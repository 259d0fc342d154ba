package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Intra-entity SEGMENT fold — the escape hatch for CHURN SKEW in the
  * per-entity, order-sensitive history folds (r13 verdict #1).
  *
  * The history family's windows partition by entity id, so one
  * monster entity (a bug with millions of activity rows — 20% of the
  * corpus in the PROBE_ETLSKEW protocol) serializes every chained
  * window sort into ONE task: linear since r13's quadratic-stage
  * fixes, but single-task — 1093 s and a 48 GB heap floor at the
  * 100× whale. The fold here is the order-sensitive analogue of
  * [[Salting.saltedAgg]] (which is spec-proven for the commutative
  * case): split each entity's timeline into K contiguous ts-range
  * SEGMENTS, run each window inside its (id, seg) slice — K-way
  * parallel, each sort bounded by the segment size — and stitch the
  * boundary state across segments on the |entities × K|-row segment
  * frame (the only per-entity serial step, K rows per entity).
  *
  * Exactness: a segment assignment that is (a) a pure function of ts
  * and (b) monotone in ts splits every entity's ordered row sequence
  * into contiguous runs, so within-segment order ∘ segment order = the
  * monolithic order, and each folded primitive restores exactly the
  * rows a window would have carried across the cut:
  *  - lag(v, 1): the previous segment's LAST row value at each
  *    segment's first row ([[lag1]]);
  *  - running last(v, ignoreNulls): the nearest preceding segment's
  *    carry-out, coalesced under the within-segment running value
  *    (reconstruct's backward anchor — BugHistory);
  *  - lead(ts, 1) / row_number: the next segment's first ts, and
  *    within-segment rank + the prefix-summed segment counts
  *    (reconstruct's version timeline — the c6 bucket-spine device).
  *
  * GATE (the d10 set-aside rule): [[boundsFor]] decides with one
  * bounded aggregate job and returns None unless some entity exceeds
  * `threshold` rows — oracle scales (max entity ≈ 10² rows) keep the
  * plain single-window path bit-identical, and the fold activates
  * only where the plain path cannot finish.
  *
  * Scale: the bounds frame is ≤ |rows|/threshold entities × one row —
  * corpus-derived, so it is joined UNHINTED (the h9 law: AQE
  * broadcasts when provably small, shuffle-joins otherwise).
  */
object SegmentFold {

  /** Conf key for the per-entity activation threshold (rows). */
  val ThresholdConf = "spark.graft.history.segmentRows"
  val DefaultThreshold: Long = 131072L
  val MaxSegments = 64

  def threshold(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.getOption(ThresholdConf).map(_.toLong)
      .getOrElse(DefaultThreshold)

  /** Per-entity segment bounds for entities whose row count in `rows`
    * exceeds `threshold`: K−1 interior ts quantiles per whale entity.
    * Returns None when no entity qualifies — ONE bounded aggregate job
    * decides (the gate). Once active, segments target threshold/8 rows
    * (floor 4096, ≤ [[MaxSegments]]): the GATE bounds when the fold
    * pays its stitch overhead at all, while the finer K keeps each
    * within-segment sort small and spreads a whale across the
    * executor slots (K = 2 measured only −10% at the 10× whale; K ≈
    * 13 is where the single-task serialization actually breaks).
    *
    * The returned frame — (seg_id, seg_bounds array) — is eagerly
    * checkpointed: it is tiny (≤ |rows|/threshold entities) and feeds
    * every window site of the caller. Quantile values only shape
    * BALANCE; any ts cut points give the exact answer (see [[segOf]]),
    * so approx_percentile's merge nondeterminism is harmless.
    *
    * `rows` must share the caller's id domain and be ts-representative
    * of the frames the bounds will segment (the raw activity feed; the
    * frames derived from it only add/drop rows at the same ts values).
    */
  def boundsFor(rows: DataFrame, idCol: String, tsCol: String,
      threshold: Long, maxSegs: Int = MaxSegments): Option[DataFrame] = {
    val counts = rows.groupBy(col(idCol).as("seg_id"))
      .agg(count(lit(1)).as("cnt"))
    val maxCnt = counts.agg(max("cnt")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toLong))
      .getOrElse(0L)
    if (maxCnt <= threshold) None
    else {
      val segTarget = math.max(threshold / 8, 4096L)
      // clamp k >= 2: a small custom threshold with maxCnt <= one
      // segment target would otherwise pick k = 1 — EMPTY quantile
      // arrays, every row in segment 0, the stitch shuffles paid for
      // zero parallelism gain. (At the default threshold the gate
      // fires only when maxCnt > 8 segment targets, so k >= 9 there.)
      val k = math.max(2L, math.min(maxSegs.toLong,
        (maxCnt + segTarget - 1) / segTarget)).toInt
      val qs = (1 until k).map(_.toDouble / k)
      val whales = counts.filter(col("cnt") > threshold)
        .select("seg_id")
      // quantiles over whale rows only: the semi join keeps the
      // percentile state off the long tail of small entities (the
      // whale frame is tiny — AQE broadcasts the unhinted semi join)
      val bounds = rows
        .join(whales.withColumnRenamed("seg_id", idCol),
          Seq(idCol), "left_semi")
        .groupBy(col(idCol).as("seg_id"))
        .agg(percentile_approx(col(tsCol).cast("long"),
          array(qs.map(lit): _*), lit(10000)).as("seg_bounds"))
        .localCheckpoint(true) // tiny; feeds every window site
      Some(bounds)
    }
  }

  /** Segment of `ts` under `bounds` (array column, null ⇒ segment 0):
    * the count of bounds strictly below ts — a pure, ts-monotone
    * function, so equal timestamps always share a segment and the
    * segment sequence is contiguous in ts. */
  def segOf(ts: Column, bounds: Column): Column =
    when(bounds.isNull, lit(0))
      .otherwise(aggregate(bounds, lit(0),
        (acc, b) => acc + when(ts > b, 1).otherwise(0)))

  /** Left-join `bounds` and attach the `seg` column. Unhinted (the h9
    * law): the bounds frame is ≤ |rows|/threshold entities — AQE
    * broadcasts it when small, which is every practical case. */
  def withSeg(df: DataFrame, bounds: DataFrame, idCol: String,
      tsCol: String): DataFrame =
    df.join(bounds.withColumnRenamed("seg_id", idCol), Seq(idCol), "left")
      .withColumn("seg", segOf(col(tsCol), col("seg_bounds")))
      .drop("seg_bounds")

  /** `lag(valueCol, 1) OVER (PARTITION BY idCol ORDER BY tsCol,
    * tieCols…)` as `outCol` — segment-folded when bounds are present,
    * the plain window otherwise. Exact: each segment's first row takes
    * the previous non-empty segment's last value (max_by over the
    * order key), every other row lags within its segment. */
  def lag1(df: DataFrame, bounds: Option[DataFrame], idCol: String,
      tsCol: String, tieCols: Seq[String], valueCol: String,
      outCol: String): DataFrame = bounds match {
    case None =>
      val w = Window.partitionBy(idCol)
        .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
      df.withColumn(outCol, lag(valueCol, 1).over(w))
    case Some(b) =>
      val segged = withSeg(df, b, idCol, tsCol)
      val ord = (col(tsCol) +: tieCols.map(col)).map(_.asc)
      val w = Window.partitionBy(idCol, "seg").orderBy(ord: _*)
      val ordKey = struct((col(tsCol) +: tieCols.map(col)): _*)
      val inner = segged
        .withColumn(outCol, lag(valueCol, 1).over(w))
        .withColumn("_sf_rn", row_number().over(w))
      val wS = Window.partitionBy(idCol).orderBy("seg")
      val carry = segged.groupBy(col(idCol), col("seg"))
        .agg(max_by(col(valueCol), ordKey).as("_sf_last"))
        .withColumn("_sf_prev", lag("_sf_last", 1).over(wS))
        .select(col(idCol), col("seg"), col("_sf_prev"))
      inner.join(carry, Seq(idCol, "seg"))
        .withColumn(outCol,
          when(col("_sf_rn") === 1, col("_sf_prev")).otherwise(col(outCol)))
        .drop("_sf_rn", "_sf_prev", "seg")
  }

  /** `lead(tsCol, 1)` (as `leadOut`, null on each entity's last row)
    * plus `row_number()` (as `rnOut`, long) over `PARTITION BY idCol
    * ORDER BY tsCol, tieCols…` — segment-folded when bounds are
    * present. The BugHistory timeline stitch generalized to tie
    * columns: across the cut, lead = the next non-empty segment's
    * first ts and rank = within-segment rank + the prefix-summed
    * earlier-segment counts (exact because the ts-monotone segment
    * assignment keeps within-segment ∘ segment order = total order;
    * ts ties always share a segment, so the cross-cut lead is a pure
    * ts value). */
  def leadRn(df: DataFrame, bounds: Option[DataFrame], idCol: String,
      tsCol: String, tieCols: Seq[String], leadOut: String,
      rnOut: String): DataFrame = bounds match {
    case None =>
      val w = Window.partitionBy(idCol)
        .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
      df.withColumn(leadOut, lead(tsCol, 1).over(w))
        .withColumn(rnOut, row_number().over(w).cast("long"))
    case Some(b) =>
      val segged = withSeg(df, b, idCol, tsCol)
      val w = Window.partitionBy(idCol, "seg")
        .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
      val inner = segged
        .withColumn(leadOut, lead(tsCol, 1).over(w))
        .withColumn("_sf_rn", row_number().over(w).cast("long"))
      val wS = Window.partitionBy(idCol).orderBy("seg")
      val meta = segged.groupBy(col(idCol), col("seg"))
        .agg(count(lit(1)).as("_sf_cnt"), min(tsCol).as("_sf_first"))
        .withColumn("_sf_next", lead("_sf_first", 1).over(wS))
        .withColumn("_sf_off", coalesce(sum("_sf_cnt").over(
          wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(idCol), col("seg"), col("_sf_next"), col("_sf_off"))
      inner.join(meta, Seq(idCol, "seg"))
        .withColumn(leadOut, coalesce(col(leadOut), col("_sf_next")))
        .withColumn(rnOut, col("_sf_off") + col("_sf_rn"))
        .drop("_sf_rn", "_sf_next", "_sf_off", "seg")
  }

  /** Inclusive running `sum(valueCol)` over `PARTITION BY idCol ORDER
    * BY tsCol, tieCols… ROWS UNBOUNDED PRECEDING..CURRENT` as
    * `outCol` — segment-folded when bounds are present: within-segment
    * running sum + the prefix-summed per-segment totals (the c6
    * bucket-spine device, exact by the same contiguity argument as
    * [[leadRn]]). */
  def runningSum(df: DataFrame, bounds: Option[DataFrame], idCol: String,
      tsCol: String, tieCols: Seq[String], valueCol: String,
      outCol: String): DataFrame = bounds match {
    case None =>
      val w = Window.partitionBy(idCol)
        .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(outCol, sum(valueCol).over(w))
    case Some(b) =>
      val segged = withSeg(df, b, idCol, tsCol)
      val w = Window.partitionBy(idCol, "seg")
        .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inner = segged.withColumn(outCol, sum(valueCol).over(w))
      val wS = Window.partitionBy(idCol).orderBy("seg")
      val meta = segged.groupBy(col(idCol), col("seg"))
        .agg(sum(valueCol).as("_sf_tot"))
        .withColumn("_sf_off", coalesce(sum("_sf_tot").over(
          wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col(idCol), col("seg"), col("_sf_off"))
      inner.join(meta, Seq(idCol, "seg"))
        .withColumn(outCol, col(outCol) + col("_sf_off"))
        .drop("_sf_off", "seg")
  }
}
