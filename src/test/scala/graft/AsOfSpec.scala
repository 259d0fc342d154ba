package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoin operator vs an independent window formulation,
  * plus edge cases the merge scan must get right. */
class AsOfSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("asof join equals union+window formulation on real data") {
    val got = operators.AsOf.q14AsofJoin(spark, sf)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // independent formulation: union events+signups, last signup as-of
    val ev = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms", "is_signup", "event_id")
    val expected = ev.select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        (col("event_type") === "signup").cast("int").as("is_signup"),
        when(col("event_type") === "signup", unix_millis(col("ts"))).as("sig_ms"))
      .withColumn("last_sig", last("sig_ms", ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .filter(col("is_signup") === 0)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q16 interval join equals the literal range-join formulation") {
    // the as-of re-expression rests on intervals tiling time per
    // entity; this proves it against the naive ts >= from AND ts < to
    // join (which Spark would execute as a per-key nested loop)
    val got = operators.AsOf.q16IntervalJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val states = ev.filter(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id").as("s_user"),
        unix_millis(col("ts")).as("valid_from"))
      .agg(max_by(col("event_type"), col("event_id")).as("state"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s_user").orderBy("valid_from")
    val versions = states
      .withColumn("state_version", row_number().over(w).cast("long"))
      .withColumn("valid_to", coalesce(lead("valid_from", 1).over(w),
        lit(operators.History.MaxTimestamp)))
    val expected = ev.filter(!col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .join(versions, col("user_id") === col("s_user") &&
        col("ts_ms") >= col("valid_from") && col("ts_ms") < col("valid_to"),
        "left")
      .select("event_id", "user_id", "ts_ms", "state", "state_version",
        "valid_from", "valid_to")
    assert(got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("left rows with no prior right row get nulls; ties on time match") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"),
      (3L, 10L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (2L, 60L, "r60"))
      .toDF("k", "rt", "rv")
    val out = operators.AsOf.join(left, right, Seq("k"), Seq("k"), "t", "rt")
      .select("tag", "rv").collect().map(r =>
        (r.getString(0), Option(r.getString(1)).getOrElse("-"))).toMap
    assert(out == Map(
      "a" -> "r100", // tie: rt <= t inclusive
      "b" -> "r150", // latest of the two
      "c" -> "-",    // right exists but only later (60 > 50)
      "d" -> "-"))   // key absent on the right
  }

  test("survives repartitioned inputs (co-partitioning enforced)") {
    val left = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), (col("id") * 10).as("t"), col("id").as("lid"))
      .repartition(13)
    val right = spark.range(0, 100).select(
      (col("id") % 7).as("k"), (col("id") * 97).as("rt"), col("id").as("rid"))
      .repartition(3)
    val out = operators.AsOf.join(left, right, Seq("k"), Seq("k"), "t", "rt")
    assert(out.count() == 1000)
    // spot check: every matched rt is the max rt <= t for that k
    val rows = out.collect()
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { r =>
      val k = r.getLong(0); val t = r.getLong(1)
      val best = rightRows.filter(p => p._1 == k && p._2 <= t)
        .map(_._2).sorted.lastOption
      val got = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(got == best, s"k=$k t=$t")
    }
  }

  test("temporalAlign refines intervals, masks gaps and missing coverage") {
    import spark.implicits._
    val MAX = operators.History.MaxTimestamp
    // left has a GAP [20,30); right starts late and ends early — every
    // masking branch fires
    val left = Seq((1L, 10L, 20L, "A"), (1L, 30L, MAX, "B"))
      .toDF("id", "valid_from", "expires_on", "status")
    val right = Seq((1L, 15L, 35L, "X"))
      .toDF("id", "valid_from", "expires_on", "grp")
    val out = operators.AsOf.temporalAlign(left, right,
        Seq("status"), Seq("grp"))
      .orderBy("valid_from").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSeq
    assert(out == Seq(
      (10L, 15L, Some("A"), None),
      (15L, 20L, Some("A"), Some("X")),
      (20L, 30L, None, Some("X")),
      (30L, 35L, Some("B"), Some("X")),
      (35L, MAX, Some("B"), None)))
  }

  test("h17 gapfill: hourly ticks from the hour floor, forward-fill " +
      "with staleness, leading gap stays null") {
    import org.apache.spark.sql.functions.to_timestamp
    val ev = Seq(
      (1L, "2024-03-01 00:30:00", 1L, 5.0),
      (1L, "2024-03-01 02:15:00", 2L, 7.0),
      (2L, "2024-03-01 00:10:00", 3L, 9.0))
      .toDF("user_id", "tss", "event_id", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = operators.History.gapfillFrame(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
      .toEpochMilli
    def t(min: Long) = base + min * 60000L
    // user 1: ticks at 0:00 (before first obs — null), 1:00 (fills
    // the 0:30 obs, 30 min stale), 2:00 (same obs, 90 min stale);
    // the 2:15 obs bounds the spine but has no tick at-or-after it.
    // user 2: single tick at 0:00 precedes its only observation.
    assert(out.toSet == Set(
      (1L, t(0), None, None),
      (1L, t(60), Some(5.0), Some(30L * 60000)),
      (1L, t(120), Some(5.0), Some(90L * 60000)),
      (2L, t(0), None, None)))
  }
}
