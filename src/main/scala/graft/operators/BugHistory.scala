package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full snapshot-history reconstruction from an activity log — the
  * declarative Spark reformulation of the reference's imperative
  * per-bug walk (reference: bugzilla_etl/parse_bug_history.py:99
  * BugHistoryParser; :457 populateIntermediateVersionObjects).
  *
  * The reference starts from the current row, walks the activity log
  * backwards to recover the initial state, then walks forward emitting
  * one version per distinct modification time, each valid over
  * [modified_ts, expires_on). The same result is computed here without
  * any per-entity loop:
  *
  *  - version timeline  = distinct activity times (+ creation), with
  *    `expires_on` = lead(ts) and a MAX_TIMESTAMP sentinel
  *    (reference: parse_bug_history.py:514);
  *  - single-value fields: a change (ts, old→new) opens a state
  *    segment; the segment live at a version is found with an as-of
  *    union-window (last non-null state ordered by (ts, kind));
  *    the initial segment is the earliest change's old_value, or the
  *    current value for never-changed fields
  *    (reference: parse_bug_history.py:592 "Simple field change");
  *  - multi-value fields: add/remove activity becomes presence
  *    intervals per (entity, item) — cumulative presence runs, with a
  *    pseudo-add at -inf when the first event is a removal (the item
  *    existed before history began) or when the item is in the current
  *    state with no activity at all
  *    (reference: parse_bug_history.py:816 addValues /:848
  *    removeValues — including its tolerance of inconsistent logs);
  *  - per-version `changes` records (field, old, new) sorted, like
  *    the reference's normalize() change list
  *    (reference: transform_bugzilla.py:75).
  *
  * Scale: one shuffle keyed by entity for the timeline, one keyed by
  * (entity, field) for segments, one by (entity, field, item) for
  * intervals, then hash joins back on (entity, ts) — every stage is
  * key-partitioned with no per-entity state held on any single node
  * beyond one entity's rows.
  */
object BugHistory {

  val MaxTimestamp: Long = History.MaxTimestamp

  /** @param current  one row per entity: `id`, `created_ts` (epoch ms,
    *                 long), single fields as columns, multi fields as
    *                 array<string>
    * @param activity change log: `id`, `ts` (epoch ms, long),
    *                 `modified_by`, `field`, `old_value`, `new_value`
    *                 (multi-value changes: comma-separated item lists,
    *                 like bugs_activity)
    * @param longFields single-value fields whose values Bugzilla
    *                 SPLITS ACROSS MULTIPLE activity records in one
    *                 timestamp hunk (the bugs_activity column width
    *                 limit; reference: parse_bug_history.py:1189
    *                 LongField, use site :395-399, LONG_FIELDS
    *                 transform_bugzilla.py:26). Fragments of the same
    *                 (id, field, ts) hunk are concatenated in record
    *                 order BEFORE the replay — the declarative twin of
    *                 the reference's backward-walk promise chaining
    *                 (next_value.timestamp == timestamp ⇒ append) —
    *                 and the hunk counts as ONE change. Record order
    *                 comes from an optional `seq` column on the
    *                 activity (absent ⇒ single-fragment hunks only).
    */
  def reconstruct(current: DataFrame, activity: DataFrame,
      singleFields: Seq[String], multiFields: Seq[String],
      longFields: Seq[String] = Nil): DataFrame = {
    val NEG = Long.MinValue

    // The raw activity feeds four consumers (timeline, single-field
    // changes, multi-field changes, per-version change records).
    // Deliberately NOT cached, and callers should not cache their
    // shaped inputs either: measured at sf0.1, every caching variant
    // was 2-5x slower than recompute — these subtrees are codegen'd
    // scans+windows, and a cache boundary costs an eager
    // materialization job plus AQE losing sight of the child stats.
    val actCols = Seq("id", "ts", "modified_by", "field",
      "old_value", "new_value")
    val act = if (longFields.isEmpty) activity else {
      // LongField reassembly: same-(id, field, ts) fragments merge
      // into one change row, old/new values concatenated in `seq`
      // order (the reference chains old_value promises walking
      // backwards; forwards, the split new_value concatenates the
      // same way). One hash aggregation over the long-field rows
      // only — keyed (id, field, ts), no wider shuffle than the
      // segment stage already pays.
      val seqCol = if (activity.columns.contains("seq")) col("seq")
        else lit(0L)
      val base = activity.withColumn("_seq", seqCol.cast("long"))
      def joined(c: String) = concat_ws("", transform(
        array_sort(collect_list(struct(col("_seq").as("s"),
          col(c).as("v")))), x => x.getField("v")))
      val merged = base.filter(col("field").isin(longFields: _*))
        .groupBy("id", "field", "ts")
        .agg(min_by(col("modified_by"), col("_seq")).as("modified_by"),
          joined("old_value").as("old_value"),
          joined("new_value").as("new_value"))
      // materialized ONCE: unlike the raw-activity case above (cheap
      // codegen'd scans, where every caching variant measured slower),
      // the reassembled frame is a union with a hash aggregation that
      // four consumers would otherwise re-execute — the d11 band-frame
      // precedent. Measured 2.2 -> 1.6 s for b1 at sf0.1.
      base.filter(!col("field").isin(longFields: _*))
        .select(actCols.map(col): _*)
        .union(merged.select(actCols.map(col): _*))
        .localCheckpoint(true)
    }

    // ---- version timeline ------------------------------------------------
    val timeline = act.select(col("id"), col("ts"))
      .union(current.select(col("id"), col("created_ts").as("ts")))
      .distinct()
    val wV = Window.partitionBy("id").orderBy("ts")
    val versions = timeline
      .withColumn("expires_on", coalesce(lead("ts", 1).over(wV), lit(MaxTimestamp)))
      .withColumn("version", row_number().over(wV).cast("long"))

    // ---- single-value fields --------------------------------------------
    val singles = if (singleFields.isEmpty) None else Some {
      val chg = act.filter(col("field").isin(singleFields: _*))
        .select(col("id"), col("field"), col("ts"),
          col("old_value"), col("new_value"))
      val wC = Window.partitionBy("id", "field").orderBy("ts", "new_value")
      // initial segment: earliest change's old_value …
      val initFromLog = chg
        .withColumn("rn", row_number().over(wC))
        .filter(col("rn") === 1)
        .select(col("id"), col("field"), lit(NEG).as("ts"),
          col("old_value").as("value"))
      // … or the current value for fields never touched by the log
      val touched = chg.select("id", "field").distinct()
      val initFromCurrent = current
        .select(col("id"),
          explode(array(singleFields.map(f =>
            struct(lit(f).as("field"), col(f).cast("string").as("value"))): _*))
            .as("fv"))
        .select(col("id"), col("fv.field"), lit(NEG).as("ts"), col("fv.value"))
        .join(touched, Seq("id", "field"), "left_anti")
      val segments = chg
        .select(col("id"), col("field"), col("ts"), col("new_value").as("value"))
        .union(initFromLog).union(initFromCurrent)
      // as-of: segment rows (kind 0) sort before the version row (kind 1)
      // at the same ts, so a change at ts applies to the version at ts
      val u = segments.select(col("id"), col("field"), col("ts"),
          col("value"), lit(0).as("kind"))
        .union(versions.select(col("id"), col("ts")).crossJoin(
          activity.sparkSession.createDataFrame(
            singleFields.map(Tuple1(_))).toDF("field"))
          .select(col("id"), col("field"), col("ts"), lit(null).cast("string")
            .as("value"), lit(1).as("kind")))
      val wA = Window.partitionBy("id", "field").orderBy("ts", "kind", "value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("state", last("value", ignoreNulls = true).over(wA))
        .filter(col("kind") === 1)
        .groupBy("id", "ts")
        .pivot("field", singleFields)
        .agg(first("state"))
    }

    // ---- multi-value fields ---------------------------------------------
    val multis = if (multiFields.isEmpty) None else Some {
      val mchg = act.filter(col("field").isin(multiFields: _*))
      val ev = mchg.select(col("id"), col("field"), col("ts"),
          explode(split(col("new_value"), ",\\s*")).as("item"), lit(1).as("delta"))
        .union(mchg.select(col("id"), col("field"), col("ts"),
          explode(split(col("old_value"), ",\\s*")).as("item"), lit(-1).as("delta")))
        .filter(col("item") =!= "")
      val wI = Window.partitionBy("id", "field", "item").orderBy("ts", "delta")
      // the item existed before history began iff its first event removes it
      val withInit = ev
        .withColumn("first_delta", first("delta").over(
          wI.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("init", when(col("first_delta") === -1, 1).otherwise(0))
      // current items with no activity at all: present forever
      val evKeys = ev.select("id", "field", "item").distinct()
      val currentItems = current.select(col("id"),
          explode(array(multiFields.map(f =>
            struct(lit(f).as("field"), col(f).cast("array<string>").as("items"))): _*))
            .as("fv"))
        .select(col("id"), col("fv.field"), explode(col("fv.items")).as("item"))
        .join(evKeys, Seq("id", "field", "item"), "left_anti")
        .select(col("id"), col("field"), col("item"),
          lit(NEG).as("start_ts"), lit(MaxTimestamp).as("end_ts"))
      // presence runs: cum>0 spans; run start at 0→+, end at +→0
      val runs = withInit
        .withColumn("cum", col("init") + sum("delta").over(
          wI.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_cum", coalesce(lag("cum", 1).over(wI), col("init")))
        .withColumn("is_start", col("prev_cum") <= 0 && col("cum") > 0)
        .withColumn("is_end", col("prev_cum") > 0 && col("cum") <= 0)
        .filter(col("is_start") || col("is_end"))
        .withColumn("next_end", lead(when(col("is_end"), col("ts")), 1).over(wI))
      val intervals = runs.filter(col("is_start"))
        .select(col("id"), col("field"), col("item"),
          col("ts").as("start_ts"),
          coalesce(col("next_end"), lit(MaxTimestamp)).as("end_ts"))
        .union(withInit.filter(col("init") === 1)
          .withColumn("rn", row_number().over(wI)).filter(col("rn") === 1)
          .select(col("id"), col("field"), col("item"), lit(NEG).as("start_ts"),
            col("ts").as("end_ts")))
        .union(currentItems)
      // membership: interval covers the version's valid_from
      val member = versions.select(col("id"), col("ts"))
        .join(intervals, Seq("id"))
        .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      member.groupBy("id", "ts", "field")
        .agg(array_sort(collect_set("item")).as("items"))
        .groupBy("id", "ts")
        .pivot("field", multiFields)
        .agg(first("items"))
    }

    // ---- per-version change records -------------------------------------
    val changes = act
      .groupBy(col("id"), col("ts"))
      .agg(array_sort(collect_list(struct(
        col("field").as("field_name"),
        col("old_value"), col("new_value")))).as("changes"),
        first("modified_by").as("modified_by"))

    // ---- assemble --------------------------------------------------------
    val base = versions
      .join(changes, Seq("id", "ts"), "left")
    val withSingles = singles.fold(base)(sdf => base.join(sdf, Seq("id", "ts"), "left"))
    val withMultis = multis.fold(withSingles)(mdf =>
      withSingles.join(mdf, Seq("id", "ts"), "left"))
    val emptyArr = array().cast("array<string>")
    multiFields.foldLeft(withMultis)(
      (df, f) => df.withColumn(f, coalesce(col(f), emptyArr)))
      .withColumn("snapshot_id", concat(col("id"), lit("_"), col("ts")))
      .withColumnRenamed("ts", "valid_from")
      .orderBy("id", "version")
  }

  /** Nest sub-entity version histories into parent versions — the
    * reference keeps each bug version's attachments (with their own
    * changing fields) inline (reference: bugzilla_etl/
    * parse_bug_history.py:255 processAttachmentsTableItem, :563
    * currBugState.attachments). For every parent version interval, the
    * sub-entity snapshot valid at the interval start is collected into
    * a sorted struct array.
    *
    * @param parents     output of [[reconstruct]] for the parent
    * @param subVersions output of [[reconstruct]] for sub-entities,
    *                    whose `id` is the PARENT id and which carries a
    *                    distinct `subId` column
    * @param subFields   sub-entity fields to carry into the nest */
  def nestSubEntities(parents: DataFrame, subVersions: DataFrame,
      subFields: Seq[String]): DataFrame = {
    // A sub-entity's version intervals tile time contiguously from its
    // first version to +inf, so "the interval containing the parent's
    // valid_from" is exactly an AS-OF lookup: the latest sub version
    // with s_from <= valid_from (none ⇒ the sub-entity doesn't exist
    // yet). Expanding parent versions by their DISTINCT subIds and
    // merge-scanning via the native as-of join keeps the intermediate
    // at (parent versions × live subIds) rows; the earlier
    // interval-filter join on the low-cardinality parent id built
    // (parent versions × ALL sub version rows) — ~16× bigger here and
    // quadratic in sub-entity churn at scale.
    val subCols = struct((col("subId") +: subFields.map(col)): _*)
    val subIds = subVersions.select(col("id"), col("subId")).distinct()
    val expanded = parents.select(col("id"), col("valid_from"))
      .join(subIds, Seq("id"))
    val rhs = subVersions.select((Seq(col("id").as("s_id"),
        col("subId").as("s_sub"), col("valid_from").as("s_from")) ++
        subFields.map(col)): _*)
    val matched = AsOf.join(expanded, rhs,
        Seq("id", "subId"), Seq("s_id", "s_sub"), "valid_from", "s_from")
      .filter(col("s_from").isNotNull)
      .groupBy("id", "valid_from")
      .agg(array_sort(collect_list(subCols)).as("sub_entities"))
    parents.join(matched, Seq("id", "valid_from"), "left")
  }
}
