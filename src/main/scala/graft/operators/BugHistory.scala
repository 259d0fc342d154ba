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
  *  - single-value fields: BACKWARD-ANCHORED like the reference — a
  *    version's value is the NEXT change's old_value (a mirrored as-of
  *    union-window: first non-null old_value over the FOLLOWING rows),
  *    falling back to the current row's value for the newest segment
  *    and for never-changed fields
  *    (reference: parse_bug_history.py:592 "Simple field change" —
  *    the backward walk applies old_value only; new_value exists for
  *    consistency warnings, so unlogged edits resolve toward current);
  *  - multi-value fields: presence intervals per (entity, item)
  *    decided BACKWARD from the current membership — the segment
  *    before a removal is present, the segment before an add is
  *    absent, the newest segment follows the current row
  *    (reference: parse_bug_history.py:816 addValues /:848
  *    removeValues — including its tolerance of inconsistent logs:
  *    unlogged removals, truncated values, and duplicate adds all
  *    resolve exactly as the reference's backward walk does, which
  *    ReferenceParitySpec proves on the real bugzilla_mini data);
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
    * @param segBounds intra-entity SEGMENT bounds from
    *                 [[SegmentFold.boundsFor]] (r13 verdict #1 — the
    *                 churn-skew escape hatch). None (the default, and
    *                 what the gate returns at oracle scales) keeps the
    *                 plain single-window path bit-identical; Some
    *                 routes the two per-entity serialized windows —
    *                 the version timeline (lead + row_number over id)
    *                 and the single-field backward anchor (running
    *                 last over (id, field)) — through K-way parallel
    *                 within-segment windows stitched on the tiny
    *                 segment frame. The multi-value windows stay
    *                 unfolded: their (id, field, item) keys spread a
    *                 whale across items, bounded by per-item churn.
    */
  def reconstruct(current: DataFrame, activity: DataFrame,
      singleFields: Seq[String], multiFields: Seq[String],
      longFields: Seq[String] = Nil,
      segBounds: Option[DataFrame] = None): DataFrame = {
    // The raw activity feeds four consumers (timeline, single-field
    // changes, multi-field changes, per-version change records).
    // Deliberately NOT cached, and callers should not cache their
    // shaped inputs either: measured at sf0.1, every caching variant
    // was 2-5x slower than recompute — these subtrees are codegen'd
    // scans+windows, and a cache boundary costs an eager
    // materialization job plus AQE losing sight of the child stats.
    val act = reassembleLongFields(activity, longFields)

    // ---- version timeline ------------------------------------------------
    val versions = versionFrame(act, current, segBounds)
    // ---- single-value fields --------------------------------------------
    // BACKWARD-ANCHORED, like the reference: the walk starts at the
    // CURRENT row and applies changes in reverse, so a version's value
    // is the NEXT change's old_value — and the newest segment is the
    // current value even when the last change's new_value disagrees
    // (reference: parse_bug_history.py:592 "Simple field change" —
    // new_value is only ever used for consistency warnings; real
    // Bugzilla logs contain unlogged edits, e.g. bulk milestone
    // renames, and anchoring at current is how the reference absorbs
    // them). On a consistent log (new_value(i) == old_value(i+1),
    // last new_value == current) this is IDENTICAL to forward replay;
    // ReferenceParitySpec proves the divergence matters on the real
    // bugzilla_mini data and that this form round-trips it.
    val singles = if (singleFields.isEmpty) None else Some {
      val chg = act.filter(col("field").isin(singleFields: _*))
        .select(col("id"), col("field"), col("ts"),
          col("old_value"), col("new_value"))
      // change rows (kind 0) sort BEFORE the version row (kind 1) at
      // the same ts, so "first change strictly after the version"
      // excludes a change at the version's own instant (that change
      // already applied AT the version, exactly like the reference's
      // backward pass leaving the post-change state on the version
      // whose timestamp it shares)
      val u = chg.select(col("id"), col("field"), col("ts"),
          col("old_value").as("value"), lit(0).as("kind"))
        .union(versions.select(col("id"), col("ts")).crossJoin(
          activity.sparkSession.createDataFrame(
            singleFields.map(Tuple1(_))).toDF("field"))
          .select(col("id"), col("field"), col("ts"), lit(null).cast("string")
            .as("value"), lit(1).as("kind")))
      // same-instant tie-break: value DESC mirrors the reference's
      // canonical within-version change order (parse_bug_history
      // .py:523 sorts changes by old_value descending), so when one
      // (id, field, ts) hunk carries TWO changes — a degenerate log no
      // fixture contains — the anchored prior state is the max
      // old_value, the same row the reference's sort puts first.
      //
      // FRAME DIRECTION (r13, the churn-skew probe's find): the
      // backward anchor is "first non-null AT OR AFTER this row" —
      // naively a [currentRow, unboundedFollowing] frame, which
      // Spark's window exec recomputes FROM SCRATCH per row (a
      // shrinking frame has no incremental update): O(n²) in the
      // (id, field) partition. A whale entity with 20% of a 1M-row
      // corpus put single tasks at 28 CPU-minutes; 100 TB churn skew
      // would never finish. The EXACT same answer comes from the
      // REVERSED total order with a RUNNING frame — last non-null
      // over [unboundedPreceding, currentRow] under (ts DESC, kind
      // DESC, value ASC) — which updates in O(1) per row (measured:
      // the 10× whale fold 28 min → sub-second; oracle-identical at
      // every scale since the order reversal is exact).
      val currentVals = current.select(col("id"),
        explode(array(singleFields.map(f =>
          struct(lit(f).as("field"), col(f).cast("string").as("cur_value"))): _*))
          .as("fv"))
        .select(col("id"), col("fv.field"), col("fv.cur_value"))
      val anchored = segBounds match {
        case None =>
          val wA = Window.partitionBy("id", "field")
            .orderBy(col("ts").desc, col("kind").desc, col("value").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          u.withColumn("state", last("value", ignoreNulls = true).over(wA))
        case Some(b) =>
          // SEGMENT FOLD (r13 verdict #1): the running reversed-order
          // anchor inside each (id, field, seg) slice; across the cut
          // each segment takes the nearest LATER segment's carry-out
          // (its final running state — the non-null value latest in
          // the reversed order: min ts, then max value) via a running
          // last over the tiny per-segment frame in seg-DESC order.
          // Segments are ts-contiguous and the reversed order only
          // reverses their sequence, so coalesce(within-segment
          // running state, carry-in) ≡ the monolithic running window.
          val segged = SegmentFold.withSeg(u, b, "id", "ts")
          val wA = Window.partitionBy("id", "field", "seg")
            .orderBy(col("ts").desc, col("kind").desc, col("value").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val inner = segged.withColumn("state_in",
            last("value", ignoreNulls = true).over(wA))
          val wC = Window.partitionBy("id", "field")
            .orderBy(col("seg").desc)
            .rowsBetween(Window.unboundedPreceding, -1)
          val carry = segged.groupBy("id", "field", "seg")
            .agg(max_by(col("value"), when(col("value").isNotNull,
              struct((lit(0L) - col("ts")).as("nts"), col("value"))))
              .as("carry_out"))
            .withColumn("carry_in",
              last("carry_out", ignoreNulls = true).over(wC))
            .select(col("id"), col("field"), col("seg"), col("carry_in"))
          inner.join(carry, Seq("id", "field", "seg"))
            .withColumn("state", coalesce(col("state_in"), col("carry_in")))
            .drop("state_in", "carry_in", "seg")
      }
      anchored
        .filter(col("kind") === 1)
        .join(currentVals, Seq("id", "field"), "left")
        .withColumn("state", coalesce(col("state"), col("cur_value")))
        .groupBy("id", "ts")
        .pivot("field", singleFields)
        .agg(first("state"))
    }

    // ---- multi-value fields ---------------------------------------------
    // BACKWARD-ANCHORED presence, like the reference (parse_bug_history
    // .py:816 addValues / :848 removeValues): walking back from the
    // current membership, an "add" record means the item was ABSENT in
    // every earlier segment and a "remove" record means it was PRESENT
    // — so, read forward, presence in the segment between two events
    // is decided by the NEXT event (add ⇒ absent, remove ⇒ present)
    // and the newest segment by membership in the current row. This
    // absorbs real-log inconsistencies the way the reference does:
    // an add whose item never reappears in current (an unlogged
    // removal, or a value truncated by the activity column width —
    // the reference's removeValues tolerance) contributes NO presence;
    // duplicate adds leave the between-adds segment absent; a remove
    // of a never-added item extends presence back to history start.
    // On consistent logs this is identical to forward +1/-1 replay.
    val multis = if (multiFields.isEmpty) None else Some {
      val intervals = presenceIntervals(act, current, multiFields)
      // membership: interval covers the version's valid_from. NOT the
      // old interval-filter join on the bare id (versions × ALL of the
      // entity's interval rows — the r13 churn-skew probe measured it
      // quadratic: a whale entity with 20% of a 1M-row corpus held b1
      // at 371 s, and 100 TB churn skew would never finish). The as-of
      // merge-scan device [[nestSubEntities]] already uses: probes =
      // versions × the entity's DISTINCT (field, item) keys — linear,
      // within a constant of the true membership answer itself — each
      // matched to the latest interval with start_ts <= ts, covered
      // iff ts < its end_ts. Per-key intervals are disjoint half-open
      // spans, so the latest-start interval is the only possible
      // cover (presenceIntervals collapses same-start degenerates to
      // max(end), keeping the as-of right side unique).
      val itemKeys = intervals.select("id", "field", "item").distinct()
      val probes = versions.select(col("id"), col("ts"))
        .join(itemKeys, Seq("id"))
      val ivals = intervals
        .select(col("id").as("i_id"), col("field").as("i_field"),
          col("item").as("i_item"), col("start_ts"), col("end_ts"))
      val member = AsOf.join(probes, ivals,
          Seq("id", "field", "item"), Seq("i_id", "i_field", "i_item"),
          "ts", "start_ts")
        .filter(col("start_ts").isNotNull && col("ts") < col("end_ts"))
      // Kept as the two-step groupBy(field)+pivot pair: a single
      // (id, ts)-keyed agg with per-field collect_set(when(...))
      // columns was MEASURED WORSE at the 100× whale (610/655 s vs
      // 587/566 — the filtered collect_set pays per-row overhead that
      // outweighs the saved second shuffle, whose input is already
      // collapsed to one array row per (id, ts, field)).
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

  /** LongField reassembly (parse_bug_history.py:1189): same-(id,
    * field, ts) fragments merge into one change row, old/new values
    * concatenated in `seq` order (the reference chains old_value
    * promises walking backwards; forwards, the split new_value
    * concatenates the same way). One hash aggregation over the
    * long-field rows only — keyed (id, field, ts), no wider shuffle
    * than the segment stage already pays. The reassembled frame is
    * materialized ONCE (unlike the raw-activity scans, where every
    * caching variant measured slower): a union with a hash
    * aggregation that four consumers would otherwise re-execute —
    * the d11 band-frame precedent. Measured 2.2 -> 1.6 s for b1 at
    * sf0.1. */
  private def reassembleLongFields(activity: DataFrame,
      longFields: Seq[String]): DataFrame = {
    val actCols = Seq("id", "ts", "modified_by", "field",
      "old_value", "new_value")
    if (longFields.isEmpty) activity else {
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
      base.filter(!col("field").isin(longFields: _*))
        .select(actCols.map(col): _*)
        .union(merged.select(actCols.map(col): _*))
        .localCheckpoint(true)
    }
  }

  /** The version timeline: distinct activity times (+ creation) with
    * expiry chaining and a version rank per entity
    * (parse_bug_history.py:514). Plain single-window path when
    * `segBounds` is None; SEGMENT FOLD (r13 verdict #1) otherwise —
    * lead/row_number inside each (id, seg) slice; across the cut,
    * expires_on = the next non-empty segment's first ts and version =
    * within-segment rank + the prefix-summed earlier-segment counts
    * (the c6 bucket-spine device on the |entities × K|-row seg
    * frame). Rows are distinct (id, ts) and segments are contiguous
    * ts ranges, so the stitched result ≡ the monolithic window. The
    * folded frame is materialized ONCE (three consumers — the singles
    * cross-join frame, the membership probes, the final assemble —
    * would each re-run the folded timeline); the PLAIN path stays
    * uncheckpointed (the measured history-DAG rule: cache boundaries
    * lose there). */
  private[operators] def versionFrame(act: DataFrame, current: DataFrame,
      segBounds: Option[DataFrame]): DataFrame = {
    val timeline = act.select(col("id"), col("ts"))
      .union(current.select(col("id"), col("created_ts").as("ts")))
      .distinct()
    segBounds match {
      case None =>
        val wV = Window.partitionBy("id").orderBy("ts")
        timeline
          .withColumn("expires_on",
            coalesce(lead("ts", 1).over(wV), lit(MaxTimestamp)))
          .withColumn("version", row_number().over(wV).cast("long"))
      case Some(b) =>
        val segged = SegmentFold.withSeg(timeline, b, "id", "ts")
        val wV = Window.partitionBy("id", "seg").orderBy("ts")
        val inner = segged
          .withColumn("lead_in", lead("ts", 1).over(wV))
          .withColumn("rn", row_number().over(wV).cast("long"))
        val wS = Window.partitionBy("id").orderBy("seg")
        val meta = segged.groupBy("id", "seg")
          .agg(count(lit(1)).as("cnt"), min("ts").as("first_ts"))
          .withColumn("next_first", lead("first_ts", 1).over(wS))
          .withColumn("offset", coalesce(sum("cnt").over(
            wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("id", "seg", "next_first", "offset")
        inner.join(meta, Seq("id", "seg"))
          .withColumn("expires_on", coalesce(col("lead_in"),
            col("next_first"), lit(MaxTimestamp)))
          .withColumn("version", col("offset") + col("rn"))
          .select(col("id"), col("ts"), col("expires_on"), col("version"))
          .localCheckpoint(true)
    }
  }

  /** Backward-anchored multi-value PRESENCE intervals in ts space —
    * (id, field, item, start_ts, end_ts), half-open, disjoint per
    * key, same-start degenerates collapsed to max(end) so an as-of
    * lookup's right side is unique (parse_bug_history.py:816
    * addValues / :848 removeValues; semantics documented at the
    * reconstruct call site). start_ts = Long.MinValue marks
    * presence since history start. */
  private[operators] def presenceIntervals(act: DataFrame,
      current: DataFrame, multiFields: Seq[String]): DataFrame = {
    val NEG = Long.MinValue
    val mchg = act.filter(col("field").isin(multiFields: _*))
    val ev = mchg.select(col("id"), col("field"), col("ts"),
        explode(split(col("new_value"), ",\\s*")).as("item"), lit(1).as("delta"))
      .union(mchg.select(col("id"), col("field"), col("ts"),
        explode(split(col("old_value"), ",\\s*")).as("item"), lit(-1).as("delta")))
      .filter(col("item") =!= "")
    val wI = Window.partitionBy("id", "field", "item").orderBy("ts", "delta")
    val currentMembers = current.select(col("id"),
        explode(array(multiFields.map(f =>
          struct(lit(f).as("field"), col(f).cast("array<string>").as("items"))): _*))
          .as("fv"))
      .select(col("id"), col("fv.field"), explode(col("fv.items")).as("item"))
    // a remove event ⇒ present over [previous event, the remove)
    val removalSpans = ev
      .withColumn("prev_ts", lag("ts", 1).over(wI))
      .filter(col("delta") === -1)
      .select(col("id"), col("field"), col("item"),
        coalesce(col("prev_ts"), lit(NEG)).as("start_ts"),
        col("ts").as("end_ts"))
    // newest segment ⇒ present iff the item is in the current row
    val lastEv = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy("id", "field", "item")
          .orderBy(col("ts").desc, col("delta").desc)))
      .filter(col("rn") === 1)
    val tailSpans = lastEv
      .join(currentMembers, Seq("id", "field", "item"), "left_semi")
      .select(col("id"), col("field"), col("item"),
        col("ts").as("start_ts"), lit(MaxTimestamp).as("end_ts"))
    // current items with no activity at all: present forever
    val evKeys = ev.select("id", "field", "item").distinct()
    val currentOnly = currentMembers
      .join(evKeys, Seq("id", "field", "item"), "left_anti")
      .select(col("id"), col("field"), col("item"),
        lit(NEG).as("start_ts"), lit(MaxTimestamp).as("end_ts"))
    removalSpans.union(tailSpans).union(currentOnly)
      .groupBy("id", "field", "item", "start_ts")
      .agg(max("end_ts").as("end_ts"))
  }

  /** B1's membership stage with RUN-LENGTH output (r14 verdict #7):
    * (id, field, item, from_version, to_version) — the item is
    * present for every version v with `from_version <= v <
    * to_version` (to_version null = present through the newest
    * version). The registered b1 form materializes versions × live
    * items (the answer's own cells — 75-80 s of the 10×-whale's
    * ~90 s wall is THIS output); a consumer that wants CHANGES pays
    * only O(membership churn) here: the same presence intervals,
    * mapped from ts space to version ranks by two as-of merge scans
    * against the version timeline (first version at-or-after each
    * bound — the negated-ts trick reuses the latest-at-or-before
    * native operator). [[BugHistorySpec]] proves exploding this over
    * the version frame reproduces the full form's exploded arrays
    * bit-for-bit. Same gate surface as [[reconstruct]]: longFields
    * reassembly and the segment-fold bounds apply to the timeline. */
  def membershipIntervals(current: DataFrame, activity: DataFrame,
      multiFields: Seq[String], longFields: Seq[String] = Nil,
      segBounds: Option[DataFrame] = None): DataFrame = {
    val act = reassembleLongFields(activity, longFields)
    // two as-of consumers below — but the FOLDED versionFrame is
    // already checkpointed; a second checkpoint would re-materialize
    // the whole whale timeline (review r15)
    val versions0 = versionFrame(act, current, segBounds)
    val versions = if (segBounds.isDefined) versions0
      else versions0.localCheckpoint(true)
    val ivals = presenceIntervals(act, current, multiFields)
    // first version with ts >= bound == latest (-ts) <= (-bound):
    // the native as-of join, negated. Every finite bound is an
    // activity ts and therefore ON the timeline; NEG (pre-history)
    // nulls through the join and coalesces to version 1, and
    // MaxTimestamp end bounds (open tails) stay null = open-ended.
    def versionAt(df: DataFrame, bound: String, out: String): DataFrame = {
      // a FRESH right side per lookup: the two as-of scans may not
      // share one plan instance (self-join attribute collision)
      val vneg = versions.select(col("id").as("v_id"),
        (-col("ts")).as("v_nts"), col("version").as(out))
      val probed = df.withColumn("_nts",
        when(col(bound) === Long.MinValue || col(bound) === MaxTimestamp,
          lit(null).cast("long")).otherwise(-col(bound)))
      AsOf.join(probed, vneg, Seq("id"), Seq("v_id"), "_nts", "v_nts")
        .drop("_nts", "v_nts", "v_id")
    }
    val withFrom = versionAt(ivals, "start_ts", "from_version")
      .withColumn("from_version",
        when(col("start_ts") === Long.MinValue, lit(1L))
          .otherwise(col("from_version")))
    versionAt(withFrom, "end_ts", "to_version")
      .select(col("id"), col("field"), col("item"),
        col("from_version"), col("to_version"))
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
