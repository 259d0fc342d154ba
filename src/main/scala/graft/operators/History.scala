package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** ETL / history operators — the reference's heart.
  *
  * The reference reconstructs per-bug snapshot *versions* with
  * validity intervals by walking the activity log
  * (reference: bugzilla_etl/parse_bug_history.py:29 "Set valid_from
  * field as modification time; Set valid_to field as the modification
  * time of the later version"). On Spark that imperative reverse-walk
  * becomes declarative window algebra: partition by entity, order by
  * modification time, and `lead`/`lag`/`row_number` derive the same
  * intervals in one shuffle. All operators below share the same
  * partitioning (entity id) so Catalyst collapses adjacent windows —
  * at 100 TB the history build is ONE shuffle per entity key, then
  * map-side work.
  */
object History {

  /** Reference: bugzilla_etl/extract_bugzilla.py:26 — versions still
    * current get this sentinel expiry (9999999999000 ms). */
  val MaxTimestamp: Long = (10L * 1000 * 1000 * 1000 - 1) * 1000

  private def byEntity: WindowSpec =
    Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** H1: SCD-2 snapshot history — valid_from/valid_to per version.
    * Spark analogue of BugHistoryParser.populateIntermediateVersionObjects
    * (reference: bugzilla_etl/parse_bug_history.py:457). */
  def h1SnapshotHistory(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        unix_millis(col("ts")).as("valid_from"),
        coalesce(unix_millis(lead("ts", 1).over(byEntity)),
          lit(MaxTimestamp)).as("valid_to"),
        row_number().over(byEntity).cast("long").as("version"))
      .orderBy("user_id", "version")

  /** H2: latest state per entity (the "current" document the reference
    * indexes; reference: bugzilla_etl/bz_etl.py incremental path). */
  def h2LatestState(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy("user_id")

  /** H3: incremental window — only rows after the cutoff re-versioned
    * (reference: bugzilla_etl/bz_etl.py:172 incremental_etl). */
  def h3IncrementalDelta(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        row_number().over(byEntity).cast("long").as("delta_version"))
      .orderBy("user_id", "delta_version")

  /** H4: collapse consecutive identical states (the reference skips
    * versions whose diff is empty). Keep a row only when the state
    * changed vs the previous one. */
  def h4DedupConsecutive(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("prev_type", lag("event_type", 1).over(byEntity))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .orderBy("user_id", "ts_ms", "event_id")

  /** H5: as-of query — the snapshot valid at time T (what the
    * reference answers by its [valid_from, valid_to) intervals). */
  def h5StateAtTime(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") < lit("2024-01-15").cast("timestamp"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("state_at"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy("user_id")

  /** H6: multi-value add/remove merge with the REFERENCE'S ordered set
    * semantics (bugzilla_etl/parse_bug_history.py:816 addValues /
    * :848 removeValues): adds and removes apply in time order with
    * tolerance for inconsistent logs — adding a present item and
    * removing an absent item are no-ops, so a remove-then-add leaves
    * the item PRESENT. Per (user, item) that reduces exactly to
    * "the last operation wins", which is a single hash aggregation
    * (map-side partial max_by, no window sort) — the set replay
    * without materializing any set. Clicks add `k`, errors remove it. */
  def h6MultivalueMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "error"))
      .select(col("user_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast("long").as("k"),
        col("event_type"), col("ts"), col("event_id"))
    ev.groupBy("user_id", "k")
      .agg(max_by(col("event_type"), struct(col("ts"), col("event_id")))
        .as("last_op"))
      .filter(col("last_op") === "click")
      .select("user_id", "k")
      .orderBy("user_id", "k")
  }

  /** H6b: the order-INSENSITIVE variant (ever-added ∖ ever-removed) —
    * kept as a separate documented query because it is the right
    * semantics when the log is a statement of facts rather than a
    * replayable edit stream. Anti-join formulation stays in
    * whole-stage codegen with map-side-distinct partial aggregation,
    * unlike a collect_set/array_except buffer build (measured 4x
    * slower at 1M events). Diverges from h6 exactly on items whose
    * last op is an add but were ever removed (or vice versa). */
  def h6bMultivalueSetdiff(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast("long").as("k"),
        col("event_type"))
    val added = ev.filter(col("event_type") === "click")
      .select("user_id", "k").distinct()
    val removed = ev.filter(col("event_type") === "error")
      .select("user_id", "k").distinct()
    added.join(removed, Seq("user_id", "k"), "left_anti")
      .orderBy("user_id", "k")
  }

  /** H7: flag parsing — "review?(x@y)" → (type, status, requestee)
    * (reference: bugzilla_etl/parse_bug_history.py:68 FLAG_PATTERN).
    * Flags are synthesized deterministically from event columns, then
    * parsed with the reference's regex — all codegen'd expressions. */
  def h7FlagParse(s: SparkSession, d: String): DataFrame = {
    val pat = "^(.*?)([?+-])(\\((.*)\\))?$"
    Tables.events(s, d)
      .withColumn("flag", concat(col("event_type"),
        when(col("value") >= 100, lit("+"))
          .when(col("value") >= 50, lit("?")).otherwise(lit("-")),
        when(col("user_id") % 2 === 0,
          concat(lit("(u"), col("user_id"), lit("@x.com)")))
          .otherwise(lit(""))))
      .select(col("event_id"), col("flag"),
        regexp_extract(col("flag"), pat, 1).as("f_type"),
        regexp_extract(col("flag"), pat, 2).as("f_status"),
        regexp_extract(col("flag"), pat, 4).as("f_requestee"))
      .orderBy("event_id")
  }

  /** H13: flag LIFECYCLE matching — beyond h7's parse, the reference
    * pairs each flag REMOVAL with the matching granted flag by
    * (type, requestee) with requestee emails folded through the alias
    * map, carrying previous_modified_ts forward and marking the flag
    * 'd' (reference: bugzilla_etl/parse_bug_history.py:292
    * processFlagsTableItem, :625 findFlag requestee-alias matching,
    * :652 processFlagChange).
    *
    * Events shape: value >= 50 sets flag (event_type, requestee),
    * value < 50 clears it; the raw requestee id (k % 40) canonicalizes
    * to k % 20 — two alias ids per canonical address, so matching
    * only works through the alias fold, as in the reference. Per
    * (entity, type, canonical requestee): state TRANSITIONS pair each
    * set with the next clear — granted_ts, removed_ts (null while
    * granted), duration, and final status '+'/'?' or 'd'. Window
    * algebra over one (id, type, requestee) partitioning; no
    * per-entity loop. */
  def h13FlagLifecycle(s: SparkSession, d: String): DataFrame = {
    val fe = Tables.events(s, d)
      .select(col("user_id").as("id"), unix_millis(col("ts")).as("ts"),
        col("event_id"), col("event_type").as("flag_type"), col("value"),
        from_json(col("props"), org.apache.spark.sql.types.StructType
          .fromDDL("k INT")).getField("k").cast("long").as("k"))
      // alias fold: raw id k%40 -> canonical k%20 (parse_bug_history
      // matches requestees via email_alias the same way)
      .withColumn("requestee",
        concat(lit("u"), pmod(col("k"), lit(40)) % 20, lit("@x.com")))
      .withColumn("delta", when(col("value") >= 50, 1).otherwise(-1))
    val wF = Window.partitionBy("id", "flag_type", "requestee")
      .orderBy("ts", "event_id")
    val transitions = fe
      .withColumn("prev", lag("delta", 1).over(wF))
      .filter(col("prev").isNull || col("prev") =!= col("delta"))
    transitions
      .withColumn("removed_ts", lead("ts", 1).over(wF))
      .filter(col("delta") === 1)
      .select(col("id"), col("flag_type"), col("requestee"),
        col("ts").as("granted_ts"), col("removed_ts"),
        (col("removed_ts") - col("ts")).as("duration_ms"),
        when(col("removed_ts").isNotNull, lit("d"))
          .when(col("value") >= 100, lit("+")).otherwise(lit("?"))
          .as("status"))
      .orderBy("id", "flag_type", "requestee", "granted_ts")
  }

  /** H8: typed JSON property extraction (the reference flattens MySQL
    * rows into nested docs; here JSON props → typed columns, then
    * aggregate). */
  def h8JsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast("long").as("k"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("user_id")

  /** H9: alias canonicalization — build an alias map, then apply it
    * via an equi-join on user_id (reference:
    * bugzilla_etl/alias_analysis.py:172 get_canonical +
    * parse_bug_history.py:1048 email_alias). The map is built from
    * signup activity; canonical id = least observed id. The map is
    * one row per ever-signed-up user — corpus-proportional, NOT a
    * bounded dimension — so it carries no broadcast hint: AQE
    * broadcasts it when genuinely small and shuffle-joins on user_id
    * otherwise (contrast AliasAnalysis.scala:101, whose alias set IS
    * bounded by distinct problem emails and may hint). Contract:
    * PlanContractSpec "h9: alias canonicalization". */
  def h9AliasCanonical(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val aliasMap = ev
      .filter(col("event_type") === "signup")
      .select(col("user_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").cast("long").as("k"))
      .groupBy("user_id")
      .agg(least(col("user_id"), min(col("k") % 25)).as("canonical"))
    ev.join(aliasMap, Seq("user_id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("user_id")))
      .groupBy("canonical")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("canonical")
  }

  /** H10: normalize/scrub — null sentinels, zero-is-null, date-string
    * round-trip (reference: bugzilla_etl/transform_bugzilla.py:53
    * normalize: NULL_VALUES scrub, ZERO_IS_NULL, DATE_PATTERN_* →
    * epoch millis). */
  def h10NormalizeScrub(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        when(col("event_type").isin("", "--", "---"), lit(null))
          .otherwise(col("event_type")).as("et"),
        when(col("value") === 0, lit(null))
          .otherwise(round(col("value"), 2)).as("v"),
        date_format(col("ts"), "yyyy/MM/dd").as("date_str"),
        unix_millis(to_timestamp(date_format(col("ts"), "yyyy/MM/dd"),
          "yyyy/MM/dd")).as("date_ms"))
      .orderBy("event_id")

  /** H14: the reference's FULL date-field normalize
    * (transform_bugzilla.py:104-131): a date value may arrive as epoch
    * millis (12-13 digit number), strict "YYYY/MM/DD HH:MM:SS.mmm",
    * strict-short "YYYY[-/]MM[-/]DD HH:MM:SS" (dashes normalized to
    * slashes before parsing, as the reference does), or relaxed
    * "YYYY[-/]MM[-/]DD..." (first 10 chars, date only) — detected by
    * the same regex ladder, all converging to epoch millis. Plus the
    * MULTI_FIELDS int-list normalize (transform_bugzilla.py:91
    * value2intlist + sort): a comma-separated id list parsed, int-ified
    * and sorted. Raw values are synthesized per event in all four
    * forms so every branch of the ladder is exercised and
    * oracle-checked. */
  def h14NormalizeDates(s: SparkSession, d: String): DataFrame = {
    def normalizeDate(c: org.apache.spark.sql.Column) =
      when(c.rlike("^\\d{12,13}$"), c.cast("long"))
        .when(c.rlike("^\\d{4}[/-]\\d{2}[/-]\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3}"),
          unix_millis(to_timestamp(translate(c, "-", "/"),
            "yyyy/MM/dd HH:mm:ss.SSS")))
        .when(c.rlike("^\\d{4}[/-]\\d{2}[/-]\\d{2} \\d{2}:\\d{2}:\\d{2}"),
          unix_millis(to_timestamp(translate(c, "-", "/"),
            "yyyy/MM/dd HH:mm:ss")))
        .when(c.rlike("^\\d{4}[/-]\\d{2}[/-]\\d{2}"),
          unix_millis(to_timestamp(translate(substring(c, 1, 10), "/", "-"),
            "yyyy-MM-dd")))
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType
      .fromDDL("k INT")).getField("k").cast("long")
    val raw = when(col("event_id") % 4 === 0,
        concat(date_format(col("ts"), "yyyy/MM/dd HH:mm:ss"), lit("."),
          date_format(col("ts"), "SSS")))
      .when(col("event_id") % 4 === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .when(col("event_id") % 4 === 2, date_format(col("ts"), "yyyy/MM/dd"))
      .otherwise(unix_millis(col("ts")).cast("string"))
    val rawList = concat(k % 10, lit(","), (k * 7) % 10, lit(","), k % 3)
    Tables.events(s, d)
      .select(col("event_id"), raw.as("raw"), rawList.as("raw_list"))
      .select(col("event_id"), col("raw"),
        normalizeDate(col("raw")).as("date_ms"),
        concat_ws(",", array_sort(transform(split(col("raw_list"), ","),
          x => x.cast("int")))).as("ints_sorted"))
      .orderBy("event_id")
  }

  /** The reference's truncation-prone multi-value fields
    * (parse_bug_history.py:80 TRUNC_FIELDS, per Bugzilla bug 55161). */
  val TruncFields: Seq[String] = Seq("cc", "blocked", "dependson", "keywords")

  /** Truncated-value tolerance core (parse_bug_history.py:137-174):
    * for TRUNC_FIELDS activities, a value of `?` / `? ?` is unknown —
    * nulled out; a `? x` prefix is a possibly-truncated `x` — prefix
    * stripped; either form marks the entity UNCERTAIN. The reference
    * (walking backwards in time) injects a synthetic
    * `uncertain: 1→null` activity at the FIRST uncertain row it meets
    * — i.e. the LATEST in time — so every state strictly before that
    * timestamp carries uncertain=1 and later states stay certain.
    * Declaratively: uncertain = ts < max(ts | row was uncertain) per
    * entity, one window over the same per-entity shuffle the history
    * build already uses.
    *
    * Input columns: id, ts_ms, event_id, field, raw. */
  def truncationTolerance(activity: DataFrame): DataFrame = {
    val unk = col("raw").isin("?", "? ?")
    val pfx = col("raw").startsWith("? ")
    val w = Window.partitionBy("id")
    activity
      .withColumn("value_clean",
        when(unk, lit(null).cast("string"))
          .when(pfx, substring(col("raw"), 3, Int.MaxValue))
          .otherwise(col("raw")))
      .withColumn("unc_ts", max(when(unk || pfx, col("ts_ms"))).over(w))
      .withColumn("uncertain",
        when(col("unc_ts").isNotNull && col("ts_ms") < col("unc_ts"), 1)
          .otherwise(0))
      .drop("unc_ts")
  }

  /** H15: drives [[truncationTolerance]] from events — the raw value
    * synthesizes every branch (`?`, `? ?`, `? v<k>`, clean) across the
    * four TRUNC_FIELDS. */
  def h15TruncationTolerance(s: SparkSession, d: String): DataFrame = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType
      .fromDDL("k INT")).getField("k").cast("long")
    val raw = when(col("event_id") % 5 === 0, lit("?"))
      .when(col("event_id") % 5 === 1, lit("? ?"))
      .when(col("event_id") % 5 === 2, concat(lit("? v"), k))
      .otherwise(concat(lit("v"), k))
    val field = element_at(
      array(TruncFields.map(lit): _*), (col("event_id") % 4 + 1).cast("int"))
    val activity = Tables.events(s, d).select(
      col("user_id").as("id"), unix_millis(col("ts")).as("ts_ms"),
      col("event_id"), field.as("field"), raw.as("raw"))
    truncationTolerance(activity)
      .select("id", "ts_ms", "event_id", "field", "value_clean", "uncertain")
      .orderBy("id", "ts_ms", "event_id")
  }

  /** H11: gap-based sessionization — a new session when >30 min idle.
    * Window-prefix-sum formulation: one shuffle on user_id, no state
    * loop (streaming variant: graft.streaming.EventStream). */
  def h11Sessionize(s: SparkSession, d: String): DataFrame = {
    val gapMs = 30L * 60 * 1000
    Tables.events(s, d)
      .withColumn("prev_ms", unix_millis(lag("ts", 1).over(byEntity)))
      .withColumn("is_new", when(col("prev_ms").isNull ||
        unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_no", sum("is_new").over(
        byEntity.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("session_no"))
      .orderBy("user_id", "ts_ms", "event_id")
  }

  /** H12: ES-style document generation — stable `_id` = entity_ts
    * (reference: bugzilla_etl/transform_bugzilla.py:55 `bug.id =
    * bug_id + "_" + modified_ts`), body as JSON. Oracle-checked: the
    * DuckDB oracle rebuilds the JSON text via string concatenation and
    * the shortest-round-trip double reprs agree byte-for-byte on the
    * test corpus. */
  def h12EsDocs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        concat(col("user_id"), lit("_"), unix_millis(col("ts"))).as("_id"),
        to_json(struct(col("user_id"), col("event_type"),
          col("value"), unix_millis(col("ts")).as("modified_ts")))
          .as("doc"))
      .orderBy("_id")

  /** H17: time-series GAP-FILL — resample each entity's irregular
    * observations onto a regular hourly spine with forward-fill and a
    * staleness column (the observability/metrics query: "the value as
    * of each tick, and how old it is"). Implementation showcases the
    * native as-of operator on a GENERATED left side: the spine is
    * sequence()-exploded per entity from its hour-floored first to
    * its last observation (no driver loop, no cross join against a
    * global calendar — each entity carries exactly its own ticks),
    * then one [[AsOf.join]] merge scan fills every tick with the
    * latest observation at-or-before it. A tick before the entity's
    * first observation stays null (leading gap — nothing to fill
    * from; one per entity by construction of the hour floor).
    *
    * Scale shape: two pushed-filter scans (bounds + observations),
    * one entity-keyed shuffle for the as-of join, and the spine
    * explode is a pure map whose fan-out is span-hours per entity —
    * the output's own size. The naive window alternative
    * (last_value IGNORE NULLS over a unioned spine+obs frame) needs
    * the same shuffle but materializes the union and a full sort;
    * the merge scan reads both sides once. */
  def h17Gapfill(s: SparkSession, d: String): DataFrame =
    gapfillFrame(Tables.events(s, d))

  /** h17's body over an arbitrary (user_id, ts, event_id, value)
    * frame — exposed so the spec can pin tick placement, leading-gap
    * nulls, and staleness arithmetic on hand-built timelines. */
  private[graft] def gapfillFrame(ev: DataFrame): DataFrame = {
    // one observation per (user, ts): concurrent events collapse to
    // the latest event_id (q14's dedup, deterministic output)
    val obs = ev.groupBy(col("user_id").as("o_user"),
        unix_millis(col("ts")).as("obs_ms"))
      .agg(round(max_by(col("value"), col("event_id")), 2).as("obs_value"))
    val spine = ev.groupBy("user_id")
      .agg(unix_millis(date_trunc("hour", min("ts"))).as("t0"),
        unix_millis(max("ts")).as("t1"))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), lit(3600000L)))
          .as("tick_ms"))
    graft.operators.AsOf.join(spine, obs,
        Seq("user_id"), Seq("o_user"), "tick_ms", "obs_ms")
      .select(col("user_id"), col("tick_ms"),
        col("obs_value").as("value_ff"),
        (col("tick_ms") - col("obs_ms")).as("staleness_ms"))
      .orderBy("user_id", "tick_ms")
  }
}
