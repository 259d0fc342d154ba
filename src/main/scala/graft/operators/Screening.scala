package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy screening — the reference drops private bugs/attachments
  * and replaces private comment text with '[screened]' before loading
  * (reference: bugzilla_etl/extract_bugzilla.py:151
  * get_private_bugs_for_delete, :744 get_comments
  * `'[screened]' comment`).
  *
  * Spark-first shape: the private-id set is a dimension — an anti-join
  * (drop) or broadcast left join (redact) against it, never a
  * collected blacklist on the driver. */
object Screening {

  /** P1: drop private entities, redact sensitive text of a second
    * tier. Private set here: documents whose source is in the screened
    * group list; redaction tier: documents flagged by a marker. */
  def p1PrivacyScreen(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // tier 1: sources 'src0','src1' are private -> dropped entirely
    val privateSources = Seq("src0", "src1")
    // tier 2: very short docs stand in for private comments -> redacted
    docs.filter(!col("source").isin(privateSources: _*))
      .select(col("doc_id"), col("source"),
        when(col("n_chars") < 150, lit("[screened]"))
          .otherwise(col("text")).as("text"),
        (col("n_chars") < 150).as("screened"))
      .orderBy("doc_id")
  }

  /** P2: FIELD-level screening — unlike p1's whole-row tiers, the
    * reference scrubs specific *fields* of bugs in screened groups
    * while keeping the rest of the row intact: `SCREENED_FIELDDEFS`
    * replaces chosen field values with '[screened]' and screened
    * whiteboards are blanked (reference:
    * bugzilla_etl/extract_bugzilla.py:30 SCREENED_FIELDDEFS, :104
    * get_screened_whiteboard; bug_group_map membership decides which
    * bugs are screened).
    *
    * Mapping: documents of sources 'src1'/'src3' are in a screened
    * group; for those rows `text` becomes '[screened]' and `lang`
    * (the whiteboard stand-in) is nulled — doc_id, source, n_chars
    * survive untouched, and no row is dropped. Pure map stage. */
  def p2FieldScreen(s: SparkSession, d: String): DataFrame = {
    val screenedGroups = Seq("src1", "src3")
    val inGroup = col("source").isin(screenedGroups: _*)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        when(inGroup, lit("[screened]")).otherwise(col("text")).as("text"),
        when(inGroup, lit(null).cast("string")).otherwise(col("lang"))
          .as("lang"),
        col("n_chars"), inGroup.as("screened"))
      .orderBy("doc_id")
  }

  /** P3: privacy DELETION propagation — screening alone is not enough:
    * documents already published before an entity turned private must
    * be removed from the index, and entities that went public again
    * must be re-extracted (reference: bz_etl.py:179-189 "Ensure the
    * following private bugs are deleted" → delete_record on both
    * output indexes; :192-209 possible_public_bugs → delete + refresh
    * re-ETL list).
    *
    * Mapping: an entity whose LATEST event is 'error' is now private —
    * every version document it ever published (the h12 `_id` space,
    * user_ts) becomes a DELETE action. An entity that had an 'error'
    * event but whose latest state is no longer private went public
    * again — it lands on the REFRESH list for re-extraction. Shape:
    * one row_number window for latest state, a semi join for the
    * delete fan-out, an anti join for the refresh set — all on the
    * entity-id clustering; AQE broadcasts the private set when small.
    * [[graft.sources.EsSink.writeDeletes]] turns the delete rows into
    * bulk wire actions. */
  def p3PrivacyDelete(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_millis(col("ts")).as("ts_ms"), col("event_id"),
      col("event_type"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    val latest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("latest_type"))
    val nowPrivate = latest.filter(col("latest_type") === "error")
      .select("user_id")
    val everPrivate = ev.filter(col("event_type") === "error")
      .select("user_id").distinct()
    val deletes = ev.join(nowPrivate, Seq("user_id"), "left_semi")
      .select(lit("delete").as("kind"),
        concat(col("user_id"), lit("_"), col("ts_ms")).as("id"))
      .distinct()
    val refresh = everPrivate.join(nowPrivate, Seq("user_id"), "left_anti")
      .select(lit("refresh").as("kind"),
        col("user_id").cast("string").as("id"))
    deletes.unionByName(refresh).orderBy("kind", "id")
  }
}
