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
}
