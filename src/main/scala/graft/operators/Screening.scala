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
}
