package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference runs TWO parallel ETL output streams — bugs and
  * comments — into separate ES indexes (reference:
  * bugzilla_etl/bz_etl.py:123 run_both_etl; extract_bugzilla.py:744
  * get_comments). Comments get their own extraction, privacy
  * screening, and load: private comments are dropped outright
  * (`isprivate = 0` filter) and comments on screened bugs are kept
  * with their text replaced by '[screened]' (get_comments'
  * allow_private_bugs branch).
  *
  * Mapping onto the documents table: `source = 'src0'` plays the
  * private-comment flag (dropped), the `n_chars < 150` tier plays the
  * screened-bug set (text redacted), and a deterministic synthetic
  * clock stands in for bug_when. One narrow map stage — scales as a
  * pure scan.
  */
object Comments {

  val Epoch: Long = 1704067200000L // 2024-01-01T00:00:00Z

  /** The comment stream as a DataFrame (the Extract + Transform
    * stages); [[writeCommentsIndex]] is the Load stage. */
  def c2CommentsStream(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("source") =!= "src0")
      .select(
        col("doc_id").as("comment_id"),
        (col("doc_id") % 100).as("bug_id"),
        concat(lit("u"), col("doc_id") % 50, lit("@example.com"))
          .as("modified_by"),
        (lit(Epoch) + col("doc_id") * 3600000L).as("modified_ts"),
        when(col("n_chars") < 150, lit("[screened]")).otherwise(col("text"))
          .as("comment"))
      .orderBy("comment_id")

  /** Load the comment stream into its own ES bulk index, separate from
    * the bugs index (reference: bz_etl.py:123 two output queues). */
  def writeCommentsIndex(s: SparkSession, d: String, outDir: String): Unit = {
    val docs = c2CommentsStream(s, d)
      .withColumn("_id", col("comment_id").cast("string"))
    graft.sources.EsSink.writeBulk(docs.drop("comment_id"), "comments",
      "_id", outDir)
  }
}
