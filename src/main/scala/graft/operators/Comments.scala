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

  /** The reference's comment extraction replayed on REAL Bugzilla
    * tables (reference: extract_bugzilla.py:744 get_comments) — the
    * operator [[ReferenceParitySpec]] diffs against the reference's
    * own published ES snapshots
    * (tests/resources/reference/public_comments.json /
    * private_comments.json):
    *
    *  - public run (`allowPrivateBugs = false`): comments of the bug
    *    list with `isprivate = 0`, text kept;
    *  - private run (`allowPrivateBugs = true`): ALL comments of the
    *    bug list, text replaced by '[screened]' (the reference screens
    *    every comment body when private bugs may be present);
    *  - `modified_by` = profiles.login_name via `who` (left join —
    *    an unknown author keeps the comment);
    *  - `modified_ts` = UNIX_TIMESTAMP(bug_when)*1000 — epoch millis,
    *    UTC;
    *  - an EMPTY comment body publishes as null: the reference runs
    *    every doc through mo_json.scrub (bz_etl.py:73), which drops
    *    empty strings, and its published snapshots omit the field.
    *
    * Scale: profiles broadcasts (a dimension), longdescs scans once
    * with the bug/privacy filters pushed to the source; one narrow
    * projection — no shuffle at all on the fact side. */
  def bugzillaComments(longdescs: DataFrame, profiles: DataFrame,
      bugList: Seq[Long], allowPrivateBugs: Boolean): DataFrame = {
    val base = longdescs.filter(col("bug_id").isin(bugList: _*))
    val vis = if (allowPrivateBugs) base
      else base.filter(col("isprivate") === 0)
    val body =
      if (allowPrivateBugs) lit("[screened]")
      else when(length(col("thetext")) === 0, lit(null))
        .otherwise(col("thetext"))
    vis.join(
        // bounded build side: profiles is the Bugzilla user dimension
        // table (the reference's profiles dump) — orders of magnitude
        // below the comment fact stream, a classic broadcast dim
        broadcast(profiles.select(col("userid"), col("login_name"))),
        col("who") === col("userid"), "left")
      .select(
        col("comment_id"),
        col("bug_id"),
        col("login_name").as("modified_by"),
        (col("bug_when").cast("long") * 1000L).as("modified_ts"),
        body.as("comment"),
        col("isprivate"))
      .orderBy("comment_id")
  }

  /** Load the comment stream into its own ES bulk index, separate from
    * the bugs index (reference: bz_etl.py:123 two output queues). */
  def writeCommentsIndex(s: SparkSession, d: String, outDir: String): Unit = {
    val docs = c2CommentsStream(s, d)
      .withColumn("_id", col("comment_id").cast("string"))
    graft.sources.EsSink.writeBulk(docs.drop("comment_id"), "comments",
      "_id", outDir)
  }
}
