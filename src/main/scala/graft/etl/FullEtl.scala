package graft.etl

import graft.operators.{Comments, HistoryDriver}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B5: the reference's END-TO-END program as ONE registered query
  * (reference: bugzilla_etl/bz_etl.py:123 run_both_etl — extract →
  * parse → normalize → load, with bugs and comments as two parallel
  * output streams into separate ES indexes).
  *
  * The flow this composes, stage for stage:
  *  - Extract: the events/documents tables (the driver's stand-ins
  *    for the 14-table MySQL pull — sources.MySqlDump replays the
  *    real dump format under ReferenceParitySpec);
  *  - Parse: [[HistoryDriver.b2NestedHistory]] — the b1 backward-
  *    anchored version reconstruct (parse_bug_history.py:99) PLUS the
  *    attachment sub-entity nest (b2), segment-fold gated;
  *  - Normalize: b2 already int-coerces the nested attachment flags
  *    and carries mimetype through (transform_bugzilla.py:62-70);
  *  - Load: each snapshot version and each screened comment
  *    ([[Comments.c2CommentsStream]], bz_etl.py's second queue)
  *    rendered as its EXACT ES bulk wire payload — the
  *    `{"index":{...}}` action line + source line that
  *    [[graft.sources.EsSink.writeBulk]] writes, one row per doc.
  *
  * Output: (_id, line) — line is the two-line bulk payload. The JSON
  * is built by explicit concatenation (not to_json) so the DuckDB
  * oracle can compose the identical bytes through the same field
  * order, null renderings, and escape ladder.
  *
  * Scale shape: adds two narrow map stages (string rendering) and one
  * union on top of b2 + c2 — no new shuffle, no new scan; the
  * composition inherits b2's fold-gated whale safety and c2's pure
  * scan shape. The production Load would feed these lines straight to
  * `_bulk` (file-per-partition, no driver funnel). */
object FullEtl {

  /** JSON string rendering shared by both streams: null → the JSON
    * null literal, else quoted with the minimal escape ladder
    * (backslash, quote, newline — in that order). */
  private def jstr(c: Column): Column =
    when(c.isNull, lit("null")).otherwise(concat(lit("\""),
      replace(replace(replace(c, lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")), lit("\n"), lit("\\n")),
      lit("\"")))

  def b5FullEtl(s: SparkSession, d: String): DataFrame = {
    val bugs = HistoryDriver.b2NestedHistory(s, d)
    val bugLines = bugs.select(
      concat(col("id"), lit("_"), col("valid_from")).as("_id"),
      concat(
        lit("{\"index\":{\"_index\":\"snapshots\",\"_id\":\""),
        col("id"), lit("_"), col("valid_from"), lit("\"}}\n"),
        lit("{\"id\":"), col("id"),
        lit(",\"version\":"), col("version"),
        lit(",\"valid_from\":"), col("valid_from"),
        lit(",\"expires_on\":"), col("expires_on"),
        lit(",\"status\":"), jstr(col("status")),
        lit(",\"n_atts\":"), col("n_atts"),
        lit(",\"n_patch\":"), col("n_patch"),
        lit(",\"mime_min\":"), jstr(col("mime_min")),
        lit("}")).as("line"))
    val comments = Comments.c2CommentsStream(s, d)
    val commentLines = comments.select(
      concat(lit("c"), col("comment_id")).as("_id"),
      concat(
        lit("{\"index\":{\"_index\":\"comments\",\"_id\":\"c"),
        col("comment_id"), lit("\"}}\n"),
        lit("{\"comment_id\":"), col("comment_id"),
        lit(",\"bug_id\":"), col("bug_id"),
        lit(",\"modified_by\":"), jstr(col("modified_by")),
        lit(",\"modified_ts\":"), col("modified_ts"),
        lit(",\"comment\":"), jstr(col("comment")),
        lit("}")).as("line"))
    // the privacy-deletion half (bz_etl.py:179-209 runs it BEFORE the
    // re-ETL): one DELETE action line per published doc of each
    // now-private entity — EsSink.writeDeletes' wire format (action
    // line only, no source). The refresh worklist is not wire output;
    // it drives re-extraction and stays p3's own registered surface.
    val deleteLines = graft.operators.Screening.p3PrivacyDelete(s, d)
      .filter(col("kind") === "delete")
      .select(concat(lit("d"), col("id")).as("_id"),
        concat(lit("{\"delete\":{\"_index\":\"snapshots\",\"_id\":\""),
          col("id"), lit("\"}}")).as("line"))
    bugLines.unionByName(commentLines).unionByName(deleteLines)
      .orderBy("_id")
  }
}
