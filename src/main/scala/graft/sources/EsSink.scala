package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Elasticsearch bulk-format sink — the reference's Load stage
  * (reference: bugzilla_etl/bz_etl.py:131 setup_es + output queues
  * feeding ES bulk indexing) re-expressed as a distributed file sink.
  *
  * Zero-egress container ⇒ no live cluster; the sink emits the exact
  * newline-delimited bulk wire format (action line + source line) that
  * an `_bulk` endpoint consumes, one file per partition, so loading is
  * `curl --data-binary @part-*.ndjson` or an es-hadoop swap-in. At
  * scale, each executor writes its own bulk file — no driver funnel.
  */
object EsSink {

  /** Write `df` as ES bulk ndjson. `idCol` must be a unique document
    * id (the reference uses `bug_id + "_" + modified_ts`). */
  def writeBulk(df: DataFrame, index: String, idCol: String,
      outDir: String): Unit = {
    val action = concat(
      lit(s"""{"index":{"_index":"$index","_id":""""),
      col(idCol).cast("string"), lit("\"}}"))
    val source = to_json(struct(df.columns.map(col): _*))
    df.select(concat(action, lit("\n"), source).as("value"))
      .write.mode(SaveMode.Overwrite).text(outDir)
  }
}
