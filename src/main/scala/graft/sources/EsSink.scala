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

  /** Read an ES bulk ndjson directory back into (_index, _id, doc)
    * rows with `doc` parsed against `schema` — the inverse of
    * [[writeBulk]] and the extraction half of [[graft.etl.Replicate]]
    * (the reference's replicate.py reads batches of docs from a
    * source ES cluster; here the "cluster" is the bulk file set).
    * Distributed line parse: action and source lines are
    * distinguished by shape (`{"index":{...}}` prefix), re-paired by
    * the _id the action carries — order within a partition file is
    * producer-defined pairs, but pairing by id keeps the read correct
    * under any file split. */
  def readBulk(spark: org.apache.spark.sql.SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      idField: String): DataFrame = {
    val lines = spark.read.text(dir)
    val actions = lines
      .filter(col("value").startsWith("""{"index":{"""))
      .select(
        get_json_object(col("value"), "$.index._index").as("_index"),
        get_json_object(col("value"), "$.index._id").as("_id"))
    val sources = lines
      .filter(!col("value").startsWith("""{"index":{"""))
      .select(from_json(col("value"), schema).as("doc"))
    // the writer puts the id column inside the source doc too, so the
    // id is recoverable from either line of the pair
    actions.join(sources,
        actions("_id") === sources("doc").getField(idField).cast("string"))
      .select(col("_index"), col("_id"), col("doc"))
  }
}
