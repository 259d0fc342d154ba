package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous incremental dedup — [[graft.dedup.Dedup.d9IncrementalDedup]]
  * run as a stream: each arriving micro-batch of documents is sketched,
  * band-joined against the persisted sketch STORE (its matches land in
  * a per-batch output directory), and then appends its own band
  * signatures to the store — so every batch dedups against everything
  * ingested before it without ever re-reading corpus text. This is the
  * ingest-time cadence a 100 TB pipeline actually runs: the store only
  * grows by sketch rows (‰ of text volume), and per-batch cost is
  * O(batch + collisions) regardless of corpus size.
  *
  * Per-batch output directories are keyed by batch id, so a replayed
  * micro-batch overwrites its own matches idempotently (same pattern
  * as [[EventStream.esSinkQuery]]); the store append is the one
  * at-least-once step a replay can duplicate — duplicate sketch rows
  * only repeat candidates, and the match aggregation dedups them, so
  * results stay correct (documented trade-off; exactly-once needs a
  * transactional table format underneath).
  */
object StreamingDedup {

  /** Matches of one batch frame against the store at `storePath`
    * (empty store ⇒ all rows is_dup = false). */
  private[streaming] def matchBatch(batch: DataFrame,
      storePath: String): (DataFrame, DataFrame) = {
    val s = batch.sparkSession
    // bands are used twice (match + append): checkpoint so the sketch
    // computes once per batch
    val bands = Dedup.mhBands(batch).localCheckpoint(true)
    val store =
      if (new java.io.File(storePath).exists) s.read.parquet(storePath)
      else bands.limit(0)
    (Dedup.incrementalMatch(bands, store, batch.select("doc_id")), bands)
  }

  /** Streaming query: `docs` must have (doc_id, text). */
  def run(docs: DataFrame, storePath: String, matchRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val (matches, bands) = matchBatch(batch.toDF(), storePath)
      matches.filter(col("is_dup"))
        .write.mode("overwrite").parquet(s"$matchRoot/batch_$batchId")
      bands.write.mode("append").parquet(storePath)
    }
}
