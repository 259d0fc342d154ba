package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous DSIR importance weighting —
  * [[graft.operators.Curation.c8Dsir]] run at ingest cadence: each
  * arriving micro-batch of documents updates the persisted BUCKET
  * DISTRIBUTION store (per-batch delta slices of (b, ct, cr)) and is
  * weighted against the distributions accumulated SO FAR, its own
  * counts included. The contract that makes this auditable: batch N's
  * weights equal the batch c8 run over the UNION of batches 0..N,
  * restricted to batch N's raw docs (spec-proven) — i.e. the stream
  * computes exactly the prefix-corpus answer at every step, and the
  * weights drift toward the full-corpus c8 as the distributions
  * converge, which is the production behavior of ingest-time
  * importance weighting.
  *
  * Replay safety mirrors [[StreamingDedup]]: the delta slice and the
  * weights land in `batch_N` directories written with overwrite, and
  * the distributions-so-far read only slices with id < N plus the
  * batch's own recomputed delta — a replayed batch rewrites itself
  * instead of double-counting.
  *
  * 100 TB shape: the store grows by ≤ `buckets` rows per batch
  * (B=1024 — kilobytes), per-batch cost is one batch-sized feature
  * aggregate + a broadcast of the B-row λ table; nothing rereads
  * corpus text.
  */
object StreamingDsir {

  /** One micro-batch: write this batch's (b, ct, cr) delta slice,
    * weigh the batch against prior slices + its own delta. Exposed
    * for the prefix-equivalence and replay specs. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, weightsRoot: String,
      buckets: Int = 1024): Unit = {
    val s = batch.sparkSession
    val bf = Curation.dsirBf(batch, buckets).localCheckpoint(true)
    val delta = bf.groupBy("b").agg(
      sum(when(col("is_t"), col("tf")).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), col("tf")).otherwise(0L)).as("cr"))
    delta.write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
    val dirs = StoreFs.priorBatchDirs(s, storePath, batchId)
    val slices =
      if (dirs.isEmpty) delta
      else s.read.parquet(dirs: _*).union(delta)
    val cnt = slices.groupBy("b")
      .agg(sum("ct").as("ct"), sum("cr").as("cr"))
    Curation.dsirWeights(bf, cnt, buckets)
      .write.mode("overwrite").parquet(s"$weightsRoot/batch_$batchId")
  }

  /** Streaming query: `docs` must have (doc_id, text). */
  def run(docs: DataFrame, storePath: String, weightsRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      processBatch(batch.toDF(), batchId, storePath, weightsRoot)
    }
}
