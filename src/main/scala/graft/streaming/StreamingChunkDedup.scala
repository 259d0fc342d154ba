package graft.streaming

import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous CHUNK-level near-dup — d17 at ingest time: each arriving
  * micro-batch of documents explodes into t15's sliding windows, the
  * chunk sketches band-join the persisted chunk-sketch store (cross)
  * and themselves (intra), and every verified cross-document pair
  * lands in the batch's match directory while the batch appends its
  * own sketch slice. Passage reuse is thereby caught when the SECOND
  * document arrives — the quoted-article case at the moment of
  * ingestion, not in a periodic corpus sweep. Chunk sketches are
  * per-document and corpus-independent, so accumulated pairs ≡ the
  * one-shot d17 pair set on everything ingested (spec).
  *
  * StreamingDedup's idempotence layout: matches in
  * `matchRoot/batch_N` (overwrite), store slices in
  * `storePath/batch_N` (overwrite), probes read ONLY id < N slices —
  * a replayed batch never joins its first-attempt sketches. */
object StreamingChunkDedup {

  /** One micro-batch, end to end. `batch` needs (doc_id, text).
    * Exposed for the fold/replay spec. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, matchRoot: String,
      chunk: Int = 64, stride: Int = 48): Unit = {
    val s = batch.sparkSession
    val K = Dedup.ChunkK
    // bands feed three consumers (cross join, intra join, slice
    // write): checkpoint so the chunk sketch computes once per batch
    val bands = Dedup.mhBands(Dedup.chunkFrame(batch, chunk, stride))
      .localCheckpoint(true)
    val dirs = StoreFs.priorBatchDirs(s, storePath, batchId)
    val store = if (dirs.isEmpty) bands.limit(0)
      else s.read.parquet(dirs: _*)
    val cross = bands.as("a").join(store.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id2"),
        T.minhashJaccardEst(col("a.sig"), col("b.sig"), 32).as("jac"))
      .filter(col("id1") =!= col("id2") && col("jac") >= 0.5)
    val intra = Dedup.pairsFromBands(bands)
      .select(col("id1"), col("id2"), col("jaccard_est").as("jac"))
    cross.union(intra)
      .groupBy("id1", "id2").agg(max("jac").as("jaccard_est"))
      // same-document chunk pairs carry no dedup signal (d17's rule)
      .filter(expr(s"id1 div $K <> id2 div $K"))
      .select(expr(s"id1 div $K").as("doc1"),
        (col("id1") % K).as("chunk1"),
        expr(s"id2 div $K").as("doc2"),
        (col("id2") % K).as("chunk2"), col("jaccard_est"))
      .write.mode("overwrite").parquet(s"$matchRoot/batch_$batchId")
    bands.write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
  }

  /** Streaming query: `docs` must have (doc_id, text). */
  def run(docs: DataFrame, storePath: String, matchRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      processBatch(b.toDF(), id, storePath, matchRoot)
    }
}
