package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous incremental CONTAINMENT — the d13 ingest cadence
  * ([[graft.dedup.Dedup.containmentIncrement]]) run as a stream, the
  * last member of the incremental family to get a continuous form
  * (minhash dedup = StreamingDedup, cluster maintenance =
  * StreamingClusters). The FIRST micro-batch seeds the store: its
  * token df dictionary is written once and thereafter FROZEN — the
  * published incremental-PPJoin compromise, recall-safe because the
  * prefix bound holds under ANY fixed key order and verification is
  * df-independent (a stale dictionary costs candidate efficiency
  * only; a periodic rebuild is a re-seed, the compactDays pattern).
  * Every later batch keys under that dictionary, forms ALL its new
  * verified pairs — batch prefixes probe the accumulated store
  * postings, store prefixes probe the broadcast batch postings (the
  * two directions cover whichever side of a pair is smaller), plus
  * intra-batch pairs — and appends its own (sets, postings) slice.
  * Accumulated pair outputs across batches ≡ the one-shot d13 pair
  * set on everything ingested (spec).
  *
  * EVERY per-batch write is idempotent under at-least-once replay
  * (the StreamingDedup layout): pairs land in `pairRoot/batch_N`
  * (overwrite), store slices in `storePath/{sets,post}/batch_N`
  * (overwrite), and the probe joins read ONLY slices with id < N via
  * [[StoreFs.priorBatchDirs]] — a replayed batch rewrites its own
  * slices and never probes its first-attempt postings (which would
  * self-pair every replayed doc at containment 1.0). */
object StreamingContainment {

  /** One micro-batch, end to end. Exposed for the replay spec. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, pairRoot: String, t: Double,
      gramN: Int = 0): Unit = {
    val s = batch.sparkSession
    val setsDirs = StoreFs.priorBatchDirs(s, s"$storePath/sets", batchId)
    val pairs =
      if (setsDirs.isEmpty) {
        // seed: this batch's corpus defines the frozen dictionary;
        // its pairs are the plain intra-batch d13 on its own sets
        // (checkpointed once — dict write, prefix, postings and
        // verification all read them)
        val (dfDict, _, sets0) = Dedup.containmentStore(batch, gramN)
        val sets = sets0.localCheckpoint(true)
        val post = Dedup.containmentPostings(sets)
        dfDict.write.mode("overwrite").parquet(s"$storePath/dict")
        writeSlice(sets, post, storePath, batchId)
        Dedup.verifyContainment(
          Dedup.candidatePairs(Dedup.containmentPrefix(sets, t), post, t)
            .distinct(),
          sets.select(col("doc_id"), col("ks")), t)
      } else {
        val dict = s.read.parquet(s"$storePath/dict")
        val postDirs = StoreFs.priorBatchDirs(s, s"$storePath/post", batchId)
        val (p, bsets) = Dedup.containmentIncrementParts(
          s.read.parquet(setsDirs: _*), s.read.parquet(postDirs: _*),
          dict, batch, t, gramN)
        writeSlice(bsets, Dedup.containmentPostings(bsets),
          storePath, batchId)
        p
      }
    pairs.write.mode("overwrite").parquet(s"$pairRoot/batch_$batchId")
  }

  private def writeSlice(sets: DataFrame, post: DataFrame,
      storePath: String, batchId: Long): Unit = {
    sets.write.mode("overwrite").parquet(s"$storePath/sets/batch_$batchId")
    post.write.mode("overwrite").parquet(s"$storePath/post/batch_$batchId")
  }

  /** Streaming query: `docs` must have (doc_id, source, text). */
  def run(docs: DataFrame, storePath: String, pairRoot: String,
      t: Double = 0.9, gramN: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      processBatch(b.toDF(), id, storePath, pairRoot, t, gramN)
    }
}
