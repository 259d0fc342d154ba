package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous incremental EMBEDDING dedup — the d5/d12 candidate
  * theory at ingest time, completing the set: every candidate
  * generator now has a streaming cadence (minhash = StreamingDedup,
  * containment = StreamingContainment, sign-band embedding = here).
  * Each arriving micro-batch of vectors is sign-banded, its bands
  * join the persisted band store AND themselves (cross + intra-batch
  * candidates), exact cosines verify against the persisted vector
  * slices, and the batch appends its own (bands, vecs) slices.
  * Banding is per-vector and corpus-independent, so accumulated
  * batch pairs ≡ the one-shot d5 pair set on everything ingested
  * (spec) — there is no dictionary/df drift in this family at all.
  *
  * StreamingDedup's idempotence layout: matches in
  * `matchRoot/batch_N` (overwrite), store slices in
  * `storePath/{bands,vecs}/batch_N` (overwrite), probes read ONLY
  * id < N slices — a replayed batch never joins its first-attempt
  * bands (which would self-match every vector at cos 1.0). */
object StreamingEmbDedup {

  /** One micro-batch, end to end. Exposed for the replay spec. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, matchRoot: String): Unit = {
    val s = batch.sparkSession
    // bands and vecs each feed two consumers (candidate join + slice
    // write; verification + slice write): checkpoint so the 96-plane
    // signature map runs once per batch
    val bands = Dedup.embBands(batch).localCheckpoint(true)
    val vecs = Dedup.embVecs(batch).localCheckpoint(true)
    val bandDirs = StoreFs.priorBatchDirs(s, s"$storePath/bands", batchId)
    val storeBands = if (bandDirs.isEmpty) bands.limit(0)
      else s.read.parquet(bandDirs: _*)
    val cross = bands.as("a").join(storeBands.as("b"),
        col("a.label") === col("b.label") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("id1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("id2"))
    val intra = bands.as("a").join(bands.as("b"),
        col("a.label") === col("b.label") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    val cand = cross.union(intra).distinct()
    val vecDirs = StoreFs.priorBatchDirs(s, s"$storePath/vecs", batchId)
    val allVecs = if (vecDirs.isEmpty) vecs
      else vecs.unionByName(s.read.parquet(vecDirs: _*))
    Dedup.verifyCosine(cand, allVecs)
      .write.mode("overwrite").parquet(s"$matchRoot/batch_$batchId")
    bands.write.mode("overwrite")
      .parquet(s"$storePath/bands/batch_$batchId")
    vecs.write.mode("overwrite")
      .parquet(s"$storePath/vecs/batch_$batchId")
  }

  /** Streaming query: `embs` must have (vec_id, label, embedding). */
  def run(embs: DataFrame, storePath: String, matchRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    embs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      processBatch(b.toDF(), id, storePath, matchRoot)
    }
}
