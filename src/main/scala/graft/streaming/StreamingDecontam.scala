package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Ingest-time eval decontamination — d14
  * ([[graft.dedup.Dedup.evalContainment]]) as a continuous ADMISSION
  * gate: a 100 TB pipeline should catch a training document that
  * covers an eval example when the document ARRIVES, not in a
  * periodic corpus-wide sweep. The eval suite is static, so unlike
  * StreamingDedup/StreamingContainment there is NO growing store:
  * [[buildIndex]] runs once (eval gram arrays + prefix keys under a
  * seed corpus's frozen df dictionary — index size is bounded by the
  * eval suite, not the corpus), and every micro-batch probes the
  * broadcast index and emits its verified (eval_id, train_id,
  * containment) pairs. Candidate exactness is dictionary-order-
  * independent and verification depends only on the gram sets, so
  * accumulated batch pairs ≡ the one-shot d14 pair set on everything
  * ingested (spec) even though the seed df drifts from the true df.
  *
  * Replay idempotence is trivial: the index is read-only, each
  * batch's pairs land in `pairRoot/batch_N` with overwrite, and no
  * batch writes state any other batch reads. */
object StreamingDecontam {

  /** One-time index build: seed-corpus df dictionary + eval gram
    * arrays + eval prefix keys, persisted under `indexPath`. */
  def buildIndex(seedTrain: DataFrame, evalDocs: DataFrame,
      indexPath: String, t: Double = 0.8): Unit = {
    val (dict, evalSorted, prefix) =
      Dedup.evalGramIndex(seedTrain, evalDocs, t)
    dict.write.mode("overwrite").parquet(s"$indexPath/dict")
    evalSorted.write.mode("overwrite").parquet(s"$indexPath/eval_sets")
    prefix.write.mode("overwrite").parquet(s"$indexPath/eval_prefix")
  }

  /** One micro-batch: probe the frozen index, emit verified pairs.
    * Exposed for the replay spec. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      indexPath: String, pairRoot: String, t: Double): Unit = {
    val s = batch.sparkSession
    Dedup.evalContainmentBatch(
        s.read.parquet(s"$indexPath/dict"),
        s.read.parquet(s"$indexPath/eval_sets"),
        s.read.parquet(s"$indexPath/eval_prefix"),
        batch, t)
      .write.mode("overwrite").parquet(s"$pairRoot/batch_$batchId")
  }

  /** Streaming query: `docs` must have (doc_id, text); the index at
    * `indexPath` must exist ([[buildIndex]]). */
  def run(docs: DataFrame, indexPath: String, pairRoot: String,
      t: Double = 0.8)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      processBatch(b.toDF(), id, indexPath, pairRoot, t)
    }
}
