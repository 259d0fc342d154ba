package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** LEXICAL-STORE ingest cadence (r13 verdict #5) — the r1 BM25 weight
  * store was build-if-absent but not ingest-maintained: the one
  * maintained store family without a StreamingKnn-style cadence.
  *
  * Design — per-batch TF slices under a FROZEN df dictionary:
  *  - a document's (term, tf) profile and its length dl are
  *    batch-local EXACT facts, so each micro-batch appends one
  *    `tf/batch_N` slice and never revisits it;
  *  - the corpus-level terms of the BM25 weight — df per term, doc
  *    count n, average length avgdl — are FROZEN at (re)compaction
  *    time into `dict/` (the t12/d13 dictionary-staleness trade,
  *    SemDeDup's periodic-retrain design: [[freezeLexDictionary]]
  *    runs per compaction cadence, not per batch);
  *  - the maintained weight view [[storedWeights]] joins the
  *    accumulated tf slices with the frozen dictionary through the
  *    EXACT per-row arithmetic of TextAnalysis.bm25Weights, so when
  *    the freeze saw everything ingested the view is row- and
  *    bit-identical to the one-shot ensure-built store (spec).
  *
  * STALENESS CONTRACT (stated, the accExtraRows precedent): between
  * compactions, new terms score with the df the dictionary had at the
  * freeze — a term unseen at freeze time has no dictionary row and
  * contributes NO weight until the next [[refreshDictionary]], and
  * df/n/avgdl drift by whatever arrived since. Exact equality with
  * the batch build holds at every compaction point; in between, the
  * slices are exact and only the corpus statistics are stale. A
  * doc_id ingested in MORE than one batch (update / out-of-band
  * re-ingest) counts ONCE: slices carry their batch id and every
  * read dedupes latest-batch-wins, so df/n/avgdl and the weight
  * view see each doc's newest profile only.
  *
  * Layout under `root`: `tf/batch_N` slices (overwrite per batch —
  * StreamingDedup's replay idempotence), `dict/df` + `dict/stats`.
  * Scale: a batch writes its own tokens only; the dictionary refresh
  * is one aggregation over the accumulated NARROW (doc, term, tf)
  * slices — no re-tokenization, the text is never stored. */
object StreamingLex {

  private val K1 = 1.2
  private val B = 0.75

  /** One micro-batch: tokenize, write the exact (doc_id, term, tf,
    * dl) slice plus a (doc_id, dl) DOC slice for every batch doc —
    * the corpus statistics count null-text and token-less docs in n
    * exactly as the one-shot build does (sum skips their null dl).
    * `batch` needs (doc_id, text). */
  private[graft] def lexBatch(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    val b = batch.localCheckpoint(true) // tf slice + doc slice
    val tf = b
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum("tf").over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")))
      .withColumn("batch", lit(batchId))
    tf.write.mode("overwrite").parquet(s"$root/tf/batch_$batchId")
    b.select(col("doc_id"),
        when(col("text").isNotNull,
          size(filter(T.tokens(col("text")), t => t =!= ""))).as("dl"),
        lit(batchId).as("batch"))
      .write.mode("overwrite").parquet(s"$root/docs/batch_$batchId")
  }

  /** Latest-batch-wins dedupe over accumulated slices: a doc_id
    * re-ingested (update / replay out of band) in a LATER batch
    * supersedes every earlier slice row it had, so the corpus
    * statistics and the weight view count each doc exactly once —
    * the one-shot build's view of the final corpus. */
  private def latestWins(slices: DataFrame): DataFrame = {
    // a store written before the batch column existed (upgrade path)
    // reads as one generation — batch 0 for every row
    val tagged = if (slices.columns.contains("batch")) slices
      else slices.withColumn("batch", lit(0L))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    tagged.withColumn("_mb", max("batch").over(w))
      .filter(col("batch") === col("_mb"))
      .drop("_mb", "batch")
  }

  /** Accumulated tf slices (all batches). */
  private[graft] def tfSlices(s: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    val dirs = StoreFs.priorBatchDirs(s, s"$root/tf", Long.MaxValue)
    if (dirs.isEmpty)
      s.range(0).select(col("id").as("doc_id"),
        lit("").as("term"), col("id").as("tf"), col("id").as("dl"))
    else latestWins(s.read.parquet(dirs: _*))
  }

  /** (Re)freeze the dictionary — df per term + the 1-row (n, avgdl) —
    * from the accumulated tf slices. The compaction step: run per
    * refresh cadence, never per batch. No re-tokenization — the
    * narrow slices carry everything the corpus statistics need. */
  def refreshDictionary(s: org.apache.spark.sql.SparkSession,
      root: String): Unit = {
    tfSlices(s, root)
      .groupBy("term").agg(count(when(col("tf") >= 1, 1)).as("df"))
      .write.mode("overwrite").parquet(s"$root/dict/df")
    val docDirs = StoreFs.priorBatchDirs(s, s"$root/docs", Long.MaxValue)
    val docs = if (docDirs.isEmpty)
      s.range(0).select(col("id").as("doc_id"),
        col("id").cast("int").as("dl"))
      else latestWins(s.read.parquet(docDirs: _*))
    // n counts EVERY ingested doc (null-text ones ride a null dl the
    // sum skips) — the one-shot build's count(1)/sum(size(tokens))
    // statistics, verbatim
    docs.agg(count(lit(1)).as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      .write.mode("overwrite").parquet(s"$root/dict/stats")
    // slice compaction rides the same cadence (r14 verdict #4): fold
    // the accumulated tf/doc slices — minus the newest, which a
    // restarted stream may replay — into one sized dir
    StoreFs.compactSlices(s, s"$root/tf")
    StoreFs.compactSlices(s, s"$root/docs")
    ()
  }

  /** The maintained BM25 weight view: accumulated exact tf slices ⋈
    * the frozen dictionary, through the same per-row arithmetic as
    * the one-shot TextAnalysis.bm25Weights — bit-identical to it
    * whenever the dictionary freeze saw everything ingested (spec).
    * Terms absent from the frozen dictionary drop (inner join): the
    * stated staleness, they gain weights at the next refresh. */
  def storedWeights(s: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    val tf = tfSlices(s, root)
    val df = s.read.parquet(s"$root/dict/df")
    val stats = s.read.parquet(s"$root/dict/stats")
    tf.join(df, "term").crossJoin(broadcast(stats)) // 1-row stats cross
      .select(col("doc_id"), col("term"),
        (log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) *
          (col("tf").cast("double") * lit(K1 + 1.0)) /
          (col("tf").cast("double") +
            lit(K1) * (lit(1.0 - B) +
              lit(B) * col("dl").cast("double") / col("avgdl"))))
          .as("w"))
  }

  /** Streaming query: `docs` needs (doc_id, text). Freeze/refresh the
    * dictionary separately on the compaction cadence. */
  def run(docs: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      lexBatch(b.toDF(), id, root)
    }
}
