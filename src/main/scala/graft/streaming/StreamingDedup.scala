package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Continuous incremental dedup — [[graft.dedup.Dedup.d9IncrementalDedup]]
  * run as a stream: each arriving micro-batch of documents is sketched,
  * band-joined against the persisted sketch STORE (its matches land in
  * a per-batch output directory), and then writes its own band
  * signatures into the store — so every batch dedups against everything
  * ingested before it without ever re-reading corpus text. This is the
  * ingest-time cadence a 100 TB pipeline actually runs: the store only
  * grows by sketch rows (‰ of text volume), and per-batch cost is
  * O(batch + collisions) regardless of corpus size.
  *
  * EVERY per-batch write is idempotent under at-least-once replay:
  * matches land in `matchRoot/batch_N` (overwrite), and the store is
  * laid out as `storePath/batch_N` subdirectories written with
  * overwrite — a replayed batch rewrites its own store slice instead
  * of appending a duplicate, and the match join reads ONLY store
  * slices with id < N, so a replay never band-joins against its own
  * first-attempt sketches (which would self-match every replayed doc
  * at jac = 1.0). [[Dedup.incrementalMatch]] additionally filters
  * doc_id = match_id pairs as belt and braces.
  */
object StreamingDedup {

  /** Matches of one batch frame against the pre-`batchId` store slices
    * (empty store ⇒ all rows is_dup = false). */
  private[graft] def matchBatch(batch: DataFrame, storePath: String,
      batchId: Long): (DataFrame, DataFrame) = {
    val s = batch.sparkSession
    // bands are used twice (match + store write): checkpoint so the
    // sketch computes once per batch
    val bands = Dedup.mhBands(batch).localCheckpoint(true)
    val dirs = StoreFs.priorBatchDirs(s, storePath, batchId)
    val store = if (dirs.isEmpty) bands.limit(0)
      else s.read.parquet(dirs: _*)
    // width from the ACCUMULATED corpus (store + batch) so batches
    // after a width-threshold crossing match d9's registered form at
    // the same corpus size (ADVICE r12 #4; matches already folded at
    // the pre-crossing width persist — see Dedup.accExtraRows scope)
    val x = Dedup.accExtraRows(s, dirs, bands)
    (Dedup.incrementalMatch(bands, store, batch.select("doc_id"), x),
      bands)
  }

  /** One micro-batch, end to end: match against prior slices, write
    * this batch's matches and store slice (both overwrite-idempotent).
    * Exposed for the replay spec. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, matchRoot: String): Unit = {
    val (matches, bands) = matchBatch(batch, storePath, batchId)
    matches.filter(col("is_dup"))
      .write.mode("overwrite").parquet(s"$matchRoot/batch_$batchId")
    bands.write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
  }

  /** Streaming query: `docs` must have (doc_id, text). */
  def run(docs: DataFrame, storePath: String, matchRoot: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      processBatch(batch.toDF(), batchId, storePath, matchRoot)
    }

  /** Maintenance cadence (r14 verdict #4): fold the accumulated band
    * slices — minus the newest, which a restarted stream may replay —
    * into one sized dir. Row-identical for every subsequent match
    * join (the store read is a slice union either way); call on the
    * deployment's compaction schedule, never per batch. */
  def compactStore(s: org.apache.spark.sql.SparkSession,
      storePath: String): Int = StoreFs.compactSlices(s, storePath)
}
