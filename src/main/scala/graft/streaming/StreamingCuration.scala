package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CONTINUOUS form of [[graft.operators.CurationPipeline]] (x1):
  * quality gate → exact dedup → near-dup dedup → split, folded over
  * arriving micro-batches instead of a one-shot corpus pass. Each
  * batch consults two persisted stores — the content-HASH store
  * (exact dedup: md5 of every quality-passing doc seen so far) and
  * the minhash BAND store (near-dup: sketches of every exact survivor
  * so far) — then appends its own slice to each. Per-batch cost is
  * O(batch + collisions), independent of corpus size: the d9 cadence
  * applied to the whole curation chain.
  *
  * Contract (differs from one-shot x1 exactly where ANY online dedup
  * must): the kept representative of a duplicate group is the
  * FIRST-ARRIVED canonical, not the global minimum id, and a chain
  * whose links arrive after its endpoints can keep both endpoints
  * (the late middle doc matches both and drops, but the endpoints
  * never see each other). The spec pins the fold contract wave by
  * wave against an independent driver implementation.
  *
  * Every write is overwrite-idempotent per batch id (curated rows,
  * report rows, and both store slices land in batch_N subdirectories;
  * a replayed batch reads only slices with id < N) — the same
  * at-least-once replay discipline as [[StreamingDedup]].
  */
object StreamingCuration {

  /** x1's quality gate: eval holdout excluded, non-null text, minimum
    * length. */
  private def quality(batch: DataFrame): DataFrame =
    batch.filter(col("doc_id") % 97 =!= 0 && col("text").isNotNull &&
      col("n_chars") >= 100)

  /** One micro-batch through the full chain. `batch` needs
    * (doc_id, source, text, n_chars). */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      root: String): Unit = {
    val s = batch.sparkSession
    // ---- quality ----
    val q = quality(batch).localCheckpoint(true)
    // ---- exact dedup: intra-batch min per content hash, then the
    // hash store (all quality docs ever seen) ----
    val hashed = q.withColumn("h", md5(col("text")))
    val intra = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
    val hdirs = StoreFs.priorBatchDirs(s, s"$root/hashes", batchId)
    val exact = (if (hdirs.isEmpty) intra
      else intra.join(s.read.parquet(hdirs: _*).select("h").distinct(),
        Seq("h"), "left_anti"))
      .localCheckpoint(true)
    // ---- near-dup: band-store matches drop; intra-batch components
    // keep their (first-arrival) canonical ----
    val bands = Dedup.mhBands(exact).localCheckpoint(true)
    val bdirs = StoreFs.priorBatchDirs(s, s"$root/bands", batchId)
    val storeMatched =
      if (bdirs.isEmpty) exact.limit(0).select("doc_id")
      else Dedup.incrementalEdges(bands, s.read.parquet(bdirs: _*))
        .select(col("src").as("doc_id")).distinct()
    val labels = Dedup.connectedComponentsAdaptive(
      Dedup.pairsFromBands(bands)
        .select(col("id1").as("src"), col("id2").as("dst")))
    val kept = exact
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
      .join(storeMatched.withColumn("m", lit(true)), Seq("doc_id"), "left")
      .filter(col("m").isNull).drop("m")
      .localCheckpoint(true)
    // ---- split + outputs ----
    val bucket = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) % 100
    val curated = kept.select(col("doc_id"), col("source"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
    curated.write.mode("overwrite").parquet(s"$root/curated/batch_$batchId")
    // per-batch accounting, x1-style single pass over survival flags
    val flags = batch.select(col("doc_id"))
      .join(q.select(col("doc_id"), lit(1).as("fq")), Seq("doc_id"), "left")
      .join(exact.select(col("doc_id"), lit(1).as("fe")), Seq("doc_id"), "left")
      .join(kept.select(col("doc_id"), lit(1).as("fk")), Seq("doc_id"), "left")
      .withColumn("b", bucket)
    flags.agg(
        count(lit(1)).as("c_raw"), count(col("fq")).as("c_quality"),
        count(col("fe")).as("c_exact"), count(col("fk")).as("c_kept"),
        count(when(col("fk") === 1 && col("b") < 80, 1)).as("c_train"),
        count(when(col("fk") === 1 && col("b") >= 80 && col("b") < 90, 1))
          .as("c_val"),
        count(when(col("fk") === 1 && col("b") >= 90, 1)).as("c_test"))
      .select(explode(array(
        struct(lit("raw").as("stage"), col("c_raw").as("rows")),
        struct(lit("quality").as("stage"), col("c_quality").as("rows")),
        struct(lit("exact_dedup").as("stage"), col("c_exact").as("rows")),
        struct(lit("near_dup").as("stage"), col("c_kept").as("rows")),
        struct(lit("split_train").as("stage"), col("c_train").as("rows")),
        struct(lit("split_val").as("stage"), col("c_val").as("rows")),
        struct(lit("split_test").as("stage"), col("c_test").as("rows"))))
        .as("r"))
      .select(lit(batchId).as("batch"), col("r.stage").as("stage"),
        col("r.rows").as("rows"))
      .write.mode("overwrite").parquet(s"$root/report/batch_$batchId")
    // ---- store appends (idempotent slices) ----
    hashed.select("h").distinct()
      .write.mode("overwrite").parquet(s"$root/hashes/batch_$batchId")
    bands.write.mode("overwrite").parquet(s"$root/bands/batch_$batchId")
  }

  /** Streaming query over (doc_id, source, text, n_chars). */
  def run(docs: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      processBatch(batch.toDF(), batchId, root)
    }
}
