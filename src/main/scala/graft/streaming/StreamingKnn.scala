package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONTINUOUS k-NN graph maintenance — s14's graph kept current at
  * ingest time: each arriving micro-batch of vectors band-joins the
  * persisted store (StreamingEmbDedup's candidate cadence — cross +
  * intra-batch, exact cosines vs the persisted vector slices), and
  * the resulting edges update ONLY the affected vectors' neighbor
  * lists in a vec-hash-partitioned graph store via dynamic partition
  * overwrite (StreamingClusters' surgical-write rule: reading the
  * graph is one columnar scan, rewriting it wholesale per batch would
  * dwarf the batch).
  *
  * The fold state is LOSSLESS at top-k: a pair's cosine is static,
  * and an edge already outside a vector's current top-k can never
  * re-enter — later edges only push it further down — so keeping only
  * the k best rows per vector loses nothing the final graph needs.
  * Replay safety: candidate probes read only id < N store slices (a
  * replayed batch never joins its first-attempt bands), and the list
  * merge dedups edges by (vec, nbr), so re-applying a batch — even
  * over a partially-written first attempt — converges to the same
  * graph.
  *
  * Spec: 3-wave fold ≡ one-shot s14 on the union; a small batch
  * rewrites few graph partitions (byte-level snapshot); replay
  * idempotent.
  */
object StreamingKnn {

  private def pbOf(c: Column, nb: Int): Column = pmod(xxhash64(c), lit(nb))

  /** One micro-batch: candidates vs the store, then a surgical graph
    * update. `batch` needs (vec_id, label, embedding). */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      storePath: String, graphPath: String, k: Int = 5, nb: Int = 64)
      : Unit = {
    val s = batch.sparkSession
    // r8: the maintained graph uses s14's SELECTIVE banding
    // (Similarity.sparseBands, 12 × 8-bit) — the d5 3-bit refinement
    // bands admit every same-label pair as a candidate (the measured
    // 30× quadratic), which at ingest would make every batch's
    // store join corpus-sized
    val bands = graft.similarity.Similarity.sparseBands(batch)
      .localCheckpoint(true)
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
    val newPairs = Dedup.verifyCosine(cand, allVecs)
    // symmetric edges; exactly these vectors' lists can change
    val newEdges = newPairs
      .select(col("id1").as("vec_id"), col("id2").as("nbr"), col("cos"))
      .union(newPairs
        .select(col("id2").as("vec_id"), col("id1").as("nbr"), col("cos")))
      .localCheckpoint(true) // consumers: touched-pb probe + the merge
    val affected = newEdges.select("vec_id").distinct()
    val touchedPbs = affected.select(pbOf(col("vec_id"), nb).as("pb"))
      .distinct().collect().map(_.getLong(0)).sorted
    if (touchedPbs.nonEmpty) {
      // Prune on the STORED partition column, not a recomputed
      // pbOf(vec_id): filtering on `pb` reaches the parquet source as
      // partition pruning, so the scan (and the checkpoint behind it)
      // touches only the affected directories — a 2-of-64-partition
      // batch reads 2 directories, not the whole graph.
      val inPb = (if (StoreFs.exists(s, graphPath))
        s.read.parquet(graphPath)
          .filter(col("pb").isin(touchedPbs: _*))
          .select("vec_id", "rk", "nbr", "cos").localCheckpoint(true)
      else newEdges.limit(0)
        .select(col("vec_id"), lit(0L).as("rk"), col("nbr"), col("cos")))
      // unchanged vectors in the touched partitions survive verbatim
      val keep = inPb.join(affected, Seq("vec_id"), "left_anti")
      // affected vectors: old list rows ∪ new edges, dedup by
      // neighbor (cosines are static — replayed edges collapse),
      // re-ranked top-k
      val fresh = inPb.join(affected, Seq("vec_id"), "left_semi")
        .select("vec_id", "nbr", "cos")
        .union(newEdges)
        .groupBy("vec_id", "nbr").agg(max("cos").as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("vec_id")
            .orderBy(col("cos").desc, col("nbr").asc)).cast("long"))
        .filter(col("rk") <= k)
        .select("vec_id", "rk", "nbr", "cos")
      keep.union(fresh)
        .withColumn("pb", pbOf(col("vec_id"), nb))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pb").parquet(graphPath)
      // (a vector's list never empties — top-k changes content, the
      // vector stays — so no emptied-partition cleanup is needed)
    }
    bands.write.mode(SaveMode.Overwrite)
      .parquet(s"$storePath/bands/batch_$batchId")
    vecs.write.mode(SaveMode.Overwrite)
      .parquet(s"$storePath/vecs/batch_$batchId")
  }

  /** Streaming query: `embs` must have (vec_id, label, embedding). */
  def run(embs: DataFrame, storePath: String, graphPath: String,
      k: Int = 5, nb: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    embs.writeStream.foreachBatch { (b: Dataset[Row], id: Long) =>
      processBatch(b.toDF(), id, storePath, graphPath, k, nb)
    }
}
