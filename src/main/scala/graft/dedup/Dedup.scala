package graft.dedup

import graft.Tables
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale training-data pipelines.
  *
  * Scale design: every near-dup variant is candidate-generation via a
  * bucket key (LSH band, simhash prefix, (source, size-bucket)) followed
  * by verification *within* buckets only — the join key is always
  * high-cardinality and uniform, so there is no cross product and the
  * shuffle partitions stay balanced at 100 TB. Exact dedup is a single
  * hash aggregation with map-side combine.
  */
object Dedup {

  /** D1: exact dedup — content-hash groupBy, keep the minimum id as the
    * canonical representative. */
  def d1ExactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("rep_id"), count(lit(1)).as("n"))
      .select("rep_id", "n")
      .orderBy("rep_id")

  /** D2: MinHash + LSH — 5-char shingles → 32-wide minhash signature →
    * 8 bands of 4 → bucket-join candidates → MinHash-estimated Jaccard
    * ≥ 0.5. Only (band, hash, id) tuples enter the bucket shuffle and
    * only 32-long signatures enter verification — the shingle sets
    * never leave the scan stage, which is what keeps this
    * corpus-size-independent per candidate at 100 TB. */
  def d2MinhashLsh(s: SparkSession, d: String): DataFrame = {
    val k = 32; val bands = 8
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"),
        T.minhashSignature(T.shingleSet(col("text"), 5), k).as("sig"))
    // The 32-long signature (256 B) rides along through the band join,
    // so verification needs no second scan of the corpus: one shuffle
    // on (band, hash), one distinct on the candidate pair.
    // Self-join on the SAME plan via dataset aliases so both sides
    // canonicalize identically and the shuffle exchange is reused
    // (one signature/band computation, not two).
    val banded = sigs
      .select(col("doc_id"), col("sig"),
        posexplode(T.bandHashes(col("sig"), k, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    // The Jaccard estimate is a pure function of the pair, so it is
    // computed inside the join projection (identical value for every
    // band a pair collides in) and the duplicate-collision dedup
    // becomes groupBy(id1,id2).max(jac): a HashAggregate with map-side
    // partials over 24-byte rows, instead of dropDuplicates carrying
    // both 256-byte signatures through a SortAggregate (first() on
    // array types forces the sort-based path). Filtering < 0.5 BEFORE
    // the pair shuffle also drops most collisions map-side.
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        round(T.minhashJaccardEst(col("a.sig"), col("b.sig"), k), 3)
          .as("jac"))
      .filter(col("jac") >= 0.5)
      .groupBy("id1", "id2")
      .agg(max("jac").as("jaccard_est"))
      .orderBy("id1", "id2")
  }

  /** D3: SimHash near-dup — 64-bit simhash; candidates share the top-16
    * bit prefix, verified by Hamming distance ≤ 10. */
  def d3Simhash(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), T.simhash(T.tokenSet(col("text"))).as("sh"))
      .withColumn("bucket", shiftrightunsigned(col("sh"), 48))
    val a = docs.select(col("bucket"), col("doc_id").as("id1"), col("sh").as("h1"))
    val b = docs.select(col("bucket"), col("doc_id").as("id2"), col("sh").as("h2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", T.hamming(col("h1"), col("h2")))
      .filter(col("hamming") <= 10)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** D4: n-gram (token-set) Jaccard over (source, size-bucket)
    * candidates — the SQL-checkable cousin of D2. */
  def d4NgramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      floor(col("n_chars") / 100).as("bkt"), T.tokenSet(col("text")).as("toks"))
    val a = docs.select(col("source"), col("bkt"),
      col("doc_id").as("id1"), col("toks").as("t1"))
    val b = docs.select(col("source"), col("bkt"),
      col("doc_id").as("id2"), col("toks").as("t2"))
    a.join(b, Seq("source", "bkt"))
      .filter(col("id1") < col("id2"))
      .withColumn("jac", round(
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2"))), 3))
      .filter(col("jac") >= 0.7)
      .select("id1", "id2", "jac")
      .orderBy("id1", "id2")
  }

  /** D5: embedding-cosine near-dup — pairs within the same cluster
    * (label) whose cosine ≥ 0.3; float64 math to match the oracle. */
  def d5EmbeddingDedup(s: SparkSession, d: String): DataFrame = {
    // Squared norms are computed once per vector BEFORE the pair join;
    // each pair then costs one dot product (identical float64 result:
    // cos = dot / sqrt(n1*n2), same as the one-shot formula).
    val e = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"),
        V.asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", V.norm2(col("emb")))
    val a = e.select(col("label"), col("vec_id").as("id1"),
      col("emb").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("label"), col("vec_id").as("id2"),
      col("emb").as("e2"), col("nrm").as("n2"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(
        V.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2")), 3))
      .filter(col("cos") >= 0.3)
      .select("id1", "id2", "cos")
      .orderBy("id1", "id2")
  }
}
