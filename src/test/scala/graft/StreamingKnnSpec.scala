package graft

import graft.streaming.StreamingKnn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous kNN-graph maintenance: the 3-wave fold must equal the
  * one-shot s14 INIT graph on everything ingested (the banded
  * candidate top-k StreamingKnn's cadence generates; s14's descent
  * rounds are a periodic batch compaction over the maintained store,
  * not per-ingest work), a small batch must
  * rewrite only the graph partitions it touches, and a replayed batch
  * must converge to the same graph. */
class StreamingKnnSpec extends AnyFunSuite {
  import SparkTest._

  private val nb = 64

  private def readGraph(path: String)
      : Set[(Long, Long, Long, Double)] =
    spark.read.parquet(path).select("vec_id", "rk", "nbr", "cos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("3-wave streamed kNN graph ≡ one-shot s14; small batch is " +
      "surgical; replay idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sknn").toString
    val (store, graph) = (s"$root/store", s"$root/graph")
    val emb = Tables.embeddings(spark, sf)
    // two big waves, then a small third (~3%) for the surgical check
    val w0 = emb.filter(col("vec_id") % 2 === 0 &&
      col("vec_id") % 30 =!= 2)
    val w1 = emb.filter(col("vec_id") % 2 === 1 &&
      col("vec_id") % 30 =!= 2)
    val w2 = emb.filter(col("vec_id") % 30 === 2)
    StreamingKnn.processBatch(w0.toDF(), 0, store, graph, 5, nb)
    StreamingKnn.processBatch(w1.toDF(), 1, store, graph, 5, nb)
    def snap(): Map[String, Seq[(String, Long)]] = {
      val dir = new java.io.File(graph)
      dir.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("pb=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSeq.sorted
      }.toMap
    }
    val before = snap()
    StreamingKnn.processBatch(w2.toDF(), 2, store, graph, 5, nb)
    val after = snap()
    val unchanged = before.keys.filter(p => after.get(p).contains(before(p)))
    assert(unchanged.size * 2 >= before.size,
      s"a ~3% batch rewrote ${before.size - unchanged.size} of " +
        s"${before.size} graph partitions — not surgical")

    // the maintained graph equals the one-shot s14 INIT graph
    val expected = similarity.Similarity.s14InitGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val got = readGraph(graph)
    assert(got == expected,
      s"missing ${(expected -- got).size} / extra ${(got -- expected).size}")
    assert(got.nonEmpty)
    // the small wave genuinely contributed edges (fixture strength)
    assert(got.exists(e => e._1 % 30 == 2 || e._3 % 30 == 2),
      "wave-2 vectors never entered the graph — fixture too weak")

    // at-least-once replay of the last batch converges
    StreamingKnn.processBatch(w2.toDF(), 2, store, graph, 5, nb)
    assert(readGraph(graph) == expected, "replay diverged")
  }
}
