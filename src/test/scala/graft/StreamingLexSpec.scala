package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lexical-store ingest cadence (r14): per-batch exact tf slices
  * under a frozen df dictionary, compaction refresh, stated staleness. */
class StreamingLexSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("3-wave lexical cadence + dictionary refresh ≡ the one-shot " +
      "bm25Weights store build, row- and bit-identical; a replayed " +
      "wave changes nothing") {
    val root = Files.createTempDirectory("graft_lex").toString
    // the weight corpus = the one-shot build's: non-query docs
    val corpus = Tables.documents(spark, sf)
      .filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "text")
    (0 until 3).foreach { i =>
      streaming.StreamingLex.lexBatch(
        corpus.filter(col("doc_id") % 3 === i), i, root)
    }
    streaming.StreamingLex.refreshDictionary(spark, root)
    def weights(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "term").collect()
        .map(r => (r.getLong(r.fieldIndex("doc_id")),
          r.getString(r.fieldIndex("term")),
          r.getDouble(r.fieldIndex("w"))))
    val stored = weights(streaming.StreamingLex.storedWeights(spark, root))
    val oneShot = weights(text.TextAnalysis.bm25Weights(spark, sf))
    assert(stored.length == oneShot.length && stored.nonEmpty)
    // bit-identical doubles: same exact integer inputs through the
    // same expression tree
    assert(stored.sameElements(oneShot))
    // replay idempotence: re-running the NEWEST wave (the only batch
    // a restarted stream can re-run — compaction at the refresh point
    // deliberately leaves it unfolded) is a no-op for the view
    streaming.StreamingLex.lexBatch(
      corpus.filter(col("doc_id") % 3 === 2), 2, root)
    assert(weights(streaming.StreamingLex.storedWeights(spark, root))
      .sameElements(oneShot))
    // the refresh compacted waves 0+1 into one slice dir; wave 2 and
    // the folded dir are all that remain
    val tfDirs = new java.io.File(s"$root/tf").listFiles()
      .map(_.getName).filter(_.startsWith("batch_")).toSet
    assert(tfDirs == Set("batch_1", "batch_2"), tfDirs.mkString(","))
  }

  test("staleness contract: a term unseen at the freeze carries no " +
      "weight until the next refresh, which folds it in (df/n/avgdl " +
      "advance only at compaction)") {
    val root = Files.createTempDirectory("graft_lex_stale").toString
    val wave0 = Seq((1L, "x y"), (2L, "x")).toDF("doc_id", "text")
    val wave1 = Seq((3L, "z x")).toDF("doc_id", "text")
    streaming.StreamingLex.lexBatch(wave0, 0, root)
    streaming.StreamingLex.refreshDictionary(spark, root) // freeze
    streaming.StreamingLex.lexBatch(wave1, 1, root)
    val stale = streaming.StreamingLex.storedWeights(spark, root)
    // doc 3's x scores under the FROZEN dictionary (df=2, n=2) ...
    assert(stale.filter($"doc_id" === 3 && $"term" === "x").count() == 1)
    // ... and its z — unseen at the freeze — has NO weight yet
    assert(stale.filter($"term" === "z").isEmpty)
    // the frozen df for x is the freeze-time value: doc 1 and doc 3
    // (same tf=1, dl=2) get the SAME stale weight
    val wx = stale.filter($"term" === "x" && $"doc_id".isin(1L, 3L))
      .select("w").collect().map(_.getDouble(0))
    assert(wx.length == 2 && wx(0) == wx(1))
    // compaction refresh: z appears, statistics advance to n=3
    streaming.StreamingLex.refreshDictionary(spark, root)
    val fresh = streaming.StreamingLex.storedWeights(spark, root)
    assert(fresh.filter($"term" === "z" && $"doc_id" === 3).count() == 1)
    val n = spark.read.parquet(s"$root/dict/stats")
      .head.getAs[Long]("n")
    assert(n == 3)
  }

  test("a doc_id re-ingested in a later batch counts once — latest " +
      "batch wins for the corpus statistics and the weight view") {
    val root = Files.createTempDirectory("graft_lex_reingest").toString
    streaming.StreamingLex.lexBatch(
      Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text"), 0, root)
    // doc 1 updated in batch 1: new text drops b, adds c
    streaming.StreamingLex.lexBatch(
      Seq((1L, "a c")).toDF("doc_id", "text"), 1, root)
    streaming.StreamingLex.refreshDictionary(spark, root)
    // n = 2 docs (not 3), df(a) = 2 (not 3), b gone, c present
    val stats = spark.read.parquet(s"$root/dict/stats").head
    assert(stats.getAs[Long]("n") == 2)
    val df = spark.read.parquet(s"$root/dict/df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df == Map("a" -> 2L, "c" -> 1L))
    // the weight view carries doc 1's NEWEST profile only
    val w = streaming.StreamingLex.storedWeights(spark, root)
    assert(w.filter($"doc_id" === 1).select("term").collect()
      .map(_.getString(0)).toSet == Set("a", "c"))
    assert(w.filter($"doc_id" === 1 && $"term" === "a").count() == 1)
    // equivalence: identical to one-shot ingest of the final corpus
    val root2 = Files.createTempDirectory("graft_lex_reingest2").toString
    streaming.StreamingLex.lexBatch(
      Seq((1L, "a c"), (2L, "a")).toDF("doc_id", "text"), 0, root2)
    streaming.StreamingLex.refreshDictionary(spark, root2)
    def rows(r: String) = streaming.StreamingLex.storedWeights(spark, r)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2)))
      .toSet
    assert(rows(root) == rows(root2))
  }
}
