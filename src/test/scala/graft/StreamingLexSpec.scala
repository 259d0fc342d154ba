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
    // replay idempotence: re-running a wave (overwrite slice) is a
    // no-op for the maintained view
    streaming.StreamingLex.lexBatch(
      corpus.filter(col("doc_id") % 3 === 1), 1, root)
    assert(weights(streaming.StreamingLex.storedWeights(spark, root))
      .sameElements(oneShot))
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
}
