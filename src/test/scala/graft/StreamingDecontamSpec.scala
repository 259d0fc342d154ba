package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingDecontam: d14 as an ingest-time admission gate. The
  * accumulated per-batch pair outputs must equal the all-pairs
  * cross-join truth on everything ingested — the frozen seed-df
  * dictionary (built from wave 0 only) may key grams differently
  * from a full-corpus df, but candidates stay exact under any fixed
  * order and verification depends only on the gram sets. */
class StreamingDecontamSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
  private val t = 0.8
  private def isEval = col("doc_id") % 10 === 0

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("eval_id", "train_id", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed ingest waves ≡ the all-pairs eval-containment truth " +
      "on everything ingested") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_sdecon").toString
    val (indexPath, pairRoot) = (s"$root/index", s"$root/pairs")
    val train = docs.filter(!isEval)
    // index frozen on wave 0's df; waves 1 and 2 arrive later under
    // the stale dictionary
    graft.streaming.StreamingDecontam.buildIndex(
      train.filter(col("doc_id") % 3 === 0), docs.filter(isEval),
      indexPath, t)
    val waves = (0 to 2).map(i =>
      train.filter(col("doc_id") % 3 === i)
        .select("doc_id", "text").as[(Long, String)].collect().toSeq)
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDecontam.run(
        ms.toDF().toDF("doc_id", "text"), indexPath, pairRoot, t)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    waves.foreach { w => ms.addData(w); q.processAllAvailable() }
    q.stop()
    val streamed = pairSet(spark.read.parquet(s"$pairRoot/batch_*"))
    // independent truth: all-pairs cross join on normalized coverage
    import graft.functions.{TextFunctions => T}
    val gs = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(Dedup.wordGrams(col("toks"), 3)).as("gs"))
    val truth = pairSet(gs.filter(isEval)
      .select(col("doc_id").as("eval_id"), col("gs").as("egs"))
      .crossJoin(gs.filter(!isEval)
        .select(col("doc_id").as("train_id"), col("gs").as("tgs")))
      .select(col("eval_id"), col("train_id"),
        round(size(array_intersect(col("egs"), col("tgs"))).cast("double") /
          size(col("egs")), 3).as("containment"))
      .filter(col("containment") >= t))
    assert(streamed == truth,
      s"missed ${(truth -- streamed).size} / " +
        s"extra ${(streamed -- truth).size}")
    assert(streamed.nonEmpty, "fixture produced no contamination pairs")
    // the stale-dictionary waves contributed, not just the seed wave
    assert(streamed.exists(p => p._2 % 3 != 0),
      "no pair from a post-seed wave — the spec lost its drift signal")
  }

  test("replayed ingest micro-batch is idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sdecon_replay").toString
    val (indexPath, pairRoot) = (s"$root/index", s"$root/pairs")
    val train = docs.filter(!isEval)
    graft.streaming.StreamingDecontam.buildIndex(
      train.filter(col("doc_id") % 3 === 0), docs.filter(isEval),
      indexPath, t)
    val b1 = train.filter(col("doc_id") % 3 === 1)
      .select("doc_id", "text")
    graft.streaming.StreamingDecontam
      .processBatch(b1, 1, indexPath, pairRoot, t)
    val first = pairSet(spark.read.parquet(s"$pairRoot/batch_*"))
    graft.streaming.StreamingDecontam
      .processBatch(b1, 1, indexPath, pairRoot, t)
    val replayed = pairSet(spark.read.parquet(s"$pairRoot/batch_*"))
    assert(replayed == first, "replay changed the pair output")
    assert(first.nonEmpty, "fixture produced no pairs")
  }
}
