package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingContainment: the d13 ingest cadence as a continuous
  * query. Accumulated per-batch pair outputs must equal the one-shot
  * d13 pair set on everything ingested — the frozen first-batch df
  * dictionary may order keys differently from the one-shot run's
  * self-df, but the prefix bound holds under ANY fixed order and
  * verification is df-independent, so only candidate efficiency can
  * differ, never the verified set. Replay of a micro-batch must be
  * idempotent (overwrite slices, probe only prior slices). */
class StreamingContainmentSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
  private val t = 0.9

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id1", "id2", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streaming containment waves ≡ the one-shot pair set on the union") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_scont").toString
    val (storePath, pairRoot) = (s"$root/store", s"$root/pairs")
    val waves = (0 to 2).map(i =>
      docs.filter(col("doc_id") % 3 === i)
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect().toSeq)
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamingContainment.run(
        ms.toDF().toDF("doc_id", "source", "text"), storePath, pairRoot, t)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    waves.foreach { w => ms.addData(w); q.processAllAvailable() }
    q.stop()
    val streamed = pairSet(spark.read.parquet(s"$pairRoot/batch_*"))
    val oneShot = pairSet(Dedup.containmentPairs(docs, t))
    assert(streamed == oneShot,
      s"missed ${(oneShot -- streamed).size} / " +
        s"extra ${(streamed -- oneShot).size}")
    assert(streamed.nonEmpty, "fixture produced no containment pairs")
    // and the pairs actually accumulated across batches: at least one
    // cross-wave pair (ends in different doc_id mod 3 classes)
    assert(streamed.exists(p => p._1 % 3 != p._2 % 3),
      "no cross-batch pair formed")
  }

  test("replayed containment micro-batch is idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_scont_replay").toString
    val (storePath, pairRoot) = (s"$root/store", s"$root/pairs")
    val b0 = docs.filter(col("doc_id") % 3 === 0)
      .select("doc_id", "source", "text")
    val b1 = docs.filter(col("doc_id") % 3 === 1)
      .select("doc_id", "source", "text")
    graft.streaming.StreamingContainment
      .processBatch(b0, 0, storePath, pairRoot, t)
    graft.streaming.StreamingContainment
      .processBatch(b1, 1, storePath, pairRoot, t)
    def readAll() = pairSet(spark.read.parquet(s"$pairRoot/batch_*"))
    val first = readAll()
    // at-least-once replay of batch 1: its first-attempt store slices
    // exist on disk, but the probe joins must not see them
    graft.streaming.StreamingContainment
      .processBatch(b1, 1, storePath, pairRoot, t)
    val replayed = readAll()
    assert(replayed == first, "replay changed the pair output")
    assert(!replayed.exists(p => p._1 == p._2), "self-pair leaked in")
    // one slice per batch in both store legs
    assert(graft.streaming.StoreFs
      .priorBatchDirs(spark, s"$storePath/sets", Long.MaxValue).size == 2)
    assert(graft.streaming.StoreFs
      .priorBatchDirs(spark, s"$storePath/post", Long.MaxValue).size == 2)
    assert(first.nonEmpty, "fixture produced no pairs")
  }
}
