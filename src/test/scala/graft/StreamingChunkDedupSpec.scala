package graft

import graft.streaming.StreamingChunkDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous chunk-level near-dup: accumulated per-batch pairs must
  * equal the one-shot d17 pair set on everything ingested (chunk
  * sketches are per-document, so there is no cross-batch drift), and
  * a replayed batch must be byte-idempotent. */
class StreamingChunkDedupSpec extends AnyFunSuite {
  import SparkTest._

  private def readPairs(root: String)
      : Set[(Long, Long, Long, Long, Double)] =
    spark.read.parquet(s"$root/batch_*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

  test("3-wave streamed chunk pairs ≡ one-shot d17 on the union; " +
      "cross-wave passage reuse caught on arrival; replay idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_schunk").toString
    val (store, matches) = (s"$root/store", s"$root/match")
    // corpus plus a planted cross-WAVE quoted passage (doc 9001 in
    // wave 0, doc 9002 only in wave 2) so the ingest-time catch is
    // exercised, not just intra-wave pairs
    val passage = (0 until 64).map(i => s"quoted$i").mkString(" ")
    val fillA = (0 until 96).map(i => s"wrapa$i").mkString(" ")
    val fillB = (0 until 96).map(i => s"wrapb$i").mkString(" ")
    val planted = Seq((9001L, s"$fillA $passage"),
      (9002L, s"$passage $fillB")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(planted)
    // 9001 (≡1 mod 3) is pulled forward into wave 0; 9002 (≡2) lands
    // naturally in wave 2 — two waves apart from its duplicate
    val waves = Seq(
      docs.filter(col("doc_id") % 3 === 0 || col("doc_id") === 9001L),
      docs.filter(col("doc_id") % 3 === 1 && col("doc_id") =!= 9001L),
      docs.filter(col("doc_id") % 3 === 2))
    waves.zipWithIndex.foreach { case (w, i) =>
      StreamingChunkDedup.processBatch(w.toDF(), i, store, matches)
    }
    val got = readPairs(matches)
    val expected = dedup.Dedup.chunkDedupFrame(docs, 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"missing ${(expected -- got).size} / extra ${(got -- expected).size}")
    // the planted cross-wave pair arrived with wave 2's batch
    assert(got.contains((9001L, 2L, 9002L, 0L, 1.0)),
      "cross-wave quoted passage not caught at ingest")
    // at-least-once replay of the last batch is byte-idempotent
    StreamingChunkDedup.processBatch(waves(2).toDF(), 2, store, matches)
    assert(readPairs(matches) == expected, "replay diverged")
  }
}
