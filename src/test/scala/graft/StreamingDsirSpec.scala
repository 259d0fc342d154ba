package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Continuous DSIR: every batch's weights must equal the BATCH c8
  * operator run over the prefix union of all batches so far,
  * restricted to that batch's raw docs — the stream is the
  * prefix-corpus answer at each step. Replay must change nothing. */
class StreamingDsirSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "text")
  private def wave(i: Int) = docs.filter(col("doc_id") % 3 === i)

  private def weightsOf(root: String, batch: Int) =
    spark.read.parquet(s"$root/weights/batch_$batch")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))).toMap

  test("each batch's weights equal batch-c8 on the prefix union; " +
      "replay is idempotent") {
    val root = Files.createTempDirectory("graft_sdsir").toString
    (0 to 2).foreach(i => streaming.StreamingDsir.processBatch(
      wave(i), i, s"$root/store", s"$root/weights"))
    for (i <- 0 to 2) {
      val prefix = docs.filter(col("doc_id") % 3 <= i)
      val batchIds = wave(i).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val expected = operators.Curation.c8DsirFrame(prefix, 1024)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
          r.getBoolean(3)))).toMap
        .filter { case (id, _) => batchIds.contains(id) }
      val got = weightsOf(root, i)
      assert(got == expected, s"batch $i diverged from prefix c8: " +
        s"missing ${(expected.keySet -- got.keySet).take(3)}, " +
        s"extra ${(got.keySet -- expected.keySet).take(3)}")
      assert(got.nonEmpty)
    }
    // replay batch 1 AFTER batch 2 ran: its slice and weights are
    // rewritten from the same inputs — byte-identical results, and
    // batch 2's outputs untouched
    val before1 = weightsOf(root, 1)
    val before2 = weightsOf(root, 2)
    streaming.StreamingDsir.processBatch(
      wave(1), 1, s"$root/store", s"$root/weights")
    assert(weightsOf(root, 1) == before1, "replayed batch 1 changed")
    assert(weightsOf(root, 2) == before2, "replay touched batch 2")
  }
}
