package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Continuous profiling: the native sketch aggregates' mergeable
  * buffers ARE streaming aggregation state, so the running stream
  * sketch must equal the one-shot batch sketch on the same rows —
  * including when the rows arrive split across micro-batches (the
  * cross-batch partial merge). */
class StreamingSketchesSpec extends AnyFunSuite {
  import SparkTest._
  import streaming.StreamingSketches

  private def regsOf(df: org.apache.spark.sql.DataFrame)
      : Map[String, Seq[Int]] =
    df.collect().map(r => (r.getString(0), r.getSeq[Int](1))).toMap

  test("streamed HLL registers equal batch, merged across micro-batches") {
    val dir = Files.createTempDirectory("graft_ssketch").toString
    // several files + one file per trigger ⇒ the state must MERGE
    // partial register arrays across micro-batches
    Tables.lineitem(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(Tables.lineitem(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = StreamingSketches.hllByFlag(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_hll")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = regsOf(spark.table("graft_hll"))
    val batch = regsOf(StreamingSketches.hllByFlag(Tables.lineitem(spark, sf)))
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.values.forall(_.length == 64))
  }

  test("streamed CMS cells equal batch across micro-batches") {
    val dir = Files.createTempDirectory("graft_scms").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = StreamingSketches.cmsCells(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_cms")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("graft_cms").collect()(0).getSeq[Long](0)
    val batch = StreamingSketches.cmsCells(Tables.events(spark, sf))
      .collect()(0).getSeq[Long](0)
    assert(streamed == batch)
    assert(streamed.length == 4 * 512 && streamed.sum > 0)
  }
}
