package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Streaming operators agree with their batch analogues; the ES sink
  * emits valid bulk wire format. */
class StreamAndSinkSpec extends AnyFunSuite {
  import SparkTest._

  test("streaming windowed counts match batch on the same data") {
    val dir = Files.createTempDirectory("graft_stream").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema)
      .parquet(dir)
    val q = streaming.EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_wc")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("graft_wc")
      .select("w_start", "event_type", "n", "total_value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = streaming.EventStream.windowedCounts(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionize matches the batch window formulation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema).parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[streaming.EventStream.Ev]
    val q = streaming.EventStream.sessionize(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_sess")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("graft_sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = operators.History.h11Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming latest-state equals batch h2") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ls").toString
    Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema).parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[streaming.EventStream.EvFull]
    val q = streaming.EventStream.latestState(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_ls")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("graft_ls")
      .groupBy("user_id")
      .agg(max_by(struct(col("last_type"), col("last_value"), col("ts_ms")),
        col("ts_ms")).as("s"))
      .select(col("user_id"), col("s.last_type"), col("s.last_value"), col("s.ts_ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val batch = operators.History.h2LatestState(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops in-watermark duplicates") {
    val dir = Files.createTempDirectory("graft_dupes").toString
    val ev = Tables.events(spark, sf)
    // duplicate the whole feed -> every event_id appears twice
    ev.union(ev).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema).parquet(dir)
    val q = streaming.EventStream.dedupStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("graft_dedup")
    assert(got.count() == ev.count())
    assert(got.select("event_id").distinct().count() == got.count())
  }

  test("end-to-end streaming ETL: events -> latest-state -> ES bulk index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_e2e").toString
    Tables.events(spark, sf).repartition(4).write.mode("overwrite").parquet(dir)
    val out = Files.createTempDirectory("graft_e2e_bulk").toString
    val stream = spark.readStream
      .schema(streaming.EventStream.eventSchema)
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[streaming.EventStream.EvFull]
    val docs = streaming.EventStream.latestState(stream).toDF()
      .withColumn("_id", col("user_id").cast("string"))
    val q = streaming.EventStream.esSinkQuery(docs, "state", "_id", out)
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // the LAST bulk emission per user must equal batch h2 latest-state
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("batch_")).toSeq
      .sortBy(_.getFileName.toString.stripPrefix("batch_").toInt)
      .flatMap { d =>
        Files.list(d).iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .flatMap(p => Files.readAllLines(p).asScala)
      }
    val lastDoc = scala.collection.mutable.LinkedHashMap[String, String]()
    lines.grouped(2).foreach { case Seq(action, source) =>
      val id = action.split("\"_id\":\"")(1).takeWhile(_ != '"')
      lastDoc(id) = source
    }
    val batch = operators.History.h2LatestState(spark, sf).collect()
      .map(r => r.getLong(0).toString ->
        (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
    assert(lastDoc.keySet == batch.keySet)
    lastDoc.foreach { case (id, json) =>
      val (lt, lv, ts) = batch(id)
      assert(json.contains(s""""last_type":"$lt""""), s"user $id: $json")
      assert(json.contains(s""""ts_ms":$ts"""), s"user $id: $json")
    }
  }

  test("es sink writes parseable bulk ndjson with alternating lines") {
    val out = Files.createTempDirectory("graft_bulk").toString + "/bulk"
    val docs = operators.History.h12EsDocs(spark, sf)
      .limit(100).withColumn("doc_id", col("_id")).drop("_id")
    sources.EsSink.writeBulk(docs, "bugs", "doc_id", out)
    val lines = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq
    assert(lines.nonEmpty && lines.length % 2 == 0)
    lines.grouped(2).foreach { case Seq(action, source) =>
      assert(action.startsWith("""{"index":{"_index":"bugs","_id":""""))
      assert(source.startsWith("{") && source.endsWith("}"))
    }
  }
}
