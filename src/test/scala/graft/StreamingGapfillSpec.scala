package graft

import graft.streaming.StreamingGapfill
import graft.streaming.StreamingGapfill.{GapTick, Obs}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming gap-fill (h17 continuously): streamed ticks must equal
  * the batch h17 rows EXACTLY — no exclusions — because every tick is
  * eagerly closed by the first observation at or past it (the batch
  * spine ends at the last observation, so nothing waits on a timeout
  * flush). Corpus equivalence across three chronological waves plus a
  * fixture pinning the tick semantics. */
class StreamingGapfillSpec extends AnyFunSuite {
  import SparkTest._

  private def runStream(waves: Seq[Seq[Obs]])
      : Set[(Long, Long, Option[Double], Option[Long])] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("graft_sgap").toString
    val ms = MemoryStream[Obs]
    val q = StreamingGapfill.gapfill(ms.toDS())
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    waves.foreach { w => ms.addData(w); q.processAllAvailable() }
    q.stop()
    spark.read.parquet(s"$out/data").as[GapTick].collect()
      .map(t => (t.user_id, t.tick_ms, t.value_ff, t.staleness_ms)).toSet
  }

  private def batchTicks(ev: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Option[Double], Option[Long])] =
    operators.History.gapfillFrame(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("streamed ticks ≡ batch h17 on the corpus events across three " +
      "chronological waves") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val obs = ev.collect().map(r => Obs(r.getLong(0),
      r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSeq
    // global time split: per-entity order survives, and same-instant
    // duplicates always land in the same wave
    val cuts = obs.map(_.ts.getTime).sorted
    val (c1, c2) = (cuts(obs.size / 3), cuts(2 * obs.size / 3))
    val waves = Seq(obs.filter(_.ts.getTime < c1),
      obs.filter(o => o.ts.getTime >= c1 && o.ts.getTime < c2),
      obs.filter(_.ts.getTime >= c2))
    val streamed = runStream(waves)
    val expected = batchTicks(ev)
    assert(streamed == expected,
      s"missing ${(expected -- streamed).size} / " +
        s"extra ${(streamed -- expected).size}")
    assert(streamed.nonEmpty)
  }

  test("fixture: leading-gap null, aligned observation at staleness 0, " +
      "multi-hour forward-fill, same-instant max_by collapse") {
    import spark.implicits._
    val H = 3600000L
    val B = 1699999200000L // 2023-11-14 22:00:00 UTC — hour-aligned
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val obs = Seq(
      Obs(1L, t(B + 30 * 60000L), 10L, 5.0),   // 22:30 (leading 22:00 gap)
      Obs(1L, t(B + 30 * 60000L), 11L, 7.0),   // same instant, higher id wins
      Obs(1L, t(B + 3 * H + 600000L), 12L, 9.0), // 01:10 — 3 ticks close
      Obs(2L, t(B + H), 20L, 1.5),             // exactly on the hour
      Obs(2L, t(B + 2 * H), 21L, 2.5))
    val streamed = runStream(Seq(obs.take(2), obs.drop(2)))
    val expected = Set[(Long, Long, Option[Double], Option[Long])](
      (1L, B, None, None),                       // leading gap
      (1L, B + H, Some(7.0), Some(30 * 60000L)), // max_by collapse
      (1L, B + 2 * H, Some(7.0), Some(90 * 60000L)),
      (1L, B + 3 * H, Some(7.0), Some(150 * 60000L)),
      (2L, B + H, Some(1.5), Some(0L)),          // aligned: staleness 0
      (2L, B + 2 * H, Some(2.5), Some(0L)))
    assert(streamed == expected)
    // the batch operator agrees on the same timeline
    val ev = obs.toDF()
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    assert(batchTicks(ev) == expected)
  }

  test("documented divergence: a same-instant duplicate STRADDLING " +
      "batches keeps the first arrival (its tick is already closed), " +
      "where batch h17 keeps the max event_id") {
    val H = 3600000L
    val B = 1699999200000L
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val first = Obs(1L, t(B), 10L, 5.0)   // aligned: closes tick B eagerly
    val dup = Obs(1L, t(B), 11L, 9.0)     // same instant, NEXT batch
    val later = Obs(1L, t(B + H), 12L, 2.0)
    val streamed = runStream(Seq(Seq(first), Seq(dup, later)))
    // stream: tick B was emitted from the first arrival; the replayed
    // instant is at-or-behind the held observation and drops even
    // though it is within the watermark (Append cannot retract)
    assert(streamed == Set[(Long, Long, Option[Double], Option[Long])](
      (1L, B, Some(5.0), Some(0L)), (1L, B + H, Some(2.0), Some(0L))))
    // batch on the union: max_by(event_id) picks the duplicate
    import spark.implicits._
    val ev = Seq(first, dup, later).toDF()
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    assert(batchTicks(ev).contains((1L, B, Some(9.0), Some(0L))))
  }
}
