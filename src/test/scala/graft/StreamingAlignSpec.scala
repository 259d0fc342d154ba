package graft

import graft.streaming.StreamingAlign
import graft.streaming.StreamingAlign.{AlignEvent, AlignSegment}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming temporal align (h16 continuously): streamed CLOSED
  * segments must equal the batch temporalAlign segments with finite
  * expires_on — on the real corpus SCDs (two arrival waves, so
  * cross-batch state is exercised) and on a gapped fixture with
  * explicit side-close events. */
class StreamingAlignSpec extends AnyFunSuite {
  import SparkTest._

  private def runStream(events: Seq[AlignEvent],
      waves: Seq[Seq[AlignEvent]]): Set[(Long, Long, Long,
      Option[String], Option[String])] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("graft_salign").toString
    val ms = MemoryStream[AlignEvent]
    val q = StreamingAlign.align(ms.toDS())
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    waves.foreach { w => ms.addData(w); q.processAllAvailable() }
    q.stop()
    spark.read.parquet(s"$out/data").as[AlignSegment].collect()
      .filter(_.expires_on != operators.History.MaxTimestamp)
      .map(s => (s.id, s.valid_from, s.expires_on, s.status, s.grp)).toSet
  }

  private def batchClosed(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long,
      Option[String], Option[String])] =
    operators.AsOf.temporalAlign(left, right, Seq("status"), Seq("grp"))
      .filter(col("expires_on") =!= operators.History.MaxTimestamp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4)))).toSet

  /** SCD version rows → boundary events: every version opens its
    * value at valid_from; a finite expires_on with NO successor at
    * that instant closes the side (a coverage gap). */
  private def boundaryEvents(df: org.apache.spark.sql.DataFrame,
      side: String, valueCol: String): Seq[AlignEvent] = {
    val rows = df.select(col("id"), col("valid_from"), col("expires_on"),
        col(valueCol).cast("string").as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3))))
    val opens = rows.map { case (id, from, _, v) =>
      AlignEvent(id, new java.sql.Timestamp(from), side, v, 0L) }
    val starts = rows.map(r => (r._1, r._2)).toSet
    val closes = rows.collect {
      case (id, _, to, _)
          if to != operators.History.MaxTimestamp && !starts((id, to)) =>
        AlignEvent(id, new java.sql.Timestamp(to), side, None, 1L)
    }
    opens ++ closes
  }

  test("streamed closed segments ≡ batch h16 on the corpus SCDs " +
      "across two arrival waves") {
    val (leftScd, rightScd) = operators.AsOf.h16Scds(spark, sf)
    val events = boundaryEvents(leftScd, "l", "status") ++
      boundaryEvents(rightScd, "r", "grp")
    // global time split keeps per-entity order across waves
    val tsCut = events.map(_.ts.getTime).sorted
      .apply(events.size / 2)
    val waves = Seq(events.filter(_.ts.getTime < tsCut),
      events.filter(_.ts.getTime >= tsCut))
    val streamed = runStream(events, waves)
    val expected = batchClosed(leftScd, rightScd)
    assert(streamed == expected,
      s"missing ${(expected -- streamed).size} / " +
        s"extra ${(streamed -- expected).size}")
    assert(streamed.nonEmpty)
  }

  test("gapped fixture: explicit side-close events split segments " +
      "like the batch expiry boundaries") {
    import spark.implicits._
    val M = operators.History.MaxTimestamp
    val B = 1700000000000L
    def ts(m: Long) = B + m * 60000L
    // left covers [0,10) then GAP then [20,MAX); right covers [5,MAX)
    val left = Seq(
      (1L, ts(0), ts(10), "a"),
      (1L, ts(20), M, "b"))
      .toDF("id", "valid_from", "expires_on", "status")
    val right = Seq(
      (1L, ts(5), M, "g1"))
      .toDF("id", "valid_from", "expires_on", "grp")
    val events = boundaryEvents(left, "l", "status") ++
      boundaryEvents(right, "r", "grp")
    val streamed = runStream(events, Seq(events))
    val expected = batchClosed(left, right)
    assert(streamed == expected,
      s"missing ${expected -- streamed} / extra ${streamed -- expected}")
    // the gap really is exercised: a segment with null left coverage
    assert(expected.exists(s => s._4.isEmpty && s._5.nonEmpty))
  }

  /** Drive the FOLDED align (EventStreamFold.alignFoldBatch) over
    * waves, returning its CLOSED segments. */
  private def runFolded(waves: Seq[Seq[AlignEvent]]): Set[(Long, Long,
      Long, Option[String], Option[String])] = {
    import spark.implicits._
    import graft.streaming.EventStreamFold
    var st = EventStreamFold.emptyAlignState(spark)
    var wm = 0L
    var out = Set.empty[(Long, Long, Long, Option[String], Option[String])]
    waves.foreach { w =>
      val (o, newSt, wmN) =
        EventStreamFold.alignFoldBatch(st, wm, w.toDS().toDF())
      out ++= o.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), Option(r.getString(3)), Option(r.getString(4))))
      st = newSt.localCheckpoint(true)
      wm = wmN
    }
    out.filter(_._3 != operators.History.MaxTimestamp)
  }

  test("FOLDED align (r15) ≡ stateful ≡ batch h16 on the corpus SCDs " +
      "across two waves, and on the gapped fixture") {
    val (leftScd, rightScd) = operators.AsOf.h16Scds(spark, sf)
    val events = boundaryEvents(leftScd, "l", "status") ++
      boundaryEvents(rightScd, "r", "grp")
    val tsCut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val waves = Seq(events.filter(_.ts.getTime < tsCut),
      events.filter(_.ts.getTime >= tsCut))
    val folded = runFolded(waves)
    val expected = batchClosed(leftScd, rightScd)
    assert(folded == expected,
      s"missing ${(expected -- folded).size} / " +
        s"extra ${(folded -- expected).size}")
    assert(folded.nonEmpty)
    // the gapped fixture, one batch (seeds + same-ts ordering edges)
    val M = operators.History.MaxTimestamp
    val B = 1700000000000L
    def ts(m: Long) = B + m * 60000L
    import spark.implicits._
    val left = Seq((1L, ts(0), ts(10), "a"), (1L, ts(20), M, "b"))
      .toDF("id", "valid_from", "expires_on", "status")
    val right = Seq((1L, ts(5), M, "g1"))
      .toDF("id", "valid_from", "expires_on", "grp")
    val fixtureEv = boundaryEvents(left, "l", "status") ++
      boundaryEvents(right, "r", "grp")
    assert(runFolded(Seq(fixtureEv)) == batchClosed(left, right))
  }

  test("FOLDED align persisted steps: replay-idempotent delta store") {
    import spark.implicits._
    import graft.streaming.EventStreamFold
    val (leftScd, rightScd) = operators.AsOf.h16Scds(spark, sf)
    val events = boundaryEvents(leftScd, "l", "status") ++
      boundaryEvents(rightScd, "r", "grp")
    val tsCut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val waves = Seq(events.filter(_.ts.getTime < tsCut),
      events.filter(_.ts.getTime >= tsCut))
    val root = java.nio.file.Files
      .createTempDirectory("graft_alignstep").toString
    def step(i: Int) = EventStreamFold.alignStep(root, i.toLong,
        waves(i).toDS().toDF())
      .collect().map(_.toSeq).toSet
    val o0 = step(0)
    val o1 = step(1)
    assert(step(1) == o1, "replay diverged")
    val persisted = (o0 ++ o1).filter(
      _(2).asInstanceOf[Long] != operators.History.MaxTimestamp)
    val mem = runFolded(waves).map(t =>
      Seq(t._1, t._2, t._3, t._4.orNull, t._5.orNull): Seq[Any])
    assert(persisted == mem)
    assert(persisted.nonEmpty)
  }
}
