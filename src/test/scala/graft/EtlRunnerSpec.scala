package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's core ETL guarantee: a full run over early data
  * followed by an incremental run equals one full run over everything
  * (reference: tests/test_etl.py incremental-vs-full equivalence). */
class EtlRunnerSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def mkActivity(maxTs: Long): DataFrame = Seq(
    (1L, 200L, "u1", "status", "NEW", "ASSIGNED"),
    (1L, 300L, "u1", "cc", "", "bob"),
    (2L, 250L, "u2", "status", "NEW", "FIXED"),
    (1L, 900L, "u1", "status", "ASSIGNED", "RESOLVED"), // late activity
    (3L, 950L, "u3", "status", "NEW", "WONTFIX"))       // late new entity
    .toDF("id", "ts", "modified_by", "field", "old_value", "new_value")
    .filter($"ts" <= maxTs)

  private def mkCurrent(maxTs: Long): DataFrame = {
    val all = Seq(
      (1L, 100L, if (maxTs >= 900) "RESOLVED" else "ASSIGNED", Seq("bob")),
      (2L, 150L, "FIXED", Seq.empty[String]),
      (3L, 940L, "WONTFIX", Seq.empty[String]))
      .toDF("id", "created_ts", "status", "cc")
    if (maxTs >= 900) all else all.filter($"id" =!= 3L)
  }

  test("full-then-incremental equals one full run") {
    val stateDir = Files.createTempDirectory("graft_etl_state").toString
    val out = Files.createTempDirectory("graft_etl_out").toString

    // run 1: everything up to t=400 (no state -> full)
    val (r1, v1) = etl.EtlRunner.run(spark, mkCurrent(400), mkActivity(400),
      Seq("status"), Seq("cc"), stateDir, s"$out/run1")
    assert(r1.mode == "full" && r1.entities == 2)

    // run 2: all data now visible; state exists -> incremental
    val (r2, v2) = etl.EtlRunner.run(spark, mkCurrent(1000), mkActivity(1000),
      Seq("status"), Seq("cc"), stateDir, s"$out/run2")
    assert(r2.mode == "incremental")
    // only entities 1 (late activity) and 3 (new) are rebuilt
    assert(v2.select("id").distinct().collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))

    // merged state: untouched entities from run1 + rebuilt from run2
    val merged = v1.filter(!$"id".isin(1L, 3L)).unionByName(v2)
      .select("id", "valid_from", "expires_on", "version", "status")
      .collect().map(_.toSeq).toSet
    // oracle: one full run over everything
    val stateDir2 = Files.createTempDirectory("graft_etl_state2").toString
    val (_, vFull) = etl.EtlRunner.run(spark, mkCurrent(1000), mkActivity(1000),
      Seq("status"), Seq("cc"), stateDir2, s"$out/full")
    val full = vFull
      .select("id", "valid_from", "expires_on", "version", "status")
      .collect().map(_.toSeq).toSet
    assert(merged == full)
    // high-water mark advanced
    assert(etl.EtlRunner.readState(stateDir, "last_run_time").contains(950L))
  }

  test("privacy-aware run excludes private entities and writes their deletes") {
    val stateDir = Files.createTempDirectory("graft_etl_ps").toString
    val out = Files.createTempDirectory("graft_etl_pout").toString + "/run"
    val nowPrivate = Seq(1L).toDF("id")
    val (r, v) = etl.EtlRunner.runWithPrivacy(spark, mkCurrent(1000),
      mkActivity(1000), Seq("status"), Seq("cc"), stateDir, out, nowPrivate)
    // entity 1 never published
    assert(r.entities == 2)
    assert(!v.select("id").distinct().collect().map(_.getLong(0)).contains(1L))
    val bulk = spark.read.text(out).collect().map(_.getString(0))
    assert(!bulk.exists(_.contains(""""id":1,""")))
    // ... and every version doc it WOULD have published is a delete action
    val dels = spark.read.text(s"${out}_deletes").collect()
      .map(_.getString(0)).sorted
    assert(dels.nonEmpty && dels.forall(_.startsWith("""{"delete":{""")))
    // entity 1 has versions at t=100/200/300/900 → 4 delete ids 1_*
    assert(dels.count(_.contains(""""_id":"1_""")) == 4)
  }
}
