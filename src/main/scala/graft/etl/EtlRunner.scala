package graft.etl

import java.nio.file.{Files, Paths}
import graft.operators.BugHistory
import graft.sources.EsSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL orchestration: full refresh vs incremental runs with persisted
  * run state (reference: bugzilla_etl/bz_etl.py:281 full_etl /
  * :172 incremental_etl; run-state semantics per README "Inter-Run
  * State": `first_run_time` triggers a full refresh when absent,
  * `last_run_time` records the high-water mark of successful runs).
  *
  * Incremental semantics match the reference: any entity with activity
  * past the cutoff is *fully re-built* (all its versions), because new
  * activity re-chains `expires_on` of earlier versions; untouched
  * entities are not read at all (the activity scan prunes on the ts
  * predicate, the entity filter is a semi-join on the touched set).
  */
object EtlRunner {

  case class RunReport(mode: String, entities: Long, versions: Long,
      lastRunTime: Long)

  private def statePath(stateDir: String, name: String) =
    Paths.get(stateDir, name)

  def readState(stateDir: String, name: String): Option[Long] = {
    val p = statePath(stateDir, name)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  private def writeState(stateDir: String, name: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(stateDir))
    Files.writeString(statePath(stateDir, name), v.toString)
  }

  /** One ETL run over an activity log + current snapshot.
    * @return the run report and the (lazily re-computable) versions df */
  def run(spark: SparkSession, current: DataFrame, activity: DataFrame,
      singleFields: Seq[String], multiFields: Seq[String],
      stateDir: String, bulkOutDir: String): (RunReport, DataFrame) = {
    val lastRun = readState(stateDir, "last_run_time")
    val mode = if (lastRun.isEmpty) "full" else "incremental"

    val (curSel, actSel) = lastRun match {
      case None => (current, activity)
      case Some(cutoff) =>
        // entities touched since the cutoff — semi-joins prune both inputs
        val touched = activity.filter(col("ts") >= cutoff)
          .select("id").distinct()
        (current.join(touched, Seq("id"), "left_semi"),
          activity.join(touched, Seq("id"), "left_semi"))
    }

    val versions = BugHistory.reconstruct(curSel, actSel,
      singleFields, multiFields)
    EsSink.writeBulk(versions.withColumn("changes",
        to_json(col("changes"))), "snapshots", "snapshot_id", bulkOutDir)

    val stats = versions.agg(
      countDistinct("id").as("e"), count(lit(1)).as("v"),
      max("valid_from").as("m")).head()
    val newHighWater = if (stats.isNullAt(2)) lastRun.getOrElse(0L)
      else stats.getLong(2)
    if (readState(stateDir, "first_run_time").isEmpty)
      writeState(stateDir, "first_run_time", newHighWater)
    writeState(stateDir, "last_run_time", newHighWater)
    (RunReport(mode, stats.getLong(0), stats.getLong(1), newHighWater),
      versions)
  }

  /** [[run]] with the reference's privacy flow in front of it
    * (bz_etl.py:179-189 runs the private-bug deletion BEFORE the
    * re-ETL): entities in `nowPrivate` are excluded from both inputs
    * (never published), and every version document they WOULD have
    * published is written as a bulk DELETE action next to the run's
    * output — so an index that loaded earlier runs forgets them. The
    * delete-id space is recomputed from the full inputs, matching the
    * reference's conservative "ensure deleted" stance (it deletes by
    * bug id whether or not the doc is still indexed). */
  def runWithPrivacy(spark: SparkSession, current: DataFrame,
      activity: DataFrame, singleFields: Seq[String],
      multiFields: Seq[String], stateDir: String, bulkOutDir: String,
      nowPrivate: DataFrame): (RunReport, DataFrame) = {
    val privVersions = BugHistory.reconstruct(
      current.join(nowPrivate, Seq("id"), "left_semi"),
      activity.join(nowPrivate, Seq("id"), "left_semi"),
      singleFields, multiFields)
    EsSink.writeDeletes(privVersions.select(col("snapshot_id")),
      "snapshots", "snapshot_id", s"${bulkOutDir}_deletes")
    run(spark,
      current.join(nowPrivate, Seq("id"), "left_anti"),
      activity.join(nowPrivate, Seq("id"), "left_anti"),
      singleFields, multiFields, stateDir, bulkOutDir)
  }
}
