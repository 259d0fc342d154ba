package graft.etl

import graft.sources.EsSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental index-to-index replication — the reference's
  * replicate.py copies documents from a source ES cluster to a
  * destination with a time-window high-water mark (reference:
  * bugzilla_etl/replicate.py:165 replicate, :68 get_last_updated:
  * resume from `max(modified_ts)` on the destination, minus a safety
  * lookback).
  *
  * Zero-egress analogue: source = any DataFrame with a `modified_ts`
  * (epoch-ms) column; destination = an ES bulk ndjson directory per
  * run plus a persisted `last_updated` state file. Each run copies
  * only rows with `modified_ts >= last_updated - lookback` — the scan
  * prunes on the pushed ts predicate, so an incremental run reads a
  * sliver of the corpus regardless of total size. The spec proves
  * split-run ≡ one-shot copy over the same data.
  */
object Replicate {

  case class CopyReport(copied: Long, newHighWater: Long)

  /** One replication run.
    * @param docs     source documents; must carry `idCol` and
    *                 `modified_ts` (epoch ms)
    * @param lookback re-copy window (the reference subtracts a day to
    *                 tolerate clock skew; copies are idempotent by _id)
    * @return rows copied + the new high-water mark */
  def run(spark: SparkSession, docs: DataFrame, idCol: String,
      stateDir: String, outDir: String, lookback: Long = 0L): CopyReport = {
    val last = EtlRunner.readState(stateDir, "last_updated")
    val window = last match {
      case None => docs
      case Some(hw) => docs.filter(col("modified_ts") >= hw - lookback)
    }
    val stats = window.agg(count(lit(1)).as("n"), max("modified_ts").as("m"))
      .head()
    val copied = stats.getLong(0)
    if (copied > 0) {
      EsSink.writeBulk(window, "replica", idCol,
        s"$outDir/run_${last.getOrElse(0L)}")
      val hw = stats.getLong(1) + 1 // window is inclusive-resume
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stateDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(stateDir, "last_updated"), hw.toString)
      CopyReport(copied, hw)
    } else CopyReport(0L, last.getOrElse(0L))
  }
}
