package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned table layout — the output side of the scale story
  * (Bucketed covers the join side). The reference's incremental loop
  * is fundamentally time-windowed: every run touches "rows modified
  * since the cutoff" (bz_etl.py:172 incremental_etl), and analytical
  * reads are as-of or range queries over `valid_from`. Laying the
  * version store out as `dt=YYYY-MM-DD/` hive partitions turns those
  * windows into PARTITION PRUNING: a day's incremental read lists one
  * directory instead of scanning 100 TB — the scan's PartitionFilters
  * carry the predicate and untouched partitions are never opened.
  * Dynamic partition overwrite keeps incremental re-runs idempotent:
  * rewriting a touched day replaces exactly that directory.
  */
object Partitioned {

  /** Write `df` hive-partitioned by the day of `tsMillisCol`.
    * Partition column `dt` is derived, data columns are untouched. */
  def writeByDay(df: DataFrame, tsMillisCol: String, path: String): Unit =
    df.withColumn("dt",
        date_format(timestamp_millis(col(tsMillisCol)), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      // replace exactly the partitions present in df, not the table:
      // the idempotent-incremental contract (re-running a touched day
      // rewrites that day's directory and nothing else)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt")
      .parquet(path)

  def read(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  /** A day-window read: the `dt` predicate is a pure partition filter
    * — Spark prunes directories at planning time, opening no file
    * outside [fromDay, toDay]. */
  def readDays(s: SparkSession, path: String, fromDay: String,
      toDay: String): DataFrame =
    read(s, path).filter(col("dt") >= fromDay && col("dt") <= toDay)

  /** True when `df`'s executed plan pruned partitions: the scan's
    * PartitionFilters is non-empty (used by the spec/PlanAudit). */
  def partitionPruned(df: DataFrame): Boolean = {
    val ex = df.queryExecution.executedPlan.toString
    ex.contains("PartitionFilters: [") &&
      !ex.contains("PartitionFilters: []")
  }
}
