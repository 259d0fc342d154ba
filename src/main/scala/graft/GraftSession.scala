package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession builder shared by the driver mains and any
  * embedding application.
  *
  * Settings are the 100 TB defaults scaled to local mode: AQE with
  * skew-join splitting and partition coalescing (Spark 4 defaults,
  * asserted here so a misconfigured cluster profile can't silently
  * drop them), shuffle parallelism = core count locally (a cluster
  * deploy sets it to ~2-3x total executor cores), UTC session time
  * (oracle parity), and graft's native SQL functions registered. */
object GraftSession {

  /** Default to the machine's cores (capped at 32, the target local
    * profile) — a fixed small default silently benches a 32-core box
    * at local[4]. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)

  def local(nThreads: String = cpus): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$nThreads]")
      .config("spark.sql.shuffle.partitions", nThreads)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // allow co-partitioning on a SUBSET of the join keys: a table
      // bucketed on a scalar key (the d9 sketch store, entity-bucketed
      // history) can then feed a wider equi-join with zero exchange on
      // the stored side — with all-keys required (the default) Spark
      // reshuffles both sides and the bucketing buys nothing
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // getOrCreate can return a pre-existing session that never went
    // through the builder's extension hook
    if (!s.catalog.functionExists("minhash_sig"))
      GraftExtensions.installInto(s)
    s
  }
}
