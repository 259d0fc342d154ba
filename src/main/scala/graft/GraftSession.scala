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
      // AQE's coalescing floor assumes partition BYTES ≈ partition
      // COST. The engine's verify stages (128-bit hamming per band
      // collision, exact cosine per candidate, per-(doc,term) BM25
      // scoring) run at single-digit MB/s per core, so the 1 MB
      // default floor folds them onto 1-4 tasks while 28 cores idle —
      // measured at sf0.1 (r15, interleaved isolated A/Bs): d13
      // 4.3→1.8 s, d4 1.7→1.4 s, t12 2.0→1.4-2.2 s from this floor
      // alone. 128 KB keeps each task ≥ tens of ms of work at those
      // stages' measured throughput (a 64 KB floor measured ~2 s
      // WORSE on x1, whose many-stage plans pay per-task plan
      // deserialization), and at cluster scale the floor is
      // irrelevant — advisoryPartitionSizeInBytes (64 MB default)
      // governs long before any partition shrinks toward it.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "128k")
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
