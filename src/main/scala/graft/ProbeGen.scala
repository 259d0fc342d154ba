package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Dev tool: build an N× scale probe dataset from a driver sf dir by
  * unioning shifted replicas — ENTITY IDS are offset per replica so
  * entity counts, join fan-outs, and history lengths scale the way a
  * genuinely bigger corpus would (dims region/nation stay fixed).
  * Text/embedding payloads are copied verbatim, so near-dup pair
  * queries (d2/d3/d4/d5) see every replica as an exact duplicate and
  * their TRUE answer grows quadratically — run d1 first (the
  * pipeline rule from SURVEY §4a) or exclude them via
  * SPARK_GRAFT_EXCLUDE when probing.
  *
  * MUTATE mode (4th arg "mutate") makes the near-dup family probeable:
  * replica i of a document mutates the tokens at positions p with
  * hash(doc, p) mod 1000 < i·80 (NESTED mutation sets, so replicas i
  * and j differ in exactly |i−j|·8% of tokens — each replica is a
  * near-dup of its chain NEIGHBORS only, and the true pair answer
  * grows LINEARLY in copies instead of quadratically); replica i of
  * an embedding drifts by i·0.25 along a fixed per-(vec, dim)
  * direction, the same bounded-degree chain in cosine space. Step
  * sizes are tuned so each operator's chain degree is ~2-3 at its
  * own threshold — true answers grow linearly with a SMALL constant
  * (weaker steps measured answer-size-bound superlinear walls). Exact
  * replicas (the default) stay for the non-near-dup family, whose
  * history/join fan-outs they scale correctly.
  *
  * An optional 5th arg overrides the embedding drift step (default
  * 0.25 — adversarial chains for the dedup family). A SMALL step
  * (e.g. 0.02) keeps every replica inside its original's cosine
  * neighborhood: the corpus becomes an ORGANIC-density cloud at N×
  * scale where replicas ARE legitimate near neighbors — the missing
  * walkable-topology cell for the walk-recall table (drift chains
  * answer "what if the corpus is dup-polluted"; jitter answers
  * "does walk recall hold on a navigable corpus 30× bigger").
  *
  * Usage: runMain graft.ProbeGen <srcSfDir> <outDir> <copies>
  *   [mutate [driftStep]]
  */
object ProbeGen {

  /** The shared probe MEASUREMENT KIT (r13 #7 / r15 #5): timing,
    * plan-executing counts, recall, waves, temp roots — the helpers
    * every campaign uses, defined ONCE so a campaign in
    * [[graft.tools.Probe]] is a row over these, not a re-implemented
    * block. */
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** executedPlan.execute().count(), NOT df.count(): a bare count
    * lets Catalyst PRUNE windows that don't change row count (h1/h11
    * timed vacuously — the whale's single-task sort never ran);
    * executing the final plan pays every column. */
  def planCount(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.execute().count()

  /** A registered query, full-plan executed. */
  def runQ(s: org.apache.spark.sql.SparkSession, dir: String,
      q: String): Long = planCount(graft.SparkEntry.queries(q)(s, dir))

  /** The cold-then-warm timing pair every wall table reports. */
  def coldWarm(name: String)(f: => Long): Unit = {
    time(s"$name cold") { f }; time(s"$name warm") { f }
    ()
  }

  /** recall@k of `df`'s (q_id, c_id) rows against an exact truth
    * frame of the same shape. */
  def recallOf(exact: org.apache.spark.sql.DataFrame,
      df: org.apache.spark.sql.DataFrame): Double =
    exact.join(df.select("q_id", "c_id"), Seq("q_id", "c_id"),
      "left_semi").count().toDouble / exact.count()

  /** Replica-index wave split (whaleEvents/main shift ids by 10M per
    * replica). */
  def waveOf(df: org.apache.spark.sql.DataFrame, idCol: String,
      w: Int, waves: Int = 3): org.apache.spark.sql.DataFrame =
    df.filter(expr(s"($idCol div 10000000) % $waves = $w"))

  def probeRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Build-if-absent WHALE events corpus at `m` × sf0.1's 100k rows
    * with ONE entity holding 20% of every corpus — the PROBE_ETLSKEW
    * churn-skew protocol (sf0.1's own max entity is 99 rows; organic
    * replication never exercises the skew). Shared by the ETL and
    * streaming skew campaigns; returns the corpus dir. */
  def whaleEvents(spark: org.apache.spark.sql.SparkSession,
      m: Int): String = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime * 1000L // µs
    val n = 100000L * m
    val dir = s"/tmp/probe_etlskew_${m}x"
    if (!new java.io.File(s"$dir/events.parquet").exists()) {
      val nUsers = 1500L * m
      val types = array(lit("signup"), lit("click"), lit("error"),
        lit("view"), lit("purchase"))
      spark.range(n).select(
          col("id").as("event_id"),
          timestamp_micros(lit(base) + col("id") * lit(1000000L))
            .as("ts"),
          // whale: every 5th row (20% of the corpus) is entity 0
          when(pmod(xxhash64(col("id"), lit(7)), lit(5)) === 0, 0L)
            .otherwise(pmod(xxhash64(col("id"), lit(11)), lit(nUsers)))
            .as("user_id"),
          element_at(types,
            (pmod(xxhash64(col("id"), lit(13)), lit(5)) + 1)
              .cast("int")).as("event_type"),
          round(pmod(xxhash64(col("id"), lit(17)), lit(20000))
            / 100.0, 2).as("value"),
          concat(lit("{\"k\": "),
            pmod(xxhash64(col("id"), lit(19)), lit(100)),
            lit("}")).as("props"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val (src, out, copies, mutate, driftStep) = args match {
      case Array(s, o, c)      => (s, o, c.toInt, false, 0.25)
      case Array(s, o, c, "mutate") => (s, o, c.toInt, true, 0.25)
      case Array(s, o, c, "mutate", d) => (s, o, c.toInt, true, d.toDouble)
      case _ =>
        System.err.println(
          "usage: runMain graft.ProbeGen <srcSfDir> <outDir> <copies> " +
            "[mutate [driftStep]]")
        sys.exit(2)
    }
    val spark = GraftSession.local()

    // raw load (no ts normalization) so written columns keep their
    // on-disk types; events.ts lands as plain INT64 nanos, which the
    // Tables loader handles identically
    def replicate(table: String, shifts: Map[String, Long]): Unit = {
      val base = Tables.load(spark, src, table)
      val reps = (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, unit)) =>
          df.withColumn(c, col(c) + lit(i * unit))
        }
      }
      reps.reduce(_.unionAll(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")
    }
    def copyOnce(table: String): Unit =
      Tables.load(spark, src, table)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")

    copyOnce("region"); copyOnce("nation")
    replicate("customer", Map("c_custkey" -> 10000000L))
    replicate("supplier", Map("s_suppkey" -> 10000000L))
    replicate("part", Map("p_partkey" -> 10000000L))
    replicate("orders", Map("o_orderkey" -> 100000000L,
      "o_custkey" -> 10000000L))
    replicate("lineitem", Map("l_orderkey" -> 100000000L,
      "l_partkey" -> 10000000L, "l_suppkey" -> 10000000L))
    replicate("events", Map("event_id" -> 1000000000L,
      "user_id" -> 1000000L))
    if (!mutate) {
      replicate("documents", Map("doc_id" -> 10000000L))
      replicate("embeddings", Map("vec_id" -> 10000000L))
    } else {
      // nested token mutation keyed on the ORIGINAL doc_id (so the
      // mutated position sets align across replicas), then id shift
      val docs = Tables.load(spark, src, "documents")
      (0 until copies).map { i =>
        val mutated =
          if (i == 0) docs
          else docs.withColumn("text",
            when(col("text").isNotNull, concat_ws(" ",
              transform(split(col("text"), " "), (t, p) =>
                when(pmod(xxhash64(col("doc_id"), p), lit(1000))
                    < lit(math.min(i * 80, 1000)),
                  // replacement keyed on (doc, position): replicas of
                  // the SAME doc share it (chain-consistent), distinct
                  // docs never do — mutation noise must not create
                  // cross-document similarity
                  concat(lit("m"),
                    pmod(xxhash64(col("doc_id"), p, lit(7)), lit(99991))))
                  .otherwise(t))))
              .otherwise(col("text")))
            .withColumn("n_chars",
              coalesce(length(col("text")).cast("long"), lit(0L)))
        mutated.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      }.reduce(_.unionAll(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
      // fixed per-(vec, dim) drift direction, magnitude i * driftStep
      val embs = Tables.load(spark, src, "embeddings")
      (0 until copies).map { i =>
        val drifted =
          if (i == 0) embs
          else embs.withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              (x + (pmod(xxhash64(col("vec_id"), j), lit(2001))
                .cast("double") / 1000.0 - 1.0) * lit(i * driftStep))
                .cast("float")))
        drifted.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
      }.reduce(_.unionAll(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    }
    spark.stop()
  }
}
