package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}

/** Scratch profiling harness (not part of the driver contract):
  * times stages of the heavy component queries to locate latency.
  * Broadcast hints here build query frames / the entry atlas only
  * (see Similarity's boundedness ledger) — measurement tooling, not
  * a registered hot path. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val cpusStr = GraftSession.cpus
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.ProbeGen.{time, planCount, runQ, coldWarm, recallOf,
      waveOf, probeRoot}
    // r11 (VERDICT #4): recall FLOORS as probe-mode assertions — a
    // graph/atlas change that silently costs recall now FAILS the
    // probe run loudly, the way plan contracts guard shuffles.
    // PROBE_RECALL_FLOORS="s15=0.8,s16=0.6" keys on the recall
    // line's name; unset = report-only (the floors are per-corpus
    // facts — organic sf0.1 vs mutated drift have different
    // ceilings — so the campaign runner sets them per corpus).
    val recallFloors: Map[String, Double] =
      sys.env.get("PROBE_RECALL_FLOORS").map(_.split(",").map { kv =>
        val Array(k, v) = kv.split("="); k -> v.toDouble
      }.toMap).getOrElse(Map.empty)
    def assertFloor(name: String, r: Double): Unit =
      recallFloors.get(name).foreach { f =>
        require(r >= f,
          f"recall floor broken: $name measured $r%.3f < floor $f%.2f")
      }
    // the recall wall row every walk campaign prints (label suffix is
    // the only per-campaign variation); floors apply when set
    def recallRow(exact: org.apache.spark.sql.DataFrame, suffix: String)(
        name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val r = time(s"$name run") { recallOf(exact, df) }
      println(f"[probe]   $name $suffix: $r%.2f")
      assertFloor(name, r)
    }
    // generic mode: PROBE_QUERIES=name1,name2 times each registered
    // query (cold, then warm) on SPARK_GRAFT_SF_DIR
    sys.env.get("PROBE_QUERIES").foreach { qs =>
      Tables.documents(spark, d).count()
      Tables.embeddings(spark, d).count()
      qs.split(",").foreach { name =>
        coldWarm(name) { graft.SparkEntry.queries(name)(spark, d).count() }
      }
      spark.stop(); return
    }

    // ETL/history skewed-churn probe (r13, VERDICT #5): the one
    // operator family never walked at a mutated 100× — b1/b2/b4/h1/
    // h11 are per-entity folds (windows partitioned by id) whose
    // worst case is CHURN SKEW: one entity carrying a large share of
    // all activity serializes into one task. PROBE_ETLSKEW="10,30,100"
    // synthesizes events corpora at those multiples of sf0.1's 100k
    // rows with a WHALE entity holding 20% of every corpus (sf0.1's
    // own max entity is 99 rows — organic replication would never
    // exercise the skew), then times the family cold + warm.
    sys.env.get("PROBE_ETLSKEW").foreach { ms =>
      ms.split(",").map(_.trim.toInt).foreach { m =>
        val dir = graft.ProbeGen.whaleEvents(spark, m)
        Tables.events(spark, dir).count() // warm listing/footer cache
        val qs = sys.env.get("PROBE_ETLSKEW_QUERIES")
          .map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Seq("h1_snapshot_history", "h11_sessionize",
            "b1_bug_history", "b2_nested_history",
            "b4_consistency_report"))
        qs.foreach(q => coldWarm(s"$q ${m}x") { runQ(spark, dir, q) })
      }
      spark.stop(); return
    }

    // b3 + STREAMING history forms under CHURN SKEW (r13 verdict #6):
    // reuses the PROBE_ETLSKEW whale corpora (run that first).
    // PROBE_STREAMSKEW="10,30" times, per multiple:
    //  - registered b3 (whale story grows per view ⇒ the TRUE answer
    //    is quadratic in whale churn — expect output-bound walls);
    //  - a BOUNDED-story diff replay (every diff rewrites line 1), so
    //    the fold/sort machinery is measured separately from answer
    //    growth;
    //  - one AvailableNow batch of versionHistory / sessionize /
    //    ConsistencyMonitor.multiValueProblems — the per-batch
    //    sort-within-group (and rows.toSeq heap-buffer) cost of the
    //    flatMapGroupsWithState forms under a whale group.
    sys.env.get("PROBE_STREAMSKEW").foreach { ms =>
      import spark.implicits._
      import org.apache.spark.sql.streaming.Trigger
      import org.apache.spark.sql.{DataFrame, Dataset, Row}
      ms.split(",").map(_.trim.toInt).foreach { m =>
        val dir = graft.ProbeGen.whaleEvents(spark, m)
        Tables.events(spark, dir).count()
        if (!sys.env.contains("PROBE_STREAMSKEW_SKIP_B3"))
          coldWarm(s"b3 registered ${m}x") {
            runQ(spark, dir, "b3_diff_history") }
        // bounded-story replay: same row volume, constant story size
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("ts", "event_id")
        val bounded = Tables.events(spark, dir)
          .filter(col("event_type") === "view")
          .select(col("user_id").as("id"), unix_millis(col("ts")).as("ts"),
            col("event_id"))
          .withColumn("first_ev", row_number().over(w) === 1)
          .select(col("id"), col("ts"), col("event_id"),
            when(col("first_ev"), concat(lit("@@ -1,0 +1,1 @@\n+v="),
              col("event_id")))
              .otherwise(concat(lit("@@ -1,1 +1,1 @@\n-\n+v="),
                col("event_id"))).as("diff"))
        time(s"b3 BOUNDED-story replay ${m}x") {
          graft.operators.DiffHistory.replay(
              bounded.as[graft.operators.DiffHistory.DiffEv])
            .queryExecution.executedPlan.execute().count()
        }
        def onebatch(name: String)(mk: DataFrame => DataFrame): Unit = {
          val stream = spark.readStream
            .schema(graft.streaming.EventStream.eventSchema)
            .parquet(s"$dir/events.parquet")
          time(s"$name ${m}x one-batch") {
            val q = mk(stream).writeStream.outputMode("append")
              .foreachBatch((b: Dataset[Row], _: Long) => { b.count(); () })
              .trigger(Trigger.AvailableNow()).start()
            q.processAllAvailable(); q.stop()
          }
        }
        // skip the stateful one-batch rows when probing the FOLDED
        // forms at a small heap: the stateful trio's whale buffer is
        // exactly what would OOM first and kill the run
        if (!sys.env.contains("PROBE_STREAMSKEW_SKIP_STATEFUL")) {
        onebatch("versionHistory") { st =>
          graft.streaming.EventStream.versionHistory(
            st.select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
              .as[graft.streaming.EventStream.EvFull]).toDF()
        }
        onebatch("sessionize") { st =>
          graft.streaming.EventStream.sessionize(
            st.select(col("event_id"), col("ts"), col("user_id"))
              .as[graft.streaming.EventStream.Ev]).toDF()
        }
        onebatch("consistency multiValue") { st =>
          graft.streaming.ConsistencyMonitor.multiValueProblems(
            st.filter(col("event_type").isin("click", "error"))
              .select(col("user_id").as("id"), col("ts"), col("event_id"),
                lit("cc").as("field"),
                when(col("event_type") === "click", lit("add"))
                  .otherwise(lit("remove")).as("op"),
                get_json_object(col("props"), "$.k").as("item"))
              .as[graft.streaming.ConsistencyMonitor.MvOp]).toDF()
        }
        }
        // FOLDED per-batch forms (r14 verdict #1): the distributed
        // pre-fold replaces the flatMapGroupsWithState per-group heap
        // buffer — the whale batch runs through spillable entity
        // windows (segment-folded), so these rows complete at a small
        // heap (run the probe JVM at -Xmx4g) where the stateful rows
        // above need the whale batch resident per task
        val esfRoot = probeRoot("graft_esf_probe")
        val evB = Tables.events(spark, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        time(s"versionFold ${m}x one-batch") {
          graft.streaming.EventStreamFold
            .versionStep(s"$esfRoot/v$m", 0L, evB).count()
        }
        time(s"sessionFold ${m}x one-batch") {
          graft.streaming.EventStreamFold
            .sessionStep(s"$esfRoot/s$m", 0L, evB).count()
        }
        time(s"privacyFold ${m}x one-batch") {
          graft.streaming.EventStreamFold
            .privacyStep(s"$esfRoot/p$m", 0L, evB).count()
        }
      }
      spark.stop(); return
    }

    // b1 per-family DECOMPOSITION (r14): time reconstruct with each
    // field family alone on SPARK_GRAFT_SF_DIR — locates which family
    // carries a churn-skew wall (the AQE stage names are anonymous).
    if (sys.env.get("PROBE_B1DECOMP").contains("1")) {
      import graft.operators.{BugHistory, HistoryDriver}
      Tables.events(spark, d).count()
      val (current, activity, segB) = HistoryDriver.b1Parts(spark, d)
      def ex(df: org.apache.spark.sql.DataFrame) = planCount(df)
      (1 to 2).foreach { i =>
        time(s"shaping (activity count) #$i") { activity.count() }
        time(s"timeline+changes only #$i") {
          ex(BugHistory.reconstruct(current, activity, Nil, Nil,
            Seq("summary"), segB)) }
        time(s"singles only #$i") {
          ex(BugHistory.reconstruct(current, activity,
            Seq("status", "owner", "summary"), Nil, Seq("summary"), segB)) }
        time(s"multis only #$i") {
          ex(BugHistory.reconstruct(current, activity, Nil, Seq("cc"),
            Seq("summary"), segB)) }
        // r15 (verdict #7): the run-length membership variant — same
        // presence intervals, O(churn) output instead of the full
        // form's versions × live items cells
        time(s"multis INTERVAL variant #$i") {
          ex(BugHistory.membershipIntervals(current, activity,
            Seq("cc"), Seq("summary"), segB)) }
        time(s"full #$i") {
          ex(BugHistory.reconstruct(current, activity,
            Seq("status", "owner", "summary"), Seq("cc"),
            Seq("summary"), segB)) }
      }
      spark.stop(); return
    }

    // b2 NEST-stage decomposition (r15, verdict #3): attribute b2's
    // wall between its three composition stages — the b1 parent
    // reconstruct, the sub-entity reconstruct (cid-keyed, own fold
    // gate), and the nest itself (as-of merge scan + sorted struct
    // collect) — on SPARK_GRAFT_SF_DIR (point it at a whale corpus
    // for the ladder row).
    if (sys.env.get("PROBE_B2DECOMP").contains("1")) {
      import graft.operators.{BugHistory, HistoryDriver}
      Tables.events(spark, d).count()
      (1 to 2).foreach { i =>
        val (parents, subVersions) = HistoryDriver.b2Parts(spark, d)
        time(s"parents (b1 versions) #$i") { planCount(parents) }
        time(s"subVersions #$i") { planCount(subVersions) }
        // nest in ISOLATION: both inputs pre-materialized, so the
        // timed region is the as-of expansion + struct collect only
        val pC = parents.localCheckpoint(true)
        val sC = subVersions.localCheckpoint(true)
        time(s"nest only (as-of + collect) #$i") {
          planCount(BugHistory.nestSubEntities(pC, sC,
            Seq("size", "is_patch_raw", "mimetype"))) }
        time(s"b2 full #$i") { runQ(spark, d, "b2_nested_history") }
      }
      spark.stop(); return
    }

    // walk checkpoint-fusion A/B (r15, verdict #6): the stored
    // hierarchical walks spend their 1× wall on per-round eager
    // checkpoint jobs. PROBE_WALKCP="1,2" times the registered
    // s16/x5/s15-family walks at each cpEvery (1 = the shipped
    // per-round policy, N = fuse N rounds lazily before
    // materializing). Ship a default change ONLY if measured faster.
    sys.env.get("PROBE_WALKCP").foreach { ns =>
      Tables.embeddings(spark, d).count()
      Seq("s16_hnsw", "x5_survivor_hnsw", "s15_graph_search",
        "x2_dedup_index").foreach { q =>
        runQ(spark, d, q) // ensure-build + warm outside the timed region
        ns.split(",").map(_.trim).foreach { n =>
          spark.conf.set("spark.graft.walk.cpEvery", n)
          time(s"$q cpEvery=$n run1") { runQ(spark, d, q) }
          time(s"$q cpEvery=$n run2") { runQ(spark, d, q) }
        }
        spark.conf.unset("spark.graft.walk.cpEvery")
      }
      spark.stop(); return
    }

    // m6 verdict-form A/B (r12): per-doc gram counts via window vs a
    // plain (unhinted) count-frame join — both 100TB-legal (no
    // explicit corpus broadcast); pick by measurement on one box
    if (sys.env.get("PROBE_M6FORM").contains("1")) {
      import graft.multimodal.Multimodal
      import org.apache.spark.sql.expressions.Window
      Tables.documents(spark, d).count()
      val grams = Multimodal.m6Grams(spark, d)
      def joinForm() = {
        val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("ng"))
        grams.as("a")
          .join(grams.as("b"),
            col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
          .agg(count(lit(1)).as("n_common"))
          .join(sizes.select(col("doc_id").as("doc1"),
            col("ng").as("na")), Seq("doc1"))
          .join(sizes.select(col("doc_id").as("doc2"),
            col("ng").as("nb")), Seq("doc2"))
          .select(col("doc1"), col("doc2"),
            col("n_common").cast("long").as("n_common"),
            (col("na") + col("nb") - col("n_common")).cast("long")
              .as("n_union"))
          .filter(col("n_common") * 2 >= col("n_union"))
          .orderBy("doc1", "doc2")
      }
      (1 to 2).foreach { i =>
        time(s"m6 window form #$i") {
          Multimodal.m6PairsFromGrams(grams).count()
        }
        time(s"m6 plain-join form #$i") { joinForm().count() }
      }
      // full-query checkpoint A/B: the gram self-join's two sides are
      // canonically equal, so WITHOUT the checkpoint Catalyst may
      // reuse one exchange and the decode runs once anyway
      (1 to 2).foreach { i =>
        time(s"m6 FULL with gram checkpoint #$i") {
          Multimodal.m6FrameDedup(spark, d).count()
        }
        time(s"m6 FULL recompute grams #$i") {
          Multimodal.m6PairsFromGrams(
            Multimodal.m6GramsNoCheckpoint(spark, d)).count()
        }
      }
      spark.stop(); return
    }

    // d11 checkpoint-vs-recompute A/B (r12) — the registered form
    // checkpoints cb/bb ("measured faster than recompute" pre-width-
    // law); re-measure now that the widened keys ride the frames
    if (sys.env.get("PROBE_D11FORM").contains("1")) {
      import graft.dedup.Dedup
      Tables.documents(spark, d).count()
      (1 to 2).foreach { i =>
        time(s"d11 checkpointed bands #$i") {
          Dedup.d11Body(spark, d, checkpoint = true).count()
        }
        time(s"d11 recompute bands #$i") {
          Dedup.d11Body(spark, d, checkpoint = false).count()
        }
      }
      spark.stop(); return
    }

    // x3 checkpoint-vs-recompute A/B (r12): are the three eager
    // wave-band checkpoints (multi-consumer rule) worth their
    // materialization at probe scale, or does recompute win (the d13
    // standalone-pipeline lesson)?
    if (sys.env.get("PROBE_X3FORM").contains("1")) {
      import graft.dedup.Dedup
      Tables.documents(spark, d).count()
      val docs = Tables.documents(spark, d)
      def run(checkpoint: Boolean): Long = {
        val x = Dedup.extraRowsFor(
          docs.filter(col("text").isNotNull).count())
        val waves = (0 until 3).map { i =>
          val b = Dedup.mhBands(docs.filter(col("doc_id") % 3 === i))
          if (checkpoint) b.localCheckpoint(true) else b
        }
        var store = waves(0)
        var pairs = Dedup.pairsFromBands(waves(0), x)
        for (i <- 1 until 3) {
          pairs = pairs.union(Dedup.pairsFromBands(waves(i), x))
            .union(Dedup.incrementalPairs(waves(i), store, x))
          store = store.union(waves(i))
        }
        pairs.groupBy("id1", "id2")
          .agg(max("jaccard_est").as("jaccard_est")).count()
      }
      (1 to 2).foreach { r =>
        time(s"x3 WITH band checkpoints #$r") { run(true) }
        time(s"x3 RECOMPUTE bands #$r") { run(false) }
      }
      spark.stop(); return
    }

    // seed-width sweep (r12): the walk ladder's LSH seed uses a fixed
    // 4-plane bucket — 5/16 of the corpus exact-scored per query, the
    // last corpus-proportional CONSTANT in the walk tier. Sweep plane
    // counts at probe scale: seed fraction + walk recall@5 vs exact.
    if (sys.env.get("PROBE_SEEDWIDTH").contains("1")) {
      import graft.similarity.Similarity
      import graft.functions.{VectorFunctions => V}
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cv = emb.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val graph = Similarity.searchGraph(spark, d, 16)
        .select("vec_id", "nbr").localCheckpoint(true)
      val exact = Similarity.s1AnnBruteForce(spark, d)
        .select("q_id", "c_id").localCheckpoint(true)
      val ne = exact.count(); val nc = cv.count(); val nq = q.count()
      Seq(4, 5, 6, 7, 8).foreach { p =>
        val dim = 64
        val qb = q.withColumn("b0",
            V.signSig(V.asDouble(col("q_emb")), 0, p, dim))
          .select(col("q_id"), explode(array((col("b0") +:
            (0 until p).map(j => col("b0").bitwiseXOR(lit(1L << j)))): _*))
            .as("bucket"))
        val frac = cv.withColumn("bucket",
            V.signSig(V.asDouble(col("c_emb")), 0, p, dim))
          .join(broadcast(qb), Seq("bucket")).count().toDouble / (nc * nq)
        val walk = time(s"walk p=$p") {
          Similarity.s15WalkQC(q, cv, graph, 5, 12, 3, p)
            .select("q_id", "c_id").localCheckpoint(true)
        }
        val r = exact.join(walk, Seq("q_id", "c_id"), "left_semi")
          .count().toDouble / ne
        val seedR = {
          val s = Similarity.lshShortlistQC(q, cv, 5, p)
          exact.join(s.select("q_id", "c_id"), Seq("q_id", "c_id"),
            "left_semi").count().toDouble / ne
        }
        println(f"[probe]   p=$p seed-frac $frac%.3f  walk recall@5 " +
          f"$r%.2f  seed-only recall@5 $seedR%.2f")
      }
      spark.stop(); return
    }

    // r1 dense-arm |Q|-scaling (r12): the exact arm is ONE corpus
    // scan at |Q|·d flops/row — its wall grows with the query batch
    // — while the walk's rounds are query-proportional over graph
    // rows. Measure both arms at growing |Q| to quantify the
    // crossover in the WORKLOAD dimension.
    if (sys.env.get("PROBE_R1QSCALE").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d)
      val cvF = emb.filter(col("vec_id") % 97 =!= 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val allQ = emb.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        .orderBy("q_id").localCheckpoint(true)
      val g = spark.read.parquet(Similarity.r1EnsureStore(spark, d))
        .select("vec_id", "nbr").localCheckpoint(true)
      Seq(8, 32, 128, 512).foreach { nq =>
        val qN = allQ.limit(nq).localCheckpoint(true)
        val realQ = qN.count()
        time(f"exact arm |Q|=$realQ%4d") {
          cvF.join(broadcast(qN))
            .withColumn("cos3", round(graft.functions.VectorFunctions
              .cosine(col("q_emb"), col("c_emb")), 3))
            .withColumn("rk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("q_id")
                .orderBy(col("cos3").desc, col("c_id").asc)))
            .filter(col("rk") <= 20).count()
        }
        time(f"walk arm  |Q|=$realQ%4d") {
          Similarity.s15WalkQC(qN, cvF, g, 20, 12, 3).count()
        }
      }
      spark.stop(); return
    }

    // r1 lexical-arm store A/B (r13, VERDICT #4): the inline BM25 arm
    // (corpus tokenize + tf/df/dl + score) vs the stored arm (score
    // over the persisted weight frame) at the r1 query protocol's
    // workload points. Measure BEFORE registering: on this corpus's
    // 31-term vocabulary the Σ df·qf scoring join is the wall, so the
    // store's win is the weight-build share — expect it at large
    // corpora (run with SPARK_GRAFT_SF_DIR=/tmp/probe100m).
    if (sys.env.get("PROBE_R1LEX").contains("1")) {
      import graft.similarity.Similarity
      Tables.documents(spark, d).count()
      time("lex store build (once)") {
        Similarity.r1EnsureLexStore(spark, d)
      }
      Seq(97L * 64, Long.MaxValue).foreach { qb =>
        val tag = if (qb == Long.MaxValue) "all" else "64"
        coldWarm(s"inline arm |Q|=$tag") {
          graft.text.TextAnalysis.t12Bm25(spark, d, 20, qb).count() }
        coldWarm(s"stored arm |Q|=$tag") {
          Similarity.t12Bm25Stored(spark, d, 20, qb).count() }
      }
      spark.stop(); return
    }

    // r1-prod arm profile (r12): where does the fused wall go —
    // seed scoring volume, walk rounds, BM25 arm, binary arm?
    if (sys.env.get("PROBE_R1PROF").contains("1")) {
      import graft.similarity.Similarity
      Tables.documents(spark, d).count()
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d)
      val qv = Tables.documents(spark, d)
        .filter(col("doc_id") % 97 === 0 && col("doc_id") < 97L * 64)
        .select(col("doc_id").as("q_id"))
        .join(emb.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb")), Seq("q_id"))
      val cv = emb.filter(col("vec_id") % 97 =!= 0)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val seedRows = time("seed: scored candidate volume") {
        Similarity.lshShortlistQC(qv, cv, 12)
          .queryExecution.executedPlan // plan only
        // count the PRE-cut scored rows: corpus rows landing in any
        // probed bucket (what the seed exact-scores)
        val dim = 64; val planes = 4
        import graft.functions.{VectorFunctions => V}
        val qb = qv.withColumn("b0",
          V.signSig(V.asDouble(col("q_emb")), 0, planes, dim))
          .select(col("q_id"), explode(array((col("b0") +:
            (0 until planes).map(j => col("b0").bitwiseXOR(lit(1L << j)))): _*))
            .as("bucket"))
        cv.withColumn("bucket",
            V.signSig(V.asDouble(col("c_emb")), 0, planes, dim))
          .join(broadcast(qb), Seq("bucket")).count()
      }
      val nc = cv.count(); val nq = qv.count()
      println(s"[probe]   seed scores $seedRows rows = " +
        f"${seedRows.toDouble / (nc * nq)}%.3f of |Q|x|C| (=${nc * nq})")
      time("seed only (beam 12)") {
        Similarity.lshShortlistQC(qv, cv, 12).count()
      }
      time("bm25 arm") {
        graft.text.TextAnalysis.t12Bm25(spark, d, 20, 97L * 64).count()
      }
      time("walk dense arm (incl. store read, excl. build)") {
        Similarity.r1EnsureStore(spark, d)
        val g = spark.read.parquet(Similarity.r1EnsureStore(spark, d))
          .select("vec_id", "nbr").localCheckpoint(true)
        Similarity.s15WalkQC(qv, cv, g, 20, 12, 3).count()
      }
      time("full r1_rrf_prod warm") {
        Similarity.r1RrfProd(spark, d).count()
      }
      time("full r1_rrf_fusion (exact) warm") {
        Similarity.r1RrfFusion(spark, d).count()
      }
      spark.stop(); return
    }

    // d3 width sweep: wall + output per extra-bit width on one corpus
    sys.env.get("PROBE_D3WIDTH").foreach { xs =>
      import graft.dedup.Dedup
      Tables.documents(spark, d).count()
      xs.split(",").map(_.toInt).foreach { x =>
        val out = time(s"d3 x=$x") {
          Dedup.d3Simhash(spark, d, extraBits = x).count()
        }
        println(s"[probe]   x=$x output pairs: $out")
      }
      spark.stop(); return
    }

    // m5 width sweep: wall + output per extra-bit width on one corpus
    sys.env.get("PROBE_M5WIDTH").foreach { xs =>
      import graft.multimodal.Multimodal
      Tables.documents(spark, d).count()
      xs.split(",").map(_.toInt).foreach { x =>
        val out = time(s"m5 x=$x") {
          Multimodal.m5PhashDedup(spark, d, extraBits = x).count()
        }
        println(s"[probe]   x=$x output pairs: $out")
      }
      spark.stop(); return
    }

    // d2 width diagnostic: candidate (join-output) volume and true
    // output rows per width x — separates bucket-collision cost a
    // width law CAN remove from true-pair volume it cannot
    if (sys.env.get("PROBE_D2DIAG").contains("1")) {
      import graft.dedup.Dedup
      val docs = Tables.documents(spark, d)
      println(s"[probe] docs ${docs.filter(col("text").isNotNull).count()}")
      (Seq(0, 2, 3, 4)).foreach { x =>
        val out = time(s"d2 pairs x=$x") {
          Dedup.minhashPairs(docs, extraRows = x).count()
        }
        println(s"[probe]   x=$x output pairs: $out")
      }
      spark.stop(); return
    }

    // d2/d17 width law (r11): PROBE_D2WIDTH=0 times the FIXED-width
    // forms (pre-law), PROBE_D2WIDTH=law the width-law forms — run
    // each in its own JVM (the one-JVM inflation rule) for the
    // before/after wall at each probe scale
    sys.env.get("PROBE_D2WIDTH").foreach { mode =>
      import graft.dedup.Dedup
      Tables.documents(spark, d).count()
      val docs = Tables.documents(spark, d)
      if (mode == "0") {
        coldWarm("d2 pairs FIXED width") {
          Dedup.minhashPairs(docs, extraRows = 0).count() }
        time("d17 chunk FIXED width cold") {
          Dedup.pairsFromBands(
            Dedup.mhBands(Dedup.chunkFrame(docs, 64, 48)), 0).count()
        }
      } else {
        coldWarm("d2 pairs width-law") { Dedup.minhashPairs(docs).count() }
        time("d17 chunk width-law cold") {
          Dedup.chunkDedupFrame(docs, 64, 48).count()
        }
      }
      spark.stop(); return
    }

    // d5 banding selectivity knob: time the pair stage at the default
    // (32, r=3) vs the selective production setting (32, r=12) on the
    // same data — the §4a measurement behind the selectivity law
    if (sys.env.get("PROBE_D5KNOB").exists(Set("1", "2"))) {
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d)
      if (sys.env.get("PROBE_D5KNOB").contains("1"))
        coldWarm("d5 pairs (32, r=3)") {
          graft.dedup.Dedup.embeddingPairsFrame(emb).count() }
      coldWarm("d5 pairs (32, r=12)") {
        graft.dedup.Dedup.embeddingPairsFrame(emb, 32, 12).count() }
      spark.stop(); return
    }

    // s15 search-graph band-width knob: the cross-label index BUILD
    // at default 8-bit vs 12-bit bands (the log n selectivity dial)
    if (sys.env.get("PROBE_S15KNOB").contains("1")) {
      Tables.embeddings(spark, d).count()
      time("searchGraph 8-bit build cold") {
        graft.similarity.Similarity.searchGraph(spark, d, 16).count()
      }
      time("searchGraph 12-bit build cold") {
        graft.similarity.Similarity.searchGraph(spark, d, 16, bits = 12)
          .count()
      }
      spark.stop(); return
    }

    // the multi-probe cell knob: d5-prod at probes=1 vs probes=2 —
    // the recall lever's measured COST curve (recall itself is the
    // SemDedupProdSpec measurement against the exact sf0.001 answer)
    if (sys.env.get("PROBE_MULTIPROBE").contains("1")) {
      Tables.embeddings(spark, d).count()
      Seq(1, 2).foreach { p =>
        time(s"d5 prod probes=$p cold") {
          println(s"[probe]   pairs: " +
            graft.dedup.Dedup.d5EmbeddingProd(spark, d, probes = p).count())
        }
        time(s"d5 prod probes=$p warm") {
          graft.dedup.Dedup.d5EmbeddingProd(spark, d, probes = p).count()
        }
      }
      spark.stop(); return
    }

    // d12's cell-confined production form
    if (sys.env.get("PROBE_D12PROD").contains("1")) {
      Tables.embeddings(spark, d).count()
      coldWarm("d12 prod (cells)") {
        graft.dedup.Dedup.d12SemDedupProd(spark, d).count() }
      spark.stop(); return
    }

    // production sketch forms (not registered queries)
    if (sys.env.get("PROBE_PRODFORMS").contains("1")) {
      Tables.lineitem(spark, d).count()
      Tables.documents(spark, d).count()
      coldWarm("o10 prod form") {
        graft.operators.Sketches.o10QuantileSketchProd(spark, d).count() }
      coldWarm("o12 prod form") {
        graft.operators.Sketches.o12SourceSimilarityProd(spark, d).count() }
      spark.stop(); return
    }

    // streaming cluster-maintenance cadence on probe data: 3 waves
    // split by replica index mod 3, so mutated near-dup CHAINS span
    // waves and every batch merges components across the persisted
    // map — reports per-wave wall, touched map partitions (mtime
    // snapshot), and final map/cluster counts
    if (sys.env.get("PROBE_STREAMCLUSTERS").contains("1")) {
      val root = probeRoot("graft_probe_sc")
      val docs = Tables.documents(spark, d)
      docs.count()
      def snap(): Map[String, Long] = {
        val dir = new java.io.File(s"$root/map")
        if (!dir.exists()) Map.empty
        else dir.listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("pb="))
          .map(f => f.getName -> f.listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .map(x => x.getName.hashCode.toLong ^ x.length() ^
              x.lastModified()).sum).toMap
      }
      (0 until 3).foreach { w =>
        val wave = waveOf(docs, "doc_id", w)
        val n = wave.count()
        val before = snap()
        time(s"clusters wave $w ($n docs)") {
          graft.streaming.StreamingClusters
            .processBatch(wave.toDF(), w, root, 64)
        }
        val after = snap()
        val touched = after.count { case (k, v) =>
          before.get(k).forall(_ != v) }
        println(s"[probe]   touched map partitions: $touched / ${after.size}")
      }
      val map = spark.read.parquet(s"$root/map")
      println(s"[probe]   final map rows: ${map.count()}, clusters: " +
        map.select("cluster").distinct().count())
      spark.stop(); return
    }

    // filtered WALK tiers (r10 — s17's pre-vs-post-filter question at
    // the graph-walk tier): PRE = survivor-style, the search graph is
    // built ON the predicate-filtered corpus and s15's walk runs over
    // it; POST = the unfiltered registered walk's top-12, predicate-
    // filtered, cut to 5. Reports recall@5 vs the filtered-exact
    // baseline and walls for both.
    if (sys.env.get("PROBE_FILTEREDWALK").contains("1")) {
      import graft.similarity.Similarity
      val emb = Tables.embeddings(spark, d)
      emb.count()
      val keep = col("vec_id") < 10 ||
        col("label").isin(0, 2, 4, 6, 8)
      val evens = emb.filter(keep).localCheckpoint(true)
      val exact = Similarity.s1AnnBruteForceOn(evens)
        .select("q_id", "c_id").localCheckpoint(true)
      val nex = exact.count()
      def recall(df: org.apache.spark.sql.DataFrame): Double =
        recallOf(exact, df)
      val pre = time("PRE-filter: graph on filtered corpus + walk") {
        val g = Similarity.searchGraphOn(evens, 16)
          .select("vec_id", "nbr").localCheckpoint(true)
        Similarity.s15WalkOn(evens, g, 5, 12, 3).localCheckpoint(true)
      }
      println(f"[probe]   pre-filter recall@5: ${recall(pre)}%.2f " +
        s"(rows ${pre.count()})")
      val labels = emb.select("vec_id", "label")
      val post = time("POST-filter: unfiltered walk top-12, filtered") {
        Similarity.s15GraphSearch(spark, d, k = 12)
          .join(labels.select(col("vec_id").as("c_id"), col("label")),
            Seq("c_id"))
          .filter(col("label").isin(0, 2, 4, 6, 8))
          .withColumn("rk", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("rank").asc)))
          .filter(col("rk") <= 5).localCheckpoint(true)
      }
      println(f"[probe]   post-filter recall@5: ${recall(post)}%.2f " +
        s"(rows ${post.count()} of ${nex} — under-fill shows here)")
      spark.stop(); return
    }

    // s16's MAINTAINED-STORE refresh cadence at probe scale (the one
    // s16 path previously proven only at spec scale): 3 waves fold
    // all four layer graphs through StreamingKnn's search cadence,
    // the atlas refreshes after each layer-0 fold (the documented
    // cadence), then the stored walk runs — the production
    // refresh-wall vs query-wall split, measured
    if (sys.env.get("PROBE_S16REFRESH").contains("1")) {
      import graft.similarity.Similarity
      import graft.streaming.{KnnGraphConfig, StreamingKnn}
      val root = probeRoot("graft_probe_s16r")
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") >= 10)
      val n = emb.count()
      val cfg0 = KnnGraphConfig(bits = Similarity.bitsFor(n),
        withinLabel = false, floor = None, k = 16)
      val mc = (1 to 3).map(l =>
        emb.filter(Similarity.levelOf(col("vec_id")) >= l).count())
      println(s"[probe] corpus $n; layer sizes ${mc.mkString("/")}; " +
        s"g0 ${cfg0.bits}-bit, uppers " +
        (1 to 3).map(l => Similarity.bitsSmall(mc(l - 1))).mkString("/") +
        "-bit")
      (0 until 3).foreach { w =>
        val wave = waveOf(emb, "vec_id", w)
        time(s"wave $w: layer-0 fold") {
          StreamingKnn.processBatch(wave.toDF(), w, s"$root/s0",
            s"$root/g0", cfg0)
        }
        time(s"wave $w: layer 1-3 folds") {
          (1 to 3).foreach { l =>
            val members = wave
              .filter(Similarity.levelOf(col("vec_id")) >= l)
            StreamingKnn.processBatch(members.toDF(), w, s"$root/s$l",
              s"$root/g$l", KnnGraphConfig(
                bits = Similarity.bitsSmall(mc(l - 1)),
                withinLabel = false, floor = None, k = 8))
          }
        }
        time(s"wave $w: atlas refresh") {
          Similarity.s16WriteAtlas(spark, d, s"$root/g0", s"$root/atlas")
        }
      }
      time("stored walk (the per-query cost)") {
        Similarity.s16HnswStored(spark, d, s"$root/g0",
          (1 to 3).map(l => s"$root/g$l"),
          atlasPath = Some(s"$root/atlas")).count()
      }
      spark.stop(); return
    }

    // streaming SPAN stage (d15 continuously inside StreamingCuration)
    // on probe data: 3 waves by replica index mod 3 — replica chains
    // SPAN waves, so later batches probe a span store holding the
    // earlier replicas' 16-token spans (the cross-batch dedup shape)
    if (sys.env.get("PROBE_STREAMSPAN").contains("1")) {
      val root = probeRoot("graft_probe_span")
      val docs = Tables.documents(spark, d)
      val embs = Tables.embeddings(spark, d)
      docs.count(); embs.count()
      (0 until 3).foreach { w =>
        val wave = waveOf(docs, "doc_id", w)
        val n = wave.count()
        time(s"span-curation wave $w ($n docs)") {
          graft.streaming.StreamingCuration.processBatch(wave.toDF(),
            w, root, embs, spanStage = true)
        }
      }
      val out = graft.streaming.StoreFs
        .priorBatchDirs(spark, s"$root/curated", Long.MaxValue)
        .map(spark.read.parquet(_).count()).sum
      println(s"[probe]   curated rows: $out")
      spark.stop(); return
    }

    // maintained SEARCH-graph cadence (StreamingKnn, s15's graph) on
    // probe data: 3 waves by replica index mod 3 (drift chains span
    // waves), auto band width from the full corpus size
    if (sys.env.get("PROBE_STREAMKNN").contains("1")) {
      val root = probeRoot("graft_probe_sk")
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") >= 10)
      val n = emb.count()
      val cfg = graft.streaming.KnnGraphConfig
        .search(graft.similarity.Similarity.bitsFor(n))
      println(s"[probe] corpus $n vectors -> ${cfg.bits}-bit bands")
      (0 until 3).foreach { w =>
        val wave = waveOf(emb, "vec_id", w)
        val wn = wave.count()
        time(s"search-graph wave $w ($wn vecs)") {
          graft.streaming.StreamingKnn.processBatch(wave.toDF(), w,
            s"$root/store", s"$root/graph", cfg)
        }
      }
      val g = spark.read.parquet(s"$root/graph")
      println(s"[probe]   final graph rows: ${g.count()}")
      spark.stop(); return
    }

    // recall@5 of the graph-walk tiers vs exact brute force at probe
    // scale — exact ground truth is |Q|·n cosines (10 queries), cheap
    // at any probe multiple; answers "does the walk still FIND the
    // true neighbors at 100× with auto-width graphs", which the
    // sf0.001/0.01 spec recalls cannot
    if (sys.env.get("PROBE_WALKRECALL").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val exact = Similarity.s1AnnBruteForce(spark, d)
        .select(col("q_id"), col("c_id")).localCheckpoint(true)
      val recall = recallRow(exact, "recall@5 vs exact") _
      recall("s15", Similarity.s15GraphSearch(spark, d))
      recall("s16", Similarity.s16Hnsw(spark, d))
      recall("s2 (lsh tier)", Similarity.s2AnnLsh(spark, d))
      // r1-prod FUSION recall: the walk-armed fused top-5 vs the
      // exact-armed fused top-5 (r12 — the floor that certifies the
      // production dense arm; keyed r1_prod in PROBE_RECALL_FLOORS)
      val exactFused = Similarity.r1RrfFusion(spark, d)
        .select(col("query_id").as("q_id"), col("doc_id").as("c_id"))
        .localCheckpoint(true)
      val nq = exactFused.count()
      if (nq > 0) {
        val r = time("r1_prod run") {
          exactFused.join(
              Similarity.r1RrfProd(spark, d)
                .select(col("query_id").as("q_id"),
                  col("doc_id").as("c_id")),
              Seq("q_id", "c_id"), "left_semi")
            .count().toDouble / nq
        }
        println(f"[probe]   r1_prod fused recall@5 vs exact-armed: $r%.2f")
        assertFloor("r1_prod", r)
      }
      spark.stop(); return
    }

    // The DEDUP-BEFORE-INDEX capstone: run the engine's own semantic
    // dedup (d12-prod, group-min keep policy) on the dup-polluted
    // corpus, index ONLY the survivors, and measure walk recall vs
    // exact-on-survivors — the payoff of the §4a law, demonstrated
    // end-to-end with registered operators.
    // star-contraction frontier audit (r10, the ef-frontier lesson
    // applied to d8/d10's iterative fold): per round, how much of the
    // shuffled edge volume already belongs to SETTLED components —
    // perfect stars whose members appear nowhere else in the active
    // set, which no later round can change? If the settled share is
    // high early, a set-aside filter (the cc analog of ef's
    // expanded-tracking) pays; if not, the negative result is pinned.
    if (sys.env.get("PROBE_CCFRONTIER").contains("1")) {
      import graft.dedup.Dedup
      Tables.documents(spark, d).count()
      val pairs = Dedup.minhashPairs(Tables.documents(spark, d))
        .select(col("id1").as("src"), col("id2").as("dst"))
      time("d10 cc rounds, instrumented") {
        Dedup.connectedComponentsStars(pairs, 30, (r, e) => {
          val nodeDeg = e
            .select(explode(array(col("u"), col("v"))).as("id"))
            .groupBy("id").agg(count(lit(1)).as("deg"))
          val byRoot = e
            .join(nodeDeg.withColumnRenamed("id", "u")
              .withColumnRenamed("deg", "du"), "u")
            .groupBy("v").agg(count(lit(1)).as("sz"),
              max("du").as("maxdu"))
          val s2 = byRoot
            .join(nodeDeg.withColumnRenamed("id", "v"), "v")
            .filter(col("maxdu") === 1 && col("deg") === col("sz"))
            .agg(coalesce(sum("sz"), lit(0L)), count(lit(1))).head()
          val tot = e.count()
          println(s"[probe]   round $r: edges $tot, settled " +
            s"${s2.getLong(0)} in ${s2.getLong(1)} star comps")
        }).count()
      }
      spark.stop(); return
    }

    if (sys.env.get("PROBE_DEDUPINDEX").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d)
      val n0 = emb.count()
      var outDir: String = null
      time("d12-prod dedup pass") {
        val kept = graft.dedup.Dedup.d12SemDedupProd(spark, d)
          .filter(col("keep")).select("vec_id")
        outDir = sys.env.getOrElse("PROBE_DEDUPINDEX_OUT",
          java.nio.file.Files
            .createTempDirectory("graft_dedupindex").toString)
        emb.join(kept, Seq("vec_id"), "left_semi")
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$outDir/embeddings.parquet")
      }
      val n1 = Tables.embeddings(spark, outDir).count()
      println(s"[probe]   survivors: $n1 of $n0")
      val exact = Similarity.s1AnnBruteForce(spark, outDir)
        .select("q_id", "c_id").localCheckpoint(true)
      val recall = recallRow(exact, "recall@5 vs exact-on-survivors") _
      recall("s2 seed tier", Similarity.s2AnnLsh(spark, outDir))
      recall("s15", Similarity.s15GraphSearch(spark, outDir))
      recall("s16", Similarity.s16Hnsw(spark, outDir))
      // the REGISTERED x5 (r14): the stored survivor-built hierarchy
      // walked from the persisted atlas — same survivor universe, so
      // the same exact-on-survivors truth applies; floor it with
      // PROBE_RECALL_FLOORS="x5=..." (the s16-on-survivors evidence:
      // 0.58 at 30× drift vs 0.10 raw)
      recall("x5", Similarity.x5SurvivorHnsw(spark, d))
      // raw-corpus s16 CONTRAST row (the precondition's counterfactual):
      // recall vs exact on the raw dup corpus — floorable as s16_raw
      val exactRaw = Similarity.s1AnnBruteForce(spark, d)
        .select("q_id", "c_id").localCheckpoint(true)
      val rRaw = time("s16_raw run") {
        exactRaw.join(Similarity.s16Hnsw(spark, d)
            .select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
          .count().toDouble / exactRaw.count()
      }
      println(f"[probe]   s16_raw recall@5 vs exact-on-raw: $rRaw%.2f")
      assertFloor("s16_raw", rRaw)
      spark.stop(); return
    }

    // s16 failure-mode separation: is low walk recall a SEEDING
    // problem (the true top-5's component never enters the top-4
    // atlas seeds — coverage is a hard upper bound on walk recall)
    // or a REACH problem (seeded right but the beam rounds cannot
    // traverse the component to the true neighbors)? Measures
    // seed-coverage@4 for atlas perCell ∈ {1, 4} plus walk recall at
    // doubled layer-0 rounds.
    if (sys.env.get("PROBE_S16DIAG").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") >= 10)
      val lvl = emb.withColumn("level",
        Similarity.levelOf(col("vec_id"))).localCheckpoint(true)
      val g0 = Similarity.searchGraph(spark, d, 16)
        .select("vec_id", "nbr").localCheckpoint(true)
      val comps = Similarity.compsOf(g0).localCheckpoint(true)
      val cmap = comps.select(col("id").as("c_id"), col("lbl"))
      val exact = Similarity.s1AnnBruteForce(spark, d)
        .select("q_id", "c_id").localCheckpoint(true)
      // component structure: count + the largest sizes
      val csz = cmap.groupBy("lbl").count().orderBy(col("count").desc)
        .limit(5).collect().map(_.getLong(1))
      val nComp = cmap.select("lbl").distinct().count()
      val nIso = emb.join(cmap, col("vec_id") === col("c_id"), "left_anti")
        .count()
      println(s"[probe]   g0 components: $nComp non-trivial, " +
        s"$nIso isolated vectors; largest: ${csz.mkString(", ")}")
      // member-level truth: the comp of EVERY true top-5 member
      val truthM = exact.join(cmap, Seq("c_id"), "left")
        .select(col("q_id"), col("c_id"),
          coalesce(col("lbl"), col("c_id")).as("comp"))
        .localCheckpoint(true)
      val nExact = truthM.count()
      val truth = truthM.select("q_id", "comp").distinct().localCheckpoint(true)
      val nTruth = truth.count()
      val q = Tables.embeddings(spark, d).filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cv = emb.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb"))
      for (t <- Seq(1, 4)) {
        val atlas = Similarity.entryAtlas(lvl, comps, t).localCheckpoint(true)
        val nAtlas = atlas.count()
        val seeds = broadcast(atlas).join(cv, "c_id")
          .crossJoin(broadcast(q))
          .select(col("q_id"), col("c_id"), col("comp"), col("csize"),
            round(graft.functions.VectorFunctions
              .cosine(col("q_emb"), col("c_emb")), 3).as("cos3"))
          .withColumn("rc", row_number().over(
            Window.partitionBy("q_id", "comp")
              .orderBy(col("cos3").desc, col("c_id").asc)))
          .filter(col("rc") === 1)
          .withColumn("rk", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("cos3").desc, col("c_id").asc)))
          .withColumn("rs", row_number().over(Window.partitionBy("q_id")
            .orderBy(col("csize").desc, col("comp").asc)))
          .filter(col("rk") <= 4 || col("rs") === 1)
        val seedComp = seeds.select("q_id", "comp").localCheckpoint(true)
        val cov = truth.join(seedComp, Seq("q_id", "comp"), "left_semi")
          .count().toDouble / nTruth
        // member-level: the hard recall ceiling a perfect
        // within-component walk could reach from these seeds
        val covM = truthM.join(seedComp, Seq("q_id", "comp"), "left_semi")
          .count().toDouble / nExact
        println(f"[probe]   atlas perCell=$t: $nAtlas%d entries, " +
          f"seed-coverage@4: comps $cov%.2f, recall ceiling $covM%.2f")
      }
      val nAll = emb.count()
      val lv = Similarity.levelsFor(nAll)
      for ((r, ur, lvls) <- Seq((3, 2, 3), (6, 2, 3), (12, 2, 3),
          (6, 5, 3), (6, 2, lv))) {
        val rec = exact.join(
          Similarity.s16Hnsw(spark, d, 5, 12, r, ur, lvls)
            .select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
          .count().toDouble / exact.count()
        println(f"[probe]   s16 walk recall@5 rounds=$r upperRounds=$ur " +
          f"levels=$lvls: $rec%.2f")
      }
      // atlas-richness lever: same walk, denser entry atlas
      val (uppersPc, nPc) = Similarity.s16Layers(spark, d)
      val g0pc = Similarity.searchGraph(spark, d, 16,
        Similarity.bitsFor(nPc)).select("vec_id", "nbr")
        .localCheckpoint(true)
      val compsPc = Similarity.compsOf(g0pc).localCheckpoint(true)
      for (pc <- Seq(4, 16, 64)) {
        val a = Similarity.entryAtlas(lvl, compsPc, pc)
          .localCheckpoint(true)
        val rec = exact.join(
          Similarity.s16Walk(spark, d, g0pc, uppersPc, 5, 12, 3, 2,
            entry = Some(a)).select("q_id", "c_id"),
          Seq("q_id", "c_id"), "left_semi")
          .count().toDouble / exact.count()
        println(f"[probe]   s16 walk recall@5 atlas perCell=$pc " +
          f"(${a.count()}%d entries): $rec%.2f")
      }
      // where the walk loses ground: found/total split by giant
      // component vs the small (chain) components
      val giantLbl = cmap.groupBy("lbl").count()
        .orderBy(col("count").desc).head().getLong(0)
      val res = Similarity.s16Hnsw(spark, d).select("q_id", "c_id")
        .localCheckpoint(true)
      val byKind = truthM
        .withColumn("kind", when(col("comp") === giantLbl, "giant")
          .otherwise("small"))
        .join(res.withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
        .groupBy("kind").agg(count(lit(1)).as("total"),
          sum(coalesce(col("hit"), lit(0))).as("found"))
        .collect()
      byKind.foreach(r => println(s"[probe]   truth in ${r.getString(0)} " +
        s"comp: found ${r.getLong(2)} of ${r.getLong(1)}"))
      spark.stop(); return
    }

    // s15 recall ladder: the registered ef walk (r9 close-2:
    // frontier = top-beam UNEXPANDED, measured 0.72 -> 0.90 at sf0.1
    // over the pre-ef walk) at rounds 3 and 5 vs the seed tier.
    if (sys.env.get("PROBE_S15EF").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val exact = Similarity.s1AnnBruteForce(spark, d)
        .select("q_id", "c_id").localCheckpoint(true)
      val recall = recallRow(exact, "recall@5") _
      recall("s2 seed tier", Similarity.s2AnnLsh(spark, d))
      recall("s15 (ef, rounds=3)", Similarity.s15GraphSearch(spark, d))
      recall("s15 (ef, rounds=5)",
        Similarity.s15GraphSearch(spark, d, rounds = 5))
      spark.stop(); return
    }

    // EXPERIMENT: does RNG edge diversification (HNSW Alg. 4) make
    // the dup-chain topology walkable? Build layer-0 from 32
    // candidates robust-pruned to 16 and run the s16 lane walk on it.
    if (sys.env.get("PROBE_S16DIVERSE").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") >= 10)
      val vecs = graft.dedup.Dedup.embVecs(emb).localCheckpoint(true)
      val exact = Similarity.s1AnnBruteForce(spark, d)
        .select("q_id", "c_id").localCheckpoint(true)
      var gDiv: org.apache.spark.sql.DataFrame = null
      time("diversified g0 (cand 32 -> RNG prune 16)") {
        gDiv = Similarity.rngPrune(
          Similarity.searchGraph(spark, d, 32), vecs, 16)
          .localCheckpoint(true)
        gDiv.count()
      }
      val comps = Similarity.compsOf(gDiv).localCheckpoint(true)
      val csz = comps.groupBy("lbl").count().orderBy(col("count").desc)
        .limit(3).collect().map(_.getLong(1))
      println(s"[probe]   gDiv components largest: ${csz.mkString(", ")}")
      val (uppers, _) = Similarity.s16Layers(spark, d)
      val rec = exact.join(
        Similarity.s16Walk(spark, d, gDiv, uppers, 5, 12, 3, 2)
          .select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
        .count().toDouble / exact.count()
      println(f"[probe]   s16 walk on DIVERSIFIED g0 recall@5: $rec%.2f")
      spark.stop(); return
    }

    // s16 stage breakdown
    if (sys.env.get("PROBE_S16BREAK").contains("1")) {
      import graft.similarity.Similarity
      Tables.embeddings(spark, d).count()
      time("s16 full cold") { Similarity.s16Hnsw(spark, d).count() }
      time("s16 full warm") { Similarity.s16Hnsw(spark, d).count() }
      time("s15 full warm") { Similarity.s15GraphSearch(spark, d).count() }
      val emb = Tables.embeddings(spark, d).filter(col("vec_id") >= 10)
      var g0break: org.apache.spark.sql.DataFrame = null
      time("g0 build alone") {
        g0break = Similarity.searchGraph(spark, d, 16)
          .select("vec_id", "nbr").localCheckpoint(true)
        g0break.count()
      }
      var compsBreak: org.apache.spark.sql.DataFrame = null
      time("g0 components (star contraction)") {
        compsBreak = Similarity.compsOf(g0break).localCheckpoint(true)
        compsBreak.count()
      }
      time("entry atlas") {
        Similarity.entryAtlas(emb.withColumn("level",
          Similarity.levelOf(col("vec_id"))), compsBreak).count()
      }
      val lvl = emb.withColumn("level",
        Similarity.levelOf(col("vec_id"))).localCheckpoint(true)
      val vecs = graft.dedup.Dedup.embVecs(emb).localCheckpoint(true)
      (1 to 3).foreach { l =>
        time(s"upper layer $l build") {
          val members = lvl.filter(col("level") >= l)
            .select("vec_id", "label", "embedding")
          val bits = Similarity.bitsSmall(members.count())
          Similarity.knnFromPairs(
            graft.dedup.Dedup.scoredCosine(
              Similarity.sparseBandPairs(
                Similarity.sparseBands(members, bits),
                withinLabel = false), vecs), 8).count()
        }
      }
      spark.stop(); return
    }

    // native sketch-aggregate forms (not registered queries)
    if (sys.env.get("PROBE_SKETCHAGG").contains("1")) {
      Tables.lineitem(spark, d).count()
      Tables.events(spark, d).count()
      time("o6 agg form cold") {
        graft.operators.Sketches.o6HllDistinctAgg(spark, d).count()
      }
      time("o7 agg form cold") {
        graft.operators.Sketches.o7CmsSketchAgg(spark, d).count()
      }
      spark.stop(); return
    }

    // warm the JVM/codegen paths once
    Tables.documents(spark, d).count()
    Tables.embeddings(spark, d).count()

    if (sys.env.get("PROBE_T13").contains("1")) {
      import graft.functions.{TextFunctions => T}
      val docs = Tables.documents(spark, d).filter(col("text").isNotNull)
      time("t13 tokens only") {
        docs.select(explode(T.tokens(col("text"))).as("t"))
          .groupBy("t").count().count()
      }
      val grams3 = {
        val toks = T.tokens(col("text"))
        transform(sequence(lit(0), size(toks) - 3, lit(1)),
          i => concat_ws(" ", (1 to 3).map(j => element_at(toks, i + j)): _*))
      }
      time("t13 grams explode+agg") {
        docs.select(col("doc_id"),
            explode(array_distinct(grams3)).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df")).count()
      }
      time("t13 full") {
        graft.text.TextAnalysis.t13Boilerplate(spark, d).count()
      }
      time("t13 full again") {
        graft.text.TextAnalysis.t13Boilerplate(spark, d).count()
      }
      time("grams with materialized toks") {
        docs.select(col("doc_id"), T.tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(array_distinct(
            transform(sequence(lit(0), size(col("toks")) - 3, lit(1)),
              i => concat_ws(" ", (1 to 3).map(j =>
                element_at(col("toks"), i + j)): _*)))).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df")).count()
      }
      spark.stop(); return
    }
    // instrumented copy of connectedComponentsStars: per-round wall
    def starsInstr(edges: org.apache.spark.sql.DataFrame): Unit = {
      var e = edges
        .select(greatest(col("src"), col("dst")).as("u"),
          least(col("src"), col("dst")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .localCheckpoint(true)
      def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v"))))
          .head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var eDigest = digest(e)
      println(s"[probe]   initial edges: ${eDigest._1}")
      var done = false; var round = 0
      while (!done && round < 30) {
        val t0 = System.nanoTime()
        val nbr = e.select(col("u"), col("v"))
          .union(e.select(col("v").as("u"), col("u").as("v")))
        val minN = nbr.groupBy("u").agg(min("v").as("mn"))
          .select(col("u"), least(col("mn"), col("u")).as("m"))
        val large = nbr.filter(col("v") > col("u"))
          .join(minN, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
        val minS = large.groupBy("u").agg(min("v").as("m"))
        val small = large.join(minS, "u")
          .select(explode(array(struct(col("v").as("a"), col("m").as("b")),
            struct(col("u").as("a"), col("m").as("b")))).as("p"))
          .select(greatest(col("p.a"), col("p.b")).as("u"),
            least(col("p.a"), col("p.b")).as("v"))
          .filter(col("u") =!= col("v")).distinct()
          .localCheckpoint(true)
        val smallDigest = digest(small)
        done = smallDigest == eDigest && small.exceptAll(e).isEmpty
        e = small; eDigest = smallDigest; round += 1
        println(f"[probe]   round $round: ${smallDigest._1} edges, " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, done=$done")
      }
    }
    import graft.functions.{VectorFunctions => V2}
    val emb0 = Tables.embeddings(spark, d)
    time("emb banded sigs only") {
      emb0.select(col("label"), col("vec_id"),
          V2.asDouble(col("embedding")).as("embd"))
        .select(col("label"), col("vec_id"),
          posexplode(array((0 until 32).map { b =>
            V2.signSig(col("embd"), 1000 + b * 3, 3, 64)
          }: _*)))
        .agg(count(lit(1))).collect()
    }
    time("emb banded sigs again") {
      emb0.select(col("label"), col("vec_id"),
          V2.asDouble(col("embedding")).as("embd"))
        .select(col("label"), col("vec_id"),
          posexplode(array((0 until 32).map { b =>
            V2.signSig(col("embd"), 1000 + b * 3, 3, 64)
          }: _*)))
        .agg(count(lit(1))).collect()
    }
    time("d5 warm1") { graft.dedup.Dedup.d5EmbeddingDedup(spark, d).count() }
    time("d5 warm2") { graft.dedup.Dedup.d5EmbeddingDedup(spark, d).count() }
    time("d3 warm1") { graft.dedup.Dedup.d3Simhash(spark, d).count() }
    time("d3 warm2") { graft.dedup.Dedup.d3Simhash(spark, d).count() }
    import graft.functions.{TextFunctions => TF}
    val docs0 = Tables.documents(spark, d).filter(col("text").isNotNull)
    time("d3 sketch only") {
      docs0.select(col("doc_id"),
        TF.simhashText(col("text")).as("sh")).agg(count(lit(1))).collect()
    }
    time("d3 sketch again") {
      docs0.select(col("doc_id"),
        TF.simhashText(col("text")).as("sh")).agg(count(lit(1))).collect()
    }
    val d3df = graft.dedup.Dedup.d3Simhash(spark, d)
    val plan = d3df.queryExecution.executedPlan.toString
    println("[probe] d3 SimhashText nodes in plan: " +
      "simhash_text".r.findAllIn(plan.toLowerCase).length)
    println("[probe] d3 exchanges: " + "Exchange".r.findAllIn(plan).length +
      " reused: " + "ReusedExchange".r.findAllIn(plan).length)
    d3df.explain("formatted")
    val ep = time("d5 embeddingPairs count") {
      val p = graft.dedup.Dedup.embeddingPairs(spark, d)
        .select(col("id1").as("src"), col("id2").as("dst"))
        .localCheckpoint(true)
      p.count()
      p
    }
    time("d12 stars on emb pairs")(starsInstr(ep))
    val mp = time("d2 minhashPairs count") {
      val p = graft.dedup.Dedup
        .minhashPairs(Tables.documents(spark, d))
        .select(col("id1").as("src"), col("id2").as("dst"))
        .localCheckpoint(true)
      p.count()
      p
    }
    time("d10 stars on mh pairs")(starsInstr(mp))
    time("adaptive on emb pairs") {
      graft.dedup.Dedup.connectedComponentsAdaptive(ep).count()
    }
    time("adaptive on mh pairs") {
      graft.dedup.Dedup.connectedComponentsAdaptive(mp).count()
    }
    time("full d12") { graft.dedup.Dedup.d12SemDedup(spark, d).count() }
    time("full d11") { graft.dedup.Dedup.d11ClusterMaintain(spark, d).count() }
    time("full d8") { graft.dedup.Dedup.d8DupClusters(spark, d).count() }
    time("full d10") { graft.dedup.Dedup.d10CcStars(spark, d).count() }
    spark.stop()
  }
}
