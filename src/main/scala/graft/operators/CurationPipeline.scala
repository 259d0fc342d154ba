package graft.operators

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X1: the END-TO-END corpus curation pipeline — the reference's ETL
  * chains extract → history → normalize → load; a training-data
  * pipeline chains holdout → quality gate → exact dedup → near-dup
  * clustering → semantic dedup → containment → decontamination →
  * split. This operator runs the whole
  * chain by COMPOSING the family operators (each stage consumes the
  * previous stage's survivors, which is precisely what the
  * standalone queries cannot show) and reports per-stage row
  * accounting as data — the acceptance sheet a data-engineering run
  * signs off on.
  *
  * Scale shape: every stage keeps its own family's plan (hash-agg
  * exact dedup, banded minhash pairs + label propagation on survivors,
  * broadcast eval-gram set, pure-map split); the report unions
  * one-row aggregates, so no stage ever funnels rows to the driver.
  */
object CurationPipeline {

  /** Survivor frames per stage (exposed for the spec).
    *
    * `cellSemantic` selects the semantic stage's candidate machinery:
    *  - false (registered default): d5's per-vector sign banding.
    *    This is the STREAMABLE form — banding is corpus-independent
    *    per-vector state, which is exactly what StreamingCuration's
    *    cross-batch sign-band store replays (cells cannot be: k-means
    *    centroids retrain with the corpus, so a streamed cadence
    *    can't reproduce them deterministically — production retrains
    *    cells periodically, a batch job). At the fixture's permissive
    *    0.3 epsilon the (32, r=3) default admits all same-label
    *    survivor pairs (the measured selectivity law); at the
    *    PRODUCTION semantic epsilon (SemDeDup ~0.95) banding with
    *    r ≈ log₂(survivors) is selective AND ≥0.9-recall — the 100 TB
    *    streaming-compatible setting.
    *  - true: the SemDeDup cell-confined batch form — cells TRAINED
    *    ON THE SURVIVORS ([[graft.dedup.Dedup.semCellsFrame]], the
    *    paper's deployment shape), Σ|cell|²-bounded pairwise, linear
    *    at any epsilon. The spec runs both and publishes the
    *    accounting delta. */
  private[graft] def stages(s: SparkSession, d: String,
      cellSemantic: Boolean = false)
      : Seq[(String, DataFrame)] = {
    val raw = Tables.documents(s, d)
    // eval holdout (the d6 benchmark stand-in) + minimal quality gate
    val quality = raw.filter(col("doc_id") % 97 =!= 0 &&
      col("text").isNotNull && col("n_chars") >= 100)
    // exact dedup: keep the minimum doc_id per content hash (d1)
    // eager checkpoint: every later stage (sketch, cluster join,
    // decontamination, the flag frame) reads the exact survivors, and
    // without it each re-derives the scan + content-hash window —
    // measured 7.0 → 4.2 s for the full pipeline at sf0.1 (the same
    // measure-first rule that REMOVED caches from the history DAGs;
    // here the frame is read 4× and the window is the chain's
    // expensive stage)
    val exact = quality
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint(true)
    // near-dup: d2 pairs over the exact survivors, EXACT components
    // (the adaptive union-find/star entry — fixed-round propagation
    // would silently under-merge once a component's diameter exceeds
    // the round budget), keep cluster canonicals + unpaired docs
    val labels = Dedup.connectedComponentsAdaptive(
      Dedup.minhashPairs(exact)
        .select(col("id1").as("src"), col("id2").as("dst")))
    val nearDup = exact
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
    // semantic dedup: SemDeDup epsilon-groups over the SURVIVORS'
    // vectors (vec_id ≡ doc_id, the m4 pairing; per-vector banding is
    // corpus-independent, so pairs-on-survivors = full pairs ∩
    // survivors², which is exactly how the oracle re-derives it),
    // keep one representative per group. The survivor vector frame is
    // consumed four times inside the pair body (sign bands + both
    // fetch-back sides) and each use would re-run the survivors join
    // + components — materialize once (x1 7.6 → 5.2 s with this and
    // the containment-stage materializations)
    val survEmb = graft.Tables.embeddings(s, d)
      .join(nearDup.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      .localCheckpoint(true)
    val semPairs = (if (cellSemantic)
        Dedup.verifyCosine(
          Dedup.semCellPairs(Dedup.semCellsFrame(survEmb, 256)),
          Dedup.embVecs(survEmb))
      else Dedup.embeddingPairsFrame(survEmb))
      .select(col("id1").as("src"), col("id2").as("dst"))
    val semLbl = Dedup.connectedComponentsAdaptive(semPairs)
    val sem = nearDup
      .join(semLbl.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
      .localCheckpoint(true)
    // containment: drop docs whose distinct word-3-GRAM set is >= 80%
    // contained in a surviving same-source partner (d13's body in its
    // gram form — truncation/quote dups that symmetric minhash
    // passed; token-set containment saturates on a bounded vocabulary
    // and would gut the corpus as a drop rule — see containmentBest)
    val contained = Dedup.containmentBest(sem, 0.8, 3, materialize = true)
      .select("doc_id")
    val cont = sem.join(contained, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // decontamination: drop survivors sharing >= 3 distinct 3-grams
    // with the eval holdout (d6; eval grams from the RAW corpus)
    val benchGrams = raw.filter(col("doc_id") % 97 === 0)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(explode(Dedup.wordGrams(col("toks"), 3)).as("gram"))
      .distinct()
    val contaminated = cont
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Dedup.wordGrams(col("toks"), 3))
        .as("gram"))
      // bounded build side: benchGrams is the eval-benchmark gram
      // set — eval suites are tiny next to the corpus by construction
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy("doc_id").agg(countDistinct("gram").as("n_shared"))
      .filter(col("n_shared") >= 3)
    val clean = cont.join(contaminated.select("doc_id"),
      Seq("doc_id"), "left_anti")
    Seq("raw" -> raw, "quality" -> quality, "exact_dedup" -> exact,
      "near_dup" -> nearDup, "semantic" -> sem, "containment" -> cont,
      "decontam" -> clean)
  }

  /** The curated corpus with its split assignment (c3's deterministic
    * multiplicative-hash buckets). */
  def curated(s: SparkSession, d: String): DataFrame = {
    val clean = stages(s, d).last._2
    val bucket = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 100
    clean.select(col("doc_id"), col("source"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }

  /** The per-stage accounting report: one row per pipeline stage plus
    * one per final split. Counted in ONE pass: per-doc survival flags
    * (four id-frame joins on the same key — exchanges reuse) feed a
    * single aggregate, then the row unpivots — counting each stage
    * with its own aggregate branch re-derived the chain prefix per
    * stage (8 recomputations; measured 7.0 → 1.5 s at sf0.1).
    *
    * STAGE-ORDER LAW (the r9 capstone, re-examined r10): every dedup
    * stage here runs BEFORE any index-building consumer of the
    * curated corpus — walk-tier ANN indexes built on a dup-polluted
    * corpus saturate at their seed (measured: s16 0.10 on 30× drift
    * chains vs 0.58 on the deduped survivors), so the pipeline's
    * contract is dedup-then-index, never the reverse. The registered
    * composition [[graft.similarity.Similarity.x2DedupIndex]] IS
    * that contract end-to-end (its spec pins every returned neighbor
    * to the survivor set), and x1's own semantic stage runs strictly
    * before the `curated` split any indexer would consume. */
  def x1CurationPipeline(s: SparkSession, d: String): DataFrame = {
    val st = stages(s, d).toMap
    def ids(df: DataFrame, flag: String) =
      df.select(col("doc_id"), lit(1).as(flag))
    val bucket = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 100
    val flags = st("raw").select(col("doc_id"))
      .join(ids(st("quality"), "q"), Seq("doc_id"), "left")
      .join(ids(st("exact_dedup"), "ex"), Seq("doc_id"), "left")
      .join(ids(st("near_dup"), "nd"), Seq("doc_id"), "left")
      .join(ids(st("semantic"), "se"), Seq("doc_id"), "left")
      .join(ids(st("containment"), "co"), Seq("doc_id"), "left")
      .join(ids(st("decontam"), "cl"), Seq("doc_id"), "left")
      .withColumn("b", bucket)
    val agg = flags.agg(
      count(lit(1)).as("c_raw"),
      count(col("q")).as("c_quality"),
      count(col("ex")).as("c_exact"),
      count(col("nd")).as("c_near"),
      count(col("se")).as("c_sem"),
      count(col("co")).as("c_cont"),
      count(col("cl")).as("c_clean"),
      count(when(col("cl") === 1 && col("b") < 80, 1)).as("c_train"),
      count(when(col("cl") === 1 && col("b") >= 80 && col("b") < 90, 1))
        .as("c_val"),
      count(when(col("cl") === 1 && col("b") >= 90, 1)).as("c_test"))
    agg.select(explode(array(
        struct(lit("raw").as("stage"), col("c_raw").as("rows")),
        struct(lit("quality").as("stage"), col("c_quality").as("rows")),
        struct(lit("exact_dedup").as("stage"), col("c_exact").as("rows")),
        struct(lit("near_dup").as("stage"), col("c_near").as("rows")),
        struct(lit("semantic").as("stage"), col("c_sem").as("rows")),
        struct(lit("containment").as("stage"), col("c_cont").as("rows")),
        struct(lit("decontam").as("stage"), col("c_clean").as("rows")),
        struct(lit("split_train").as("stage"), col("c_train").as("rows")),
        struct(lit("split_val").as("stage"), col("c_val").as("rows")),
        struct(lit("split_test").as("stage"), col("c_test").as("rows"))))
        .as("r"))
      .select(col("r.stage").as("stage"), col("r.rows").as("rows"))
      .orderBy("stage")
  }
}
