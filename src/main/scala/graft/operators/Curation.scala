package graft.operators

import graft.Tables
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: per-stratum selection,
  * quantization, and dataset profiling.
  *
  * Broadcast-hint boundedness ledger (r12 verdict #1 sweep): every
  * hinted build side in this file is a policy frame — per-source
  * rates/weights/caps (`rates`, `weights`, `eps`, `tilted`:
  * |sources|-row), 1-row scalars (`minCnt`, `minSum`, `totals`,
  * `kframe`, `z`, `rmax`, `tot`, `lam`), a quantile bucket spine
  * (|buckets|-row, a config constant), or per-cluster counts capped
  * by the clustering k. The corpus itself never broadcasts; it
  * streams through the policy join.
  */
object Curation {

  /** C1: keep the top-3 documents per source by a quality score
    * (length × stopword balance) — the per-stratum selection every
    * curation pipeline runs before sampling. One window pass per
    * stratum; strata are independent so this scales with the number
    * of sources, not corpus size. */
  def c1Curation(s: SparkSession, d: String): DataFrame = {
    val score = round(col("n_chars") *
      (lit(1.0) - abs(lit(0.3) - col("stop_ratio"))), 4)
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .withColumn("stop_ratio",
        size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
          .cast("double") / size(toks))
      .withColumn("score", score)
      .withColumn("rk", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= 3)
      .select("source", "rk", "doc_id", "score")
      .orderBy("source", "rk")
  }

  /** C3: deterministic train/val/test split — every curation pipeline
    * needs a split that is (a) reproducible across runs and engines,
    * (b) independent of row order and partitioning, (c) computable as
    * a pure map with no shuffle. A Knuth multiplicative hash of the
    * stable doc_id gives all three (md5/xxhash would too, but their
    * bit-twiddling isn't portable to every oracle engine): bucket =
    * ((doc_id mod 2^31) * 2654435761) mod 2^32 mod 100 → 80/10/10.
    * The mod-2^31-first guard (r7, the o6/c10 rule applied to the
    * whole coin family) keeps the product within int64 for ANY key —
    * the raw multiply wraps (silently in Spark, an error in ANSI
    * engines) once doc_id passes ~3.47e9, i.e. a few billion
    * documents; values are identical for keys < 2^31. */
  def c3SampleSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 100
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), bucket.as("bucket"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** C4: quality-weighted resampling — keep each document with
    * probability proportional to its quality weight, DETERMINISTICALLY:
    * the acceptance "coin" is the same Knuth multiplicative hash as c3
    * (reproducible across runs, engines, partitionings; no RNG state),
    * compared against the weight. Pure map, no shuffle — the standard
    * way to skew a 100 TB corpus toward higher-quality strata without
    * materializing per-stratum quotas. The accept test compares
    * UNROUNDED doubles computed identically in both engines; only the
    * reported weight is rounded. */
  def c4QualityResample(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val stopRatio =
      size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("double") / size(toks)
    val weight = lit(1.0) - abs(lit(0.3) - stopRatio) // in [0.3, 1]
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        round(weight, 4).as("weight"),
        u.as("u"),
        (u < weight).as("sampled"))
      .orderBy("doc_id")
  }

  /** C5: source-mixture balancing — downsample over-represented
    * sources so the kept corpus matches a target mixture (uniform
    * here; the standard pretraining-mix rebalance). Without
    * upsampling, the largest achievable balanced corpus keeps
    * min(count_s) docs per source, so rate_s = min(count) / count_s.
    * The per-source rates come from a |sources|-row aggregate
    * broadcast back onto the corpus; acceptance is the same
    * engine-portable multiplicative-hash coin as c3/c4 — the corpus
    * itself never shuffles, making this a scan + broadcast-join at
    * 100 TB. The accept test compares unrounded doubles (one exact
    * small-int division) computed identically in both engines. */
  def c5MixtureBalance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
    val minCnt = counts.agg(min("cnt").as("min_cnt"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .select(col("source"),
        (col("min_cnt").cast("double") / col("cnt")).as("rate"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"),
        round(col("rate"), 4).as("rate"),
        (u < col("rate")).as("sampled"))
      .orderBy("doc_id")
  }

  /** C12: TEMPERATURE-scaled source mixture (Xue et al. 2021 mT5
    * §3.2; Conneau et al. 2020 XLM-R): sample source s with
    * probability q_s ∝ p_s^α, the standard softening between the raw
    * mixture (α=1) and uniform (α=0, which is exactly c5). Expressed
    * as deterministic per-doc keep rates anchored so the smallest
    * source keeps everything, the whole temperature family collapses
    * in closed form: rate_s = q_s·B/n_s with B = min_s(n_s/q_s)
    * reduces to (n_min/n_s)^(1−α) — the global Σ p^α cancels, so no
    * cross-engine pow or order-dependent float sum survives. α = 1/2
    * makes the rate an IEEE-exact sqrt of one exact small-int
    * division — bit-identical in any engine. Same broadcast-rates +
    * hash-coin shape as c5: the corpus never shuffles. */
  def c12TemperatureMixture(s: SparkSession, d: String): DataFrame =
    temperatureMixtureFrame(Tables.documents(s, d))

  /** c12's body over an arbitrary (doc_id, source) frame — exposed so
    * the softening spec can drive a skewed synthetic stratum (the
    * driver corpus is perfectly source-uniform at small SF, where
    * every rate is 1 and the temperature has nothing to soften). */
  private[graft] def temperatureMixtureFrame(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
    val minCnt = counts.agg(min("cnt").as("min_cnt"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .select(col("source"),
        sqrt(col("min_cnt").cast("double") / col("cnt")).as("rate"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"),
        round(col("rate"), 6).as("rate"),
        (u < col("rate")).as("sampled"))
      .orderBy("doc_id")
  }

  /** C9: TOKEN-budget mixture balancing — c5's contract restated in
    * the unit mixtures are actually specified in: a source's sampling
    * rate is min(token_sum) / token_sum_s, so every kept slice
    * contributes ~the same TOKEN volume (a source of few huge docs
    * and one of many small docs get equal budget, where c5's
    * doc-count rates would skew 10:1 in tokens). Rates come from
    * exact integer token sums (a \|sources\|-row aggregate broadcast
    * back); acceptance is the same engine-portable hash coin; the
    * corpus never shuffles. `exp_tokens` = the rounded expected token
    * contribution of the doc under its rate — the number a mixture
    * sheet reports. */
  def c9TokenMixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val sums = docs.groupBy("source").agg(sum("n_toks").as("toks"))
    val minSum = sums.agg(min("toks").as("min_toks"))
    val rates = sums.crossJoin(broadcast(minSum))
      .select(col("source"),
        (col("min_toks").cast("double") / col("toks")).as("rate"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("rate"), 6).as("rate"),
        (u < col("rate")).as("sampled"),
        round(col("n_toks") * col("rate"), 4).as("exp_tokens"))
      .orderBy("doc_id")
  }

  /** C11: c9's token-budget mixture balancing denominated in REAL BPE
    * tokens — the unit a training budget is actually spent in (t18's
    * motivation applied to mixing: whitespace counts over-estimate by
    * exactly the merges the tokenizer applies, and the error is
    * SOURCE-BIASED — merge-friendly sources look bigger than they
    * are, so their whitespace rate is too low; the spec pins that the
    * two rate tables actually differ on this corpus). The ranked rule
    * table is mined once (t17's deterministic-sample trainer), every
    * document is encoded in ONE `BpeEncodeAll` corpus pass, and the
    * narrow (doc_id, source, n_toks) frame is checkpointed — the
    * encode map runs once, NOT once per consumer; what materializes
    * is 3 columns, not the corpus text (the x1 measure-first
    * checkpoint rule: here the recomputed branch is the expensive
    * encode itself). Rates then derive from exact integer encoded
    * sums and broadcast back; the corpus never shuffles. */
  def c11BpeMixture(s: SparkSession, d: String, rounds: Int = 16,
      sampleMod: Int = 10): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val rules = graft.text.TextAnalysis.mineRulesCached(docs, d, rounds,
      sampleMod)
    val enc =
      if (rules.isEmpty) col("toks")
      else T.bpeEncodeAll(col("toks"), array(rules.map { case (l, r) =>
        struct(lit(l).as("l"), lit(r).as("r")) }: _*))
    val counted = docs
      .select(col("doc_id"), col("source"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        size(enc).cast("long").as("n_toks"))
      .localCheckpoint(true)
    val sums = counted.groupBy("source").agg(sum("n_toks").as("toks"))
    val minSum = sums.agg(min("toks").as("min_toks"))
    val rates = sums.crossJoin(broadcast(minSum))
      .select(col("source"),
        (col("min_toks").cast("double") / col("toks")).as("rate"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    counted.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_toks"),
        round(col("rate"), 6).as("rate"),
        (u < col("rate")).as("sampled"),
        round(col("n_toks") * col("rate"), 4).as("exp_tokens"))
      .orderBy("doc_id")
  }

  /** C13: CLUSTER-balanced sampling — mixture balancing in EMBEDDING
    * space rather than by source label: each document's vector is
    * assigned to a k-means cell (s5's refined centroids — label-mean
    * init, two Lloyd rounds, broadcast argmin assignment), then each
    * cell keeps min(cell_count)/cell_count of its docs via the
    * deterministic hash coin. The SEMANTIC-diversity counterpart of
    * c5: source labels under-specify content (one "web" source spans
    * many topics), so balancing by cluster flattens TOPIC skew — the
    * cluster-based selection shape modern curation pipelines use
    * between dedup and mixing. Cross-table composition: the vector
    * store supplies geometry, the corpus supplies the rows kept.
    *
    * Scale shape: cluster assignment is a broadcast-argmin pure map
    * (s5 — the corpus never shuffles on the low-cardinality cell id);
    * the narrow (doc_id, cluster) frame checkpoints once (two
    * consumers — the o10 bounds rule); rates come from a |cells|-row
    * aggregate broadcast back; the doc↔vector join is an id-keyed
    * hash join of co-partitionable tables. */
  def c13ClusterBalance(s: SparkSession, d: String): DataFrame = {
    val assigned = graft.similarity.Similarity.s5KmeansRefine(s, d)
      .select(col("vec_id").as("doc_id"), col("cluster"))
      .localCheckpoint(true)
    // |cells|-row frame, two consumers (rates + min): checkpoint so
    // the cell-count pass over the assignment frame runs once
    val counts = assigned.groupBy("cluster").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val minCnt = counts.agg(min("cnt").as("min_cnt"))
    val rates = counts.crossJoin(broadcast(minCnt))
      .select(col("cluster"),
        (col("min_cnt").cast("double") / col("cnt")).as("rate"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    Tables.documents(s, d).select("doc_id", "source")
      .join(assigned, "doc_id")
      .join(broadcast(rates), "cluster")
      .select(col("doc_id"), col("source"), col("cluster"),
        round(col("rate"), 4).as("rate"),
        (u < col("rate")).as("sampled"))
      .orderBy("doc_id")
  }

  /** C14: UniMax EPOCH-CAPPED source mixture (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining"): spread a total training
    * budget B across sources as uniformly as possible subject to an
    * epoch cap — no source repeats more than E times. This is the
    * mixture family's fourth policy (c5 uniform-by-doc, c9/c11
    * uniform-by-token, c12 temperature-softened) and the only one
    * that UPSAMPLES: a small source can be seen up to E epochs, so a
    * doc's realized multiplicity can exceed 1.
    *
    * The paper's greedy per-source loop has a CLOSED FORM on the
    * sorted cap frame: with caps c_s = n_s·E sorted ascending and
    * cum_k = Σ_{j≤k} c_j, f(k) = cum_k + (m−k)·c_k = Σ_j min(c_j,c_k)
    * is nondecreasing in k, so the capped set is the prefix
    * k* = max{ k : f(k) ≤ B } — an all-INTEGER test with no float
    * order dependence — and everyone else shares the water level
    * L = (B − cum_{k*}) / (m − k*): alloc_s = min(c_s, L). Only the
    * |sources|-row count aggregate touches the corpus; the cumsum
    * window, the k* probe, and the level derivation run on the tiny
    * frame (its single-partition window is |sources| rows — the c6
    * bucket-spine shape). Materialization: each doc is kept
    * ⌊epochs⌋ + (coin < frac) times via the deterministic hash coin,
    * so fractional epochs realize exactly and the result is
    * partition/arrival-invariant. The corpus never shuffles. */
  def c14Unimax(s: SparkSession, d: String): DataFrame =
    unimaxFrame(Tables.documents(s, d), epochCap = 2, budgetFrac = 0.6)

  /** c14's body over an arbitrary (doc_id, source) frame with
    * explicit epoch cap and budget fraction (B = ⌊budgetFrac·Σn_s⌋) —
    * exposed so the spec can drive skewed strata and the all-capped
    * degenerate case (budget ≥ Σ caps). */
  private[graft] def unimaxFrame(docsIn: DataFrame, epochCap: Int,
      budgetFrac: Double): DataFrame = {
    val docs = docsIn.select("doc_id", "source")
    // the |sources|-row count frame materializes ONCE: its three
    // consumers (cumsum spine, totals, epoch table) would otherwise
    // each re-run the aggregate — and its corpus scan (the o10
    // bounds-frame rule)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("cap", col("n") * epochCap)
      .localCheckpoint(true)
    // tiny-frame cumsum: |sources| rows, deterministic (cap, source)
    // order — the only single-partition window in the plan
    val w = Window.orderBy("cap", "source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.orderBy("cap", "source")
    val cums = counts
      .withColumn("cum", sum("cap").over(w))
      .withColumn("rk", row_number().over(wr).cast("long"))
    val totals = counts.agg(sum("n").as("tot_n"),
      count(lit(1)).as("m"))
    val probe = cums.crossJoin(broadcast(totals))
      .withColumn("budget",
        floor(col("tot_n").cast("double") * budgetFrac).cast("long"))
      .withColumn("capped",
        col("cum") + (col("m") - col("rk")) * col("cap") <= col("budget"))
    val kframe = probe.agg(
      coalesce(max(when(col("capped"), col("rk"))), lit(0L)).as("k"),
      coalesce(max(when(col("capped"), col("cum"))), lit(0L)).as("cumk"),
      max("m").as("m"), max("budget").as("budget"))
    // water level; all-capped (k = m) ⇒ every alloc hits its cap
    val level = when(col("k") === col("m"), lit(Double.MaxValue))
      .otherwise((col("budget") - col("cumk")).cast("double") /
        (col("m") - col("k")).cast("double"))
    val rates = counts.crossJoin(broadcast(kframe))
      .select(col("source"), col("n"),
        least(col("cap").cast("double"), level).as("alloc"))
      .select(col("source"),
        (col("alloc") / col("n").cast("double")).as("epochs"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 10000)
      .cast("double") / 10000.0
    docs.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"),
        round(col("epochs"), 4).as("epochs"),
        (floor(col("epochs")).cast("long") +
          when(u < col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
          .as("n_copies"))
      .orderBy("doc_id")
  }

  /** C15: DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining")
    * — the mixture family's fifth policy and the only LEARNED one:
    * where c5/c9/c12/c14 pick rates from counts alone, DoReMi's Group
    * DRO loop UPWEIGHTS the domains a proxy model finds hardest
    * (positive excess loss vs a reference). One exponentiated-gradient
    * step collapses to closed form: α_s ∝ p_s·exp(η·excess_s),
    * smoothed (1−ε)·α/Σα + ε/m — exactly the paper's update with the
    * per-domain excess-loss term supplied by a DETERMINISTIC proxy
    * (the c1/c4 stopword quality score as negative loss; a real run
    * plugs per-domain eval losses into the same frame). Output is the
    * per-source weight table and per-doc sampling decisions, rates
    * normalized so the most-upweighted source keeps everything.
    *
    * Scale shape: one corpus scan builds the narrow (doc_id, source,
    * n_toks, loss6) frame, checkpointed (consumers: the per-source
    * aggregate + the final rate join — the c11 pattern). Losses ride
    * as FIXED-POINT micro-unit bigints (the t19 device) so every
    * cross-row sum is exact and order-free, and the tilted weights
    * re-quantize to integers BEFORE the normalizing sum — Z is an
    * exact bigint in both engines, no float-sum order dependence
    * anywhere. All mixture math runs on |sources|-row frames; rates
    * broadcast back; the corpus never shuffles. (Per-source micro-unit
    * sums stay < 7e5·Σtoks_s — switch lw to decimal past ~10^12
    * tokens per source.) */
  def c15Doremi(s: SparkSession, d: String): DataFrame =
    doremiFrame(Tables.documents(s, d), eta = 10.0, smooth = 0.1)

  /** c15's body with explicit step size and smoothing — exposed so
    * the spec can drive the uniform-loss fixture (tilt ∝ prior, the
    * smoothing-only update) and the hard-domain fixture (strict
    * upweight vs prior). */
  private[graft] def doremiFrame(docsIn: DataFrame, eta: Double,
      smooth: Double): DataFrame = {
    val (counted, rates) = doremiParts(docsIn, eta, smooth)
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L) % 10000).cast("double") / 10000.0
    counted.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("prior"), col("excess"), col("weight"),
        round(col("rate"), 6).as("rate"),
        (u < col("rate")).as("sampled"))
      .orderBy("doc_id")
  }

  /** The (per-doc counted frame, per-source weight table) pair behind
    * c15 — exposed so c16 can cap the SAME learned weights. */
  private[graft] def doremiParts(docsIn: DataFrame, eta: Double,
      smooth: Double): (DataFrame, DataFrame) = {
    val toks = split(col("text"), " ")
    val stopRatio =
      size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("double") / size(toks)
    val counted = docsIn.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_toks"),
        round(abs(lit(0.3) - stopRatio) * 1e6).cast("long").as("loss6"))
      .localCheckpoint(true) // consumers: source aggregate + rate join
    // |sources|-row frame, two consumers (totals + the tilt) that
    // would each re-aggregate the corpus-sized narrow frame — the
    // o10 bounds rule
    val src = counted.groupBy("source").agg(
        sum(col("loss6") * col("n_toks")).as("lw"),
        sum("n_toks").as("toks"))
      .localCheckpoint(true)
    val totals = src.agg(sum("lw").as("tlw"), sum("toks").as("ttoks"),
      count(lit(1)).as("m"))
    val tilted = src.crossJoin(broadcast(totals))
      .withColumn("prior", col("toks").cast("double") / col("ttoks"))
      .withColumn("excess", greatest(lit(0.0),
        col("lw").cast("double") / col("toks") / 1e6 -
          col("tlw").cast("double") / col("ttoks") / 1e6))
      // integer re-quantize BEFORE the normalizing sum (exact Z)
      .withColumn("t6",
        round(col("prior") * exp(lit(eta) * col("excess")) * 1e6)
          .cast("long"))
      .localCheckpoint(true) // consumers: Z + both weight reads
    val z = tilted.agg(sum("t6").as("z"))
    val weights = tilted.crossJoin(broadcast(z))
      .withColumn("alpha",
        lit(1.0 - smooth) * col("t6").cast("double") / col("z") +
          lit(smooth) / col("m"))
      .withColumn("r0", col("alpha") / col("prior"))
    val rmax = weights.agg(max("r0").as("rmax"))
    val rates = weights.crossJoin(broadcast(rmax))
      .select(col("source"), round(col("prior"), 6).as("prior"),
        round(col("excess"), 6).as("excess"),
        round(col("alpha"), 6).as("weight"),
        (col("r0") / col("rmax")).as("rate"))
    (counted, rates)
  }

  /** C16: EPOCH-CAPPED learned mixture — c15's DoReMi weights run
    * through c14's repetition discipline: the deployed form of a
    * learned mixture, because an upweighted small domain must still
    * respect "no source repeats more than E epochs" (the data-repetition
    * findings behind UniMax apply regardless of where the target
    * weights came from). Mathematically this is WEIGHTED water-filling:
    * find λ with Σ_s min(cap_s, λ·α_s) = B; sources saturate in
    * increasing cap_s/α_s order, so on that sorted frame the capped
    * set is again a prefix — and the probe test multiplies through by
    * α6_s to stay ALL-INTEGER (cum_c_k·α6_k + c_k·(α6t−cumα6_k) ≤
    * B·α6_k), the c14 no-float-order-dependence property generalized
    * to weighted targets (α6 = the 6-dp fixed-point weights, ≥ 1
    * whenever ε/m ≥ 1e-6). Everyone uncapped shares
    * λ = (B−cum_c_k*)·1e6/(α6t−cumα6_k*); docs realize
    * ⌊epochs⌋+(coin<frac) copies. Only the corpus scan and the
    * |sources| aggregates touch data; the waterfill runs on tiny
    * frames and epochs broadcast back. */
  def c16CappedDoremi(s: SparkSession, d: String): DataFrame =
    cappedDoremiFrame(Tables.documents(s, d), eta = 10.0, smooth = 0.1,
      epochCap = 2, budgetFrac = 0.6)

  private[graft] def cappedDoremiFrame(docsIn: DataFrame, eta: Double,
      smooth: Double, epochCap: Int, budgetFrac: Double): DataFrame = {
    val (counted, rates) = doremiParts(docsIn, eta, smooth)
    val cap = counted.groupBy("source").agg(count(lit(1)).as("n"))
      .join(rates.select(col("source"), col("weight")), "source")
      .select(col("source"), col("n"), (col("n") * epochCap).as("cap"),
        round(col("weight") * 1e6).cast("long").as("a6"))
      .localCheckpoint(true) // consumers: totals + the sorted spine
    val tots = cap.agg(sum("a6").as("a6t"), sum("n").as("totn"),
      count(lit(1)).as("m"))
    // tiny-frame saturation spine: |sources| rows sorted by cap/α
    val ratio = col("cap").cast("double") / col("a6")
    val w = Window.orderBy(ratio, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wr = Window.orderBy(ratio, col("source"))
    val ord = cap.crossJoin(broadcast(tots))
      .withColumn("budget",
        floor(col("totn").cast("double") * budgetFrac).cast("long"))
      .withColumn("rk", row_number().over(wr).cast("long"))
      .withColumn("cumc", sum("cap").over(w))
      .withColumn("cuma", sum("a6").over(w))
      .withColumn("capped",
        col("cumc") * col("a6") + col("cap") * (col("a6t") - col("cuma"))
          <= col("budget") * col("a6"))
    val kframe = ord.agg(
      coalesce(max(when(col("capped"), col("rk"))), lit(0L)).as("k"),
      coalesce(max(when(col("capped"), col("cumc"))), lit(0L)).as("cumck"),
      coalesce(max(when(col("capped"), col("cuma"))), lit(0L)).as("cumak"),
      max("m").as("m"), max("budget").as("budget"), max("a6t").as("a6t"))
    val lam = when(col("k") === col("m"), lit(Double.MaxValue))
      .otherwise((col("budget") - col("cumck")).cast("double") * 1e6 /
        (col("a6t") - col("cumak")).cast("double"))
    val eps = cap.crossJoin(broadcast(kframe))
      .select(col("source"),
        round(col("a6").cast("double") / 1e6, 6).as("weight"),
        (least(col("cap").cast("double"), lam * col("a6") / 1e6) /
          col("n").cast("double")).as("epochs"))
    val u = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) %
      lit(4294967296L) % 10000).cast("double") / 10000.0
    counted.select("doc_id", "source").join(broadcast(eps), "source")
      .select(col("doc_id"), col("source"), col("weight"),
        round(col("epochs"), 4).as("epochs"),
        (floor(col("epochs")).cast("long") +
          when(u < col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
          .as("n_copies"))
      .orderBy("doc_id")
  }

  /** E1: symmetric int8 embedding quantization — per-vector scale =
    * max|x|/127, elements round to [-127, 127]. Cuts ANN storage and
    * bandwidth 4×; the spec bounds the dequantization error. */
  def e1EmbeddingQuantize(s: SparkSession, d: String): DataFrame = {
    val emb = V.asDouble(col("embedding"))
    Tables.embeddings(s, d)
      .withColumn("raw_scale",
        aggregate(emb, lit(0.0), (m, x) => greatest(m, abs(x))) / 127.0)
      // floor(x+0.5) instead of round(): no round-half tie for the
      // engines to disagree on
      .withColumn("q", transform(emb, x =>
        floor(x / col("raw_scale") + 0.5).cast("int")))
      .select(col("vec_id"), round(col("raw_scale"), 6).as("scale"),
        aggregate(col("q"), lit(0L), (acc, v) => acc + abs(v)).as("l1_q"),
        element_at(col("q"), 1).cast("long").as("q0"))
      .orderBy("vec_id")
  }

  /** E3: BINARY embedding quantization — the cheapest production
    * memory tier (Yamada et al. 2021 BPR; sign-bit hashing back to
    * Charikar 2002): 64 dims collapse to ONE int64 of sign bits, a
    * 32× cut vs float32 that a Hamming pre-rank can scan at memory
    * bandwidth (s11 is the retrieval pairing). bits = Σ 2^j over
    * positive dims — an exact integer sum, order-independent, so both
    * engines produce the identical word; n_pos (the popcount) rides
    * along as the sanity digest. Pure map, no shuffle. */
  def e3BinaryQuantize(s: SparkSession, d: String): DataFrame = {
    val emb = V.asDouble(col("embedding"))
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        binaryHalf(slice(emb, 1, 32)).as("bits_hi"),
        binaryHalf(slice(emb, 33, 32)).as("bits_lo"))
      .select(col("vec_id"), col("bits_hi"), col("bits_lo"),
        (bit_count(col("bits_hi")) + bit_count(col("bits_lo")))
          .cast("long").as("n_pos"))
      .orderBy("vec_id")
  }

  /** 32 sign bits packed by a left-to-right Horner fold (first dim =
    * MSB): acc·2 + [x > 0]. Stays well inside int64 (≤ 2^32−1), needs
    * no variable shift or pow, and folds identically in any engine.
    * Two halves cover a 64-dim vector; Hamming distance is then
    * bit_count(xor(hi)) + bit_count(xor(lo)). */
  private[graft] def binaryHalf(embSlice: Column): Column =
    aggregate(embSlice, lit(0L),
      (a, x) => a * 2 + when(x > 0, 1L).otherwise(0L))

  /** E2: Matryoshka-style embedding TRUNCATION (Kusupati et al. 2022:
    * MRL-trained vectors keep most of their energy in a prefix, so
    * ANN shortlists can run on the first k dims at a fraction of the
    * memory). Per vector: energy retained by the 16-dim prefix
    * (Σx²[1..16] / Σx²[1..64]) and the first renormalized coordinate
    * — the scalar digests that pin the truncate+renormalize math
    * without hashing a float array. Pure map stage, no shuffle; both
    * sums fold left-to-right so the engines add identically. */
  def e2MatryoshkaTruncate(s: SparkSession, d: String,
      k: Int = 16): DataFrame = {
    val emb = V.asDouble(col("embedding"))
    def ss(v: Column) = aggregate(v, lit(0.0), (a, x) => a + x * x)
    Tables.embeddings(s, d)
      .select(col("vec_id"), ss(slice(emb, 1, k)).as("ss_k"),
        ss(emb).as("ss_all"), element_at(emb, 1).as("x0"))
      .select(col("vec_id"),
        round(col("ss_k") / col("ss_all"), 6).as("energy"),
        round(col("x0") / sqrt(col("ss_k")), 6).as("r0"))
      .orderBy("vec_id")
  }

  /** C6: CURRICULUM ordering — assign every document its index in the
    * global quality order (easy/high-quality first is the standard
    * curriculum; the index is what a packing/sharding stage consumes).
    * A naive `row_number() OVER (ORDER BY score)` funnels the corpus
    * through ONE partition — the classic global-sort scale killer.
    * The distributed recipe: (1) assign each row a BUCKET that is
    * order-consistent with the total order, with POPULATIONS BOUNDED
    * BY CONSTRUCTION (below), (2) count per bucket and prefix-sum the
    * counts on the bucket frame (the only single-partition window,
    * |buckets| rows, corpus-size-independent), (3) broadcast the
    * offsets back and rank WITHIN each bucket, so
    * global_idx = bucket offset + within-bucket rank. Total order =
    * (score desc NULLS LAST, doc_id) exactly, proven against the
    * naive window by the oracle and spec.
    *
    * Bucket spine (the r4 floor(score) bucket was data-blind — a
    * clamped/skewed score put the corpus in one bucket and re-created
    * the global window): boundaries come from approx_percentile over
    * the score, so each inter-boundary range holds ~1/nb of the
    * corpus REGARDLESS of the score distribution; a score value
    * heavier than a full bucket (where no score split can help) is
    * isolated into its own bucket and SUB-SPLIT by doc_id quantiles —
    * order-consistent because ties are broken by doc_id ascending.
    * Both spines are tiny driver-side literals (two aggregate probes
    * of |distinct-heavy-scores|+1 rows — the EtlRunner-style 1-row
    * action pattern), and the bucket assignment itself is a pure
    * codegen'd map: no join, no shuffle beyond the rank window's. */
  private[graft] def curriculumScored(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .withColumn("stop_ratio",
        size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
          .cast("double") / size(toks))
      // floor(x·10⁴+0.5)/10⁴, not round(): Spark rounds the double's
      // exact binary expansion (BigDecimal HALF_UP), DuckDB rounds the
      // scaled double — they disagree by 1 ulp exactly at half
      // boundaries, and a global ordering surfaces every row
      .withColumn("score",
        floor(col("n_chars") * (lit(1.0) - abs(lit(0.3) - col("stop_ratio")))
          * lit(10000.0) + lit(0.5)) / lit(10000.0))
      .select(col("doc_id"), col("score"))
  }

  /** Bucket assignment for [[curriculumIndex]]: (doc_id, score,
    * bucket, sub) where (bucket, sub) ascending is consistent with
    * (score desc NULLS LAST, doc_id asc) and populations are bounded
    * ~2·corpus/nb under ANY score distribution. Exposed for the skew
    * spec. */
  private[graft] def curriculumBuckets(scored: DataFrame,
      nb: Int): DataFrame = {
    val nonNull = scored.filter(col("score").isNotNull)
    // score boundaries: nb-quantiles; heavy scores (population > mean
    // bucket size) can't be split by any score boundary — isolate and
    // sub-split them by doc_id quantiles instead. Both probes return
    // tiny frames (nb-1 doubles; |heavy| rows, |heavy| <= nb).
    val probe = nonNull.agg(
      approx_percentile(col("score"),
        typedLit((1 until nb).map(_.toDouble / nb).toArray), lit(10000))
        .as("bounds"),
      count(lit(1)).as("n")).head()
    val bounds0 = Option(probe.getSeq[Double](0)).getOrElse(Seq.empty)
    val total = probe.getLong(1)
    val cap = math.max(1L, total / nb)
    val heavy = nonNull.groupBy("score").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > cap)
      .agg(collect_list(struct(col("score"), col("cnt"))))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    // heavy scores join the boundary set so each gets an isolated
    // bucket: counting 2 per strictly-greater boundary and 1 per
    // equal boundary makes "equal to a boundary" its own bucket value.
    // The count unrolls into a DESCENDING CASE chain instead of array
    // HOFs over a literal spine: higher-order functions are
    // CodegenFallback and would split the scan stage's whole-stage
    // codegen — this projection runs on every corpus row.
    val bounds = (bounds0 ++ heavy.map(_._1)).distinct.sorted
    val bucket = {
      val desc = bounds.reverse
      val chain = desc.zipWithIndex.foldLeft(null: Column) {
        case (acc, (b, i)) =>
          val step =
            if (acc == null) when(col("score") > b, 2 * i)
            else acc.when(col("score") > b, 2 * i)
          step.when(col("score") === b, 2 * i + 1)
      }
      when(col("score").isNull, lit(2 * bounds.size + 1)).otherwise(
        if (chain == null) lit(0) else chain.otherwise(2 * bounds.size))
    }
    // doc_id sub-quantiles per heavy score (ties break by doc_id asc,
    // so a doc_id split inside one score value is order-consistent)
    val subSpine: Map[Double, Seq[Long]] = {
      import scored.sparkSession.implicits._
      if (heavy.isEmpty) Map.empty
      else nonNull.join(broadcast(
          heavy.map(_._1).toDF("score")), Seq("score"))
        .groupBy("score")
        .agg(approx_percentile(col("doc_id"),
          typedLit((1 until nb).map(_.toDouble / nb).toArray), lit(10000))
          .as("qs"))
        .collect()
        .map(r => r.getDouble(0) ->
          r.getSeq[Long](1).distinct.sorted.toSeq).toMap
    }
    // heavy-score sub-splits sized to the cap: keep every k-th
    // quantile so each sub-bucket holds ~cap rows; the quantile count
    // unrolls into a CASE chain for the same codegen reason as above
    val sub = heavy.foldLeft(lit(0): Column) { case (acc, (hs, cnt)) =>
      val k = math.max(1, (nb * cap / math.max(1L, cnt)).toInt)
      val qs = subSpine.getOrElse(hs, Seq.empty)
        .zipWithIndex.collect { case (q, i) if (i + 1) % k == 0 => q }
      if (qs.isEmpty) acc
      else {
        // #{q < doc_id} over ascending qs, as a descending chain
        val nLess = qs.reverse.zipWithIndex.foldLeft(null: Column) {
          case (a, (q, i)) =>
            if (a == null) when(col("doc_id") > q, qs.size - i)
            else a.when(col("doc_id") > q, qs.size - i)
        }.otherwise(0)
        when(col("score") === hs, nLess).otherwise(acc)
      }
    }
    scored.select(col("doc_id"), col("score"),
      bucket.cast("long").as("bucket"), sub.cast("long").as("sub"))
  }

  /** Global (score desc NULLS LAST, doc_id) index via the bounded
    * bucket spine — see [[c6CurriculumOrder]]. */
  private[graft] def curriculumIndex(scored: DataFrame, nb: Int): DataFrame = {
    val bucketed = curriculumBuckets(scored, nb)
    val prefix = bucketed.groupBy("bucket", "sub").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(
        Window.orderBy(col("bucket").asc, col("sub").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "sub", "off")
    bucketed.join(broadcast(prefix), Seq("bucket", "sub"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("bucket", "sub")
          .orderBy(col("score").desc_nulls_last, col("doc_id").asc)))
      .select(col("doc_id"), col("score"),
        (col("off") + col("rk")).cast("long").as("global_idx"))
      .orderBy("global_idx")
  }

  def c6CurriculumOrder(s: SparkSession, d: String): DataFrame =
    curriculumIndex(curriculumScored(s, d), nb = 32)

  /** C7: deterministic GLOBAL SHUFFLE — the training-order shuffle a
    * pretraining pipeline runs between curation and packing (t7):
    * every document gets its position in a pseudorandom but fully
    * reproducible permutation. The "random" key is the same
    * engine-portable multiplicative hash as c3/c4/c5 (no RNG state,
    * invariant to partitioning and arrival order), and the global
    * rank reuses [[curriculumIndex]]'s bounded bucket spine — so the
    * permutation is computed WITHOUT a single-partition sort at any
    * scale. Oracle: the naive global window over the same key. */
  def c7GlobalShuffle(s: SparkSession, d: String): DataFrame = {
    val key = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), key.cast("double").as("score"))
    curriculumIndex(scored, nb = 32)
      .select(col("doc_id"), col("score").cast("long").as("shuffle_key"),
        col("global_idx").as("pos"))
      .orderBy("pos")
  }

  /** O4: per-source HEAVY HITTERS — the exact top-k most frequent
    * terms per corpus source with their share of the source's tokens
    * (the vocabulary/boilerplate report quality pipelines run before
    * choosing filter rules; MassiveText's repetition analysis is the
    * per-document cousin, t8). Exact, not sketched: one explode scan
    * into a (source, term) hash aggregate with map-side combine —
    * high-cardinality, uniform key — whose exchange is REUSED by the
    * per-source totals (t5's count(cnt >= 1)-style branch alignment,
    * here sum over the same grouped frame), then WindowGroupLimit
    * prunes to k rows per source before the final rank. At 100 TB the
    * only full-volume stage is the first aggregate; everything after
    * runs on |vocab| rows. */
  def o4HeavyHitters(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("source", "term").agg(count(lit(1)).as("cnt"))
    val totals = tf.groupBy("source").agg(sum("cnt").as("total"))
    tf.join(totals, "source")
      .withColumn("share",
        round(col("cnt").cast("double") / col("total"), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("cnt").desc, col("term").asc)).cast("long"))
      .filter(col("rk") <= k)
      .select("source", "rk", "term", "cnt", "share")
      .orderBy("source", "rk")
  }

  /** O3: declarative data-quality EXPECTATIONS — the Deequ pattern
    * (Schelter et al. 2018, "Automating Large-Scale Data Quality
    * Verification"): a set of per-column constraints (completeness,
    * uniqueness, value bounds) verified in ONE aggregation pass over
    * the table, emitting one row per constraint with the observed
    * metric and its verdict. The scan cost is a single map-side-
    * combinable aggregate regardless of how many constraints ride it
    * — the shape that lets a 100 TB pipeline gate every batch on
    * quality without a second read. The nonneg_bound check fails by
    * design on this data (negative balances exist at every scale):
    * a verification report that cannot show a failure proves
    * nothing. */
  def o3Expectations(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.customer(s, d).agg(
      count(lit(1)).as("n"),
      count(col("c_name")).as("n_name"),
      countDistinct(col("c_custkey")).as("n_key"),
      min("c_acctbal").as("min_bal"))
    def check(name: String, column: String, observed: Column,
        threshold: Double, pass: Column) =
      struct(lit(name).as("check"), lit(column).as("column"),
        observed.as("observed"), lit(threshold).as("threshold"),
        pass.as("pass"))
    val checks = array(
      check("completeness", "c_name",
        round(col("n_name").cast("double") / col("n"), 4), 1.0,
        col("n_name") === col("n")),
      check("uniqueness", "c_custkey",
        round(col("n_key").cast("double") / col("n"), 4), 1.0,
        col("n_key") === col("n")),
      check("min_bound", "c_acctbal",
        round(col("min_bal"), 4), -1000.0, col("min_bal") >= -1000.0),
      check("nonneg_bound", "c_acctbal",
        round(col("min_bal"), 4), 0.0, col("min_bal") >= 0.0))
    agg.select(explode(checks).as("c")).select(col("c.*"))
      .orderBy("check", "column")
  }

  /** O2: distribution drift between two time windows — the data-quality
    * check a production pipeline runs before trusting a new batch:
    * Population Stability Index over fixed equal-width bins of `value`,
    * early window (before the cutoff) vs late. Add-one smoothing keeps
    * ln defined on empty bins; a generated bin spine (0..9) keeps the
    * row set deterministic even when a bin is empty in both windows.
    * Plan shape: one scan, conditional-count hash agg, broadcast join
    * to the 10-row spine and the 1-row totals — nothing shuffles but
    * 10-row frames. */
  def o2Drift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = "2024-01-15 00:00:00"
    val bin = greatest(least(floor(col("value") / 50).cast("int"), lit(9)),
      lit(0))
    val counts = graft.Tables.events(s, d)
      .select(bin.as("bin"),
        (col("ts") < to_timestamp(lit(cutoff))).as("early"))
      .groupBy("bin")
      .agg(count(when(col("early"), 1)).as("n_early"),
        count(when(!col("early"), 1)).as("n_late"))
    val spine = s.range(10).select(col("id").cast("int").as("bin"))
    val full = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
    val totals = full.agg(sum("n_early").as("t_early"),
      sum("n_late").as("t_late"))
    full.join(broadcast(totals))
      .withColumn("p_early",
        (col("n_early") + 1).cast("double") / (col("t_early") + 10))
      .withColumn("p_late",
        (col("n_late") + 1).cast("double") / (col("t_late") + 10))
      .select(col("bin"), col("n_early"), col("n_late"),
        round((col("p_early") - col("p_late")) *
          log(col("p_early") / col("p_late")), 4).as("psi_contrib"))
      .orderBy("bin")
  }

  /** O1: dataset profile — per-column null/distinct/min/max stats in
    * ONE pass (conditional aggregation, no per-column jobs). */
  def o1Profile(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    c.agg(
      count(lit(1)).as("rows"),
      count(col("c_name")).as("name_nonnull"),
      countDistinct(col("c_mktsegment")).as("segments"),
      round(min("c_acctbal"), 2).as("min_bal"),
      round(max("c_acctbal"), 2).as("max_bal"),
      round(avg("c_acctbal"), 2).as("avg_bal"),
      countDistinct(col("c_nationkey")).as("nations"))
  }

  /** O5: per-SOURCE dataset report — the "dataset card" aggregate a
    * curation run publishes per corpus slice: volume, exact distinct
    * text count (dup pressure), length/stopword/punctuation profile,
    * language spread. Determinism without ordered folds: every ratio
    * is derived from EXACT INTEGER bases (char counts, token counts,
    * stopword hits, punct hits summed as longs — associative), so the
    * division happens once per source on identical operands in both
    * engines. One corpus scan into one \|sources\|-row aggregate with
    * map-side partials; nothing else shuffles. */
  def o5SourceReport(s: SparkSession, d: String): DataFrame = {
    val toks = col("toks")
    val stopArr = array(graft.text.TextAnalysis.stopwords.map(lit): _*)
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"), col("lang"), col("text"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("source"), col("lang"),
        md5(col("text")).as("h"),
        length(col("text")).cast("long").as("len"),
        size(toks).cast("long").as("n_toks"),
        size(filter(toks, t => array_contains(stopArr, t)))
          .cast("long").as("n_stop"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("long").as("n_punct"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum("len").as("sum_len"), sum("n_toks").as("sum_toks"),
        sum("n_stop").as("sum_stop"), sum("n_punct").as("sum_punct"),
        countDistinct(col("lang")).as("n_langs"))
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        round(col("sum_len").cast("double") / col("n_docs"), 2)
          .as("avg_len"),
        round(col("sum_stop").cast("double") / col("sum_toks"), 6)
          .as("stop_share"),
        round(col("sum_punct").cast("double") / col("sum_len"), 6)
          .as("punct_share"),
        col("n_langs"))
      .orderBy("source")
  }

  /** C8: DSIR importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its HASHED N-GRAM features are —
    * w(d) = Σ_b tf(d,b) · ln(p_target(b) / p_raw(b)) over B=1024
    * md5-hashed buckets of unigrams+bigrams, with add-1/2 smoothing.
    * The target is the held-out eval slice (doc_id % 97 == 0, d6's
    * stand-in); `keep` = the paper's resampling acceptance reduced to
    * its deterministic core (w > 0: the doc is likelier under the
    * target distribution).
    *
    * Scale shape: ONE corpus scan builds the (doc, is_target, bucket,
    * tf) frame; its aggregate exchange is REUSED by both consumers —
    * the B-row bucket-distribution aggregate and the per-doc weight
    * sum (t5's shared-tf-exchange pattern). The λ table is B rows and
    * BROADCASTS. Per-bucket log-ratios are quantized to 2^20 fixed
    * point (t12's trick), so the per-doc sum is an order-free exact
    * long — associative, stays in whole-stage codegen, and matches
    * the oracle bit-for-bit. No stage touches more than |corpus|
    * feature rows; nothing is quadratic in anything. */
  def c8Dsir(s: SparkSession, d: String, buckets: Int = 1024): DataFrame =
    c8DsirFrame(Tables.documents(s, d), buckets)

  /** The c8 body over an arbitrary (doc_id, text) frame — composable,
    * and the streaming form weighs arriving batches through the same
    * pieces ([[dsirBf]] + [[dsirWeights]]). */
  private[graft] def c8DsirFrame(docs: DataFrame,
      buckets: Int): DataFrame = {
    val bf = dsirBf(docs, buckets)
    val cnt = bf.groupBy("b").agg(
      sum(when(col("is_t"), col("tf")).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), col("tf")).otherwise(0L)).as("cr"))
    dsirWeights(bf, cnt, buckets)
  }

  /** The hashed-feature frame (doc_id, b, tf, is_t).
    * Features: unigrams + bigrams over the materialized token array
    * (tokens projected before the gram lambda — see Dedup.wordGrams).
    * is_t rides as an AGGREGATE output (max over the group), not a
    * grouping key: a grouping-key predicate would push below the
    * aggregate into the scan, splitting the shared subtree into two
    * corpus scans (canonical inequality kills exchange reuse); a
    * predicate on an aggregate result cannot push, so the weights
    * branch's raw-only filter stays ABOVE the one shared exchange. */
  private[graft] def dsirBf(docs: DataFrame, buckets: Int): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val mask = buckets - 1
    require((buckets & mask) == 0, "buckets must be a power of two")
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), (col("doc_id") % 97 === 0).as("is_t"),
        T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("is_t"),
        explode(concat(col("toks"),
          graft.dedup.Dedup.wordGrams(col("toks"), 2))).as("f"))
      .select(col("doc_id"), col("is_t"),
        T.md5Lo64(col("f")).bitwiseAND(lit(mask.toLong)).as("b"))
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("tf"), max(col("is_t")).as("is_t"))
  }

  /** DSIR weights of `bf`'s raw docs under bucket distributions
    * `cnt` (b, ct, cr) — the log-ratio table broadcasts, per-doc sums
    * are 2^20 fixed-point longs. */
  private[graft] def dsirWeights(bf: DataFrame, cnt: DataFrame,
      buckets: Int): DataFrame = {
    val tot = cnt.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val half = buckets / 2.0
    val lam = cnt.crossJoin(broadcast(tot))
      .select(col("b"), floor(
        log((col("ct") + 0.5) / (col("tt") + half) /
          ((col("cr") + 0.5) / (col("tr") + half))) * 1048576.0 + 0.5)
        .cast("long").as("q"))
    bf.filter(!col("is_t"))
      .join(broadcast(lam), Seq("b"))
      .groupBy("doc_id").agg(sum("tf").as("n_feats"),
        sum(col("tf") * col("q")).as("wq"))
      .select(col("doc_id"), col("n_feats"),
        round(col("wq") / 1048576.0, 4).as("logratio"),
        (col("wq") > 0).as("keep"))
      .orderBy("doc_id")
  }
}
