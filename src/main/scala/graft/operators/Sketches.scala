package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators for 100 TB-scale profiling.
  *
  * At full scale an exact `count(distinct)` or per-key frequency table
  * over a high-cardinality column shuffles the whole key universe; the
  * sketches here bound that state to a CONSTANT (HLL registers, CMS
  * cells) or to k rows per stratum (reservoir), which is the only shape
  * that survives a 1000-executor profiling job. All randomness is
  * deterministic arithmetic hashing (the c3 coin pattern), so every
  * sketch is bit-replayable in the DuckDB oracle — the estimates are
  * CHECKED, not just bounded.
  *
  * HyperLogLog: Flajolet, Fusy, Gandouet, Meunier 2007. Count-min:
  * Cormode & Muthukrishnan 2005. Weighted reservoir (exponential
  * race): Efraimidis & Spirakis 2006.
  *
  * Broadcast-hint boundedness ledger (r12 verdict #1 sweep): every
  * hinted build side here is sketch- or stratum-sized, never
  * corpus-sized — `sketch` (CMS) is depth×width config rows;
  * `bounds` is one row per group key (|flags|-row); `srcs`/`sizes`/
  * `inter` are |sources|-row (or |sources|² pairs); bloom `words`
  * is m/32 rows per source, m a config constant. The corpus streams
  * through them.
  */
object Sketches {

  /** O6: HyperLogLog distinct-count sketch — per l_returnflag,
    * estimate |distinct l_orderkey| with m=64 registers and report the
    * relative error against the exact count.
    *
    * Register update is ONE hash-aggregate over (group, reg) — 64
    * registers per group regardless of corpus size, the map-side
    * partial max makes the shuffle carry at most groups×64 rows. The
    * exact count (for the error column) is the expensive branch at
    * scale and exists here only because the whole point of the query
    * is to certify the estimator; a production profile drops it.
    *
    * rho = trailing-zero count + 1 of the hash suffix, computed
    * exactly: (w & -w) isolates the lowest set bit; log2 of an exact
    * power of two rounds to the true integer. The register sum
    * Σ 2^-M[j] is a sum of exact binary fractions (≤33 significant
    * bits), so it is order-independent — safe to aggregate
    * distributed. Small-range correction: E ≤ 2.5m with empty
    * registers → linear counting m·ln(m/V). */
  def o6HllDistinct(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_orderkey"))
    val exact = li.groupBy("flag")
      .agg(countDistinct("l_orderkey").as("n_exact"))
    hllRegisters(s, d).join(exact, "flag")
      .selectExpr("flag", "n_exact", hllEstExpr)
      .selectExpr("flag", "n_exact", "hll_est",
        "round((hll_est - n_exact) / n_exact, 6) as rel_err")
      .orderBy("flag")
  }

  /** O6 PRODUCTION form: the per-flag HLL estimate alone — the
    * register fold's one corpus scan, no exact countDistinct branch
    * (that branch exists only to certify the estimator; at 100 TB it
    * IS the cost the sketch exists to avoid). Registered as
    * `o6_hll_prod`; the certification form is spec-covered
    * ([[o6HllDistinct]], SketchAggSpec + its plan contract). */
  def o6HllProd(s: SparkSession, d: String): DataFrame =
    hllRegisters(s, d).selectExpr("flag", hllEstExpr).orderBy("flag")

  private val hllEstExpr =
    "round(case when (0.709 * 4096) / ssum <= 160.0 and v0 > 0 " +
      "then 64.0 * ln(64.0 / v0) " +
      "else (0.709 * 4096) / ssum end, 4) as hll_est"

  /** o6's register fold — the per-flag (ssum, v0) aggregate both the
    * certification and production forms read. */
  private def hllRegisters(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_orderkey"))
    val keyed = li.selectExpr("flag",
      // reduce mod 2^31 BEFORE the Knuth multiply: the product then
      // tops out at 2^31 * 2654435761 ~= 5.7e18 < int64 max, so the
      // mixer never wraps (a raw l_orderkey * 2654435761 overflows —
      // silently in Spark, an error in ANSI engines — once the key
      // passes ~3.47e9, i.e. exactly the 100 TB regime). Identical
      // values for keys < 2^31, which covers every test SF.
      "cast(((l_orderkey % 2147483648) * 2654435761) % 4294967296 " +
        "as bigint) as h")
    val rho = keyed.selectExpr("flag",
      "cast(h % 64 as int) as reg",
      // 26-bit suffix; all-zero suffix saturates at 26+1
      "case when h div 64 = 0 then 27 else " +
        "cast(round(log2((h div 64) & -(h div 64))) as int) + 1 end as rho")
    val regs = rho.groupBy("flag", "reg").agg(max("rho").as("mr"))
    // No 64-register spine materializes: an untouched register
    // contributes exactly 2^-0 = 1.0 to the register sum and 1 to the
    // zero-register count, and a PRESENT register always has mr ≥ 1
    // (rho = tz+1 ≥ 1), so ssum = Σ 2^-mr + (64 − |present|) and
    // v0 = 64 − |present|. Every term is an exact binary fraction
    // (≤33 significant bits over ≤64 terms), so this is BIT-IDENTICAL
    // to folding the explicit spine — the oracle keeps the spine form
    // as an independent derivation. Removes the spine's second corpus
    // scan, the crossJoin, and the left join from the plan.
    regs.groupBy("flag").agg(
      (sum(expr("1.0 / cast(1 << mr as double)")) +
        (lit(64) - count(lit(1)))).as("ssum"),
      (lit(64) - count(lit(1))).cast("bigint").as("v0"))
  }

  /** O7: count-min frequency sketch — per user_id event frequencies
    * estimated from a d=4 × w=512 CMS, reported beside the exact count
    * with the (always ≥ 0) overcount.
    *
    * The sketch is built from the per-key count aggregate, not by
    * re-scanning events once per hash row: cell(i,c) = Σ cnt(key) over
    * keys with h_i(key)=c is EXACTLY the cell a streaming CMS ends at
    * (counter increments commute), but costs one corpus scan plus a
    * key-cardinality-sized explode. At 100 TB the corpus scan
    * dominates and the 2048-cell sketch broadcasts for the estimate
    * join. Hashes are (a·x+b) mod p mod w with p = 2^31−1 — the
    * classic pairwise-independent family, deterministic literals. */
  def o7CmsFreq(s: SparkSession, d: String): DataFrame = {
    val (cnts, est) = cmsParts(s, d)
    cnts.join(est, "user_id")
      .selectExpr("user_id", "cnt", "cms_est",
        "cms_est - cnt as overcount")
      .orderBy("user_id")
  }

  /** O7 PRODUCTION form: the per-key CMS estimates alone — the exact
    * count still feeds the SKETCH (cell(i,c) = Σ cnt(key) is how the
    * one-scan build works) but never rides to the output, so the
    * certification report join is gone. Registered as `o7_cms_prod`;
    * the certification form is spec-covered ([[o7CmsFreq]],
    * SketchAggSpec + its plan contract). */
  def o7CmsProd(s: SparkSession, d: String): DataFrame =
    cmsParts(s, d)._2.select("user_id", "cms_est").orderBy("user_id")

  /** o7's shared build: (per-key exact counts, per-key CMS estimates)
    * — the certification form joins them for the overcount report,
    * the production form keeps only the estimates. */
  private def cmsParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    // explicit isnotnull on the key: the estimate and report joins
    // push IsNotNull(user_id) into THEIR copies of this aggregate
    // subtree but the sketch branch doesn't, which de-canonicalizes
    // the three subtrees and splits the count aggregate into three
    // corpus scans. With the filter stated once here, all consumers
    // see one canonical subtree → ONE scan + ReusedExchange
    // (plan-contracted).
    val cnts = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val cells = cnts.selectExpr("user_id", "cnt",
      "stack(4, " +
        "0, ((101 * user_id + 17) % 2147483647) % 512, " +
        "1, ((1009 * user_id + 29) % 2147483647) % 512, " +
        "2, ((10007 * user_id + 71) % 2147483647) % 512, " +
        "3, ((100003 * user_id + 113) % 2147483647) % 512" +
        ") as (i, cell)")
    val sketch = cells.groupBy("i", "cell").agg(sum("cnt").as("csum"))
    // cnt >= 1 is a tautology (counts are positive) whose only job is
    // to keep `cnt` REFERENCED on the probe side: without it column
    // pruning rewrites this branch's count aggregate into a bare
    // distinct, de-canonicalizing it from the sketch branch's subtree
    // and splitting the shared exchange into a second corpus scan
    // (the t5 pruning gotcha; plan-contracted).
    val est = cells.filter(col("cnt") >= 1).select("user_id", "i", "cell")
      .join(broadcast(sketch), Seq("i", "cell"))
      .groupBy("user_id").agg(min("csum").as("cms_est"))
    (cnts, est)
  }

  /** C10: weighted reservoir sample — k=20 documents per source with
    * inclusion probability ∝ n_chars, via the exponential race
    * (A-ES): key = -ln(u)/weight with u a deterministic uniform from
    * the doc_id hash; the k SMALLEST keys per stratum win.
    *
    * Selection is a salted two-phase top-k: phase 1 keeps the local
    * top-k inside each (source, salt) cell — the map-side partial that
    * a plain per-source window lacks, so the per-source shuffle
    * carries salt·k rows instead of the whole stratum (the 100 TB
    * shape: a source is terabytes, salt·k is hundreds of rows).
    * Phase 2 re-ranks the survivors. Any global top-k row is top-k in
    * its own salt cell, so the two-phase result is exactly the
    * single-window order (spec-asserted). Keys are rounded to 9
    * decimals with doc_id tie-break — total order, replayable. */
  /** o6 in its PRODUCTION shape: the register array is the buffer of
    * the native `hll_registers` aggregate ([[graft.expressions
    * .HllRegAgg]]), so the whole sketch is ONE hash aggregate — no
    * (group, reg) explode, constant 64 ints per group on the shuffle,
    * mergeable partials. The estimate derivation is the same
    * closed-form as o6 run as a per-group array fold. No exact-count
    * branch: at production scale the certification column IS the cost,
    * so this form reports (flag, hll_est) only. Spec-asserted equal to
    * o6's registers and estimates (which the oracle checks, so this
    * form is certified transitively). */
  private[graft] def o6HllDistinctAgg(s: SparkSession, d: String)
      : DataFrame = {
    val keyed = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_orderkey"))
      .selectExpr("flag",
        "cast(((l_orderkey % 2147483648) * 2654435761) % 4294967296 " +
          "as bigint) as h")
    keyed.groupBy("flag")
      .agg(graft.functions.SketchFunctions.hllRegisters(col("h")).as("regs"))
      .selectExpr("flag",
        "aggregate(regs, cast(0.0 as double), " +
          "(acc, mr) -> acc + 1.0 / cast(1 << mr as double)) as ssum",
        "aggregate(regs, 0L, " +
          "(acc, mr) -> acc + case when mr = 0 then 1 else 0 end) as v0")
      .selectExpr("flag",
        "round(case when (0.709 * 4096) / ssum <= 160.0 and v0 > 0 " +
          "then 64.0 * ln(64.0 / v0) " +
          "else (0.709 * 4096) / ssum end, 4) as hll_est")
      .orderBy("flag")
  }

  /** o7 in its PRODUCTION shape: the 2048-cell array is the buffer of
    * the native `cms_sketch` aggregate ([[graft.expressions.CmsAgg]])
    * — the TRUE streaming CMS, one increment per (row, hash-row), no
    * per-key count explode, mergeable partials; the corpus collapses
    * to ONE 2048-long array in a single pass. Estimates then read the
    * broadcast-sized sketch. Spec-asserted cell-equal to o7's composed
    * groupBy sketch (counter increments commute). */
  private[graft] def o7CmsSketchAgg(s: SparkSession, d: String)
      : DataFrame =
    Tables.events(s, d)
      .agg(graft.functions.SketchFunctions.cmsSketch(col("user_id"))
        .as("cells"))

  /** O8: per-source TOKENIZER FERTILITY report — the evaluation sheet
    * tokenizer and mixture decisions are made from: fertility =
    * subword tokens per whitespace word (the standard per-language
    * tokenizer-quality metric — a high-fertility source pays more of
    * its token budget per word) and chars-per-token (the compression
    * dial), from REAL encoded counts. Rules mined once on t17's
    * deterministic sample, the corpus encoded in ONE `BpeEncodeAll`
    * pass, the narrow per-doc count frame checkpointed (c11's
    * pattern: 5 integer columns materialize, not text), then one
    * |sources|-row aggregate over exact integer bases. */
  def o8TokenizerFertility(s: SparkSession, d: String, rounds: Int = 16,
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
      .select(col("doc_id"), col("source"), col("n_chars"),
        T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(col("toks")).cast("long").as("n_words"),
        size(enc).cast("long").as("n_bpe"))
      .localCheckpoint(true)
    counted.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("words"),
        sum("n_bpe").as("bpe_toks"),
        sum("n_chars").as("chars"),
        count(when(col("n_bpe") < col("n_words"), 1)).as("compressed_docs"))
      .select(col("source"), col("n_docs"), col("words"), col("bpe_toks"),
        col("chars"), col("compressed_docs"),
        round(col("bpe_toks").cast("double") / col("words"), 4)
          .as("fertility"),
        round(col("chars").cast("double") / col("bpe_toks"), 4)
          .as("chars_per_tok"))
      .orderBy("source")
  }

  /** O9: PACKING-EFFICIENCY report — the acceptance sheet for t18's
    * sequence packing: per source, how many context windows the
    * packed corpus occupies and how full they are (fill below ~1
    * means padding waste the training loop pays for; the number a
    * data-loader dashboard tracks). Derives entirely from t18's
    * packed frame (cached rule mining, one encode pass, one window
    * shuffle) plus two tiny aggregates: a shard's window count is
    * ⌈shard token total / budget⌉ — counting every window the packed
    * stream TOUCHES, not just the ones a doc starts in, so capacity
    * always covers the tokens and waste is the true padding tail
    * (counting start-bins alone showed fill > 1 on straddling docs).
    * Exact integer bases, BIGINT-cast sums in the oracle. */
  def o9PackingReport(s: SparkSession, d: String,
      budget: Long = 256L): DataFrame = {
    val packed = graft.text.TextAnalysis.t18BpePack(s, d)
    val perShard = packed.groupBy("source", "shard").agg(
      count(lit(1)).as("n"), sum("n_tokens").as("tot"))
      .withColumn("windows", floor((col("tot") - 1) / budget) + 1)
    perShard.groupBy("source").agg(
        sum("n").as("n_docs"),
        sum("tot").as("tokens"),
        sum("windows").as("n_bins"))
      .select(col("source"), col("n_docs"), col("tokens"), col("n_bins"),
        (col("n_bins") * budget).as("capacity"),
        round(col("tokens").cast("double") / (col("n_bins") * budget), 4)
          .as("fill_rate"),
        (col("n_bins") * budget - col("tokens")).as("waste"))
      .orderBy("source")
  }

  /** O10: equi-width HISTOGRAM QUANTILE sketch — the mergeable
    * quantile estimator that completes the sketch trio (o6 distinct =
    * HLL, o7 frequency = CMS, o10 quantiles = histogram): per
    * l_returnflag, p50/p90/p99 of l_extendedprice estimated from a
    * B=256-bin equi-width histogram, reported beside the exact values
    * with relative error.
    *
    * Bin counts are plain-SUM mergeable — the property KLL/t-digest
    * trade determinism for; equi-width keeps every step deterministic
    * arithmetic, so the ESTIMATE is oracle-checked, not just
    * error-bounded — and the histogram aggregate carries at most
    * groups×B rows on the shuffle regardless of corpus size. Two
    * corpus passes (bounds, counts; production keeps running bounds
    * and pays one). The covering bin for target rank r = ⌈q·n⌉ is the
    * unique bin with cum−cnt < r ≤ cum; the estimate interpolates
    * linearly inside it. The exact branch (approx_percentile at 1e7
    * accuracy ≡ exact, the q13 device) exists ONLY to certify the
    * estimator — a production profile drops it (the o6/o7 pattern). */
  def o10QuantileSketch(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
    val (est, bounds) = quantileHistEst(li, 256)
    val exact = li.groupBy("flag").agg(
      round(expr("approx_percentile(x, 0.5, 10000000)"), 2).as("p50_exact"),
      round(expr("approx_percentile(x, 0.9, 10000000)"), 2).as("p90_exact"),
      round(expr("approx_percentile(x, 0.99, 10000000)"), 2).as("p99_exact"))
    est.join(broadcast(bounds.select("flag", "n")), "flag")
      .join(exact, "flag")
      .select(col("flag"), col("n"),
        round(col("e50"), 4).as("p50_est"),
        round(col("e90"), 4).as("p90_est"),
        round(col("e99"), 4).as("p99_est"),
        col("p50_exact"), col("p90_exact"), col("p99_exact"),
        round((col("e50") - col("p50_exact")) / col("p50_exact"), 6).as("err50"),
        round((col("e90") - col("p90_exact")) / col("p90_exact"), 6).as("err90"),
        round((col("e99") - col("p99_exact")) / col("p99_exact"), 6).as("err99"))
      .orderBy("flag")
  }

  /** The histogram-quantile estimation pipeline both o10 forms build
    * on: (estimates frame keyed flag → e50/e90/e99, checkpointed
    * bounds). The |groups|-row bounds frame materializes ONCE: its
    * consumers (binning, covering-bin derivation, output n) prune
    * different columns, which de-canonicalizes the subtrees and would
    * re-run the bounds aggregate — and its corpus scan — once per
    * consumer (the t5 gotcha, join form). */
  private def quantileHistEst(li: DataFrame, bins: Int)
      : (DataFrame, DataFrame) = {
    val bounds = li.groupBy("flag").agg(
      min("x").as("lo"), max("x").as("hi"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    val binned = li.join(broadcast(bounds), "flag")
      .select(col("flag"), col("lo"), col("hi"), col("n"),
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / bins))
            .cast("long"), lit(bins - 1L))).as("bin"))
      .groupBy("flag", "bin").agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy("flag").orderBy("bin")
    val cum = binned
      .withColumn("cum", sum("cnt").over(wcum))
      .join(broadcast(bounds), "flag")
    def estQ(q: Double) = {
      val r = ceil(lit(q) * col("n")).cast("long")
      val interp = col("lo") + (col("hi") - col("lo")) / bins *
        (col("bin") + (r - (col("cum") - col("cnt"))).cast("double") /
          col("cnt").cast("double"))
      max(when(col("cum") - col("cnt") < r && col("cum") >= r, interp))
    }
    (cum.groupBy("flag").agg(
      estQ(0.5).as("e50"), estQ(0.9).as("e90"), estQ(0.99).as("e99")),
      bounds)
  }

  /** o10 in its PRODUCTION shape (the o6/o7 rule, r7 verdict #4):
    * histogram-only — bounds pass + one groups×B-row mergeable
    * histogram aggregate, no exact-percentile branch (at production
    * scale the certification column IS the cost: approx_percentile at
    * 1e7 accuracy materializes per-group value buffers). Reports
    * (flag, n, p50/p90/p99 estimates) only. Spec-asserted slot-equal
    * to o10's estimate columns (which the oracle certifies, so this
    * form is certified transitively). */
  private[graft] def o10QuantileSketchProd(s: SparkSession, d: String)
      : DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
    val (est, bounds) = quantileHistEst(li, 256)
    est.join(broadcast(bounds.select("flag", "n")), "flag")
      .select(col("flag"), col("n"),
        round(col("e50"), 4).as("p50_est"),
        round(col("e90"), 4).as("p90_est"),
        round(col("e99"), 4).as("p99_est"))
      .orderBy("flag")
  }

  /** O11: BLOOM FILTER membership sketch — the fourth member of the
    * sketch family (o6 distinct = HLL, o7 frequency = CMS, o10
    * quantiles = histogram, o11 MEMBERSHIP = Bloom): per source, a
    * m=2048-bit / k=3-hash filter over content hashes, reported with
    * its fill-derived cardinality estimate (−m/k·ln(1−X/m)) and a
    * MEASURED false-positive count from probing every other source's
    * documents — the certification the membership answer ships with.
    * Production use is the d9/d16 ingest shape: probe the bloom
    * before touching the exact store, so definitely-new documents
    * skip the store lookup entirely; 2048 bits per stratum is the
    * state that survives any corpus size.
    *
    * Determinism: content hash = DuckDB-identical md5 lower 64 masked
    * to 31 bits; positions from the o7 pairwise-independent
    * (a·h+b) mod p mod m family — the whole filter, its estimate, and
    * every probe verdict hash-check against the oracle. Bits pack
    * into 32-bit words (shift < 32 never overflows int64 in either
    * engine — 1<<63 does) via bit_or hash aggregation with map-side
    * partials: the shuffle carries ≤ sources×64 word rows regardless
    * of corpus size. The exact-count and truth-set branches exist
    * only to certify estimate and FP verdicts (the o6 rule). The
    * 4-consumer (doc_id, source, hh) hash frame checkpoints once (the
    * o10 bounds rule). */
  def o11BloomFilter(s: SparkSession, d: String): DataFrame =
    bloomFrame(Tables.documents(s, d), 2048, 31)

  /** O11 PRODUCTION form: the packed filter's occupancy stats +
    * Swamidass–Baldi cardinality estimate alone — ONE corpus scan,
    * two hash aggregates, zero joins. The registered o11 query; the
    * certification machinery ([[o11BloomFilter]]: exact
    * countDistinct beside the estimate, the cross-source probe
    * membership sweep and the truth-set anti-join measuring the FP
    * rate) exists to CERTIFY the filter and retires to spec status
    * (function-driven plan contract + the prod ≡ cert equivalence
    * spec), the o6/o7/o10/o12 move — completing the sketch set. */
  def o11BloomProd(s: SparkSession, d: String): DataFrame =
    bloomProdFrame(Tables.documents(s, d), 2048)

  private[graft] def bloomProdFrame(docsIn: DataFrame,
      m: Int): DataFrame = {
    import graft.functions.{TextFunctions => T}
    // the lean single-chain build: no checkpoints (nothing has a
    // second consumer here — the cert form's bloomCore checkpoints
    // exist for ITS probe/exact branches)
    val h = docsIn.filter(col("text").isNotNull)
      .select(col("source"),
        T.md5Lo64(col("text")).bitwiseAND(lit(2147483647L)).as("hh"))
    val words = h.selectExpr("source", bloomPosStack(m, "hh"))
      .groupBy(col("source"), expr("p div 32").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").as("bits"))
    words.groupBy("source")
      .agg(sum(bit_count(col("bits"))).cast("bigint").as("bits_set"))
      .selectExpr("source", "bits_set",
        s"case when bits_set >= $m then null else " +
          s"round(-$m.0 / 3.0 * ln(1.0 - bits_set / $m.0), 2) end as est_n")
      .orderBy("source")
  }

  /** o11's body with explicit filter width and probe modulus —
    * exposed so the spec can drive a deliberately saturated filter
    * (small m ⇒ guaranteed false positives) and pin membership
    * semantics: no false negatives ever, FPs only outside the truth
    * set. */
  private def bloomPosStack(m: Int, col0: String) =
    s"stack(3, 0, ((101 * $col0 + 17) % 2147483647) % $m, " +
      s"1, ((1009 * $col0 + 29) % 2147483647) % $m, " +
      s"2, ((10007 * $col0 + 71) % 2147483647) % $m) as (i, p)"

  /** The (doc hash frame, packed filter words) pair every bloom
    * consumer builds on; both checkpoint (multi-consumer narrow
    * frames — the o10 bounds rule). */
  private def bloomCore(docsIn: DataFrame, m: Int)
      : (DataFrame, DataFrame) = {
    import graft.functions.{TextFunctions => T}
    val h = docsIn.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        T.md5Lo64(col("text")).bitwiseAND(lit(2147483647L)).as("hh"))
      .localCheckpoint(true)
    val words = h.selectExpr("source", bloomPosStack(m, "hh"))
      .groupBy(col("source"), expr("p div 32").as("w"))
      .agg(expr("bit_or(shiftleft(1L, cast(p % 32 as int)))").as("bits"))
      .localCheckpoint(true) // consumers: stats + the membership join
    (h, words)
  }

  /** Per-(probe, filter) membership verdicts over EVERY source pair
    * including a probe's own — the spec surface: an own-source probe
    * must ALWAYS hit (a bloom filter has no false negatives), and a
    * cross-source hit outside the truth set is a false positive. */
  private[graft] def bloomVerdicts(docsIn: DataFrame, m: Int,
      probeMod: Int): DataFrame = {
    val (h, words) = bloomCore(docsIn, m)
    val probes = h.filter(col("doc_id") % probeMod === 0)
      .select(col("doc_id"), col("source").as("psrc"), col("hh"))
    val srcs = h.select("source").distinct()
    val cand = probes.crossJoin(broadcast(srcs))
      .selectExpr("source as bsrc", "psrc", "doc_id", "hh",
        bloomPosStack(m, "hh"))
    val nset = cand
      .join(broadcast(words.withColumnRenamed("source", "wsrc")),
        col("bsrc") === col("wsrc") && expr("p div 32 = w"))
      .filter(expr("(bits >> cast(p % 32 as int)) & 1 = 1"))
      .groupBy("bsrc", "psrc", "doc_id", "hh")
      .agg(count(lit(1)).as("nset"))
    probes.crossJoin(broadcast(srcs)).select(
        col("source").as("bsrc"), col("psrc"), col("doc_id"), col("hh"))
      .join(nset, Seq("bsrc", "psrc", "doc_id", "hh"), "left")
      .withColumn("hit", coalesce(col("nset"), lit(0L)) === 3)
      .drop("nset")
  }

  private[graft] def bloomFrame(docsIn: DataFrame, m: Int,
      probeMod: Int): DataFrame = {
    val (h, words) = bloomCore(docsIn, m)
    val stats = words.groupBy("source")
      .agg(sum(bit_count(col("bits"))).cast("bigint").as("bits_set"))
    val exact = h.groupBy("source")
      .agg(countDistinct("hh").as("n_distinct"))
    val probes = h.filter(col("doc_id") % probeMod === 0)
      .select(col("doc_id"), col("source").as("psrc"), col("hh"))
    val srcs = h.select("source").distinct()
    val cand = probes.crossJoin(broadcast(srcs))
      .filter(col("source") =!= col("psrc"))
      .selectExpr("source as bsrc", "doc_id", "hh", bloomPosStack(m, "hh"))
    val hits = cand
      .join(broadcast(words.withColumnRenamed("source", "wsrc")),
        col("bsrc") === col("wsrc") && expr("p div 32 = w"))
      .filter(expr("(bits >> cast(p % 32 as int)) & 1 = 1"))
      .groupBy("bsrc", "doc_id", "hh")
      .agg(count(lit(1)).as("nset"))
      .filter(col("nset") === 3)
    // Truth-set columns are RENAMED before the anti-join: hits and eh
    // both descend from the checkpointed h, and a same-name hh === hh
    // predicate would be rescued only by Catalyst's self-join
    // disambiguation heuristic (with a "trivially true equals" log
    // warning). Distinct names make the join unambiguous by
    // construction — the o11 plan contract asserts the anti-join keys.
    val eh = h.select(col("source").as("t_src"), col("hh").as("t_hh"))
      .distinct()
    val fps = hits.join(eh,
        col("bsrc") === col("t_src") && col("hh") === col("t_hh"),
        "left_anti")
      .groupBy("bsrc").agg(count(lit(1)).as("fp_probes"))
      .withColumnRenamed("bsrc", "source")
    val nprobes = broadcast(srcs).crossJoin(probes)
      .filter(col("psrc") =!= col("source"))
      .groupBy("source").agg(count(lit(1)).as("n_probes"))
    stats.join(exact, "source").join(nprobes, "source")
      .join(fps, Seq("source"), "left")
      .selectExpr("source", "n_distinct", "bits_set",
        s"case when bits_set >= $m then null else " +
          s"round(-$m.0 / 3.0 * ln(1.0 - bits_set / $m.0), 2) end as est_n",
        "n_probes", "coalesce(fp_probes, 0L) as fp_probes")
      .orderBy("source")
  }

  def c10WeightedReservoir(s: SparkSession, d: String,
      k: Int = 20, salts: Int = 8): DataFrame =
    weightedReservoirFrame(Tables.documents(s, d), k, salts)

  /** c10's body over an arbitrary (doc_id, source, n_chars) frame —
    * exposed so the two-phase ≡ single-window spec can drive it on a
    * skewed synthetic stratum as well as the corpus. */
  private[graft] def weightedReservoirFrame(docsIn: DataFrame,
      k: Int, salts: Int): DataFrame = {
    val docs = docsIn.selectExpr(
      "doc_id", "source", "n_chars",
      // same mod-2^31-first guard as o6: keeps the mixer exact past
      // 2^31 keys without changing any value at test scale
      "round(-ln((cast(((doc_id % 2147483648) * 2654435761) " +
        "% 4294967296 as bigint) " +
        "+ 1) / 4294967297.0) / n_chars, 9) as ekey")
    val salted = docs.withColumn("salt", expr(s"cast(doc_id % $salts as int)"))
    val w1 = Window.partitionBy("source", "salt")
      .orderBy(col("ekey").asc, col("doc_id").asc)
    val phase1 = salted.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= k)
    val w2 = Window.partitionBy("source")
      .orderBy(col("ekey").asc, col("doc_id").asc)
    phase1.withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= k)
      .select("source", "rk", "doc_id", "n_chars", "ekey")
      .orderBy("source", "rk")
  }

  /** O12: per-source MINHASH SIGNATURE similarity — the corpus-level
    * "how much do my sources overlap" report. Each source folds into
    * ONE 32-slot minhash signature: the element-wise min of d2's
    * per-doc signatures equals the minhash of the source's shingle
    * UNION (min over docs of min over doc shingles = min over the
    * union), so a source's whole shingle set compresses to 32 longs —
    * constant state per source, the only dataset-overlap shape that
    * survives 100 TB (the pairwise-exact branch below is the o6-rule
    * certification and is exactly what a production profile drops).
    * Every source pair then reports estimated Jaccard (matching
    * slots / 32) beside the exact shingle-set Jaccard and the
    * absolute estimator error — the overlap matrix a source-mixing
    * decision (c5/c9/c12/c14) reads before trusting its strata to be
    * distinct. Reference's per-source profiling only counts rows
    * (`bz_etl.py` per-table counts); cross-source CONTENT overlap is
    * the LLM-era extension of that report.
    *
    * Scale shape: per-doc signatures come from the d2 native
    * expression in one corpus pass; the per-(source, slot) min is a
    * map-side-combined hash aggregate whose shuffle carries ≤
    * sources×32 rows at any corpus size; the |sources|-row signature
    * frame checkpoints once (both sides of the pair cross read it)
    * and pairs are a |sources|²-row driver-free cross. The exact
    * branch's distinct (source, hash32) frame checkpoints once
    * (consumers: sizes + both intersection sides). Determinism: the
    * same md5-derived permutations as d2 (MinHashParams interpolated
    * into the oracle), so the ESTIMATE hash-checks, not just its
    * error bound. */
  def o12SourceSimilarity(s: SparkSession, d: String): DataFrame =
    sourceSimilarityFrame(Tables.documents(s, d))

  /** The per-source minhash signature fold both o12 forms build on:
    * one native-expression corpus pass, then the element-wise fold to
    * |sources|×32 rows (map-side partial min). */
  private def sourceSigs(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    docs
      .select(col("source"), posexplode(
        T.minhashSignatureText(col("text"), 5, 32)).as(Seq("j", "h")))
      .groupBy("source", "j").agg(min("h").as("h"))
      .groupBy("source")
      .agg(array_sort(collect_list(struct(col("j"), col("h")))).as("jh"))
      .select(col("source"), col("jh.h").as("sig"))
      .localCheckpoint(true) // consumers: both sides of the pair cross
  }

  /** o12 in its PRODUCTION shape (the o6/o7 rule, r7 verdict #4):
    * signature-only — the similarity matrix a 100 TB profile actually
    * runs. The exact shingle-set branch in [[o12SourceSimilarity]] is
    * corpus-scale certification work (a distinct (source, hash) self
    * join that dominated o12's wall ~90%); this form reports
    * (src1, src2, est_jac) from the |sources|×32-row signature fold
    * alone — constant state per source, nothing else touches the
    * corpus. Spec-asserted: est_jac slot-equal to o12's on every
    * pair (which the oracle certifies, so this form is certified
    * transitively). */
  private[graft] def o12SourceSimilarityProd(s: SparkSession, d: String)
      : DataFrame = {
    import graft.functions.{TextFunctions => T}
    val sigs = sourceSigs(
      Tables.documents(s, d).filter(col("text").isNotNull))
    sigs.as("a")
      .join(sigs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src1"), col("b.source").as("src2"),
        round(T.minhashJaccardEst(col("a.sig"), col("b.sig"), 32), 6)
          .as("est_jac"))
      .orderBy("src1", "src2")
  }

  /** o12's body over an arbitrary documents frame — exposed so the
    * spec can drive identical-source / disjoint-source fixtures and
    * the fold-≡-union-sketch property. */
  private[graft] def sourceSimilarityFrame(docsIn: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val docs = docsIn.filter(col("text").isNotNull)
    val sigs = sourceSigs(docs)
    // exact branch (certification-only, the o6 rule): the true
    // distinct-shingle sets, as DuckDB-identical 32-bit hashes
    val sh = docs
      .select(col("source"), explode(T.shingleSet(col("text"), 5)).as("g"))
      .select(col("source"),
        T.md5Lo64(col("g")).bitwiseAND(lit(4294967295L)).as("x"))
      .distinct()
      .localCheckpoint(true) // consumers: sizes + intersection a/b
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.x") === col("b.x") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
      .agg(count(lit(1)).as("n_common"))
    sigs.as("a")
      .join(sigs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src1"), col("b.source").as("src2"),
        T.minhashJaccardEst(col("a.sig"), col("b.sig"), 32).as("est"))
      .join(broadcast(sizes.select(col("source").as("src1"),
        col("n").as("n1"))), "src1")
      .join(broadcast(sizes.select(col("source").as("src2"),
        col("n").as("n2"))), "src2")
      .join(broadcast(inter), Seq("src1", "src2"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(col("src1"), col("src2"),
        round(col("est"), 6).as("est_jac"), col("n1"), col("n2"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")), 6).as("exact_jac"),
        round(abs(col("est") - col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common"))), 6).as("abs_err"))
      .orderBy("src1", "src2")
  }
}
