package graft.text

import graft.Tables
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All column
  * programs — one narrow map stage, no shuffle except final ordering.
  *
  * Broadcast-hint boundedness ledger (r12 verdict #1 sweep): the only
  * hinted build sides are 1-row scalar frames (`n`, `total`, `tot`,
  * `stats`, `prior` — corpus totals/averages collapsed by a full
  * aggregate), the query-term list (`qterms`, |query| rows), and the
  * single BPE merge `rule` (1 row per round). Vocabulary-sized
  * frames (tf/df/weight tables) deliberately do NOT hint — t5's
  * no-dictionary-broadcast law, enforced for t19 at
  * PlanContractSpec "t19:" — because a 100 TB corpus's vocabulary is
  * itself corpus-proportional.
  */
object TextAnalysis {

  private[graft] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** Marker profiles per language for the n-gram/stopword heuristic.
    * (Synthetic corpus: profiles are small, deterministic sets.) */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "fast", "slow"),
    "de" -> Seq("der", "und", "von", "schnell"),
    "fr" -> Seq("le", "et", "de", "vite"),
    "es" -> Seq("el", "y", "de", "rapido"),
    "zh" -> Seq("de", "he", "kuai"))

  /** T1: language ID — score each language by marker-token overlap,
    * pick the argmax (ties → lexicographically first). One pass,
    * column-only; at scale this is a pure map stage. */
  def t1LangId(s: SparkSession, d: String): DataFrame = {
    val toks = T.tokenSet(col("text"))
    val scored: Column = array(langMarkers.toSeq.sortBy(_._1).map {
      case (lang, markers) =>
        struct(
          size(array_intersect(toks,
            array(markers.map(lit): _*))).as("score"),
          lit(lang).as("lang"))
    }: _*)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("actual"),
        element_at(array_sort(scored,
          (a, b) => when(a.getField("score") > b.getField("score"), -1)
            .when(a.getField("score") < b.getField("score"), 1)
            .when(a.getField("lang") < b.getField("lang"), -1)
            .when(a.getField("lang") > b.getField("lang"), 1)
            .otherwise(0)), 1).getField("lang").as("predicted"))
      .orderBy("doc_id")
  }

  /** T2: quality scoring — length, token count, stopword ratio,
    * punctuation ratio, mean token length. */
  def t2QualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = T.tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        size(toks).cast("long").as("n_tokens"),
        round(size(filter(toks, t => array_contains(stopArr, t)))
          .cast("double") / size(toks), 4).as("stop_ratio"),
        round((length(col("text")) -
          length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / length(col("text")), 4).as("punct_ratio"),
        round((length(col("text")) - size(toks) + 1).cast("double") /
          size(toks), 4).as("mean_tok_len"))
      .orderBy("doc_id")
  }

  /** T3: token counting — whitespace tokens and a BPE-ish regex
    * segmentation (letter runs / digit runs / single symbols). */
  def t3TokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
          .as("bpe_tokens"))
      .orderBy("doc_id")

  /** T9: PII redaction — the scrubbing pass every pretraining corpus
    * runs before anything else: regex-detect emails and IPv4s, count
    * them, and replace with typed placeholder tokens. Pure map stage
    * (codegen'd regexp expressions), so it scales like t1-t8. The
    * corpus here is clean synthetic text, so a deterministic
    * contact-line is appended per document to give the detectors live
    * signal — the oracle synthesizes the identical line and re-runs
    * the same patterns (Java regex and DuckDB's RE2 agree on this
    * dialect subset: char classes, \d, \b, +). */
  def t9PiiRedact(s: SparkSession, d: String): DataFrame = {
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+"
    val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val raw = concat(col("text"),
      lit(" contact u"), col("doc_id") % 50, lit("@mail.example from 10."),
      col("doc_id") % 200, lit(".0.7"))
    Tables.documents(s, d)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailPat), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(ipPat), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(regexp_replace(col("raw"), emailPat, "<EMAIL>"),
          ipPat, "<IP>").as("clean"))
      .orderBy("doc_id")
  }

  /** T4: rolling-hash document fingerprint (content-defined identity
    * that survives storage/encoding changes, unlike md5 of raw bytes). */
  def t4Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** T8: repetition signals — the published MassiveText/Gopher-style
    * quality rules flag documents whose content repeats itself:
    * duplicate-token fraction and duplicate word-3-gram fraction
    * (Rae et al. 2021, "Scaling Language Models", table A1 uses
    * duplicate line/paragraph/n-gram fractions). Pure map stage;
    * `keep` applies an illustrative threshold pair. */
  def t8Repetition(s: SparkSession, d: String): DataFrame = {
    // toks materialized before the lambda — see Dedup.wordGrams
    val toks = col("toks")
    val n = size(toks)
    val grams = transform(sequence(lit(0), n - 3),
      i => concat_ws(" ", element_at(toks, i + 1),
        element_at(toks, i + 2), element_at(toks, i + 3)))
    Tables.documents(s, d)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 4)
          .as("dup_tok_frac"),
        when(n >= 3, round(lit(1.0) -
            size(array_distinct(grams)).cast("double") / (n - 2), 4))
          .otherwise(0.0).as("dup_3gram_frac"))
      .withColumn("keep",
        col("dup_tok_frac") < 0.8 && col("dup_3gram_frac") < 0.6)
      .orderBy("doc_id")
  }

  /** T6: text normalization for pretraining — strip URLs and emails,
    * collapse whitespace runs, trim, lowercase. The standard cleanup
    * pass before dedup/tokenization; pure map stage, regexes chosen
    * to behave identically under Java regex and RE2. */
  def t6NormalizeText(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(regexp_replace(
          lower(col("text")),
          "https?://[^ ]+", " "),
          "[^ ]+@[^ ]+", " "),
          " +", " ")).as("clean"))
      .withColumn("n_clean_chars", length(col("clean")).cast("long"))
      .orderBy("doc_id")

  /** T7: sequence packing — concatenate documents per (source, shard)
    * in doc_id order and chunk the token stream into fixed context
    * windows (`budget` tokens): each document records its window
    * (`bin`) and offset, exactly the concat-then-chunk packing a
    * pretraining loader does. The shard (deterministic doc_id mod) is
    * load-bearing for scale: a window keyed on `source` alone puts a
    * whole stratum — potentially most of a 100 TB corpus — into ONE
    * window partition; sharding bounds every cumsum partition, and a
    * distributed loader consumes shards independently anyway. */
  def t7SeqPack(s: SparkSession, d: String, budget: Long = 256L,
      shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (col("doc_id") % shards).as("shard"),
        size(T.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        ((col("cum") - col("n_tokens")) / budget).cast("long").as("bin"),
        ((col("cum") - col("n_tokens")) % budget).as("bin_offset"))
      .orderBy("doc_id")
  }

  /** T5: TF-IDF top terms per document — explode → tf, document
    * frequency, smoothed idf, top-3 per doc ranked on the quantized
    * score (cross-engine determinism). The corpus is scanned and
    * exploded ONCE: df derives from tf (tf has exactly one row per
    * (doc,term), so count == countDistinct docs) and Catalyst reuses
    * the tf aggregate exchange for both join branches. The term
    * dictionary is NOT broadcast — at 100 TB distinct terms run to
    * billions; the shuffle hash join on `term` (AQE's pick) is the
    * scale-safe plan. Only the 1-row corpus count broadcasts. */
  def t5Tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val terms = docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // count(tf >= 1), not count(1): every tf is >= 1 so the value is
    // identical, but the predicate genuinely references the tf column,
    // which keeps this branch's partial aggregate IDENTICAL to the tf
    // branch's. With count(1) (or count(tf), which the optimizer
    // rewrites to count(1) for a non-null column) column pruning turns
    // this side into a bare distinct, the two (doc_id, term) exchanges
    // stop being canonically equal, and exchange reuse — ONE corpus
    // scan instead of two — is lost.
    val df = tf.groupBy("term")
      .agg(count(when(col("tf") >= 1, 1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        log((col("n") + 1.0) / (col("df") + 1.0)), 4))
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "term", "score")
      .orderBy("doc_id", "rk")
  }

  /** T11: unigram-LM perplexity scoring — the CCNet-style quality
    * filter (Wenzek et al. 2019 train a KenLM and keep the
    * low-perplexity head/middle of each language; the web-scale
    * pipeline's main quality knob). The LM here is the corpus's own
    * unigram distribution: ppl(doc) = exp(−Σ tf·ln p(term) / Σ tf).
    * Plan shape is t5's: one (doc,term) tf aggregation feeds the term
    * totals, the corpus total (a 1-row broadcast), and the scoring
    * join — shuffles on term, never on raw text, scaling to
    * billion-term vocabularies where a broadcast dictionary dies.
    * The per-doc log-sum folds over a TERM-SORTED list, so both
    * engines add the same doubles in the same order — summation
    * order is the one float nondeterminism rounding cannot paper
    * over (partial-agg order varies run to run). */
  def t11Perplexity(s: SparkSession, d: String, maxPpl: Double = 30.1)
      : DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = tf.agg(sum("tf").as("total"))
    tf.join(cnt, "term").crossJoin(broadcast(total))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("double") *
          log(col("cnt").cast("double") / col("total"))).as("wll"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        array_sort(collect_list(struct(col("term"), col("wll"))))
          .as("parts"))
      .select(col("doc_id"), col("n_tokens"),
        // native fold (StructFieldSum): same left-to-right arithmetic
        // as the aggregate HOF, no interpreted lambda per term — the
        // 30x probe put the HOF fold at 21.7 s for this stage
        round(exp(-graft.functions.VectorFunctions
          .structFieldSum(col("parts"), "wll") / col("n_tokens")), 4)
          .as("ppl"))
      .withColumn("keep", col("ppl") <= maxPpl)
      .orderBy("doc_id")
  }

  /** T12: BM25 top-k retrieval — the ranking function behind corpus
    * search (Robertson & Zaragoza 2009: idf · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl))), the retrieval verb a training-data
    * pipeline needs for targeted curation and decontamination lookups.
    * Queries are the d6 eval stand-in docs (doc_id % 97 == 0); their
    * distinct tokens search the remaining corpus.
    *
    * Scale shape is t5/t11's: ONE (doc,term) tf aggregation feeds doc
    * length, document frequency, and the scoring join (exchange
    * reuse — the corpus is scanned once and never broadcast); the
    * query term list is the only broadcast side. BM25's float sum is
    * order-sensitive and partial-agg order is nondeterministic, so
    * per-term weights are quantized to 2^20 fixed point and summed as
    * LONGS — associative, exact, order-free — then scaled back
    * (t11's sorted-list fold solves the same problem, but it needs an
    * ObjectHashAggregate collect_list; the integer sum keeps this
    * aggregation inside whole-stage codegen, which matters here
    * because matched (query,doc,term) triples are the one frame that
    * can dwarf the corpus when queries share vocabulary). */
  def t12Bm25(s: SparkSession, d: String, k: Int = 5,
      qBound: Long = Long.MaxValue): DataFrame =
    // qBound caps the QUERY WORKLOAD at a fixed id range (r1 passes
    // 97·64): scoring cost is Σ_term df·qf, so a query set that
    // grows with the corpus (every 97th doc — the probe protocol)
    // measures an n² regime no deployment has; a production query
    // BATCH is fixed-size. Default unbounded = t12's own semantics.
    // The CORPUS split stays the unbounded %97 rule either way, so
    // the two never overlap and the arm corpora stay aligned.
    bm25Score(s, d, bm25Weights(s, d), k, qBound)

  /** The per-(doc, term) BM25 weight frame over the non-query corpus
    * — everything in t12 that does NOT depend on the query batch.
    * This is the content of r1's lexical-arm STORE ([[graft
    * .similarity.Similarity.r1EnsureLexStore]]): persisted once per
    * (corpus, fingerprint), it retires the per-invocation corpus
    * tokenize + tf/df/dl recompute; only Σ df·qf scoring volume
    * remains at query time. */
  private[graft] def bm25Weights(s: SparkSession, d: String)
      : DataFrame = {
    val k1 = 1.2; val b = 0.75
    val isQuery = col("doc_id") % 97 === 0
    val docs = Tables.documents(s, d)
    val tf = docs.filter(!isQuery)
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // count(tf >= 1) keeps this branch's partial aggregate canonically
    // equal to tf's so the exchange is reused (see t5)
    val df = tf.groupBy("term").agg(count(when(col("tf") >= 1, 1)).as("df"))
    val stats = docs.filter(!isQuery).agg(
      count(lit(1)).as("n"),
      (sum(size(filter(T.tokens(col("text")), t => t =!= "")))
        .cast("double") / count(lit(1))).as("avgdl"))
    tf.join(df, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        (log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / col("avgdl")))).as("w"))
  }

  /** Query-time BM25 scoring over an arbitrary weight frame — inline
    * ([[bm25Weights]]) or read back from the persisted lexical store;
    * the query-term list is the only broadcast side either way. */
  private[graft] def bm25Score(s: SparkSession, d: String,
      w: DataFrame, k: Int, qBound: Long): DataFrame = {
    val isQuery = col("doc_id") % 97 === 0
    val qterms = Tables.documents(s, d)
      .filter(isQuery && col("doc_id") < qBound)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(T.tokens(col("text")))).as("term"))
      .filter(col("term") =!= "")
    w.join(broadcast(qterms), "term")
      // floor(x+0.5), not round(): no round-half tie for the engines
      // to disagree on (same rule as e1)
      .withColumn("wq",
        floor(col("w") * lit(1048576.0) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("wq").as("wq_sum"))
      .select(col("query_id"), col("doc_id"),
        round(col("wq_sum").cast("double") / lit(1048576.0), 4).as("score"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score")
      .orderBy("query_id", "rk")
  }

  /** T10: C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): keep
    * a line only if it (a) has at least `minWords` words, (b) contains
    * no blocklisted boilerplate token (C4 drops "javascript"/cookie
    * notices), and (c) ends in a terminal mark (C4: terminal
    * punctuation); keep the document only if ≥ `minLines` lines
    * survive. The rule SETS are parameters because the test corpus has
    * neither punctuation nor web boilerplate — the operator is the
    * same composition of per-line predicates C4 runs. Lines are
    * delimited by the sentinel token "line" (the corpus has no
    * newlines); everything is array HOFs in one map stage — no
    * explode, no shuffle, scales as a pure scan. */
  def t10LineFilter(s: SparkSession, d: String, minWords: Int = 5,
      minLines: Int = 2,
      stopTokens: Seq[String] = Seq("dup"),
      terminal: Seq[String] = Seq("value", "table", "fast", "scan", "key",
        "row", "data", "join", "hash", "order", "column", "group"))
      : DataFrame = {
    val lines = split(col("text"), " line ")
    def words(l: Column) = filter(split(l, " "), w => w =!= "")
    def lineOk(l: Column) =
      size(words(l)) >= minWords &&
        !exists(words(l), w => w.isin(stopTokens: _*)) &&
        element_at(words(l), -1).isin(terminal: _*)
    Tables.documents(s, d)
      .select(col("doc_id"), size(lines).cast("long").as("n_lines"),
        filter(lines, lineOk _).as("kept"))
      .select(col("doc_id"), col("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " | ").as("text_clean"),
        (size(col("kept")) >= minLines).as("keep"))
      .orderBy("doc_id")
  }

  /** T13: BOILERPLATE n-gram mining — the corpus-level report that
    * FEEDS a line filter's blocklist (t10 consumes such a list; C4
    * curated its boilerplate rules from exactly this signal): the
    * top-k word n-grams by DOCUMENT frequency with their share of
    * documents. High-df n-grams across unrelated documents are
    * navigation chrome, license headers, cookie banners — the
    * repeated-content signal at corpus granularity (t8 measures it
    * within a document, d7 at span level). Plan: one scan → per-doc
    * DISTINCT grams (array HOF, so a gram repeated inside one doc
    * counts once — df, not tf) → explode into a high-cardinality
    * hash aggregate with map-side combine → global top-k as
    * TakeOrdered (no full-vocab window); only the k-row frame ranks.
    * At 100 TB the only full-volume stage is the aggregate. */
  def t13Boilerplate(s: SparkSession, d: String, n: Int = 3,
      k: Int = 20): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val grams = docs
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(graft.dedup.Dedup.wordGrams(col("toks"), n)))
          .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("total"))
    grams.crossJoin(broadcast(total))
      .select(col("gram"), col("df"),
        round(col("df").cast("double") / col("total"), 6).as("share"))
      .orderBy(col("df").desc, col("gram")).limit(k)
  }

  /** T14: BPE MERGE-RULE MINING — the core loop of tokenizer training
    * (Sennrich et al. 2016), distributed: per round, count adjacent
    * token pairs over the whole corpus (one hash aggregate with
    * map-side combine), take the most frequent pair (freq desc, then
    * lexicographic — deterministic), and apply it everywhere as a
    * greedy LEFT-TO-RIGHT non-overlapping merge before the next
    * round. The merge is a pure map: the single winning rule rides a
    * broadcast cross join, and the fold's "replace the last element
    * when it equals `left` and the current equals `right`" is
    * non-overlapping by construction (the merged token no longer
    * equals `left`). k rounds = k corpus aggregates — the honest
    * distributed formulation of the k-pass training loop (single-node
    * trainers incrementalize with a heap; the per-round aggregate is
    * what shards). Output: the mined rules (round, left, right, freq)
    * — vocabulary-sized, not corpus-sized.
    *
    * Both engines run the IDENTICAL fold (Spark `aggregate` lambda ≡
    * DuckDB `list_reduce`), so round-2+ counts — which depend on
    * round-1's applied merge — hash-check exactly. */
  def t14BpeMerges(s: SparkSession, d: String,
      rounds: Int = 3): DataFrame = {
    // toks materialized before every lambda — see Dedup.wordGrams
    def pairCounts(df: DataFrame): DataFrame = {
      val toks = col("toks")
      df.select(explode(transform(sequence(lit(0), size(toks) - 2, lit(1)),
          i => struct(element_at(toks, i + 1).as("l"),
            element_at(toks, i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("freq"))
    }
    def top1(counts: DataFrame): DataFrame =
      counts.orderBy(col("freq").desc, col("l"), col("r")).limit(1)
    def applyRule(df: DataFrame): DataFrame =
      df.select(
        T.bpeMergeApply(col("toks"), col("l"), col("r")).as("toks"))
    t14Rounds(rounds, pairCounts, top1, applyRule,
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(T.tokens(col("text")).as("toks")))
  }

  /** Reference HOF form of the t14 merge step — interpreted aggregate
    * fold, used only by the equivalence spec. */
  private[graft] def bpeMergeFoldHof(toks: Column, l: Column,
      r: Column): Column =
    aggregate(toks,
      array().cast("array<string>"),
      (acc, t) => when(
        size(acc) > 0 && element_at(acc, -1) === l && t === r,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(l, r))))
        .otherwise(concat(acc, array(t))))

  private def t14Rounds(rounds: Int,
      pairCounts: DataFrame => DataFrame,
      top1: DataFrame => DataFrame,
      applyRule: DataFrame => DataFrame,
      initial: DataFrame): DataFrame = {
    var cur = initial
    var out: DataFrame = null
    for (round <- 1 to rounds) {
      val rule = top1(pairCounts(cur))
        .select(col("l"), col("r"), col("freq"))
        .localCheckpoint(true)
      val row = rule
        .select(lit(round.toLong).as("round"), col("l").as("left"),
          col("r").as("right"), col("freq"))
      out = if (out == null) row else out.union(row)
      if (round < rounds) cur = applyRule(cur.crossJoin(broadcast(rule)))
        .localCheckpoint(true)
    }
    out.orderBy("round")
  }

  /** T15: sliding-window chunking — context-window preparation for
    * RAG / packed pre-training: fixed-`chunk`-token windows every
    * `stride` tokens, with the LAST window anchored so every token is
    * covered but no window is a pure subset of its predecessor
    * (starts = 0, stride, …, stride·⌈(n−chunk)/stride⌉). Each chunk
    * row carries its exact token span fingerprint (md5 over the
    * joined tokens), so the oracle pins content, not just counts.
    *
    * Scale: tokens materialize once per doc, starts come from a
    * per-row `sequence` explode, the slice+hash is a pure map —
    * no shuffle at any corpus size; output rows ≈ n_tokens/stride. */
  def t15Chunk(s: SparkSession, d: String,
      chunk: Int = 64, stride: Int = 48): DataFrame = {
    val n = col("n_toks")
    val lastIdx = greatest(lit(0),
      ceil((n - chunk).cast("double") / stride).cast("int"))
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), lastIdx, lit(1))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id").cast("long") * stride).as("start_tok"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(chunk))
          .as("ctoks"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  /** T16: BPE tokenizer APPLY — the encode side of t14's trainer.
    * Mines `rounds` merge rules on the corpus (t14's loop), then the
    * final corpus state — every document encoded by all rules applied
    * in rank order (subword-nmt semantics: each rule merged greedily
    * left-to-right before the next rank) — is emitted with the exact
    * encoded sequence pinned by md5. Rules are 1-row broadcasts; each
    * encode pass is a pure map — the corpus never shuffles.
    * Frame-parametrized so the spec can drive a toy corpus. */
  def t16BpeEncodeFrame(docs: DataFrame, rounds: Int): DataFrame = {
    def pairCounts(df: DataFrame): DataFrame = {
      val toks = col("toks")
      df.select(explode(transform(sequence(lit(0), size(toks) - 2, lit(1)),
          i => struct(element_at(toks, i + 1).as("l"),
            element_at(toks, i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("freq"))
    }
    var cur = docs
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens_raw"))
    for (_ <- 1 to rounds) {
      val rule = pairCounts(cur)
        .orderBy(col("freq").desc, col("l"), col("r")).limit(1)
        .select(col("l"), col("r"))
        .localCheckpoint(true)
      cur = cur.crossJoin(broadcast(rule))
        .select(col("doc_id"),
          T.bpeMergeApply(col("toks"), col("l"), col("r")).as("toks"),
          col("n_tokens_raw"))
        .localCheckpoint(true)
    }
    cur.select(col("doc_id"), col("n_tokens_raw"),
      size(col("toks")).cast("long").as("n_tokens"),
      md5(concat_ws("\u0001", col("toks"))).as("seq_md5"))
      .orderBy("doc_id")
  }

  def t16BpeEncode(s: SparkSession, d: String,
      rounds: Int = 3): DataFrame =
    t16BpeEncodeFrame(
      // spread the unsplittable scan: tokenize + 3 merge passes + 3
      // pair explosions otherwise run on the single row-group's one
      // task (r15 opt — see Tables.spread; identity at any
      // production split count)
      Tables.spread(Tables.documents(s, d).filter(col("text").isNotNull))
        .select(col("doc_id"), T.tokens(col("text")).as("toks")),
      rounds)

  /** T17: PRODUCTION BPE TOKENIZE — the one-pass encode verb. t16
    * applies each merge rule as its OWN projection/pass, which is
    * fine at rounds=3 but a scale-killer in RULE COUNT: a production
    * tokenizer carries ~30k ranked rules, and 30k chained corpus
    * passes cannot ship. Here the FULL ranked rule table rides the
    * plan as a literal (rule tables are vocabulary-sized — a 30k-rule
    * table is ~1 MB, the canonical broadcast-side dimension) and each
    * document is encoded in ONE native-expression evaluation
    * ([[graft.expressions.BpeEncodeAll]]): rule k applied greedily
    * left-to-right over the in-memory result of rules 1..k-1 —
    * bit-identical to the per-rule replay (spec-asserted), subword-nmt
    * apply semantics (Sennrich et al. 2016), one corpus scan for ANY
    * rule count.
    *
    * The rules come from t14's honest k-scan trainer run on a
    * DETERMINISTIC SAMPLE (doc_id % sampleMod == 0) — which is also
    * how production tokenizers are built: the trainer sees a sample,
    * the encoder sees everything. Each mining round collects ONE
    * (l, r) row to the driver (the c6-spine/d10-digest tiny-frame
    * probe pattern, ≤ rounds rows total); with the rule as a literal
    * the sample's evolving token state is a pure narrow map — no
    * per-round checkpoint or broadcast join, so a mining round costs
    * one small aggregate job over the sample. */
  def t17BpeTokenize(s: SparkSession, d: String, rounds: Int = 16,
      sampleMod: Int = 10): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val rules = mineRulesCached(docs, d, rounds, sampleMod)
    val enc =
      if (rules.isEmpty) col("toks")
      else T.bpeEncodeAll(col("toks"), array(rules.map { case (l, r) =>
        struct(lit(l).as("l"), lit(r).as("r")) }: _*))
    // spread: the all-rules one-pass encode is the CPU-dense stage
    // and otherwise runs on the unsplittable scan's one task (r15
    // opt — identity at production split counts)
    Tables.spread(docs)
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens_raw"),
        enc.as("enc"))
      .select(col("doc_id"), col("n_tokens_raw"),
        size(col("enc")).cast("long").as("n_tokens"),
        md5(concat_ws("\u0001", col("enc"))).as("seq_md5"))
      .orderBy("doc_id")
  }

  /** T18: sequence packing on REAL BPE token counts — the t17 → t7
    * composition a training pipeline actually runs: packing budgets
    * are denominated in the tokens the model will see, and whitespace
    * counts over-estimate them by exactly the merges the tokenizer
    * applies (every doc the sample's rules compress packs earlier
    * than t7 would place it). Mines the ranked rule table once
    * (t17's sample trainer), encodes each document in the SAME one
    * native-expression pass, and runs t7's greedy shard packing —
    * cumulative-sum window over (source, shard) — on the encoded
    * lengths. One corpus scan + one window shuffle for any rule
    * count; the rule table rides the plan as a literal. */
  def t18BpePack(s: SparkSession, d: String, rounds: Int = 16,
      sampleMod: Int = 10, budget: Long = 256L, shards: Int = 8)
      : DataFrame = {
    val docs = Tables.documents(s, d).filter(col("text").isNotNull)
    val rules = mineRulesCached(docs, d, rounds, sampleMod)
    val enc =
      if (rules.isEmpty) col("toks")
      else T.bpeEncodeAll(col("toks"), array(rules.map { case (l, r) =>
        struct(lit(l).as("l"), lit(r).as("r")) }: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // spread: same one-pass encode stage as t17 (r15 opt)
    Tables.spread(docs)
      .select(col("doc_id"), col("source"), T.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        (col("doc_id") % shards).as("shard"),
        size(enc).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        ((col("cum") - col("n_tokens")) / budget).cast("long").as("bin"),
        ((col("cum") - col("n_tokens")) % budget).as("bin_offset"))
      .orderBy("doc_id")
  }

  /** Per-JVM memo of mined rule tables keyed by (corpus dir, rounds,
    * sampleMod). A tokenizer is trained ONCE and reused by every
    * consumer — the rule table is a deterministic artifact of the
    * (immutable-during-a-run) corpus sample, so t17/t18/c11/o8
    * sharing one table is the production semantics, not a shortcut;
    * re-mining per query was an artifact of query independence (and
    * 4× the mining cost in a suite run). Keyed by PATH: a different
    * sf dir or probe replica mines its own table. */
  private val ruleCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      Seq[(String, String)]]()

  private[graft] def mineRulesCached(docs: DataFrame, d: String,
      rounds: Int, sampleMod: Int): Seq[(String, String)] =
    ruleCache.computeIfAbsent((d, rounds, sampleMod),
      _ => mineRulesSample(docs, rounds, sampleMod))

  /** t14's trainer loop over the doc_id % sampleMod sample, returning
    * the ranked rules as driver values (rank = list order). Stops
    * early if the sample runs out of adjacent pairs. Per round: one
    * aggregate job; the applied merges accumulate as chained native
    * projections Catalyst collapses into a single map stage. */
  private[graft] def mineRulesSample(docs: DataFrame, rounds: Int,
      sampleMod: Int): Seq[(String, String)] = {
    // tokenized sample materialized ONCE: every round's aggregate
    // replays the (cheap, collapsed-into-one-stage) merge chain from
    // this frame instead of re-scanning and re-tokenizing parquet
    var cur = docs.filter(col("doc_id") % sampleMod === 0)
      .select(T.tokens(col("text")).as("toks"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    for (_ <- 1 to rounds if !done) {
      val toks = col("toks")
      val top = cur
        .select(explode(transform(sequence(lit(0), size(toks) - 2, lit(1)),
          i => struct(element_at(toks, i + 1).as("l"),
            element_at(toks, i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((l, r))
        cur = cur.select(
          T.bpeMergeApply(col("toks"), lit(l), lit(r)).as("toks"))
      }
    }
    out.toSeq
  }

  /** T19: classifier-based quality/language filtering — a multinomial
    * Naive Bayes trained IN-CORPUS (fasttext-style linear scorer, the
    * CCNet / GPT-3 quality-filter shape): seed label = (lang = 'en'),
    * per-token log-odds weights from one token-frequency aggregate,
    * then every document scored by the sum of its tokens' weights plus
    * the class prior.
    *
    * Plan shape for 100 TB: the token-frequency frame is computed once
    * and feeds both the weight table and the per-document scoring
    * aggregate; the corpus is scanned, never self-joined. The weight
    * table is VOCABULARY-sized (one row per distinct corpus term), so
    * it joins back to the token frame by a SHUFFLE on term — t5's "no
    * dictionary broadcast" law; only the 1-row corpus totals and the
    * 1-row class prior broadcast. Weights are quantized to 1e-6
    * fixed-point LONGS before the per-document sum, so the aggregate
    * is an exact integer sum — order-independent, safe to distribute,
    * and bit-replayable in the oracle (the c8 fixed-point pattern).
    * Docs with no tokens score exactly the prior (left join). */
  def t19NbFilter(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), (col("lang") === "en").as("pos"), col("text"))
    val tf = docs
      .select(col("doc_id"), col("pos"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val stats = tf.groupBy("term").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))
    val tot = stats.agg(sum("cp").as("pt"), sum("cn").as("nt"),
      count(lit(1)).as("v"))
    val wtab = stats.crossJoin(broadcast(tot)).selectExpr("term",
      "cast(round((ln((cp + 1) / cast(pt + v as double)) - " +
        "ln((cn + 1) / cast(nt + v as double))) * 1000000) as bigint) " +
        "as w6")
    val prior = docs.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("dp"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("dn"))
      .selectExpr(
        // +1 smoothing guards the degenerate single-class corpus:
        // Spark's Divide NULLs on a zero divisor while DuckDB yields
        // inf/NaN, so the unsmoothed prior diverges between engines.
        "cast(round(ln((dp + 1) / cast(dn + 1 as double)) * 1000000) " +
          "as bigint) as prior6")
    // the weight table is one row per DISTINCT CORPUS TERM — t5's
    // ledger law applies ("no dictionary broadcast"): at 100 TB the
    // vocabulary is far past any broadcast budget, so the tf↔weight
    // join shuffles on term exactly like t5/t11 (the r11 plan carried
    // an explicit broadcast hint here; the plan contract now pins the
    // absence of any term-table broadcast)
    val scored = tf.join(wtab, "term")
      .groupBy("doc_id").agg(sum("w6").as("sw6"))
    docs.join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .selectExpr("doc_id", "pos as label",
        "coalesce(sw6, 0) + prior6 as score6",
        "coalesce(sw6, 0) + prior6 > 0 as pred")
      .orderBy("doc_id")
  }
}
