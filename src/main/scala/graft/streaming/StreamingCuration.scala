package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CONTINUOUS form of [[graft.operators.CurationPipeline]] (x1):
  * quality gate → exact dedup → near-dup dedup → SEMANTIC dedup →
  * CONTAINMENT → split, folded over arriving micro-batches instead of
  * a one-shot corpus pass — the same stage list as the r6-extended
  * batch x1 (decontamination runs separately as the
  * [[StreamingDecontam]] admission gate, which owns the frozen eval
  * index). Each batch consults four persisted stores — the
  * content-HASH store (exact dedup), the minhash BAND store
  * (near-dup), the sign-band EMBEDDING store with its vector slices
  * (semantic — [[StreamingEmbDedup]]'s cadence), and the containment
  * SET/POSTINGS store under a first-batch-FROZEN df dictionary
  * ([[StreamingContainment]]'s cadence) — then appends its own slice
  * to each. Per-batch cost is O(batch + collisions), independent of
  * corpus size: the d9 cadence applied to the whole curation chain.
  * Every store accumulates its stage's INPUT survivors (hash ← all
  * quality docs, minhash bands ← exact survivors, embedding bands ←
  * near-dup survivors, containment sets ← semantic survivors), so a
  * batch dedups against exactly the population the batch chain put
  * in front of that stage — the stage-on-survivors composition the
  * batch x1 runs.
  *
  * Contract (differs from one-shot x1 exactly where ANY online dedup
  * must): the kept representative of a duplicate group is the
  * FIRST-ARRIVED canonical, not the global minimum id; a chain whose
  * links arrive after its endpoints can keep both endpoints; and a
  * small doc already published cannot be retro-dropped when its
  * container arrives later (containment only ever drops from the
  * CURRENT batch). The spec pins the fold contract wave by wave
  * against an independent driver implementation.
  *
  * Every write is overwrite-idempotent per batch id (curated rows,
  * report rows, and all store slices land in batch_N subdirectories;
  * a replayed batch reads only slices with id < N) — the same
  * at-least-once replay discipline as [[StreamingDedup]].
  */
object StreamingCuration {

  private val ContainT = 0.8
  private val GramN = 3

  /** x1's quality gate: eval holdout excluded, non-null text, minimum
    * length. */
  private def quality(batch: DataFrame): DataFrame =
    batch.filter(col("doc_id") % 97 =!= 0 && col("text").isNotNull &&
      col("n_chars") >= 100)

  /** One micro-batch through the full chain. `batch` needs
    * (doc_id, source, text, n_chars); `embs` is the static
    * (vec_id, label, embedding) lookup (vec_id ≡ doc_id, the m4
    * pairing — x1's semantic stage joins the same way).
    *
    * `spanStage = true` prepends d15's span REMOVAL as a cross-batch
    * cadence (r7 verdict #6) — the one APPLY stage of the chain: the
    * batch's stride-1 16-token span hashes probe the persisted SPAN
    * store; an occurrence whose span was seen in ANY earlier batch is
    * rewritten out AT ARRIVAL (the earlier keeper is already
    * published, exactly d15's keep-first policy), fresh intra-batch
    * repeats keep their minimum (doc_id, start) occurrence, and the
    * batch's span hashes append to the store. When arrival follows id
    * order, first-arrival ≡ d15's lexicographic keeper, so the
    * streamed rewrite equals batch d15 on the union EXACTLY — no
    * retro-rewrite exists because the kept occurrence is always the
    * one published first (spec: StreamingSpanCurationSpec). */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      root: String, embs: DataFrame, spanStage: Boolean = false): Unit = {
    val s = batch.sparkSession
    // ---- span removal (d15 continuously), before the gates: the
    // rewrite changes text and therefore n_chars, which the quality
    // gate and every dedup stage must see post-rewrite ----
    val input = if (!spanStage) batch else {
      val spans = Dedup.spanOccurrences(batch).localCheckpoint(true)
      val sdirs = StoreFs.priorBatchDirs(s, s"$root/spans", batchId)
      val removed =
        if (sdirs.isEmpty) {
          val shared = spans.groupBy("h")
            .agg(count(lit(1)).as("cnt"), min("occ").as("keeper"))
            .filter(col("cnt") >= 2)
          spans.join(shared, Seq("h"))
            .filter(col("occ") =!= col("keeper"))
            .select("doc_id", "st")
        } else {
          val storeH = s.read.parquet(sdirs: _*)
            .select("h").distinct().localCheckpoint(true)
          val storeHit = spans.join(storeH, Seq("h"), "left_semi")
            .select("doc_id", "st")
          val fresh = spans.join(storeH, Seq("h"), "left_anti")
          val shared = fresh.groupBy("h")
            .agg(count(lit(1)).as("cnt"), min("occ").as("keeper"))
            .filter(col("cnt") >= 2)
          storeHit.union(
            fresh.join(shared, Seq("h"))
              .filter(col("occ") =!= col("keeper"))
              .select("doc_id", "st"))
        }
      val flagged = removed.groupBy("doc_id")
        .agg(sort_array(collect_list("st")).as("fl"))
      val cleaned = batch
        .join(flagged, Seq("doc_id"), "left")
        // coalesce: codegen subexpression elimination can hoist the
        // rewrite branch past the when(), and size(null toks) would
        // feed sequence() an illegal bound for null-text rows
        .withColumn("toks", split(coalesce(col("text"), lit("")), " "))
        .select(col("doc_id"), col("source"),
          when(col("fl").isNull, col("text")).otherwise(concat_ws(" ",
            expr(Dedup.spanRewriteExpr))).as("text"))
        .withColumn("n_chars",
          coalesce(length(col("text")).cast("long"), lit(0L)))
        .localCheckpoint(true)
      spans.select("h").distinct()
        .write.mode("overwrite").parquet(s"$root/spans/batch_$batchId")
      cleaned
    }
    // ---- quality ----
    val q = quality(input).localCheckpoint(true)
    // ---- exact dedup: intra-batch min per content hash, then the
    // hash store (all quality docs ever seen) ----
    val hashed = q.withColumn("h", md5(col("text")))
    val intra = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
    val hdirs = StoreFs.priorBatchDirs(s, s"$root/hashes", batchId)
    val exact = (if (hdirs.isEmpty) intra
      else intra.join(s.read.parquet(hdirs: _*).select("h").distinct(),
        Seq("h"), "left_anti"))
      .localCheckpoint(true)
    // ---- near-dup: band-store matches drop; intra-batch components
    // keep their (first-arrival) canonical ----
    val bands = Dedup.mhBands(exact).localCheckpoint(true)
    val bdirs = StoreFs.priorBatchDirs(s, s"$root/bands", batchId)
    // accumulated-corpus width (ADVICE r12 #4): store join and
    // intra-batch pairs both ride the batch forms' law
    val x = Dedup.accExtraRows(s, bdirs, bands)
    val storeMatched =
      if (bdirs.isEmpty) exact.limit(0).select("doc_id")
      else Dedup.incrementalEdges(bands, s.read.parquet(bdirs: _*), x)
        .select(col("src").as("doc_id")).distinct()
    val labels = Dedup.connectedComponentsAdaptive(
      Dedup.pairsFromBands(bands, x)
        .select(col("id1").as("src"), col("id2").as("dst")))
    val kept = exact
      .join(labels.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
      .join(storeMatched.withColumn("m", lit(true)), Seq("doc_id"), "left")
      .filter(col("m").isNull).drop("m")
      .localCheckpoint(true)
    // ---- semantic dedup (StreamingEmbDedup's cadence as a stage):
    // the near-dup survivors' vectors are sign-banded; store matches
    // drop, intra-batch epsilon-components keep their canonical.
    // Docs without a vector pass through (they cannot pair) — exactly
    // the batch x1 inner-join semantics. ----
    val survEmb = embs
      .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val ebands = Dedup.embBands(survEmb).localCheckpoint(true)
    val evecs = Dedup.embVecs(survEmb).localCheckpoint(true)
    val ebdirs = StoreFs.priorBatchDirs(s, s"$root/embbands", batchId)
    val semStoreMatched =
      if (ebdirs.isEmpty) kept.limit(0).select("doc_id")
      else {
        val sbands = s.read.parquet(ebdirs: _*)
        val svecs = s.read.parquet(
          StoreFs.priorBatchDirs(s, s"$root/embvecs", batchId): _*)
        val cand = ebands.as("a").join(sbands.as("b"),
            col("a.label") === col("b.label") &&
              col("a.band") === col("b.band") &&
              col("a.sig") === col("b.sig"))
          .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
          .distinct()
        Dedup.verifyCosine(cand, evecs.unionByName(svecs))
          .select(col("id1").as("doc_id")).distinct()
      }
    val semIntra = Dedup.verifyCosine(
      ebands.as("a").join(ebands.as("b"),
          col("a.label") === col("b.label") &&
            col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
        .distinct(),
      evecs)
    val semLbl = Dedup.connectedComponentsAdaptive(
      semIntra.select(col("id1").as("src"), col("id2").as("dst")))
    val sem = kept
      .join(semLbl.select(col("id").as("doc_id"), col("lbl")),
        Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
      .join(semStoreMatched.withColumn("m", lit(true)), Seq("doc_id"), "left")
      .filter(col("m").isNull).drop("m")
      .localCheckpoint(true)
    // ---- containment (StreamingContainment's frozen-df cadence as a
    // stage): drop batch docs whose distinct word-3-gram set is ≥ t
    // contained in a same-source partner among the semantic
    // survivors seen so far (store ∪ this batch). The CONTAINED side
    // of a verified pair (smaller set; ties by larger id) drops —
    // d13's containmentBest orientation — but only if it is a
    // CURRENT-batch doc: a store doc is already published. ----
    val csdirs = StoreFs.priorBatchDirs(s, s"$root/cont/sets", batchId)
    val (cpairs, bsets) =
      if (csdirs.isEmpty) {
        val (dfDict, _, sets0) = Dedup.containmentStore(sem, GramN)
        val sets = sets0.localCheckpoint(true)
        dfDict.write.mode("overwrite").parquet(s"$root/cont/dict")
        (Dedup.verifyContainment(
          Dedup.candidatePairs(Dedup.containmentPrefix(sets, ContainT),
            Dedup.containmentPostings(sets), ContainT).distinct(),
          sets.select(col("doc_id"), col("ks")), ContainT), sets)
      } else {
        val dict = s.read.parquet(s"$root/cont/dict")
        Dedup.containmentIncrementParts(
          s.read.parquet(csdirs: _*),
          s.read.parquet(
            StoreFs.priorBatchDirs(s, s"$root/cont/post", batchId): _*),
          dict, sem, ContainT, GramN)
      }
    val containedBatch = cpairs
      .select(when(col("n1") < col("n2") ||
          (col("n1") === col("n2") && col("id1") > col("id2")), col("id1"))
        .otherwise(col("id2")).as("doc_id"))
      .distinct()
    val cont = sem.join(containedBatch, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // ---- split + outputs ----
    val bucket = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L) % 100
    val curated = cont.select(col("doc_id"), col("source"), col("text"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
    curated.write.mode("overwrite").parquet(s"$root/curated/batch_$batchId")
    // per-batch accounting, x1-style single pass over survival flags
    val flags = batch.select(col("doc_id"))
      .join(q.select(col("doc_id"), lit(1).as("fq")), Seq("doc_id"), "left")
      .join(exact.select(col("doc_id"), lit(1).as("fe")), Seq("doc_id"), "left")
      .join(kept.select(col("doc_id"), lit(1).as("fk")), Seq("doc_id"), "left")
      .join(sem.select(col("doc_id"), lit(1).as("fs")), Seq("doc_id"), "left")
      .join(cont.select(col("doc_id"), lit(1).as("fc")), Seq("doc_id"), "left")
      .withColumn("b", bucket)
    flags.agg(
        count(lit(1)).as("c_raw"), count(col("fq")).as("c_quality"),
        count(col("fe")).as("c_exact"), count(col("fk")).as("c_kept"),
        count(col("fs")).as("c_sem"), count(col("fc")).as("c_cont"),
        count(when(col("fc") === 1 && col("b") < 80, 1)).as("c_train"),
        count(when(col("fc") === 1 && col("b") >= 80 && col("b") < 90, 1))
          .as("c_val"),
        count(when(col("fc") === 1 && col("b") >= 90, 1)).as("c_test"))
      .select(explode(array(
        struct(lit("raw").as("stage"), col("c_raw").as("rows")),
        struct(lit("quality").as("stage"), col("c_quality").as("rows")),
        struct(lit("exact_dedup").as("stage"), col("c_exact").as("rows")),
        struct(lit("near_dup").as("stage"), col("c_kept").as("rows")),
        struct(lit("semantic").as("stage"), col("c_sem").as("rows")),
        struct(lit("containment").as("stage"), col("c_cont").as("rows")),
        struct(lit("split_train").as("stage"), col("c_train").as("rows")),
        struct(lit("split_val").as("stage"), col("c_val").as("rows")),
        struct(lit("split_test").as("stage"), col("c_test").as("rows"))))
        .as("r"))
      .select(lit(batchId).as("batch"), col("r.stage").as("stage"),
        col("r.rows").as("rows"))
      .write.mode("overwrite").parquet(s"$root/report/batch_$batchId")
    // ---- store appends (idempotent slices, one per stage input) ----
    hashed.select("h").distinct()
      .write.mode("overwrite").parquet(s"$root/hashes/batch_$batchId")
    bands.write.mode("overwrite").parquet(s"$root/bands/batch_$batchId")
    ebands.write.mode("overwrite").parquet(s"$root/embbands/batch_$batchId")
    evecs.write.mode("overwrite").parquet(s"$root/embvecs/batch_$batchId")
    bsets.write.mode("overwrite").parquet(s"$root/cont/sets/batch_$batchId")
    Dedup.containmentPostings(bsets)
      .write.mode("overwrite").parquet(s"$root/cont/post/batch_$batchId")
  }

  /** Streaming query over (doc_id, source, text, n_chars) with the
    * static embedding lookup. */
  def run(docs: DataFrame, embs: DataFrame, root: String,
      spanStage: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      processBatch(batch.toDF(), batchId, root, embs, spanStage)
    }
}
