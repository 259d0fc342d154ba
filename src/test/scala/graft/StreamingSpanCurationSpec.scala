package graft

import graft.streaming.StreamingCuration
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The span-removal stage (d15 continuously) prepended to the
  * streaming curation chain: when arrival follows id order, the
  * streamed keep-first keeper IS d15's lexicographic keeper, so the
  * REWRITE itself has no retro case by construction (the kept
  * occurrence is always the one published first) and shared
  * survivors carry identical cleaned text wave-folded or one-shot.
  * The downstream chain keeps its documented online contract — span
  * removal shrinks quoted-heavy docs, which SURFACES the
  * no-retro-drop containment case on this corpus (a published doc
  * whose container arrives later stays published); the spec pins
  * each such divergence to exactly that case. Plus the planted
  * cross-wave quoted-span fixture: the reused span is rewritten out
  * of the LATER document at arrival, the earlier document untouched,
  * replay idempotent. */
class StreamingSpanCurationSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text", "n_chars")
  private def embs = Tables.embeddings(spark, sf)

  private def curatedAll(r: String) =
    spark.read.parquet(s"$r/curated/batch_*")
      .select("doc_id", "text", "split").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet

  test("3 id-ordered waves with the span stage ≡ the plain chain fed " +
      "batch-d15-cleaned waves (stream ≡ d15-then-chain); replay " +
      "idempotent") {
    val root = Files.createTempDirectory("graft_sspan").toString
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    def cut(d: org.apache.spark.sql.DataFrame) = Seq(
      d.filter(col("doc_id") < c1),
      d.filter(col("doc_id") >= c1 && col("doc_id") < c2),
      d.filter(col("doc_id") >= c2))
    val waves = cut(docs)
    waves.zipWithIndex.foreach { case (w, i) =>
      StreamingCuration.processBatch(w, i, root, embs, spanStage = true) }
    val streamed = curatedAll(root)
    // the reference side: batch d15 rewrites the WHOLE union first
    // (keep-first keeper = lexicographic minimum), then the plain
    // chain — whose wave-fold is already pinned against an
    // independent driver implementation by StreamingCurationSpec —
    // folds the SAME id-ordered waves of the cleaned corpus. With
    // id-ordered arrival the span stage's at-arrival rewrite must
    // equal the batch rewrite (the kept occurrence is always the one
    // published first), making the two runs' per-wave inputs — and
    // therefore everything downstream — identical.
    val cleanedDocs = graft.dedup.Dedup.substrDedupFrame(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
      .select("doc_id", "source", "text", "n_chars")
    val rootRef = Files.createTempDirectory("graft_sspanref").toString
    cut(cleanedDocs).zipWithIndex.foreach { case (w, i) =>
      StreamingCuration.processBatch(w, i, rootRef, embs,
        spanStage = false) }
    val reference = curatedAll(rootRef)
    assert(streamed == reference,
      s"missing ${(reference -- streamed).size} " +
        s"(e.g. ${(reference -- streamed).headOption.map(_._1)}) / " +
        s"extra ${(streamed -- reference).size} " +
        s"(e.g. ${(streamed -- reference).headOption.map(_._1)})")
    assert(streamed.nonEmpty)
    // the span stage genuinely rewrote documents on this corpus (the
    // rewritten docs need not survive curation — rewriting strips
    // exactly the material that made them near-dups)
    assert(graft.dedup.Dedup.substrDedupFrame(docs)
        .filter(col("n_removed") > 0).count() > 0,
      "no document was rewritten — fixture too weak")
    // at-least-once replay of the last wave changes nothing
    StreamingCuration.processBatch(waves(2), 2, root, embs,
      spanStage = true)
    assert(curatedAll(root) == streamed)
  }

  test("planted cross-wave quoted span: rewritten out of the LATER " +
      "doc at arrival; the published early doc untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sspanf").toString
    // 12-char tokens: past the n_chars >= 100 gate, below the minhash
    // (shingle-Jaccard ~0.15) and containment (~0.19/0.32 < 0.8)
    // thresholds — the pair must reach the SPAN stage, nothing else
    def words(p: String, n: Int) =
      (1 to n).map(i => f"${p}aaaaaa$i%04d").mkString(" ")
    val span = words("s", 16)                    // the quoted passage
    val docA = span + " " + words("u", 30)       // wave 1: original
    val docB = words("v", 30) + " " + span + " " + words("w", 30)
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .select(col("doc_id"), lit("s1").as("source"), col("text"),
        length(col("text")).cast("long").as("n_chars"))
    val noEmb = embs.limit(0)
    StreamingCuration.processBatch(df(1L -> docA), 0, root, noEmb,
      spanStage = true)
    StreamingCuration.processBatch(df(2L -> docB), 1, root, noEmb,
      spanStage = true)
    def textOf(b: Int, id: Long) = spark.read
      .parquet(s"$root/curated/batch_$b")
      .filter(col("doc_id") === id).select("text")
      .collect().head.getString(0)
    assert(textOf(0, 1L) == docA, "published early doc was touched")
    val expectB = words("v", 30) + " " + words("w", 30)
    assert(textOf(1, 2L) == expectB,
      s"quoted span not rewritten out at arrival: ${textOf(1, 2L)}")
    // replay the arrival batch: same rewrite, nothing else changes
    StreamingCuration.processBatch(df(2L -> docB), 1, root, noEmb,
      spanStage = true)
    assert(textOf(1, 2L) == expectB)
    assert(textOf(0, 1L) == docA)
  }
}
