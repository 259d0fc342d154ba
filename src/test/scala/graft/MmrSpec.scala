package graft

import org.scalatest.funsuite.AnyFunSuite

/** s8 vs s9: the same greedy MMR fold over the exact (s1 brute-force)
  * and the scale (s2 multi-probe LSH) shortlists — the s6 recall
  * pattern applied to diversified retrieval. The LSH shortlist sees
  * only probed buckets, so its picks can differ; what must hold is
  * that the two instantiations stay recognizably the same retrieval
  * (bounded divergence) and that the scale path degrades the way LSH
  * recall math predicts, not collapses. Measured on this corpus:
  * mean picked-set overlap 0.46, min 1/5 — in line with s2's ~38%
  * recall@5 at 4 planes (asserting floors a regression to an empty
  * or disjoint shortlist would break). */
class MmrSpec extends AnyFunSuite {
  import SparkTest._

  test("s9 picks track s8's across shortlists: full pick counts, " +
      "every query overlaps, mean overlap above the LSH-recall floor") {
    val s8 = similarity.Similarity.s8MmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s9 = similarity.Similarity.s9MmrLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s8.nonEmpty && s9.nonEmpty)
    val qs = s8.map(_._1).distinct.sorted
    assert(s9.map(_._1).distinct.sorted.sameElements(qs),
      "s9 lost or invented queries")
    // on this corpus every query's probed buckets hold >= kShort docs,
    // so both forms return the full m picks with dense ranks
    for (q <- qs) {
      assert(s9.filter(_._1 == q).map(_._2).sorted
        .sameElements(1L to 5L), s"q=$q s9 pick ranks not dense 1..5")
    }
    // bounded divergence: every query shares at least one pick, and
    // the mean overlap clears a floor consistent with multi-probe
    // LSH recall (disjoint or empty shortlists would break both)
    val per = qs.map { q =>
      val a = s8.filter(_._1 == q).map(_._3).toSet
      val b = s9.filter(_._1 == q).map(_._3).toSet
      (a intersect b).size
    }
    assert(per.forall(_ >= 1), s"a query's picked sets are disjoint: $per")
    val mean = per.sum.toDouble / (qs.length * 5)
    assert(mean >= 0.3, s"mean picked-set overlap collapsed: $mean")
  }

  test("s10 picks track s8's: full dense picks per query, overlap " +
      "above the PQ-recall floor") {
    val s8 = similarity.Similarity.s8MmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s10 = similarity.Similarity.s10MmrPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s10.nonEmpty)
    val qs = s8.map(_._1).distinct.sorted
    assert(s10.map(_._1).distinct.sorted.sameElements(qs),
      "s10 lost or invented queries")
    // the PQ shortlist always holds kShort = 20 >= 10 rows, so every
    // query diversifies a full list — dense ranks 1..5
    for (q <- qs) {
      assert(s10.filter(_._1 == q).map(_._2).sorted
        .sameElements(1L to 5L), s"q=$q s10 pick ranks not dense 1..5")
    }
    // bounded divergence vs the exact shortlist — PQ recall on this
    // random corpus is the s7 regime (~0.3-0.4 @5); a collapse to
    // disjoint picks would mean the shortlist or the fold broke
    val per = qs.map { q =>
      val a = s8.filter(_._1 == q).map(_._3).toSet
      val b = s10.filter(_._1 == q).map(_._3).toSet
      (a intersect b).size
    }
    val mean = per.sum.toDouble / (qs.length * 5)
    assert(mean >= 0.2, s"mean picked-set overlap collapsed: $mean")
  }

  test("s12 picks track s8's: full dense picks per query, overlap " +
      "above the binary-recall floor") {
    val s8 = similarity.Similarity.s8MmrDiversify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s12 = similarity.Similarity.s12MmrBinary(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s12.nonEmpty)
    val qs = s8.map(_._1).distinct.sorted
    assert(s12.map(_._1).distinct.sorted.sameElements(qs),
      "s12 lost or invented queries")
    for (q <- qs) {
      assert(s12.filter(_._1 == q).map(_._2).sorted
        .sameElements(1L to 5L), s"q=$q s12 pick ranks not dense 1..5")
    }
    // the Hamming tier's measured shortlist recall (~0.5 @5) sits
    // above the LSH tier's, so its MMR picks should track s8 at least
    // as well as s9's floor
    val per = qs.map { q =>
      val a = s8.filter(_._1 == q).map(_._3).toSet
      val b = s12.filter(_._1 == q).map(_._3).toSet
      (a intersect b).size
    }
    val mean = per.sum.toDouble / (qs.length * 5)
    assert(mean >= 0.3, s"mean picked-set overlap collapsed: $mean")
  }
}
