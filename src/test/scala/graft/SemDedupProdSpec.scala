package graft

import graft.dedup.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** d12's production form (the SemDeDup paper's own cell-confined
  * design): verified against an independent scala re-derivation —
  * within-cell exact cosine pairs + union-find — and measured against
  * the full d12 for the paper's accepted cross-cell recall tradeoff. */
class SemDedupProdSpec extends AnyFunSuite {
  import SparkTest._

  test("cell-confined semantic dedup ≡ independent within-cell " +
      "pairwise + union-find; drops are a measured subset of d12's") {
    import org.apache.spark.sql.functions._
    val out = Dedup.d12SemDedupProd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)

    // independent re-derivation: same cell input (the cell split is
    // an INPUT here — s5's assignment sub-sharded by the same hash),
    // then scala-side exact pairs + union-find
    val cap = 256
    val assign = similarity.Similarity.s5KmeansRefine(spark, sf)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val sizes = assign.groupBy(_._2).map { case (c, g) => c -> g.length }
    val cellOf = assign.map { case (id, c) =>
      val shards = math.max(1, math.ceil(sizes(c).toDouble / cap).toLong)
      // the house portable hash, re-derived independently
      id -> s"$c#${(id % 2147483648L) * 2654435761L % 4294967296L % shards}"
    }.toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = vecs.toMap
    def cos3(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      BigDecimal(dot / n).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val ids = vecs.map(_._1)
    val pairs = ids.groupBy(cellOf).toSeq.flatMap { case (_, g) =>
      val v = g.toSeq
      for (i <- v; j <- v if i < j && cos3(byId(i), byId(j)) >= 0.3)
        yield (i, j)
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val compMin = ids.groupBy(find).map { case (_, g) => find(g.head) -> g.min }
    val expected = ids.map { id =>
      val grp = compMin(find(id))
      (id, grp, grp == id)
    }.toSet
    assert(out.toSet == expected,
      s"diff ${(out.toSet -- expected).take(2)} / ${(expected -- out.toSet).take(2)}")

    // the paper's tradeoff, measured: cell-form drops ⊆ d12's full
    // drops would require identical grouping; what must hold is that
    // every cell-form drop has a ≥0.3 partner (it is a true
    // semantic duplicate), and the cell form recovers a substantial
    // share of d12's drops on this corpus
    val fullDrops = Dedup.d12SemDedup(spark, sf).collect()
      .collect { case r if !r.getBoolean(2) => r.getLong(0) }.toSet
    val prodDrops = out.collect { case (id, _, false) => id }.toSet
    if (fullDrops.nonEmpty) {
      val recovered = (prodDrops intersect fullDrops).size.toDouble /
        fullDrops.size
      info(s"cell-form recovers $recovered of d12's drops " +
        s"(${prodDrops.size} vs ${fullDrops.size})")
      assert(recovered >= 0.5,
        s"cell confinement lost too many duplicates: $recovered")
    }
  }

  test("d5 prod vs the exact within-label form — cell confinement's " +
      "tradeoff MEASURED in both directions: same-label pairs are a " +
      "sound subset, cross-label finds are true ≥0.3 pairs d5's " +
      "label confinement never saw") {
    import org.apache.spark.sql.functions._
    val exact = Dedup.d5EmbeddingDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val prod = Dedup.d5EmbeddingProd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val labelOf = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (sameLabel, crossLabel) =
      prod.partition(p => labelOf(p._1) == labelOf(p._2))
    // soundness within the common universe: a same-label cell pair is
    // a true within-label ≥0.3 pair, so it must appear in the exact
    // (spec-proven ≡ all-pairs) d5 answer
    assert((sameLabel -- exact).isEmpty,
      s"prod emitted same-label non-pairs: ${(sameLabel -- exact).take(3)}")
    // cross-label finds are OUTSIDE d5's universe by construction —
    // re-verify their cosines independently (the d12-prod 'cells
    // cross labels' bonus, here at pair granularity)
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert(crossLabel.forall { case (a, b) => cos(a, b) >= 0.2995 },
      "a cross-label prod pair fails its own cosine floor")
    val recall = if (exact.isEmpty) 1.0
      else (sameLabel intersect exact).size.toDouble / exact.size
    info(s"d5 prod: same-label recall $recall " +
      s"(${sameLabel.size} of ${exact.size}), " +
      s"${crossLabel.size} true cross-label pairs d5 never saw")
    // the 0.3 floor admits many barely-related cross-cell pairs (the
    // regime where NO method is both selective and complete — the
    // measured selectivity law); the cell form must still recover a
    // substantial share of the within-label answer
    assert(recall >= 0.3, s"cell confinement recall collapsed: $recall")
  }

  test("multi-probe cells (probes = 2) recover cross-cell boundary " +
      "pairs the single-probe split cannot see: a strict superset of " +
      "the probe-1 pairs here, every extra pair independently true, " +
      "recall strictly above the single-probe floor") {
    val p1 = Dedup.d5EmbeddingProd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = Dedup.d5EmbeddingProd(spark, sf, probes = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // STRUCTURAL since the review fix: the shard grid is sized by
    // rank-1 counts only, so every probe-1 cell survives the probe-2
    // split verbatim at ANY scale and the pair set can only grow
    assert((p1 -- p2).isEmpty,
      s"probe-2 lost probe-1 pairs: ${(p1 -- p2).take(3)}")
    // the recovered pairs are TRUE ≥0.3 pairs, re-verified off-engine
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      dot / math.sqrt(x.map(v => v * v).sum * y.map(v => v * v).sum)
    }
    assert((p2 -- p1).forall { case (a, b) => cos(a, b) >= 0.2995 },
      "a multi-probe-recovered pair fails its own cosine floor")
    // the knob's measured effect: recall over the TRUE ≥0.3 universe
    // (all pairs, label-blind — the superset both forms chase)
    val ids = vecs.keys.toSeq.sorted
    val universe = (for (i <- ids; j <- ids if i < j
      && cos(i, j) >= 0.2995) yield (i, j)).toSet
    val (r1, r2) = ((p1 intersect universe).size.toDouble / universe.size,
      (p2 intersect universe).size.toDouble / universe.size)
    info(f"multi-probe recall $r1%.2f -> $r2%.2f over ${universe.size} " +
      f"true pairs (+${(p2 -- p1).size} pairs, " +
      f"candidate cost x${p2.size.toDouble / math.max(1, p1.size)}%.1f)")
    assert(r2 > r1, s"probes=2 did not improve recall: $r1 vs $r2")
  }

  test("d12 prod at probes = 2: one row per vector despite doubled " +
      "memberships, and extra edges only MERGE epsilon-groups — " +
      "drops grow monotonically, every group still keyed by its min") {
    val g1 = Dedup.d12SemDedupProd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val g2 = Dedup.d12SemDedupProd(spark, sf, probes = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // the multi-membership frame must still dedup to the corpus
    assert(g2.map(_._1).distinct.length == g2.length &&
      g2.map(_._1).toSet == g1.map(_._1).toSet,
      "probes=2 universe is not one row per vector")
    // pairs only grow (superset law proven above), so components only
    // merge: a probe-1 drop stays dropped, and keeps can only shrink
    val drops1 = g1.collect { case (id, _, false) => id }.toSet
    val drops2 = g2.collect { case (id, _, false) => id }.toSet
    assert((drops1 -- drops2).isEmpty,
      s"probe-2 resurrected dropped vectors: ${(drops1 -- drops2).take(3)}")
    // group invariants hold in the multi-probe output too
    val byGrp = g2.groupBy(_._2)
    assert(byGrp.forall { case (grp, members) =>
      grp == members.map(_._1).min &&
        members.count(_._3) == (if (members.exists(_._1 == grp)) 1 else 0)
    }, "a probe-2 group is not keyed by its min with one keep")
    info(s"d12 prod drops ${drops1.size} -> ${drops2.size} " +
      s"of ${g1.length} vectors at probes=2")
  }
}
