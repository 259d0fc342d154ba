package graft

import graft.expressions.{MinHashSig, ShingleSet, SimHash128}
import graft.functions.DiffUtils
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: diff replay round-trips on arbitrary edits; the
  * native hash expressions obey their algebraic contracts (checked by
  * direct expression evaluation — no Spark session needed). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g) { a => f(a); true })

  private val lineGen = Gen.listOfN(8, Gen.alphaNumStr.map(_.take(6)))

  test("sketch aggregate buffers are merge-associative: any partition " +
      "of the input folds to the single-pass state") {
    import graft.expressions.{CmsAgg, HllRegAgg}
    val hll = HllRegAgg(Literal(0L))
    val cms = CmsAgg(Literal(0L))
    // drive update() through expression eval by re-binding the child
    def hllOnce(keys: Seq[Long]): Seq[Int] = {
      val buf = hll.createAggregationBuffer()
      keys.foreach { k =>
        HllRegAgg(Literal(k)).update(buf, null)
      }
      buf.toSeq
    }
    def cmsOnce(keys: Seq[Long]): Seq[Long] = {
      val buf = cms.createAggregationBuffer()
      keys.foreach(k => CmsAgg(Literal(k)).update(buf, null))
      buf.toSeq
    }
    val gen = for {
      keys <- Gen.listOf(Gen.choose(0L, 1L << 40))
      cuts <- Gen.listOf(Gen.choose(0, math.max(keys.length, 1)))
    } yield (keys, cuts.sorted.distinct)
    forAll(gen) { case (keys, cuts) =>
      // split into arbitrary consecutive partitions, update each
      // partial independently, merge in order — must equal one pass
      val bounds = (0 +: cuts :+ keys.length).distinct.sorted
      val parts0 = bounds.zip(bounds.tail).map { case (a, b) =>
        keys.slice(a, b)
      }
      val parts = if (parts0.isEmpty) Seq(Seq.empty[Long]) else parts0
      val hMerged = parts.map(p => {
        val b = hll.createAggregationBuffer()
        p.foreach(k => HllRegAgg(Literal(k)).update(b, null)); b
      }).reduceLeft(hll.merge)
      assert(hMerged.toSeq == hllOnce(keys))
      // serialization round-trip preserves the buffer
      assert(hll.deserialize(hll.serialize(hMerged)).toSeq == hMerged.toSeq)
      val cMerged = parts.map(p => {
        val b = cms.createAggregationBuffer()
        p.foreach(k => CmsAgg(Literal(k)).update(b, null)); b
      }).reduceLeft(cms.merge)
      assert(cMerged.toSeq == cmsOnce(keys))
      assert(cms.deserialize(cms.serialize(cMerged)).toSeq == cMerged.toSeq)
      // CMS invariant: every cell total equals the key count (each key
      // increments exactly one cell per hash row)
      (0 until 4).foreach { i =>
        assert(cMerged.slice(i * 512, (i + 1) * 512).sum == keys.length)
      }
    }
  }

  test("diff apply/reverse round-trips arbitrary single-hunk edits") {
    val editGen = for {
      lines <- lineGen.suchThat(_.nonEmpty)
      start <- Gen.choose(0, lines.length - 1)
      delLen <- Gen.choose(0, lines.length - start)
      ins <- Gen.listOf(Gen.alphaNumStr.map(_.take(6)))
      if delLen > 0 || ins.nonEmpty
    } yield (lines, start, delLen, ins)

    forAll(editGen) { case (lines, start, delLen, ins) =>
      val removed = lines.slice(start, start + delLen)
      val modified = lines.take(start) ++ ins ++ lines.drop(start + delLen)
      val hunk =
        s"@@ -${start + 1},$delLen +${start + 1},${ins.length} @@" ::
          (removed.map("-" + _) ++ ins.map("+" + _))
      val diff = hunk.mkString("\n").split("\n", -1).toVector
      // the line-vector form round-trips EXACTLY for arbitrary content
      // (the joined-string form collapses a lone trailing empty line —
      // see DiffUtils.applyDiff's representation caveat)
      assert(DiffUtils.applyDiffLines(lines.toVector, diff,
        reverse = false) == modified.toVector)
      assert(DiffUtils.applyDiffLines(modified.toVector, diff,
        reverse = true) == lines.toVector)
      // string form agrees whenever the representation is unambiguous
      if (lines != List("") && modified != List("")) {
        assert(DiffUtils.applyDiff(lines.mkString("\n"), diff.mkString("\n"))
          == modified.mkString("\n"))
      }
    }
  }

  private def evalMinhash(tokens: Seq[String], k: Int): Seq[Long] = {
    val arr = new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t)).toArray[Any])
    MinHashSig(Literal(arr, ArrayType(StringType)), k)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  test("minhash estimator: identity=1, symmetric, bounded") {
    val setsGen = for {
      a <- Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)
      b <- Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)
    } yield (a, b)
    forAll(setsGen) { case (a, b) =>
      val k = 32
      def est(x: Seq[Long], y: Seq[Long]) =
        x.zip(y).count(p => p._1 == p._2).toDouble / k
      val (sa, sb) = (evalMinhash(a, k), evalMinhash(b, k))
      assert(est(sa, sa) == 1.0)
      assert(est(sa, sb) == est(sb, sa))
      assert(est(sa, sb) >= 0.0 && est(sa, sb) <= 1.0)
      // disjoint sets should rarely agree; identical sets always do
      if (a.toSet == b.toSet) assert(est(sa, sb) == 1.0)
    }
  }

  test("simhash: deterministic, zero hamming on identical input") {
    forAll(Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))) { tokens =>
      def sh(t: Seq[String]): (Long, Long) = {
        val arr = new GenericArrayData(
          t.map(x => UTF8String.fromString(x)).toArray[Any])
        val r = SimHash128(Literal(arr, ArrayType(StringType)))
          .eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        (r.getLong(0), r.getLong(1))
      }
      assert(sh(tokens) == sh(tokens))
      val ((lo1, hi1), (lo2, hi2)) = (sh(tokens), sh(tokens))
      assert(java.lang.Long.bitCount(lo1 ^ lo2) +
        java.lang.Long.bitCount(hi1 ^ hi2) == 0)
    }
  }

  test("shingles: correct count, width, and distinctness") {
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { text =>
      val n = 5
      val out = ShingleSet(Literal(UTF8String.fromString(text), StringType), n)
        .eval(null).asInstanceOf[GenericArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toSeq
      if (text.length <= n) assert(out == Seq(text))
      else {
        assert(out.forall(_.length == n))
        assert(out.distinct == out)
        assert(out.toSet == text.sliding(n).toSet)
      }
    }
  }
}
