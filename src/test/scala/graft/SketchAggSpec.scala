package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native sketch AGGREGATES (buffer = the sketch state; the
  * production one-pass shape) must be bit-equal to the composed
  * groupBy forms the DuckDB oracle replays — equality here certifies
  * the native aggregates against the oracle transitively. */
class SketchAggSpec extends AnyFunSuite {
  import SparkTest._

  test("hll_registers ≡ o6's (flag, reg) max-rho aggregate; estimates equal") {
    // composed reference: o6's exact register derivation
    val regRows = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag as flag",
        "cast(((l_orderkey % 2147483648) * 2654435761) % 4294967296 " +
          "as bigint) as h")
      .selectExpr("flag", "cast(h % 64 as int) as reg",
        "case when h div 64 = 0 then 27 else " +
          "cast(round(log2((h div 64) & -(h div 64))) as int) + 1 end as rho")
      .groupBy("flag", "reg").agg(max("rho").as("mr"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getInt(2))).toMap
    val flags = regRows.keys.map(_._1).toSet
    val expected = flags.map { f =>
      f -> (0 until 64).map(reg => regRows.getOrElse((f, reg), 0)).toSeq
    }.toMap

    val got = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag as flag",
        "cast(((l_orderkey % 2147483648) * 2654435761) % 4294967296 " +
          "as bigint) as h")
      .groupBy("flag")
      .agg(graft.functions.SketchFunctions.hllRegisters(col("h")).as("regs"))
      .collect().map(r => (r.getString(0), r.getSeq[Int](1))).toMap
    assert(got.keySet == flags)
    flags.foreach(f => assert(got(f) == expected(f), s"registers differ for $f"))

    // the one-pass form's estimates equal the oracle-checked o6 column
    val estAgg = Sketches.o6HllDistinctAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val estRef = Sketches.o6HllDistinct(spark, sf)
      .select("flag", "hll_est")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(estAgg == estRef)
  }

  test("cms_sketch ≡ o7's composed (i, cell) sum sketch; estimates equal") {
    val cellRows = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .selectExpr("user_id", "cnt",
        "stack(4, " +
          "0, ((101 * user_id + 17) % 2147483647) % 512, " +
          "1, ((1009 * user_id + 29) % 2147483647) % 512, " +
          "2, ((10007 * user_id + 71) % 2147483647) % 512, " +
          "3, ((100003 * user_id + 113) % 2147483647) % 512" +
          ") as (i, cell)")
      .groupBy("i", "cell").agg(sum("cnt").as("csum"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = (0 until 4).flatMap(i =>
      (0 until 512).map(c => cellRows.getOrElse((i, c.toLong), 0L)))

    val got = Sketches.o7CmsSketchAgg(spark, sf)
      .collect().head.getSeq[Long](0)
    assert(got == expected, "CMS cells differ from the composed sketch")

    // per-key estimates read from the one-pass array equal o7's
    val as = Array(101L, 1009L, 10007L, 100003L)
    val bs = Array(17L, 29L, 71L, 113L)
    def estOf(key: Long): Long = (0 until 4).map(i =>
      got((i * 512 + ((as(i) * key + bs(i)) % 2147483647L % 512)).toInt)).min
    Sketches.o7CmsFreq(spark, sf).select("user_id", "cms_est")
      .collect().foreach(r =>
        assert(estOf(r.getLong(0)) == r.getLong(1),
          s"estimate differs for key ${r.getLong(0)}"))
  }

  test("o10 production form ≡ o10's estimate columns (histogram-only, " +
      "no exact-percentile branch)") {
    val prod = Sketches.o10QuantileSketchProd(spark, sf)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val full = Sketches.o10QuantileSketch(spark, sf)
      .select("flag", "n", "p50_est", "p90_est", "p99_est")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(prod.nonEmpty && prod == full)
  }

  test("o12 production form ≡ o12's est_jac on every pair " +
      "(signature-only, no exact shingle-set branch)") {
    val prod = Sketches.o12SourceSimilarityProd(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(2))).toMap
    val full = Sketches.o12SourceSimilarity(spark, sf)
      .select("src1", "src2", "est_jac")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getDouble(2))).toMap
    assert(prod.nonEmpty && prod == full)
  }

  test("o11 production form ≡ o11's (bits_set, est_n) columns " +
      "(filter stats only — no exact count, no FP probe sweep)") {
    val prod = Sketches.o11BloomProd(spark, sf)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    val full = Sketches.o11BloomFilter(spark, sf)
      .select("source", "bits_set", "est_n")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(prod.nonEmpty && prod == full)
  }

  test("o6 production form ≡ o6's hll_est column (register fold " +
      "only, no exact countDistinct branch)") {
    val prod = Sketches.o6HllProd(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val full = Sketches.o6HllDistinct(spark, sf)
      .select("flag", "hll_est")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(prod.nonEmpty && prod == full)
  }

  test("o7 production form ≡ o7's cms_est column (no exact report " +
      "join — the count feeds the sketch, not the output)") {
    val prod = Sketches.o7CmsProd(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Sketches.o7CmsFreq(spark, sf)
      .select("user_id", "cms_est")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(prod.nonEmpty && prod == full)
  }

  test("o12: source-signature fold ≡ union minhash (independent scala " +
      "re-derivation); identical sources est=exact=1, disjoint exact=0") {
    import spark.implicits._
    val ta = Seq("alpha bravo charlie delta echo", "foxtrot golf hotel india")
    val tc = Seq("zulu yankee xray whiskey victor", "uniform tango sierra")
    val fixture = (
      ta.zipWithIndex.map { case (t, i) => (i.toLong, "srcA", t) } ++
      ta.zipWithIndex.map { case (t, i) => (100L + i, "srcB", t) } ++
      tc.zipWithIndex.map { case (t, i) => (200L + i, "srcC", t) })
      .toDF("doc_id", "source", "text")
    val out = Sketches.sourceSimilarityFrame(fixture).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap

    // independent re-derivation: per-source shingle-hash UNION, then
    // the d2 permutation minima — the fold of per-doc signatures must
    // equal the minhash OF THE UNION (min over docs of min over doc
    // shingles = min over the union)
    def shingles(t: String): Set[String] =
      if (t.length <= 5) Set(t)
      else (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
    def hashes(ts: Seq[String]): Set[Long] = ts.flatMap(shingles).toSet
      .map((g: String) => graft.expressions.Md5Helper.lo64(
        org.apache.spark.unsafe.types.UTF8String.fromString(g)) &
        0xFFFFFFFFL)
    val hs = Map("srcA" -> hashes(ta), "srcB" -> hashes(ta),
      "srcC" -> hashes(tc))
    def sig(xs: Set[Long]): Seq[Long] = (0 until 32).map { j =>
      xs.map(x => (graft.expressions.MinHashParams.A(j) * x +
        graft.expressions.MinHashParams.B(j)) %
        graft.expressions.MinHashParams.P).min
    }
    def estOf(s1: String, s2: String): Double =
      sig(hs(s1)).zip(sig(hs(s2))).count { case (a, b) => a == b } / 32.0
    def exactOf(s1: String, s2: String): Double = {
      val (a, b) = (hs(s1), hs(s2))
      (a & b).size.toDouble / (a | b).size
    }
    for ((p1, p2) <- Seq(("srcA", "srcB"), ("srcA", "srcC"),
        ("srcB", "srcC"))) {
      val (est, n1, n2, common, exact, err) = out((p1, p2))
      assert(est == estOf(p1, p2), s"$p1-$p2 est")
      assert(n1 == hs(p1).size && n2 == hs(p2).size, s"$p1-$p2 sizes")
      assert(common == (hs(p1) & hs(p2)).size, s"$p1-$p2 intersection")
      assert(math.abs(exact - exactOf(p1, p2)) < 5e-7, s"$p1-$p2 exact")
      assert(math.abs(err - math.abs(estOf(p1, p2) - exactOf(p1, p2)))
        < 5e-7, s"$p1-$p2 err")
    }
    // identical sources: the sketch MUST report 1.0 (same signature)
    assert(out(("srcA", "srcB"))._1 == 1.0)
    assert(out(("srcA", "srcB"))._5 == 1.0)
    // disjoint sources: exact 0, intersection empty
    assert(out(("srcA", "srcC"))._4 == 0L)
    assert(out(("srcA", "srcC"))._5 == 0.0)
  }

  test("o12 on the corpus: pair count = C(|sources|,2), intersections " +
      "bounded by set sizes, estimator error moderate") {
    val rows = Sketches.o12SourceSimilarity(spark, sf).collect()
    val m = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == (m * (m - 1) / 2).toInt)
    rows.foreach { r =>
      val (n1, n2, common) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(common <= math.min(n1, n2))
      val exact = r.getDouble(6)
      assert(exact >= 0.0 && exact <= 1.0)
    }
    // 32-slot minhash: mean |est − exact| stays well under one band
    val meanErr = rows.map(_.getDouble(7)).sum / rows.length
    assert(meanErr < 0.2, s"mean estimator error $meanErr")
  }
}
