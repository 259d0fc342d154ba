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
}
