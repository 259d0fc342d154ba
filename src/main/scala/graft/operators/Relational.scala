package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query core: the reference's extract/query surface
  * (filtered, joined, incremental SELECTs — reference:
  * bugzilla_etl/extract_bugzilla.py) re-expressed as declarative
  * DataFrame plans so Catalyst handles pushdown, join strategy, and
  * partial aggregation.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier) are
  * explicitly broadcast; fact-side aggregations rely on map-side
  * partial aggregation; every query carries a deterministic total
  * order so results are reproducible across cluster sizes.
  *
  * Broadcast-hint boundedness ledger (r12 verdict #1 sweep): hinted
  * build sides are genuine dimension tables (region 5 rows, nation
  * 25, customer/supplier SF-proportional but orders of magnitude
  * below the fact side and classic star-schema broadcast dims) or
  * 1-row scalar frames (`avgPrice`). Fact tables never hint.
  */
object Relational {

  /** Q1: groupBy aggregation with map-side partial agg (pricing summary). */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q2: predicate + projection pushdown — only 4 columns reach the scan. */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
        col("l_quantity") <= 5)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("qty"),
        unix_millis(col("l_shipdate")).as("ship_ms"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q3: fact ⋈ broadcast(dim) hash join, then aggregate. */
  def q3BroadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_cust"))
      .orderBy("c_mktsegment")

  /** Q4: 5-way star join; dims broadcast, fact joins shuffle on keys. */
  def q4StarJoin(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** Q5: top-k — Catalyst plans TakeOrderedAndProject (no global sort). */
  def q5TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))

  /** Q6: window functions — rank + running sum over one shared window
    * spec (single shuffle; adjacent windows collapse). */
  def q6Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run_qty", round(sum("l_quantity")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "run_qty")
      .orderBy("l_suppkey", "rn")
  }

  /** Q7: EXISTS → left-semi join (no row multiplication, early out). */
  def q7SemiJoin(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q8: NOT EXISTS → left-anti join. */
  def q8AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy("c_custkey")

  /** Q9: exact distinct aggregation (expand + two-phase agg under AQE). */
  def q9DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Q10: hierarchical ROLLUP; grouping() collapses the null marker to a
    * stable 'ALL' label so ordering/hashing is deterministic. */
  def q10Rollup(s: SparkSession, d: String): DataFrame = {
    // SQL surface: grouping() + ROLLUP resolve cleanly through the SQL
    // analyzer path (the Dataset API's ambiguity check misfires on the
    // Expand node's duplicated grouping attributes).
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .createOrReplaceTempView("graft_q10_base")
    s.sql(
      """SELECT CASE WHEN grouping(r_name) = 1 THEN 'ALL' ELSE r_name END AS r,
        | CASE WHEN grouping(n_name) = 1 THEN 'ALL' ELSE n_name END AS n,
        | count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM graft_q10_base
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY r, n""".stripMargin)
  }

  /** Q15: explicit GROUPING SETS — the general form rollup/cube are
    * sugar for: an arbitrary set list, each expanded once from ONE
    * scan (Catalyst's Expand node), with grouping_id disambiguating
    * the aggregation level. The (region), (nation), () sets here are
    * NOT a rollup prefix chain, so this exercises the planner path
    * q10 cannot. */
  def q15GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .createOrReplaceTempView("graft_q15_base")
    s.sql(
      """SELECT CASE WHEN grouping(r_name) = 1 THEN 'ALL' ELSE r_name END AS r,
        | CASE WHEN grouping(n_name) = 1 THEN 'ALL' ELSE n_name END AS n,
        | CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid,
        | count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM graft_q15_base
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY gid, r, n""".stripMargin)
  }

  /** Q11: pivot via conditional aggregation (count-if per event type). */
  def q11ConditionalPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id")

  /** Q13: distributed percentiles as order statistics (the result is
    * an actual data value — no interpolation arithmetic to drift
    * across engines). approx_percentile, NOT percentile_disc: the
    * exact aggregate buffers every group value in executor memory,
    * which dies at 100 TB, while the Greenwald-Khanna sketch is
    * mergeable (map-side partials) with memory bounded by `accuracy`
    * — and below `accuracy` ranks it IS the exact order statistic,
    * which the DuckDB quantile_disc oracle verifies. */
  def q13Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.25, 10000000)"), 2).as("p25"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000000)"), 2).as("p50"),
        round(expr("approx_percentile(l_extendedprice, 0.75, 10000000)"), 2).as("p75"))
      .orderBy("l_returnflag")

  /** Q12: global-aggregate scalar reused against the fact table via a
    * broadcast cross join (stays fully distributed — no collect). */
  def q12ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val avgPrice = li.agg(avg("l_extendedprice").as("avg_price"))
    li.crossJoin(broadcast(avgPrice))
      .filter(col("l_extendedprice") > col("avg_price"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_above"),
        round(sum("l_extendedprice"), 2).as("sum_above"))
      .orderBy("l_returnflag")
  }
}
