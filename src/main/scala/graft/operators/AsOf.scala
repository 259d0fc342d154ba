package graft.operators

import graft.plans.{AsOfJoin, AsOfStrategy}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** User-facing as-of join API over the custom Catalyst operator
  * (graft.plans.AsOfJoin / AsOfJoinExec). */
object AsOf {

  /** Left as-of join: every left row + the latest right row whose
    * keys match and whose `rightTimeCol` <= `leftTimeCol`. Time
    * columns must be long-backed (epoch millis). Keep right rows
    * unique per (keys, time) for deterministic output. */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val lPlan = Bridge.plan(left)
    val rPlan = Bridge.plan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    Bridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol)))
  }

  /** Q16: fact-to-SCD-2 interval join — every fact event joined to the
    * dimension VERSION whose validity interval contains the event time
    * (the reference's "bug state at event time" query shape: version
    * intervals come from parse_bug_history's valid_from/expires_on,
    * reference: bugzilla_etl/parse_bug_history.py:29).
    *
    * Implementation is the native as-of join on valid_from: because
    * SCD-2 intervals TILE time per entity (valid_to = the next
    * version's valid_from), "latest valid_from <= ts" IS interval
    * containment — no end-of-interval filter needed. That re-expression
    * matters at 100 TB: the naive `BETWEEN` range join has no equi-only
    * condition Spark can hash on beyond user_id, so within-key it
    * degenerates to per-key nested loops (and with a skewed entity the
    * stage dies); the as-of plan is one shuffle on the entity key and
    * an O(n+m) merge scan per partition. */
  def q16IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val stateTypes = Seq("signup", "purchase")
    // One state row per (user, ts): concurrent changes collapse to the
    // latest event_id, mirroring q14's dedup so output is deterministic.
    val states = ev.filter(col("event_type").isin(stateTypes: _*))
      .groupBy(col("user_id").as("s_user"),
        unix_millis(col("ts")).as("valid_from"))
      .agg(max_by(col("event_type"), col("event_id")).as("state"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s_user").orderBy("valid_from")
    val versions = states
      .withColumn("state_version", row_number().over(w).cast("long"))
      .withColumn("valid_to",
        coalesce(lead("valid_from", 1).over(w), lit(History.MaxTimestamp)))
    val facts = ev.filter(!col("event_type").isin(stateTypes: _*))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
    join(facts, versions, Seq("user_id"), Seq("s_user"), "ts_ms", "valid_from")
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("state"),
        col("state_version"), col("valid_from"), col("valid_to"))
      .orderBy("event_id")
  }

  /** Q14: every non-signup event joined as-of to the user's latest
    * prior signup (oracle: DuckDB's native ASOF LEFT JOIN). */
  def q14AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val lhs = ev.filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
    val rhs = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id").as("s_user"),
        unix_millis(col("ts")).as("signup_ms"))
      .agg(round(max_by(col("value"), col("event_id")), 2).as("signup_value"))
    join(lhs, rhs, Seq("user_id"), Seq("s_user"), "ts_ms", "signup_ms")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("signup_ms"), col("signup_value"))
      .orderBy("event_id")
  }
}
