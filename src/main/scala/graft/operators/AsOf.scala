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
