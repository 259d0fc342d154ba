package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  import SparkTest._

  test("salted two-phase agg equals plain groupBy") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("s"),
        min("user_id").as("mn"), max("user_id").as("mx"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3), r.getLong(4))))
      .toMap
    import operators.Salting._
    val salted = saltedAgg(ev, Seq("event_type"), 8,
      SaltedCount("n"), SaltedSum("s", col("value")),
      SaltedMin("mn", col("user_id")), SaltedMax("mx", col("user_id")))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), math.round(r.getDouble(2) * 100), r.getLong(3), r.getLong(4))))
      .toMap
    assert(plain == salted)
  }

  test("nested docs round-trip to the base table") {
    val flat = operators.Nested.n1NestedFlatten(spark, sf)
    val base = Tables.lineitem(spark, sf)
    assert(flat.count() == base.count())
    // every order's n_items equals its true lineitem count
    val bad = flat.groupBy("orderkey")
      .agg(count(lit(1)).as("actual"), first("n_items").as("claimed"))
      .filter(col("actual") =!= col("claimed")).count()
    assert(bad == 0)
  }

  test("count shards recombine as sums (not counts of shards)") {
    import operators.Salting._
    val n = saltedAgg(Tables.events(spark, sf), Seq("user_id"), 16,
      SaltedCount("n")).agg(sum("n")).head.getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }
}
