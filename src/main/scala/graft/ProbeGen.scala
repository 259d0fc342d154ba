package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Dev tool: build an N× scale probe dataset from a driver sf dir by
  * unioning shifted replicas — ENTITY IDS are offset per replica so
  * entity counts, join fan-outs, and history lengths scale the way a
  * genuinely bigger corpus would (dims region/nation stay fixed).
  * Text/embedding payloads are copied verbatim, so near-dup pair
  * queries (d2/d3/d4/d5) see every replica as an exact duplicate and
  * their TRUE answer grows quadratically — run d1 first (the
  * pipeline rule from SURVEY §4a) or exclude them via
  * SPARK_GRAFT_EXCLUDE when probing.
  *
  * Usage: runMain graft.ProbeGen <srcSfDir> <outDir> <copies>
  */
object ProbeGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = GraftSession.local()

    // raw load (no ts normalization) so written columns keep their
    // on-disk types; events.ts lands as plain INT64 nanos, which the
    // Tables loader handles identically
    def replicate(table: String, shifts: Map[String, Long]): Unit = {
      val base = Tables.load(spark, src, table)
      val reps = (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, unit)) =>
          df.withColumn(c, col(c) + lit(i * unit))
        }
      }
      reps.reduce(_.unionAll(_))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")
    }
    def copyOnce(table: String): Unit =
      Tables.load(spark, src, table)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$table.parquet")

    copyOnce("region"); copyOnce("nation")
    replicate("customer", Map("c_custkey" -> 10000000L))
    replicate("supplier", Map("s_suppkey" -> 10000000L))
    replicate("part", Map("p_partkey" -> 10000000L))
    replicate("orders", Map("o_orderkey" -> 100000000L,
      "o_custkey" -> 10000000L))
    replicate("lineitem", Map("l_orderkey" -> 100000000L,
      "l_partkey" -> 10000000L, "l_suppkey" -> 10000000L))
    replicate("events", Map("event_id" -> 1000000000L,
      "user_id" -> 1000000L))
    replicate("documents", Map("doc_id" -> 10000000L))
    replicate("embeddings", Map("vec_id" -> 10000000L))
    spark.stop()
  }
}
