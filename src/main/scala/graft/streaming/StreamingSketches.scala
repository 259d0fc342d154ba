package graft.streaming

import graft.functions.SketchFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CONTINUOUS profiling — the o6/o7 native sketch aggregates run as a
  * streaming aggregation: a `TypedImperativeAggregate`'s mergeable
  * buffer is exactly streaming aggregation state, so each micro-batch
  * folds its rows into the running register/cell arrays and a
  * dashboard reads a CURRENT distinct estimate / frequency table at
  * any moment with no batch recompute. State per group is the
  * constant-size sketch (64 registers / 2048 cells) — the only
  * profiling state shape that survives an unbounded stream; an exact
  * streaming countDistinct would grow state with the key universe.
  *
  * Both transforms apply unchanged to a batch frame (the functions
  * are aggregates, not stream-specific) — the spec pins streamed ≡
  * batch on the same rows, and cross-batch merge ≡ one-shot.
  */
object StreamingSketches {

  /** o6's per-group HLL register state over a (streaming or batch)
    * lineitem frame; the estimate derivation is o6HllDistinctAgg's
    * closed form, applied downstream of the state. */
  def hllByFlag(li: DataFrame): DataFrame =
    li.selectExpr("l_returnflag as flag",
        "cast(((l_orderkey % 2147483648) * 2654435761) % 4294967296 " +
          "as bigint) as h")
      .groupBy("flag")
      .agg(SketchFunctions.hllRegisters(col("h")).as("regs"))

  /** o7's global CMS cell state over a (streaming or batch) events
    * frame — one 2048-long array, the true streaming CMS. */
  def cmsCells(ev: DataFrame): DataFrame =
    ev.agg(SketchFunctions.cmsSketch(col("user_id")).as("cells"))
}
