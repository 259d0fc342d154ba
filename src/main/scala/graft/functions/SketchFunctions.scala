package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/** Column builders for the native sketch aggregates (also registered
  * as SQL functions `hll_registers` / `cms_sketch` via
  * [[graft.GraftExtensions]]). */
object SketchFunctions {

  /** HyperLogLog 64-register max array over a pre-mixed 32-bit hash. */
  def hllRegisters(h: Column): Column =
    Bridge.column(graft.expressions.HllRegAgg(Bridge.expression(h))
      .toAggregateExpression())

  /** d=4 × w=512 count-min sketch cell array over raw keys. */
  def cmsSketch(key: Column): Column =
    Bridge.column(graft.expressions.CmsAgg(Bridge.expression(key))
      .toAggregateExpression())
}
