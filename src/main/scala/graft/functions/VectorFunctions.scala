package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as codegen'd higher-order-function Columns — no UDFs.
  * `aggregate`/`zip_with` fold left-to-right in doubles, matching the
  * DuckDB oracle's evaluation order at 3-decimal precision.
  */
object VectorFunctions {

  /** Element-wise cast to double (embeddings are float32 on disk). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** cosine(a, b) = dot / sqrt(|a|^2 * |b|^2), all float64. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / sqrt(norm2(ad) * norm2(bd))
  }

  /** Element-wise mean vector aggregate (native buffer, map-side
    * partial agg — no posexplode row blowup). */
  def vectorMean(v: Column, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VectorMeanAgg(
        org.apache.spark.sql.graft.Bridge.expression(v), dim)
        .toAggregateExpression())
}
