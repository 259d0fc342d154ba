package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math Columns. Dot products run through the native codegen'd
  * [[graft.expressions.VecDot]]; the higher-order-function formulation
  * is kept as `dotHof` and spec-asserted identical (same left-to-right
  * float64 accumulation, so results match the DuckDB oracle's
  * evaluation order at 3-decimal precision).
  */
object VectorFunctions {

  /** Element-wise cast to double (embeddings are float32 on disk). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native tight-loop dot product (whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VecDot(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Reference higher-order-function dot — interpreted lambdas; used
    * by the equivalence spec, never in a hot path. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native left-to-right sum of one double field over an
    * array<struct> ([[graft.expressions.StructFieldSum]]) — t11's
    * per-document log-likelihood fold without an interpreted lambda
    * per element. */
  def structFieldSum(arr: Column, field: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.StructFieldSum(
        org.apache.spark.sql.graft.Bridge.expression(arr), field))

  /** The interpreted-HOF form of [[structFieldSum]] — equivalence
    * spec only. */
  def structFieldSumHof(arr: Column, field: String): Column =
    aggregate(arr, lit(0.0), (acc, p) => acc + p.getField(field))

  def norm2(a: Column): Column = dot(a, a)

  /** Native squared-L2 distance (whole-stage codegen); bit-identical
    * to the `zip_with`/`aggregate` fold. */
  def l2(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VecL2(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** HOF squared-L2 — kept for the equivalence spec only. */
  def l2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, v) => acc + v)

  /** cosine(a, b) = dot / sqrt(|a|^2 * |b|^2), all float64.
    * ([[graft.expressions.VecDot]] casts float elements to double
    * in-loop — identical to transform-cast-then-multiply.) */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Deterministic random hyperplane j, as a double array in [-1, 1).
    * SQL formulation — per-row recomputation; kept for the
    * plane-equivalence spec. */
  def plane(j: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(lit(j), i), lit(2000)).cast("double") / 1000.0 - 1.0)

  /** The same plane as [[plane]], precomputed once on the driver by
    * replicating xxhash64's chaining (seed 42, then per-argument
    * XXH64.hashInt — both inputs are int-typed in the SQL form) —
    * spec-asserted identical values. Folding the plane to a literal
    * keeps the per-row work at one native dot instead of rebuilding
    * the 64-element array per row per plane. */
  def planeValues(j: Int, dim: Int): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(dim) { i =>
      val h = XXH64.hashInt(i, XXH64.hashInt(j, 42L))
      val m = ((h % 2000L) + 2000L) % 2000L // pmod
      m.toDouble / 1000.0 - 1.0
    }
  }

  /** Sign-signature of `emb` (already double) under `r` hyperplanes
    * with ids [seed, seed+r) — a value in [0, 2^r). */
  def signSig(emb: Column, seed: Int, r: Int, dim: Int): Column =
    (0 until r).map { j =>
      when(dot(emb, typedLit(planeValues(seed + j, dim))) > 0, 1L << j)
        .otherwise(0L)
    }.reduce(_ + _)

  /** Element-wise mean vector aggregate (native buffer, map-side
    * partial agg — no posexplode row blowup). */
  def vectorMean(v: Column, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.VectorMeanAgg(
        org.apache.spark.sql.graft.Bridge.expression(v), dim)
        .toAggregateExpression())
}
