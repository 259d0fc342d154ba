package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hot paths.
  *
  * The composed higher-order-function formulation (`transform` +
  * `aggregate` + `xxhash64`) is semantically identical but evaluates
  * lambdas interpretively — measured 25 ms/document for a 32-wide
  * signature. These expressions run the same arithmetic as tight JVM
  * loops over the unsafe string bytes (~50 µs/document, >400×).
  * `CodegenFallback` costs one virtual call per row; the inner loop
  * dominates, and the expressions are deterministic and
  * partition-local, so they scale embarrassingly on a cluster.
  */

/** MinHash signature: for seeds 0..k-1, the minimum of
  * xxhash64(element, seed) over the input array<string>.
  * Implements `doGenCode`, so the expression stays inside whole-stage
  * codegen (the fallback eval is kept for interpreted paths). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
        |long[] $mins = new long[$k];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  UTF8String $s = $arr.getUTF8String($i);
        |  if ($s != null) {
        |    for (int $j = 0; $j < $k; $j++) {
        |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
        |        .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
        |          $s.numBytes(), (long) $j);
        |      if ($h < $mins[$j]) $mins[$j] = $h;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """.stripMargin
    })
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
    }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(base, off, len, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** 64-bit SimHash over array<string>: bit i set when the sum of ±1
  * votes from each element-hash's bit i is positive. Codegen'd like
  * [[MinHashSig]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        |int[] $votes = new int[64];
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  UTF8String $s = $arr.getUTF8String($i);
        |  if ($s != null) {
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
        |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
        |        $s.numBytes(), 42L);
        |    for (int $b = 0; $b < 64; $b++) {
        |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
        |    }
        |  }
        |}
        |long $out = 0L;
        |for (int $b = 0; $b < 64; $b++) {
        |  if ($votes[$b] > 0) $out |= (1L << $b);
        |}
        |${ev.value} = $out;
      """.stripMargin
    })
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"simhash64 needs array<string>, got $t")
    }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Character shingles computed natively: all n-CHARACTER windows of
  * the string (`numChars`/char-indexed `substring`, so non-ASCII input
  * shingles correctly and identically to the character-based columnar
  * TextFunctions.shingles), distinct, as array<string>. Codegen emits
  * a static call into
  * [[ShingleHelper]] — the set-building loop is allocation-bound, so
  * inlining it as generated Java buys nothing, but the static call
  * keeps the surrounding projection inside one whole-stage span
  * (no per-row `eval` dispatch / InternalRow boxing as with
  * `CodegenFallback`). */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.ShingleHelper.shingles($s, $n)")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"shingle_set needs string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    ShingleHelper.shingles(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(c: Expression): ShingleSet =
    copy(child = c)
}

/** Static target for [[ShingleSet]] codegen (Scala objects expose
  * static forwarders, so generated Java calls this directly). */
object ShingleHelper {
  def shingles(s: UTF8String, n: Int): ArrayData = {
    // character count, NOT numBytes: UTF8String.substring indexes by
    // character, so a byte-based bound disagrees on non-ASCII input
    val len = s.numChars()
    if (len <= n) return new GenericArrayData(Array[Any](s.copy()))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n).copy())
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
