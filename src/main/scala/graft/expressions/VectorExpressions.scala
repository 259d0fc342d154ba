package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native float64 dot product over two numeric arrays.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b,
  * _*_), 0.0, _+_)`) is semantically identical — same left-to-right
  * double accumulation — but evaluates its lambdas interpretively,
  * which dominates the ANN/dedup verification stages (millions of
  * 64-dim dots). This expression runs the same arithmetic as one tight
  * loop and stays inside whole-stage codegen via a static helper call,
  * so the surrounding projection keeps one codegen span. Equivalence
  * with the HOF formulation is spec-asserted bit-for-bit.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"vec_dot needs two array<float|double>, got $l, $r")
    }

  // a null ELEMENT nulls the whole dot (the HOF formulation's
  // semantics: null*x poisons the running sum), so the expression can
  // return null even for non-null array inputs — codegen must route
  // through a boxed helper and set isNull
  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
        |java.lang.Double $r = graft.expressions.VecHelper.dot($a, $b,
        |  ${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)});
        |if ($r == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $r.doubleValue(); }
      """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any =
    VecHelper.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
}

/** Native squared-L2 distance over two double arrays, accumulated
  * left-to-right as (a_i - b_i)^2 — BIT-IDENTICAL to the
  * `aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)), 0.0, _+_)`
  * higher-order formulation (spec-asserted), so swapping it into a hot
  * path changes no query result and no oracle. Exists because the HOF
  * form evaluates interpreted lambdas per element — the PQ encoder
  * runs vectors × codewords × subspaces of these. */
case class VecL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"vec_l2 needs two array<double>, got $l, $r")
    }

  // like VecDot: a null ELEMENT nulls the whole distance
  override def nullable: Boolean = true

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("l2Res")
      s"""
        |java.lang.Double $r = graft.expressions.VecHelper.l2($a, $b);
        |if ($r == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $r.doubleValue(); }
      """.stripMargin
    })

  override def nullSafeEval(a: Any, b: Any): Any =
    VecHelper.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecL2 = copy(left = l, right = r)
}

/** Count of pairwise-equal slots between two long arrays (minhash
  * signature agreement). The `zip_with`+`aggregate` formulation is
  * semantically identical but evaluates interpreted lambdas per
  * candidate pair — this is the LSH verification hot path. */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"sig_agree needs two array<bigint>, got $l, $r")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VecHelper.sigAgree($a, $b)")

  override def nullSafeEval(a: Any, b: Any): Any =
    VecHelper.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigAgree = copy(left = l, right = r)
}

/** Static target for [[VecDot]] / [[SigAgree]] codegen. */
object VecHelper {

  /** Null SLOTS count as disagreement — identical to the HOF
    * `when(a === b, 1).otherwise(0)` form, where a null comparison
    * falls through to the otherwise(0) branch. */
  def sigAgree(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"sig_agree length mismatch: $n vs ${b.numElements()}")
    }
    var agree = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) {
        agree += 1
      }
      i += 1
    }
    agree
  }

  /** Squared L2, left-to-right; null on any null element (matches the
    * HOF `(x - c) * (x - c)` fold bit-for-bit). */
  def l2(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_l2 length mismatch: $n vs ${b.numElements()}")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Returns null when any element is null — identical to the HOF
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form, where a null
    * product poisons the running sum. (Unsafe arrays would otherwise
    * silently read a null slot as 0.0.) */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean)
      : java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot length mismatch: $n vs ${b.numElements()}")
    }
    var acc = 0.0
    var i = 0
    if (!aFloat && !bFloat) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getDouble(i) * b.getDouble(i); i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
    }
    java.lang.Double.valueOf(acc)
  }

  /** Left-to-right sum of one DOUBLE field over an array of structs;
    * null on a null element or null field — identical to the HOF
    * `aggregate(arr, 0.0, (a, p) => a + p.getField(f))` fold
    * bit-for-bit (null poisons the running sum). */
  def structFieldSum(arr: ArrayData, idx: Int,
      numFields: Int): java.lang.Double = {
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val st = arr.getStruct(i, numFields)
      if (st.isNullAt(idx)) return null
      acc += st.getDouble(idx)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Native left-to-right sum of one double field over an
  * array<struct> — the per-document log-likelihood accumulation in
  * t11's perplexity (fold over a term-SORTED struct list, so summation
  * order is engine-identical). The interpreted `aggregate` HOF runs a
  * lambda closure per element per row and dominated t11 at the 30×
  * probe (21.7 s); this expression is the same arithmetic in one tight
  * loop inside whole-stage codegen. Equivalence with the HOF fold is
  * spec-asserted bit-for-bit. */
case class StructFieldSum(child: Expression, fieldName: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val (idx, numFields) = child.dataType match {
    case ArrayType(st: StructType, _) => (st.fieldIndex(fieldName), st.length)
    case _ => (-1, -1)
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _)
          if st.fieldNames.contains(fieldName) &&
            st(st.fieldIndex(fieldName)).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"struct_field_sum needs array<struct<...$fieldName:double...>>, got $t")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sfsRes")
      s"""
        |java.lang.Double $r =
        |  graft.expressions.VecHelper.structFieldSum($a, $idx, $numFields);
        |if ($r == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $r.doubleValue(); }
      """.stripMargin
    })

  override def nullSafeEval(a: Any): Any =
    VecHelper.structFieldSum(a.asInstanceOf[ArrayData], idx, numFields)

  override protected def withNewChildInternal(
      newChild: Expression): StructFieldSum = copy(child = newChild)
}
