package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

/** MD5-derived 64-bit values, bit-identical to DuckDB's
  * `md5_number_lower` / `md5_number_upper` (verified empirically:
  * lower = digest bytes 8..15 little-endian, upper = bytes 0..7
  * little-endian). MD5 is the ONE string hash both engines share, so
  * every sketch built on it is oracle-checkable end to end — xxhash64
  * sketches were rows-only forever. */
object Md5Helper {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def leLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(off + i) & 0xffL); i -= 1 }
    v
  }
  def digest(s: UTF8String): Array[Byte] = {
    val md = tl.get(); md.reset(); md.update(s.getBytes); md.digest()
  }
  /** Reusable per-thread digest for fused loops. */
  def threadDigest(): java.security.MessageDigest = tl.get()
  /** DuckDB `md5_number_lower(s)` bit pattern (as a signed long). */
  def lo64(s: UTF8String): Long = leLong(digest(s), 8)
  /** DuckDB `md5_number_upper(s)` bit pattern (as a signed long). */
  def hi64(s: UTF8String): Long = leLong(digest(s), 0)
}

/** MinHash permutation parameters: h_j(x) = (A(j)·x + B(j)) mod P over
  * the low-32 md5 bits x. A(j) < 2^30 and x < 2^32 keep the product
  * inside non-overflowing signed-64 range in BOTH engines (DuckDB
  * BIGINT errors on overflow; Java would silently wrap). The arrays
  * are interpolated verbatim into the DuckDB oracle SQL, so both
  * sides share one definition. */
object MinHashParams {
  val P = 2147483647L // 2^31 - 1
  private val AMod = 1073741789L // largest prime < 2^30
  val A: Array[Long] = Array.tabulate(64)(j => 1L + (2654435761L * (j + 1)) % AMod)
  val B: Array[Long] = Array.tabulate(64)(j => (40503L * (j + 1) * (j + 17)) % P)
}

/** Static loop target for [[MinHashSig]] codegen. */
object MinHashHelper {
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val a = MinHashParams.A
    val b = MinHashParams.B
    val p = MinHashParams.P
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val x = Md5Helper.lo64(s) & 0xffffffffL
        var j = 0
        while (j < k) {
          val h = (a(j) * x + b(j)) % p
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Static loop target for [[MinHashTextSig]] codegen: the FUSED
  * shingle+minhash — slides every n-CHAR window over the string's
  * UTF-8 bytes (char-boundary walk, so non-ASCII text windows
  * identically to ShingleSet), hashing each window in place with a
  * reused digest + output buffer. No shingle set is materialized:
  * minhash minima over the window MULTISET equal minima over the
  * distinct set, so the result is bit-identical to
  * minhash_sig(shingle_set(text, n), k) (spec-asserted) while
  * skipping the per-document LinkedHashSet build and ~500 UTF8String
  * copies. */
object MinHashTextHelper {
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  def sig(s: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val a = MinHashParams.A
    val b = MinHashParams.B
    val p = MinHashParams.P
    val mins = Array.fill(k)(Long.MaxValue)
    val md = Md5Helper.threadDigest()
    val out = outBuf.get()

    // char start offsets (UTF-8 boundary walk)
    val starts = new Array[Int](bytes.length + 1)
    var nChars = 0
    var off = 0
    while (off < bytes.length) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    starts(nChars) = bytes.length

    def upd(from: Int, len: Int): Unit = {
      md.reset()
      md.update(bytes, from, len)
      md.digest(out, 0, 16)
      // DuckDB md5_number_lower low 32 bits (digest bytes 8..11 LE)
      val x = (out(8) & 0xffL) | ((out(9) & 0xffL) << 8) |
        ((out(10) & 0xffL) << 16) | ((out(11) & 0xffL) << 24)
      var j = 0
      while (j < k) {
        val h = (a(j) * x + b(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }

    if (nChars <= n) upd(0, bytes.length)
    else {
      var i = 0
      while (i <= nChars - n) {
        upd(starts(i), starts(i + n) - starts(i))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Fused shingle+minhash signature over raw text — result identical
  * to `MinHashSig(ShingleSet(text, n), k)`, one pass, zero
  * intermediate allocation per window. The hot path for d2. */
case class MinHashTextSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.MinHashTextHelper.sig($s, $n, $k);")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"minhash_text needs string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    MinHashTextHelper.sig(input.asInstanceOf[UTF8String], n, k)
  override protected def withNewChildInternal(c: Expression): MinHashTextSig =
    copy(child = c)
}

/** MinHash signature: for permutations 0..k-1, the minimum of
  * (A(j)·md5lo32(element) + B(j)) mod P over the input array<string>.
  * One MD5 per element + k cheap mults — cheaper than the former k
  * seeded xxhash64 passes, and DuckDB-reproducible (md5_number_lower).
  * Codegen emits a static call into [[MinHashHelper]], keeping the
  * surrounding projection in one whole-stage span. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expressions.MinHashHelper.sig($arr, $k);")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"minhash_sig needs array<string>, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    MinHashHelper.sig(input.asInstanceOf[ArrayData], k)
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Static loop target for [[SimHash128]] codegen. */
object SimHashHelper {
  def sig128(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val votes = new Array[Int](128)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val lo = Md5Helper.lo64(s)
        val hi = Md5Helper.hi64(s)
        var b = 0
        while (b < 64) {
          if (((lo >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          if (((hi >>> b) & 1L) == 1L) votes(64 + b) += 1 else votes(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var outLo = 0L
    var outHi = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) outLo |= (1L << b)
      if (votes(64 + b) > 0) outHi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](outLo, outHi))
  }
}

/** Static loop target for [[SimHashText]] codegen: FUSED
  * split+distinct+simhash — walks the UTF-8 bytes once, splitting on
  * single spaces with the exact `split(text, ' ')` semantics
  * (consecutive/trailing separators yield empty tokens, the empty
  * string yields one empty token), hashing each token in place and
  * deduplicating by its full 128-bit md5 (collision-free in any
  * practical corpus; the staged form dedups by string). Bit-identical
  * to simhash128(array_distinct(split(text, ' '))) — spec-asserted —
  * with no token array, no distinct pass, no UTF8String copies. */
object SimHashTextHelper {
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
  private def leLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(off + i) & 0xffL); i -= 1 }
    v
  }

  def sig128(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val votes = new Array[Int](128)
    val md = Md5Helper.threadDigest()
    val out = outBuf.get()
    val seen = new java.util.HashSet[(Long, Long)]()

    def token(from: Int, to: Int): Unit = {
      md.reset()
      md.update(bytes, from, to - from)
      md.digest(out, 0, 16)
      val lo = leLong(out, 8)
      val hi = leLong(out, 0)
      if (seen.add((lo, hi))) {
        var b = 0
        while (b < 64) {
          votes(b) += (((lo >>> b) & 1L).toInt << 1) - 1
          votes(64 + b) += (((hi >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
    }

    var start = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { token(start, i); start = i + 1 }
      i += 1
    }
    token(start, bytes.length)

    var outLo = 0L
    var outHi = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) outLo |= (1L << b)
      if (votes(64 + b) > 0) outHi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](outLo, outHi))
  }
}

/** Fused split+distinct+simhash over raw text — result identical to
  * `SimHash128(array_distinct(split(text, ' ')))`. The d3 sketch hot
  * path. */
case class SimHashText(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.SimHashTextHelper.sig128($s);")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"simhash_text needs string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    SimHashTextHelper.sig128(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SimHashText =
    copy(child = c)
}

/** 128-bit SimHash over array<string> as a (lo, hi) long pair: bit i
  * set when the sum of ±1 votes from each element's md5 bit i is
  * positive (bits 0..63 from md5_number_lower, 64..127 from
  * md5_number_upper — both DuckDB-reproducible, so the sketch itself
  * is oracle-checked). 128 bits keep pigeonhole bands ≥ 11 bits wide
  * at hamming ≤ 10, which bounds per-band bucket population at
  * corpus/2^11 per value — the 64-bit variant's 5–6-bit bands went
  * quadratic within buckets at corpus scale. */
case class SimHash128(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.expressions.SimHashHelper.sig128($arr);")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"simhash128 needs array<string>, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    SimHashHelper.sig128(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): SimHash128 =
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

/** DuckDB-identical `md5_number_lower` bit pattern of a string, as a
  * signed long — the cross-engine scalar hash for FEATURE BUCKETING
  * (c8's hashed n-gram features): `md5lo64(s) & (B-1)` equals
  * DuckDB's `md5_number_lower(s) & (B-1)` for power-of-two B, because
  * a bitwise AND reads the low bits identically under both signs. */
case class Md5Lo64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.Md5Helper.lo64($s);")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"md5lo64 needs string, got $t")
    }
  override def nullSafeEval(input: Any): Any =
    Md5Helper.lo64(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Md5Lo64 =
    copy(child = c)
}

/** Static loop target for [[BpeMergeApply]] codegen. */
object BpeHelper {
  def merge(toks: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var m = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (m > 0 && l.equals(out(m - 1)) && t != null && t.equals(r))
        out(m - 1) = UTF8String.concat(l, r)
      else { out(m) = t; m += 1 }
      i += 1
    }
    if (m == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], m))
  }
}

/** Greedy LEFT-TO-RIGHT non-overlapping BPE pair merge: every
  * adjacent (l, r) in `toks` becomes the single token l||r; the
  * merged token cannot chain as the left of another merge in the
  * same pass (it no longer equals l). Bit-identical to the
  * interpreted `aggregate` fold (spec-asserted) and to DuckDB's
  * `list_reduce` formulation in the t14 oracle — one tight loop, one
  * output array, no per-element accumulator copies (the HOF fold
  * reallocates the accumulator per token: O(n²) copies per doc). */
case class BpeMergeApply(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = first.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"bpe_merge_apply needs (array<string>, string, string), got $t")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, l, r) =>
      s"${ev.value} = graft.expressions.BpeHelper.merge($a, $l, $r);")

  override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    BpeHelper.merge(a.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BpeMergeApply = copy(f, s, t)
}

/** Static loop target for [[BpeEncodeAll]] codegen. */
object BpeEncodeHelper {
  /** Apply EVERY ranked rule in order, each as the same greedy
    * left-to-right non-overlap merge as [[BpeHelper.merge]], in ONE
    * in-place pass per rule over a single working array — no
    * per-rule column projection, no intermediate ArrayData. The write
    * index m never passes the read index i, so in-place is safe, and
    * the per-rule loop is literally BpeHelper.merge's condition —
    * sequential-replay equivalence is by construction (spec-asserted
    * against the chained per-rule expression). */
  def encodeAll(toks: ArrayData, rules: ArrayData): ArrayData = {
    val n = toks.numElements()
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) { arr(i) = toks.getUTF8String(i); i += 1 }
    var len = n
    val nr = rules.numElements()
    var k = 0
    while (k < nr) {
      val rule = rules.getStruct(k, 2)
      if (rule != null && !rule.isNullAt(0) && !rule.isNullAt(1)) {
        val l = rule.getUTF8String(0)
        val r = rule.getUTF8String(1)
        var m = 0
        i = 0
        while (i < len) {
          val t = arr(i).asInstanceOf[UTF8String]
          if (m > 0 && l.equals(arr(m - 1)) && t != null && t.equals(r))
            arr(m - 1) = UTF8String.concat(l, r)
          else { arr(m) = t; m += 1 }
          i += 1
        }
        len = m
      }
      k += 1
    }
    if (len == n) new GenericArrayData(arr)
    else new GenericArrayData(java.util.Arrays.copyOf(arr, len))
  }
}

/** The ONE-PASS BPE encoder: applies a FULL ranked merge-rule table
  * (array<struct<l,r>>, broadcast as a 1-row frame by the caller) to
  * a token array in a single expression evaluation — rule k runs over
  * the in-memory result of rules 1..k-1, bit-identical to chaining
  * [[BpeMergeApply]] once per rule (spec-asserted), but the corpus is
  * scanned ONCE regardless of rule count. This is the production
  * "tokenize the corpus" verb: a real tokenizer carries ~30k ranked
  * rules, and the per-rule-per-projection form is 30k corpus passes /
  * 30k chained plan nodes — unusable in rule count even though each
  * pass is cheap in data. Per-doc cost is O(rules × tokens) of
  * cache-hot pointer compares, microseconds at realistic sizes. */
case class BpeEncodeAll(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = left.dataType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
          ArrayType(StructType(Array(f1, f2)), _))
          if f1.dataType == StringType && f2.dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"bpe_encode_all needs (array<string>, array<struct<l,r>>), got $t")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, r) =>
      s"${ev.value} = graft.expressions.BpeEncodeHelper.encodeAll($a, $r);")

  override def nullSafeEval(a: Any, r: Any): Any =
    BpeEncodeHelper.encodeAll(a.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BpeEncodeAll = copy(l, r)
}

/** Static loop target for [[SortedIntersectCount]] codegen. */
object SortedIntersectHelper {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}

/** Intersection SIZE of two SORTED string arrays via a linear merge —
  * the d13 verification hot path. `array_intersect` builds a hash set
  * per call in interpreted eval; candidate verification runs one call
  * per candidate pair, and the inputs (the per-doc sorted key arrays)
  * are already sorted, so the merge does the same set-semantics count
  * (inputs are de-duplicated sets by construction) in one pass with
  * zero allocation. Callers MUST pass sorted, distinct arrays —
  * that's the producer's contract (sort_array over a token SET). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"sorted_intersect_count needs two array<string>, got $t")
    }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedIntersectHelper.count($a, $b);")

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectHelper.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SortedIntersectCount = copy(l, r)
}
