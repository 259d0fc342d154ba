package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing primitives for the dedup + text-analysis operators.
  *
  * Everything is built from codegen'd built-in expressions
  * (`transform`/`aggregate`/`xxhash64`) — no Scala UDFs in the hot
  * path, so whole-stage codegen spans the full pipeline and the same
  * column program runs unchanged on a 1000-executor cluster.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (for Jaccard). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Character n-gram shingles; a text shorter than n yields itself.
    * (Columnar reference formulation; the hot path uses the native
    * [[graft.expressions.ShingleSet]] expression.) */
  def shingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Distinct character shingles via the native expression. */
  def shingleSet(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.ShingleSet(
        org.apache.spark.sql.graft.Bridge.expression(text), n))

  /** MinHash signature via the native tight-loop expression: k
    * md5-derived permutation minima over the shingle set (~400× the
    * interpreted higher-order-function formulation; md5-based so the
    * DuckDB oracle reproduces it — see
    * [[graft.expressions.MinHashParams]]). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.MinHashSig(
        org.apache.spark.sql.graft.Bridge.expression(shingleCol), k))

  /** FUSED shingle+minhash over raw text — identical output to
    * minhashSignature(shingleSet(text, n), k) (multiset minima equal
    * set minima), one pass over the UTF-8 bytes, no intermediate
    * shingle array. The d2 sketch hot path. */
  def minhashSignatureText(text: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.MinHashTextSig(
        org.apache.spark.sql.graft.Bridge.expression(text), n, k))

  /** MinHash-estimated Jaccard: fraction of agreeing signature slots
    * (native tight loop — this runs once per LSH candidate pair). */
  def minhashJaccardEst(sig1: Column, sig2: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SigAgree(
        org.apache.spark.sql.graft.Bridge.expression(sig1),
        org.apache.spark.sql.graft.Bridge.expression(sig2)))
      .cast("double") / k

  /** Interpreted HOF formulation of [[minhashJaccardEst]] — kept for
    * the equivalence spec only. */
  def minhashJaccardEstHof(sig1: Column, sig2: Column, k: Int): Column =
    aggregate(zip_with(sig1, sig2, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, m) => acc + m).cast("double") / k

  /** LSH band keys: split the k-wide signature into `bands` slices of
    * k/bands values each. The raw slice array IS the join key (array
    * equality shuffles and compares fine) — no band hash, so the
    * banding is exactly reproducible in the DuckDB oracle via
    * list_slice, with zero hash-collision false candidates. */
  def bandSlices(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map(b => slice(sig, b * rows + 1, rows)): _*)
  }

  /** FUSED split+distinct+simhash over raw text — identical output to
    * simhash(tokenSet(text)), one byte-walk, no token array. The d3
    * sketch hot path. */
  def simhashText(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SimHashText(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** 128-bit SimHash over a token array via the native expression:
    * struct(lo, hi) of two longs; bit i is set when the sum of
    * (+1/-1) votes from each token's md5 bit i is positive. */
  def simhash(tokenCol: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SimHash128(
        org.apache.spark.sql.graft.Bridge.expression(tokenCol)))

  /** Intersection size of two SORTED distinct string arrays (linear
    * merge, no per-call hash set) — d13's verification hot path. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Native greedy left-to-right non-overlap BPE pair merge (t14's
    * per-round apply step); ≡ the interpreted aggregate fold,
    * spec-asserted. */
  def bpeMergeApply(toks: Column, l: Column, r: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.BpeMergeApply(
        org.apache.spark.sql.graft.Bridge.expression(toks),
        org.apache.spark.sql.graft.Bridge.expression(l),
        org.apache.spark.sql.graft.Bridge.expression(r)))

  /** ONE-PASS BPE encode: apply a full ranked rule table
    * (array<struct<l,r>>) in rank order within a single native
    * expression evaluation — ≡ chaining [[bpeMergeApply]] per rule
    * (spec-asserted), one corpus scan for ANY rule count. */
  def bpeEncodeAll(toks: Column, rules: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.BpeEncodeAll(
        org.apache.spark.sql.graft.Bridge.expression(toks),
        org.apache.spark.sql.graft.Bridge.expression(rules)))

  /** DuckDB-identical md5_number_lower of a string as a signed long
    * (cross-engine feature-bucket hash; AND with a power-of-two mask
    * for a bucket id that matches the oracle bit-for-bit). */
  def md5Lo64(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.Md5Lo64(
        org.apache.spark.sql.graft.Bridge.expression(text)))

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Hamming distance between two simhash128 structs. */
  def hamming128(a: Column, b: Column): Column =
    hamming(a.getField("lo"), b.getField("lo")) +
      hamming(a.getField("hi"), b.getField("hi"))

  /** Declare a column non-null (Catalyst KnownNotNull). Use on an
    * EXPENSIVE expression that becomes a join key: the optimizer
    * infers `isnotnull(key)` filters from join constraints, and on a
    * nullable sketch column that re-evaluates the whole sketch per
    * row inside the scan filter — doubling its cost. Caller asserts
    * the inputs can't produce null (e.g. text IS NOT NULL scans). */
  def knownNotNull(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.KnownNotNull(
        org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Rolling polynomial fingerprint mod 1e9+7 over the code points —
    * accumulator stays < 2^35 so ANSI overflow checking never trips. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), greatest(length(text), lit(1))),
        i => ascii(text.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31 + c, lit(1000000007L)))
}
