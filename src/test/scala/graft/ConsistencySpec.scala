package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the activity-log consistency report
  * (reference PROBLEM-note semantics, parse_bug_history.py:827, :418,
  * :947-966). */
class ConsistencySpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("multi-value: same-direction runs flagged, reference tolerances applied") {
    val ops = Seq(
      // keywords: add-after-add on a normal item → redundant_add
      (1L, 10L, 1L, "keywords", "add", "foo"),
      (1L, 20L, 2L, "keywords", "add", "foo"),
      // keywords: same conflict on a KNOWN_MISSING keyword → suppressed
      (1L, 10L, 3L, "keywords", "add", "dogfood"),
      (1L, 20L, 4L, "keywords", "add", "dogfood"),
      // cc: conflicts suppressed in both directions (DEBUG_CC_CHANGES off)
      (1L, 10L, 5L, "cc", "add", "a@m"),
      (1L, 20L, 6L, "cc", "add", "a@m"),
      (1L, 30L, 7L, "cc", "remove", "b@m"),
      (1L, 40L, 8L, "cc", "remove", "b@m"),
      // blocked: remove-after-remove suppressed (missing private bugs)
      (1L, 10L, 9L, "blocked", "remove", "7"),
      (1L, 20L, 10L, "blocked", "remove", "7"),
      // blocked: add-after-add IS a problem (only remove-misses tolerated)
      (1L, 30L, 11L, "blocked", "add", "8"),
      (1L, 40L, 12L, "blocked", "add", "8"),
      // dependson: leading remove alone = pre-history presence, fine
      (2L, 10L, 13L, "dependson", "remove", "9"),
      // alternating ops never flag
      (2L, 10L, 14L, "keywords", "add", "bar"),
      (2L, 20L, 15L, "keywords", "remove", "bar"),
      (2L, 30L, 16L, "keywords", "add", "bar"))
      .toDF("id", "ts_ms", "event_id", "field", "op", "item")
    val out = operators.Consistency.multiValueProblems(ops)
      .select("event_id", "kind", "detail").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (2L, "redundant_add", "foo"),
      (12L, "redundant_add", "8")))
  }

  test("single-value: chain mismatches flagged with field and rewrite tolerances") {
    val chg = Seq(
      // status: v1→v2 then old says v9 → inconsistent_change
      (1L, 10L, 1L, "status", "v0", "v2"),
      (1L, 20L, 2L, "status", "v9", "v3"),
      // consistent link: no problem
      (1L, 30L, 3L, "status", "v3", "v4"),
      // cf_last_resolved: mismatch suppressed (KNOWN_INCONSISTENT_FIELDS)
      (1L, 10L, 4L, "cf_last_resolved", "r0", "r1"),
      (1L, 20L, 5L, "cf_last_resolved", "r9", "r2"),
      // cf_blocking_b2g: 1.5 → observed 2.0 tolerated (FIELDS_CHANGED)
      (2L, 10L, 6L, "cf_blocking_b2g", "1.0", "1.5"),
      (2L, 20L, 7L, "cf_blocking_b2g", "2.0", "2.1"),
      // cf_blocking_b2g: 2.1 → observed 9.9 NOT in the allowed list
      (2L, 30L, 8L, "cf_blocking_b2g", "9.9", "3.0"),
      // qa_contact: email → pre-1999 integer profile-id mismatch,
      // and a plain alias-churn mismatch — EMAIL_FIELDS swallows both
      // (parse_bug_history.py:422-431: every branch passes)
      (3L, 10L, 9L, "qa_contact", "x", "u7@x.com"),
      (3L, 20L, 10L, "qa_contact", "7", "u8@x.com"),
      (3L, 30L, 11L, "qa_contact", "u9@y.org", "u8@x.com"))
      .toDF("id", "ts_ms", "event_id", "field", "old_value", "new_value")
    val out = operators.Consistency.singleValueProblems(chg)
      .select("event_id", "detail").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (2L, "v2 != v9"),
      (8L, "2.1 != 9.9")))
  }

  test("report is invariant to input row order and partitioning") {
    // the property a cluster actually exercises: results must not
    // depend on which partition a row lands in or arrival order
    val ops = (1 to 200).map { i =>
      (i % 7L, i % 50L, i.toLong, if (i % 3 == 0) "keywords" else "blocked",
        if (i % 2 == 0) "add" else "remove", s"i${i % 5}")
    }.toDF("id", "ts_ms", "event_id", "field", "op", "item")
    def collectSet(df: org.apache.spark.sql.DataFrame) =
      operators.Consistency.multiValueProblems(df)
        .collect().map(_.toString).toSet
    val base = collectSet(ops)
    assert(base == collectSet(ops.repartition(13)))
    assert(base == collectSet(ops.orderBy(org.apache.spark.sql.functions
      .rand(42))))
    assert(base.nonEmpty)
  }
}
