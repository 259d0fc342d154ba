package graft

import org.scalatest.funsuite.AnyFunSuite

/** Alias matching on a crafted fixture: one person renames
  * alice@m -> alice2@m across several bugs; noise must not match. */
class AliasSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("renamed address resolves to its old canonical email") {
    // On bugs 1-4 alice@m (present since creation) is removed and
    // alice2@m is added -> alice2 is a 'problem' (added, never removed),
    // alice is the co-occurring 'solution'.
    val cc = Seq(
      (1L, "alice@m", "alice2@m"),
      (2L, "alice@m", "alice2@m"),
      (3L, "alice@m", "alice2@m"),
      (4L, "alice@m", "alice2@m"),
      // noise: bob added on one bug only, nothing removed there
      (5L, "", "bob@m"),
      // unrelated balanced churn
      (6L, "carol@m", "carol@m"))
      .toDF("bug_id", "old_value", "new_value")
    val result = operators.AliasAnalysis.analyze(cc).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(result.get("alice2@m").contains("alice@m"))
    assert(!result.contains("bob@m"))
    assert(!result.contains("carol@m"))
  }

  test("transitive rename folds to one canonical") {
    // a -> b on early bugs, then b -> c later: c should canonicalize to a
    // chain ending at the oldest address
    val cc = Seq(
      (1L, "a@m", "b@m"), (2L, "a@m", "b@m"), (3L, "a@m", "b@m"),
      (4L, "b@m", "c@m"), (5L, "b@m", "c@m"), (6L, "b@m", "c@m"))
      .toDF("bug_id", "old_value", "new_value")
    val result = operators.AliasAnalysis.analyze(cc, rounds = 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // b and c both resolve to the same ultimate canonical
    val canonB = result.getOrElse("b@m", "b@m")
    val canonC = result.getOrElse("c@m", "c@m")
    assert(canonB == canonC, s"b->$canonB c->$canonC should agree")
    assert(canonB == "a@m")
  }

  test("not_aliases exclusion: a declared non-match is never matched") {
    // same clear alice signal as above, but a human has declared
    // alice2@m a NON-alias (reference alias_analysis.py:92
    // not_aliases) — it must never appear in the output, while an
    // unrelated rename on other bugs still matches
    val cc = Seq(
      (1L, "alice@m", "alice2@m"),
      (2L, "alice@m", "alice2@m"),
      (3L, "alice@m", "alice2@m"),
      (7L, "dave@m", "dave2@m"),
      (8L, "dave@m", "dave2@m"),
      (9L, "dave@m", "dave2@m"))
      .toDF("bug_id", "old_value", "new_value")
    val result = operators.AliasAnalysis.analyze(cc,
      notAliases = Some(Seq("alice2@m").toDF("email"))).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(!result.contains("alice2@m"))
    assert(result.get("dave2@m").contains("dave@m"))
  }

  test("fine pass: rough threshold misses a weak match, fine catches it") {
    // eve renames on only 2 bugs: margin over the runner-up is 2.
    // At minimumDiff=3 (rough) no round matches her; once the rough
    // fixpoint is reached the analyzer relaxes to minimumDiffFine=2
    // (reference MINIMUM_DIFF_FINE final-pass tightening) and matches.
    val cc = Seq(
      (1L, "eve@m", "eve2@m"),
      (2L, "eve@m", "eve2@m"))
      .toDF("bug_id", "old_value", "new_value")
    val rough = operators.AliasAnalysis.analyze(cc,
      rounds = 3, minimumDiff = 3, minimumDiffFine = 3).collect()
    assert(rough.isEmpty, "margin-2 match must fail the rough threshold")
    val fine = operators.AliasAnalysis.analyze(cc,
      rounds = 3, minimumDiff = 3, minimumDiffFine = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(fine.get("eve2@m").contains("eve@m"),
      "fine pass after rough fixpoint must catch the margin-2 match")
  }

  test("fine threshold applies on the last round even without a rough fixpoint") {
    // rounds=1: the single round IS the last run, so the reference's
    // unconditional min(minimum_diff, MINIMUM_DIFF_FINE) on the final
    // pass (alias_analysis.py:115-117) must apply immediately — no
    // empty rough round needed first.
    val cc = Seq(
      (1L, "eve@m", "eve2@m"),
      (2L, "eve@m", "eve2@m"))
      .toDF("bug_id", "old_value", "new_value")
    val result = operators.AliasAnalysis.analyze(cc,
      rounds = 1, minimumDiff = 3, minimumDiffFine = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(result.get("eve2@m").contains("eve@m"),
      "final round must run at the fine threshold unconditionally")
  }

  test("saved aliases seed the next run and stay transitively closed") {
    val run1 = Seq(
      (1L, "a@m", "b@m"), (2L, "a@m", "b@m"), (3L, "a@m", "b@m"))
      .toDF("bug_id", "old_value", "new_value")
    val aliasPath = java.nio.file.Files
      .createTempDirectory("graft_alias").toString + "/aliases"
    operators.AliasAnalysis.saveAliases(
      operators.AliasAnalysis.analyze(run1), aliasPath)

    // next incremental run only sees the later rename b -> c, but the
    // reloaded alias file carries b -> a, so c still folds to a
    val run2 = Seq(
      (4L, "b@m", "c@m"), (5L, "b@m", "c@m"), (6L, "b@m", "c@m"))
      .toDF("bug_id", "old_value", "new_value")
    val prior = operators.AliasAnalysis.loadAliases(spark, aliasPath)
    assert(prior.isDefined)
    val result = operators.AliasAnalysis.analyze(run2, prior = prior)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(result.get("b@m").contains("a@m")) // carried forward
    assert(result.get("c@m").contains("a@m")) // new rename folds through
    // closure: no canonical is itself an alias
    assert(result.values.toSet.intersect(result.keySet).isEmpty)
  }
}
