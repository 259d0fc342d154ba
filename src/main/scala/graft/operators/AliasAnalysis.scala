package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Email alias analysis — associates the addresses one person used
  * over time (reference: bugzilla_etl/alias_analysis.py:78
  * AliasAnalyzer).
  *
  * Reference semantics: per bug, a signed multiset of cc-change
  * emails (`- new + old`, alias_analysis.py:99 aggregator); an email
  * with a negative total was added-but-never-removed (a person's NEW
  * address), a positive one removed-but-never-added (their OLD
  * address). The reference then greedily matches the worst problem
  * email to the best co-occurring solution email when the margin over
  * the runner-up is at least `minimum_diff` (alias_analysis.py:114
  * analysis), folds the alias in, and repeats.
  *
  * Spark reformulation: the greedy one-at-a-time loop becomes a small
  * number of *batch rounds* — every problem email is matched
  * simultaneously, the alias map is folded in (including transitive
  * remapping, alias_analysis.py:219), and the round repeats. Each
  * round is a pair of joins + windowed argmax, fully distributed; the
  * driver holds nothing but the loop counter.
  */
object AliasAnalysis {

  /** Persist an alias map for the next run — the reference stores its
    * alias file and reloads it so later incremental runs start from
    * the accumulated knowledge (reference: bugzilla_etl/
    * alias_analysis.py:full_analysis save_aliases / load from
    * param.alias_file). */
  def saveAliases(aliases: DataFrame, path: String): Unit =
    aliases.write.mode("overwrite").parquet(path)

  def loadAliases(s: SparkSession, path: String): Option[DataFrame] =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      Some(s.read.parquet(path))
    else None

  /** @param ccChanges (bug_id, old_value, new_value) with
    *                  comma-separated email lists, as in bugs_activity
    * @param minimumDiff     required margin of the best match over the
    *                  runner-up (reference MINIMUM_DIFF_ROUGH)
    * @param minimumDiffFine once the rough threshold reaches a
    *                  fixpoint (a round matches nothing), relax to
    *                  min(minimumDiff, minimumDiffFine) and keep
    *                  going — the reference tightens the same way on
    *                  its final pass once all data is in
    *                  (alias_analysis.py:115-117 MINIMUM_DIFF_FINE,
    *                  "ONCE WE HAVE ALL THE DATA IN WE CAN BE LESS
    *                  DISCRIMINATING")
    * @param notAliases      single-column `email` frame of explicit
    *                  non-matches (human-curated): these emails are
    *                  never treated as problems
    *                  (alias_analysis.py:92 not_aliases, :135 filter)
    * @param prior     alias map from a previous run to seed round 0
    *                  (folded in before the first matching pass, like
    *                  the reference's reloaded alias file)
    * @return (alias, canonical) rows */
  def analyze(ccChanges: DataFrame, rounds: Int = 3,
      minimumDiff: Int = 2, minimumDiffFine: Int = 2,
      notAliases: Option[DataFrame] = None,
      prior: Option[DataFrame] = None): DataFrame = {
    val s = ccChanges.sparkSession
    import s.implicits._

    val sign = ccChanges.select(col("bug_id"),
        explode(split(lower(col("new_value")), ",\\s*")).as("email"),
        lit(-1L).as("delta"))
      .union(ccChanges.select(col("bug_id"),
        explode(split(lower(col("old_value")), ",\\s*")).as("email"),
        lit(1L).as("delta")))
      .filter(col("email") =!= "")
    // NOT cached, though round 2's fold re-reads it: same measured
    // result as the history DAGs — recompute of a codegen'd
    // scan+explode+agg beats a cache materialization barrier.
    val base = sign.groupBy("bug_id", "email")
      .agg(sum("delta").as("cnt"))
      .filter(col("cnt") =!= 0)

    var aliases = prior.map(_.select("alias", "canonical"))
      .getOrElse(Seq.empty[(String, String)].toDF("alias", "canonical"))
    var aliasesEmpty = prior.isEmpty

    val fine = math.min(minimumDiff, minimumDiffFine)
    var curDiff = minimumDiff
    var round = 0
    var converged = false
    while (round < rounds && !converged) {
      round += 1
      // the reference's last_run applies min(minimum_diff,
      // MINIMUM_DIFF_FINE) UNCONDITIONALLY on the final pass
      // (alias_analysis.py:115-117) — not only after a rough fixpoint.
      // So if we are out of rounds while rough matching is still
      // productive, the final round still runs at the fine threshold.
      if (round == rounds) curDiff = fine
      // fold current aliases into the per-bug multisets (first round
      // has nothing to fold — skip the join + re-aggregation). The
      // alias map is tiny by construction (bounded by distinct problem
      // emails), so broadcast it explicitly: no shuffle of `base`, and
      // AQE never has to guess.
      val folded = if (aliasesEmpty) base else base
        .join(broadcast(aliases.withColumnRenamed("alias", "email")),
          Seq("email"), "left")
        .withColumn("email", coalesce(col("canonical"), col("email")))
        .groupBy("bug_id", "email")
        .agg(sum("cnt").as("cnt"))
        .filter(col("cnt") =!= 0)
      // score every (problem, solution) by co-occurring positive mass.
      // One pass: collect each bug's problem and solution lists in a
      // single aggregation, then explode the cross product per bug —
      // the fold subtree is evaluated once, where the earlier
      // problems⋈solutions self-join evaluated it twice and reshuffled
      // both sides on bug_id.
      val scoredAll = folded.groupBy("bug_id")
        .agg(
          collect_list(when(col("cnt") < 0, col("email"))).as("probs"),
          collect_list(when(col("cnt") > 0,
            struct(col("email"), col("cnt")))).as("sols"))
        .select(explode(col("probs")).as("problem"), col("sols"))
        .select(col("problem"), explode(col("sols")).as("sol"))
        .groupBy(col("problem"), col("sol.email").as("solution"))
        .agg(sum("sol.cnt").as("score"))
      // excluded problems are dropped BEFORE the argmax window, like
      // the reference's problems filter — they are simply never
      // candidates for matching (the tiny curated list broadcasts)
      val scored = notAliases match {
        case Some(na) => scoredAll.join(
          broadcast(na.select(lower(col("email")).as("problem"))),
          Seq("problem"), "left_anti")
        case None => scoredAll
      }
      val w = Window.partitionBy("problem")
        .orderBy(col("score").desc, col("solution").asc)
      val best = scored
        .withColumn("rk", row_number().over(w))
        .withColumn("margin", col("score") -
          coalesce(lead("score", 1).over(w), lit(0L)))
        .filter(col("rk") === 1 && col("margin") >= curDiff)
        .select(col("problem").as("alias"), col("solution").as("canonical"))
        // materialize once: `best` feeds both the transitive remap and
        // the union below — without this the whole round pipeline
        // (fold + pair-agg + window) would run twice
        .localCheckpoint(eager = true)
      if (best.isEmpty) {
        if (curDiff > fine) {
          // rough fixpoint reached with data fully folded in: relax to
          // the fine threshold and keep matching (reference last_run)
          curDiff = fine
        } else {
          converged = true // fine fixpoint adds nothing; later rounds won't either
        }
      } else {
        // transitive fold: existing aliases pointing at a problem email
        // get remapped to its new canonical. `best` is the round's ONE
        // materialization; the alias chain on top of it is a handful
        // of broadcast joins over ≤rounds checkpointed tiny frames, so
        // re-evaluating it is cheap and a second eager checkpoint per
        // round (which serialized the loop) is not worth its job.
        val remapped = aliases.as("a")
          .join(broadcast(best.as("b")), $"a.canonical" === $"b.alias", "left")
          .select($"a.alias",
            coalesce($"b.canonical", $"a.canonical").as("canonical"))
        aliases = remapped.union(best)
          .groupBy("alias").agg(min("canonical").as("canonical"))
          .filter(col("alias") =!= col("canonical"))
        aliasesEmpty = false
      }
    }
    aliases.orderBy("alias")
  }
}
