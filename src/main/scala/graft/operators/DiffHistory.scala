package graft.operators

import graft.Tables
import graft.functions.DiffUtils
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diff-tracked field reconstruction — the reference stores
  * `cf_user_story` history as unified diffs and rebuilds the text by
  * replaying them while walking versions (reference:
  * bugzilla_etl/parse_bug_history.py:379 processBugsActivitiesTableItem
  * DIFF_FIELDS branch, :1102 ApplyDiff;
  * transform_bugzilla.py:25 DIFF_FIELDS).
  *
  * Here every 'view' event contributes one unified-diff hunk that
  * appends a line to the user's story; the story at each version is
  * rebuilt by REPLAYING THE ACTUAL DIFFS through
  * [[graft.functions.DiffUtils.applyDiff]] — not by shortcutting to
  * the known final text — as a SECONDARY-SORT streaming fold:
  * repartition by entity, sortWithinPartitions (id, ts, event_id),
  * then one pass per partition detecting entity boundaries. Diff
  * replay is inherently sequential per entity, exactly the
  * reference's walk, but no entity's history ever has to fit in
  * memory — Spark's external sort spills, and the fold holds ONE
  * story string, unlike the earlier flatMapGroups which buffered and
  * sorted each group's rows in the heap. The DuckDB oracle
  * reconstructs the same states independently via a windowed string
  * aggregation, so the replay machinery is hash-checked end-to-end.
  */
object DiffHistory {

  final case class DiffEv(id: Long, ts: Long, event_id: Long, diff: String)
  final case class StoryVersion(id: Long, ts: Long, event_id: Long,
      story: String)

  def b3DiffHistory(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("id").orderBy("ts", "event_id")
    val diffs = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("id"), unix_millis(col("ts")).as("ts"),
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType
          .fromDDL("k INT")).getField("k").as("k"))
      .withColumn("n_before", row_number().over(w) - 1)
      // unified hunk appending one line at position n_before+1
      .select(col("id"), col("ts"), col("event_id"),
        concat(lit("@@ -"), col("n_before") + 1, lit(",0 +"),
          col("n_before") + 1, lit(",1 @@\n+k="), col("k"),
          lit(" e="), col("event_id")).as("diff"))
      .as[DiffEv]
    replay(diffs)
      .toDF()
      .orderBy("id", "ts", "event_id")
  }

  /** Secondary-sort streaming replay: cluster by entity, sort rows
    * (id, ts, event_id) inside each partition, then fold each
    * partition in one pass, resetting at entity boundaries. Spark's
    * sort is external (spills to disk), and the fold state is one
    * story string — no entity's history is ever buffered in memory. */
  def replay(diffs: org.apache.spark.sql.Dataset[DiffEv])
      : org.apache.spark.sql.Dataset[StoryVersion] = {
    import diffs.sparkSession.implicits._
    diffs
      .repartition(col("id"))
      .sortWithinPartitions("id", "ts", "event_id")
      .mapPartitions { it =>
        // entity boundaries arrive contiguously after the sort; the
        // fold carries only the current entity's story string
        var curId = 0L
        var started = false
        var story = ""
        it.map { e =>
          if (!started || e.id != curId) {
            curId = e.id; started = true; story = ""
          }
          story = DiffUtils.applyDiff(story, e.diff)
          StoryVersion(e.id, e.ts, e.event_id, story)
        }
      }
  }
}
