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
  * the known final text — inside a typed per-entity fold
  * (`flatMapGroups`): diff replay is inherently sequential per entity,
  * exactly the reference's walk, and the group holds one entity's
  * rows only, so the stage scales by entity-hash partitioning like
  * every other history operator. The DuckDB oracle reconstructs the
  * same states independently via a windowed string aggregation, so the
  * replay machinery is hash-checked end-to-end.
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
    diffs.groupByKey(_.id)
      .flatMapGroups { (id: Long, rows: Iterator[DiffEv]) =>
        // one entity per group; replay in version order
        val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
        var story = ""
        sorted.iterator.map { e =>
          story = DiffUtils.applyDiff(story, e.diff)
          StoryVersion(id, e.ts, e.event_id, story)
        }
      }
      .toDF()
      .orderBy("id", "ts", "event_id")
  }
}
