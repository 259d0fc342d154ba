package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the reference's incremental ETL loop
  * (reference: bugzilla_etl/bz_etl.py:172 incremental_etl polls for
  * rows with modified_ts past the last run) becomes a continuous
  * query — watermarked event-time windows for aggregation and
  * mapGroupsWithState for gap sessionization (the stateful analogue of
  * operators.History.h11Sessionize).
  *
  * SCALE NOTE (r15): the three flatMapGroupsWithState operators below
  * buffer one entity's whole micro-batch on a single executor's heap
  * (`rows.toSeq.sortBy`) — fine up to the maxFilesPerTrigger/maxBytes
  * throttle, but a whale entity dominating a batch serializes into
  * one task's memory. [[EventStreamFold]] carries the whale-safe
  * folded forms (per-batch distributed window fold, state as
  * DataFrames, O(entities) state input), spec-pinned record-identical
  * to these; these remain the low-latency small-entity forms and the
  * semantic reference the fold is proven against.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Continuous Load stage: stream micro-batches into the ES bulk
    * sink via foreachBatch — the streaming face of the reference's
    * incremental ETL loop, which polls and bulk-indexes each window
    * (reference: bugzilla_etl/bz_etl.py:172 incremental_etl). Each
    * micro-batch lands as its own bulk directory named by batch id,
    * so replayed batches overwrite idempotently (same dir, same _ids)
    * instead of double-indexing. */
  def esSinkQuery(docs: DataFrame, index: String, idCol: String,
      outRoot: String): org.apache.spark.sql.streaming.DataStreamWriter[
      org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        graft.sources.EsSink.writeBulk(batch.toDF(), index, idCol,
          s"$outRoot/batch_$batchId")
    }

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup: drop duplicate event_ids within the
    * watermark horizon — the streaming face of dedup.Dedup.d1 (state
    * store bounded by the watermark, not the corpus). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  case class EvFull(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class LatestState(user_id: Long, last_type: String,
      last_value: Double, ts_ms: Long)

  /** Streaming latest-state upsert — the continuously-maintained
    * "current document" the reference re-indexes on every incremental
    * run (reference: bugzilla_etl/bz_etl.py:172 incremental_etl),
    * here as one mapGroupsWithState row per entity per trigger.
    *
    * State is BOUNDED: EventTimeTimeout evicts entities idle past
    * `retentionMs` (watermark-driven), emitting their final state once
    * more on the way out — an update-mode sink upserts by user_id, so
    * the re-emission is idempotent. Without this, state grows with
    * key cardinality forever. */
  def latestState(events: Dataset[EvFull],
      retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[LatestState] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, LatestState](
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EvFull], state: GroupState[LatestState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val newest = rows.maxBy(e => (e.ts.getTime, e.event_id))
            val cur = state.getOption match {
              case Some(prev) if prev.ts_ms >= newest.ts.getTime => prev
              case _ => LatestState(userId, newest.event_type,
                math.round(newest.value * 100) / 100.0, newest.ts.getTime)
            }
            state.update(cur)
            state.setTimeoutTimestamp(math.max(cur.ts_ms + retentionMs,
              state.getCurrentWatermarkMs() + 1))
            cur
          }
      }
  }

  case class VersionState(version: Long, open: EvFull)
  case class VersionRow(user_id: Long, event_id: Long, event_type: String,
      value: Double, valid_from: Long, valid_to: Long, version: Long)

  /** Streaming SCD-2 version maintenance — the reference's CORE
    * operator (parse_bug_history's snapshot versioning, batch analogue
    * operators.History.h1SnapshotHistory) run continuously: each
    * arriving event CLOSES the entity's open version (emitted with
    * valid_to = the new event's ts) and opens the next one. Append
    * mode emits exactly the closed versions — the immutable CDC
    * records a downstream index consumes; the one still-open version
    * per entity lives in the state store (it IS the mutable "current
    * document") until EventTimeTimeout evicts it, at which point it is
    * emitted with the open-ended valid_to = 9999999999000, exactly as
    * the batch operator marks it. State per entity is one version
    * counter plus one event — bounded by live-entity cardinality, not
    * history length. Late events older than the open version would
    * rewrite closed history; the watermark bounds them and they are
    * dropped (the reference's incremental ETL instead REBUILDS touched
    * entities — that path is EtlRunner's full/incremental contract). */
  def versionHistory(events: Dataset[EvFull],
      retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[VersionRow] = {
    import events.sparkSession.implicits._
    def mkRow(uid: Long, open: EvFull, validTo: Long, version: Long) =
      VersionRow(uid, open.event_id, open.event_type,
        math.round(open.value * 100) / 100.0, open.ts.getTime, validTo, version)
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[VersionState, VersionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EvFull], state: GroupState[VersionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(mkRow(uid, s.open, 9999999999000L, s.version))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[VersionRow]
            sorted.foreach { e =>
              val later = st == null || e.ts.getTime > st.open.ts.getTime ||
                (e.ts.getTime == st.open.ts.getTime &&
                  e.event_id > st.open.event_id)
              if (st == null) {
                st = VersionState(1L, e)
              } else if (later) {
                out += mkRow(uid, st.open, e.ts.getTime, st.version)
                st = VersionState(st.version + 1, e)
              } // else: late/out-of-order vs the open version — drop
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.open.ts.getTime + retentionMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  case class PrivacyState(published: Seq[String], priv: Boolean)
  case class PrivacyAction(user_id: Long, kind: String, id: String)

  /** Streaming privacy-deletion propagation — batch
    * [[graft.operators.Screening.p3PrivacyDelete]] run continuously
    * (bz_etl.py:179-209): while an entity is public its emitted
    * version ids accumulate in state; the moment an 'error' event
    * flips it private, one DELETE action per published id is emitted
    * (the index must forget it) and the published set clears; when it
    * goes public again a REFRESH action asks for re-extraction.
    * Events arriving while private publish nothing — screening
    * upstream drops them — so there is nothing to delete later.
    * State is the published-id list, bounded by versions emitted
    * since the last privacy flip; a production deployment would
    * evict long-idle entities via timeout and re-derive the published
    * set from the index on revival (the same index-is-truth contract
    * as EsIndexManager). */
  def privacyDeletes(events: Dataset[EvFull]): Dataset[PrivacyAction] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PrivacyState, PrivacyAction](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EvFull],
            state: GroupState[PrivacyState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(PrivacyState(Nil, priv = false))
          val out = Seq.newBuilder[PrivacyAction]
          sorted.foreach { e =>
            if (e.event_type == "error") {
              if (!st.priv) {
                st.published.foreach(id =>
                  out += PrivacyAction(uid, "delete", id))
                st = PrivacyState(Nil, priv = true)
              }
            } else {
              if (st.priv) {
                out += PrivacyAction(uid, "refresh", uid.toString)
                st = st.copy(priv = false)
              }
              st = st.copy(published =
                st.published :+ s"${uid}_${e.ts.getTime}")
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionState(lastMs: Long, sessionNo: Long)
  case class SessionOut(user_id: Long, event_id: Long, ts_ms: Long,
      session_no: Long)

  /** Stateful gap sessionization: a new session when >30 min idle.
    * State per user is two longs, and EventTimeTimeout evicts it once
    * the watermark passes `lastMs + gapMs` — at that point any
    * non-late future event would open a new session anyway, so
    * eviction never merges or splits a session. (Per-user session
    * NUMBERING restarts after eviction; sessions are identified by
    * (user_id, first event) downstream, not by the counter, when
    * running unbounded.) */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000)
      (implicit enc1: org.apache.spark.sql.Encoder[SessionOut])
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // within a micro-batch rows may arrive unordered; sort locally
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            val out = sorted.map { e =>
              val ms = e.ts.getTime
              val newSession = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
              st = SessionState(ms, if (newSession) st.sessionNo + 1 else st.sessionNo)
              SessionOut(userId, e.event_id, ms, st.sessionNo)
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.lastMs + gapMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
