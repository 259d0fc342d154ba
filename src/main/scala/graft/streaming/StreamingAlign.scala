package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CONTINUOUS temporal align — batch
  * [[graft.operators.AsOf.temporalAlign]] (h16) as a stream: the two
  * SCD-2 sides arrive as one stream of BOUNDARY events (side "l" or
  * "r" opens a new state value at ts; value None closes the side's
  * coverage — a gap), and every event that advances an entity's
  * boundary spine CLOSES the previous combined segment, emitting it
  * with both sides' states live over [lastBoundary, ts). Equal-ts
  * events collapse into one spine boundary (sorted within the batch
  * by (ts, side, seq)), exactly like the batch spine's distinct
  * union. State per entity is two Option[String]s and a long —
  * bounded by live entities, the versionHistory shape; the one open
  * segment lives in state until EventTimeTimeout flushes it with the
  * open-ended MaxTimestamp sentinel, as the batch operator marks it.
  * Late events (ts behind the open boundary) would rewrite closed
  * segments; the watermark bounds them and they are dropped
  * (EtlRunner's rebuild path is the batch answer, as versionHistory).
  *
  * Spec: streamed CLOSED segments ≡ batch h16 segments with finite
  * expires_on, on the real corpus SCDs and on a gapped fixture.
  *
  * SCALE NOTE (r15): the per-batch group buffer here is
  * entity-keyed — the trio's whale shape, one tier milder (the input
  * is SCD-2 BOUNDARY events, versions not raw activity, so a whale's
  * per-batch volume is its version churn). The FOLDED form exists:
  * [[EventStreamFold.alignFoldBatch]] / [[EventStreamFold.alignStep]]
  * run each micro-batch through distributed window algebra with the
  * open boundary as two seed rows and the delta state store —
  * spec-pinned ≡ this stateful form's closed segments. This form
  * remains the low-latency small-entity path.
  */
object StreamingAlign {

  case class AlignEvent(id: Long, ts: java.sql.Timestamp, side: String,
      value: Option[String], seq: Long)
  case class AlignState(lastTs: Long, l: Option[String], r: Option[String])
  case class AlignSegment(id: Long, valid_from: Long, expires_on: Long,
      status: Option[String], grp: Option[String])

  def align(events: Dataset[AlignEvent],
      retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[AlignSegment] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.id)
      .flatMapGroupsWithState[AlignState, AlignSegment](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id: Long, rows: Iterator[AlignEvent],
            state: GroupState[AlignState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(AlignSegment(id, st.lastTs,
              graft.operators.History.MaxTimestamp, st.l, st.r))
          } else {
            val sorted = rows.toSeq
              .sortBy(e => (e.ts.getTime, e.side, e.seq))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[AlignSegment]
            sorted.foreach { e =>
              val ts = e.ts.getTime
              def applied(s: AlignState) =
                if (e.side == "l") s.copy(l = e.value)
                else s.copy(r = e.value)
              if (st == null) st = applied(AlignState(ts, None, None))
              else if (ts > st.lastTs) {
                out += AlignSegment(id, st.lastTs, ts, st.l, st.r)
                st = applied(st.copy(lastTs = ts))
              } else if (ts == st.lastTs) st = applied(st)
              // else: late vs the open boundary — drop
            }
            state.update(st)
            state.setTimeoutTimestamp(math.max(st.lastTs + retentionMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
