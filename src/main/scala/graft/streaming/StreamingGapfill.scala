package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CONTINUOUS gap-fill — batch
  * [[graft.operators.History.h17Gapfill]] as a stream: each entity's
  * irregular observations resample onto the regular hourly spine AS
  * THEY ARRIVE. A tick is emittable the moment an observation at or
  * past it arrives (the fill — latest observation ≤ tick — is then
  * known forever: later observations are strictly later), so every
  * arriving observation EAGERLY closes all ticks up to and including
  * itself: ticks in [nextTick, ts) fill from the held last
  * observation, an hour-aligned ts fills its own tick with staleness
  * 0, and the leading ticks before an entity's first observation
  * emit null (the batch operator's leading gap). State per entity is
  * three longs — next unemitted tick, last observation — the
  * versionHistory shape, evicted by EventTimeTimeout with NOTHING to
  * flush (every emittable tick already went out; the batch spine
  * ends at the last observation, so there is no open-ended tail).
  *
  * Ordering contract (the StreamingAlign rule): same-instant
  * duplicates collapse intra-batch to the max event_id exactly like
  * batch h17's max_by; an observation arriving at or behind the held
  * last observation is LATE — its ticks are already closed — and
  * drops, EVEN when it is still inside the watermark. That is the
  * price of eager tick close (Append mode cannot retract an emitted
  * tick), so stream ≡ batch holds exactly when same-instant
  * duplicates co-arrive in one micro-batch; duplicates that straddle
  * batches keep the FIRST arrival's value where batch h17 keeps the
  * max event_id — a documented divergence, pinned by spec. Holding
  * rows open until the watermark passes them would restore the batch
  * answer at the cost of a watermark's worth of output latency on
  * every tick; this operator deliberately chooses eagerness.
  *
  * Spec: streamed ticks ≡ batch h17 rows — exactly, no exclusions —
  * on the corpus events across three chronological waves, and on a
  * fixture pinning leading gap / aligned observation / multi-hour
  * gap fills.
  *
  * SCALE NOTE (r15): the per-batch group buffer is entity-keyed —
  * the trio's whale shape — AND the per-group output is the gap
  * spine itself (span-hours of ticks), so a whale's batch cost is
  * output-bound on top of the buffer. The folded escape is the
  * [[EventStreamFold]] template over the batch h17 machinery
  * (sequence()-exploded spine + the native as-of fill, both already
  * distributed); state input would shrink to each entity's
  * (nextTick, last observation) boundary. Not yet folded — at the
  * whale probes the one-batch cost tracked the output (the spine),
  * not the buffer. */
object StreamingGapfill {

  case class Obs(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)
  /** lastObsMs == Long.MinValue ⇒ no observation held yet. */
  case class GapState(nextTick: Long, lastObsMs: Long, lastObsVal: Double)
  case class GapTick(user_id: Long, tick_ms: Long,
      value_ff: Option[Double], staleness_ms: Option[Long])

  private val HourMs = 3600000L

  private def round2(v: Double): Double =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  def gapfill(events: Dataset[Obs],
      retentionMs: Long = 30L * 24 * 3600 * 1000): Dataset[GapTick] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, GapTick](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Obs], state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            // every emittable tick was closed eagerly — plain eviction
            state.remove()
            Iterator.empty
          } else {
            // batch h17 collapses same-instant observations via
            // max_by(event_id); intra-batch duplicates collapse here,
            // a cross-batch same-instant replay is late and drops
            val sorted = rows.toSeq.groupBy(_.ts.getTime).toSeq
              .sortBy(_._1)
              .map { case (t, es) => (t, es.maxBy(_.event_id).value) }
            var st = state.getOption.orNull
            val out = Seq.newBuilder[GapTick]
            sorted.foreach { case (ts, v) =>
              if (st == null)
                st = GapState(ts - ts % HourMs, Long.MinValue, 0.0)
              if (ts > st.lastObsMs) {
                var nt = st.nextTick
                while (nt < ts) {
                  out += (if (st.lastObsMs == Long.MinValue)
                    GapTick(uid, nt, None, None)
                  else GapTick(uid, nt, Some(st.lastObsVal),
                    Some(nt - st.lastObsMs)))
                  nt += HourMs
                }
                val vr = round2(v)
                if (nt == ts) {
                  out += GapTick(uid, nt, Some(vr), Some(0L))
                  nt += HourMs
                }
                st = GapState(nt, ts, vr)
              } // else: late vs the held observation — drop
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.lastObsMs + retentionMs,
                state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}
