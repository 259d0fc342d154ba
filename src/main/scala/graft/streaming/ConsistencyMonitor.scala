package graft.streaming

import graft.operators.Consistency
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The STREAMING form of the b4 consistency report
  * ([[graft.operators.Consistency]]): the reference detects PROBLEM
  * rows while its ETL walks each bug's activity log — the production
  * analogue is a continuous monitor that emits them as activity
  * arrives, instead of waiting for the next full history rebuild.
  *
  * Both detectors are lag-window logic, so the state per key is ONE
  * tiny record — the previous op (multi-value) or the previous
  * new_value (single-value chain); every tolerance the batch report
  * applies (cc both directions, blocked/dependson remove-misses,
  * KNOWN_MISSING_KEYWORDS, KNOWN_INCONSISTENT_FIELDS, EMAIL_FIELDS,
  * FIELDS_CHANGED) is applied identically at emit time. Within a
  * micro-batch rows sort locally by (ts, event_id), the same
  * discipline as [[EventStream.sessionize]]; across batches arrival
  * must respect per-key event-time order (the log is append-only in
  * the reference's bugs_activity, so it does). The spec proves stream
  * rows ≡ the batch b4 report on the same replayed activity.
  *
  * SCALE NOTE (r15, the EventStreamFold question asked of every
  * stateful op): the per-batch `rows.toSeq.sortBy` buffers one
  * GROUP, and the groups here are (id, field, item) / (id, field) —
  * finer than the entity. A whale entity's batch spreads across its
  * items and fields, so per-task memory is bounded by per-item (resp.
  * per-field) churn — the same argument that keeps b1's multi-value
  * windows unfolded by design. A single (entity, field) hot key that
  * still dominates a batch would take the [[EventStreamFold]]
  * treatment (per-batch lag-window fold, (id, field)-keyed); the
  * whale probes exercise this monitor one-batch at 100× without a
  * wall (§4a round-13/14).
  */
object ConsistencyMonitor {

  case class MvOp(id: Long, ts: java.sql.Timestamp, event_id: Long,
      field: String, op: String, item: String)
  case class SvChg(id: Long, ts: java.sql.Timestamp, event_id: Long,
      field: String, old_value: String, new_value: String)
  case class Problem(id: Long, ts_ms: Long, event_id: Long,
      field: String, kind: String, detail: String)
  case class LastStr(v: String)

  /** Multi-value add/remove conflicts, continuously. */
  def multiValueProblems(ops: Dataset[MvOp]): Dataset[Problem] = {
    import ops.sparkSession.implicits._
    ops.withWatermark("ts", "1 hour")
      .groupByKey(o => (o.id, o.field, o.item))
      .flatMapGroupsWithState[LastStr, Problem](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String, String), rows: Iterator[MvOp],
            state: GroupState[LastStr]) =>
          val (id, field, item) = key
          val sorted = rows.toSeq.sortBy(o => (o.ts.getTime, o.event_id))
          var prev = state.getOption.map(_.v)
          val out = Seq.newBuilder[Problem]
          sorted.foreach { o =>
            val kind =
              if (prev.contains("add") && o.op == "add") Some("redundant_add")
              else if (prev.contains("remove") && o.op == "remove")
                Some("remove_absent")
              else None
            val tolerated = field == "cc" ||
              (kind.contains("remove_absent") &&
                (field == "blocked" || field == "dependson")) ||
              (field == "keywords" &&
                Consistency.KnownMissingKeywords.contains(item))
            kind.filterNot(_ => tolerated).foreach(kd =>
              out += Problem(id, o.ts.getTime, o.event_id, field, kd, item))
            prev = Some(o.op)
          }
          prev.foreach(p => state.update(LastStr(p)))
          out.result().iterator
      }
  }

  /** Single-value chain mismatches, continuously. */
  def singleValueProblems(chg: Dataset[SvChg]): Dataset[Problem] = {
    import chg.sparkSession.implicits._
    chg.withWatermark("ts", "1 hour")
      .groupByKey(c => (c.id, c.field))
      .flatMapGroupsWithState[LastStr, Problem](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[SvChg],
            state: GroupState[LastStr]) =>
          val (id, field) = key
          val sorted = rows.toSeq.sortBy(c => (c.ts.getTime, c.event_id))
          var prevNew = state.getOption.map(_.v)
          val out = Seq.newBuilder[Problem]
          sorted.foreach { c =>
            val mismatch = prevNew.exists(_ != c.old_value)
            val tolerated =
              Consistency.KnownInconsistentFields.contains(field) ||
              Consistency.EmailFields.contains(field) ||
              Consistency.FieldsChanged.get(field).exists(m =>
                prevNew.exists(pn =>
                  m.get(pn).exists(_.contains(c.old_value))))
            if (mismatch && !tolerated)
              out += Problem(id, c.ts.getTime, c.event_id, field,
                "inconsistent_change", s"${prevNew.get} != ${c.old_value}")
            prevNew = Some(c.new_value)
          }
          prevNew.foreach(p => state.update(LastStr(p)))
          out.result().iterator
      }
  }
}
