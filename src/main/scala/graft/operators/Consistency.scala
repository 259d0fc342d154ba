package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Activity-log consistency report — the reference's PROBLEM notes as
  * a first-class dataset instead of log lines.
  *
  * While rebuilding history the reference detects and logs (but
  * tolerates) inconsistencies in the activity log:
  *
  *  - a multi-value item added when it is provably already present, or
  *    removed when absent (parse_bug_history.py:827 addValues conflict,
  *    :947-966 removeValues "Unable to find value"), with tolerances:
  *    `cc` conflicts are expected in both directions (alias churn —
  *    both notes gate on DEBUG_CC_CHANGES, off by default),
  *    `blocked`/`dependson` remove-misses happen because private
  *    bugs are invisible (:957), and keyword values already catalogued
  *    as KNOWN_MISSING_KEYWORDS (:81, grown at :966) are suppressed.
  *    (The reference literally tests `field_name not in
  *    KNOWN_MISSING_KEYWORDS` — a field-vs-value slip; the set's
  *    contents and the :966 update make the intent unambiguous: it is
  *    the known-missing keyword VALUES that are tolerated.)
  *  - a single-value field whose activity chain does not line up: the
  *    earlier activity's new_value must equal the later activity's
  *    old_value (:418-447), tolerating KNOWN_INCONSISTENT_FIELDS (:85,
  *    timezone/signature churn) and the FIELDS_CHANGED map (:89,
  *    values Bugzilla rewrote without logging history — observed old
  *    value → allowed successor states).
  *
  * The imperative backwards walk becomes two lag windows on the same
  * per-entity clustering the history build already shuffles by — at
  * 100 TB this report is a free rider on the history build's exchange,
  * all map-side after it.
  */
object Consistency {

  /** parse_bug_history.py:81 — keyword values known to be missing from
    * truncated logs; their add/remove conflicts are expected noise. */
  val KnownMissingKeywords: Seq[String] = Seq(
    "dogfood", "beta1", "nsbeta1", "nsbeta2", "nsbeta3", "patch",
    "mozilla1.0", "correctness", "mozilla0.9", "mozilla0.9.9+",
    "nscatfood", "mozilla0.9.3", "fcc508", "nsbeta1+", "mostfreq")

  /** parse_bug_history.py:85 — fields whose values drift without
    * matching history (database timezone changes, crash signatures). */
  val KnownInconsistentFields: Seq[String] =
    Seq("cf_last_resolved", "cf_crash_signature")

  /** parse_bug_history.py:94 EMAIL_FIELDS. Chain mismatches on these
    * are NEVER reported: every branch of the :422-431 check passes —
    * pre-1999-05-27 the qa_contact field held a NUMBER not the email
    * (is_integer + modified_ts <= 927814152000), empties pass, and the
    * remainder is presumed alias churn the analyzer must not guess at
    * ("WE CAN NOT ASSUME WE FOUND AN ALIAS WITH JUST A SINGLE
    * MISMATCH" — the add_alias call is commented out). */
  val EmailFields: Seq[String] = Seq(
    "cc", "assigned_to", "modified_by", "created_by", "qa_contact",
    "bug_mentor")

  /** parse_bug_history.py:89 FIELDS_CHANGED — field → (logged value →
    * allowed successor states Bugzilla rewrote to without history). */
  val FieldsChanged: Map[String, Map[String, Seq[String]]] =
    Map("cf_blocking_b2g" -> Map("1.5" -> Seq("2.0")))

  /** Multi-value conflicts. `ops`: (id, ts_ms, event_id, field,
    * op ∈ add|remove, item). Per (id, field, item) in time order, two
    * consecutive ops in the same direction are the contradiction the
    * reference logs: add-after-add = "adding a value that is already
    * there"; remove-after-remove = "removing a value that is absent".
    * A first op needs no problem row either way — a leading remove is
    * the reference's pre-history presence (an interval b1 already
    * models), a leading add is a plain insert. */
  def multiValueProblems(ops: DataFrame): DataFrame = {
    val w = Window.partitionBy("id", "field", "item")
      .orderBy("ts_ms", "event_id")
    ops
      .withColumn("prev_op", lag("op", 1).over(w))
      .withColumn("kind",
        when(col("op") === "add" && col("prev_op") === "add",
          lit("redundant_add"))
          .when(col("op") === "remove" && col("prev_op") === "remove",
            lit("remove_absent")))
      .filter(col("kind").isNotNull)
      // cc is suppressed in BOTH directions: the :827 add-conflict is
      // gated on `field_name != 'cc'` and the cc remove-miss note
      // (:863-885) only fires under DEBUG_CC_CHANGES, off by default
      .filter(col("field") =!= "cc")
      .filter(!(col("kind") === "remove_absent" &&
        col("field").isin("blocked", "dependson")))
      .filter(!(col("field") === "keywords" &&
        col("item").isin(KnownMissingKeywords: _*)))
      .select(col("id"), col("ts_ms"), col("event_id"), col("field"),
        col("kind"), col("item").as("detail"))
  }

  /** Single-value chain mismatches. `chg`: (id, ts_ms, event_id,
    * field, old_value, new_value). The later activity's old_value must
    * equal the earlier activity's new_value; a mismatch is reported at
    * the later activity unless the field is known-inconsistent or the
    * FIELDS_CHANGED map allows the rewrite. */
  def singleValueProblems(chg: DataFrame): DataFrame = {
    val w = Window.partitionBy("id", "field").orderBy("ts_ms", "event_id")
    val tolerated: Column = FieldsChanged.foldLeft(lit(false)) {
      case (acc, (f, m)) => m.foldLeft(acc) { case (a, (from, tos)) =>
        a || (col("field") === f && col("prev_new") === from &&
          col("old_value").isin(tos: _*))
      }
    }
    chg
      .withColumn("prev_new", lag("new_value", 1).over(w))
      .filter(col("prev_new").isNotNull &&
        col("prev_new") =!= col("old_value"))
      .filter(!col("field").isin(KnownInconsistentFields: _*))
      .filter(!col("field").isin(EmailFields: _*))
      .filter(!tolerated)
      .select(col("id"), col("ts_ms"), col("event_id"), col("field"),
        lit("inconsistent_change").as("kind"),
        concat(col("prev_new"), lit(" != "), col("old_value")).as("detail"))
  }

  /** B4: the consistency report driven from events. Even event_ids
    * synthesize multi-value add/remove ops across the four truncated
    * fields (items recur per (user, field), so same-direction runs —
    * the conflicts — occur naturally; two items are known-missing
    * keywords to exercise that suppression). Odd event_ids synthesize
    * single-value chains that are consistent by construction
    * (old = lag(new)) except every 7th event, whose old_value is
    * perturbed — to the FIELDS_CHANGED-allowed successor for half the
    * cf_blocking_b2g rows, to a flat contradiction otherwise. The
    * qa_contact chain carries emails whose perturbation is the
    * pre-1999 INTEGER profile-id form — real mismatches that must be
    * swallowed by the EMAIL_FIELDS tolerance. */
  def b4ConsistencyReport(s: SparkSession, d: String): DataFrame = {
    val (ops, chg) = shapedActivity(s, d)
    multiValueProblems(ops).unionByName(singleValueProblems(chg))
      .orderBy("event_id")
  }

  /** The synthesized (ops, chg) activity frames b4 runs on — exposed
    * so the streaming monitor spec can replay the SAME activity and
    * compare against the batch report. */
  private[graft] def shapedActivity(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType
      .fromDDL("k INT")).getField("k").cast("long")
    val ev = Tables.events(s, d).select(
      col("user_id").as("id"), unix_millis(col("ts")).as("ts_ms"),
      col("event_id"), k.as("k"))

    val ops = ev.filter(col("event_id") % 2 === 0).select(
      col("id"), col("ts_ms"), col("event_id"),
      element_at(array(lit("cc"), lit("keywords"), lit("blocked"),
        lit("dependson")), (col("k") % 4 + 1).cast("int")).as("field"),
      when((col("k") + col("event_id")) % 3 === 0, lit("remove"))
        .otherwise(lit("add")).as("op"),
      element_at(array(lit("dogfood"), lit("beta1"), lit("i2"), lit("i3"),
        lit("i4"), lit("i5")), (col("k") % 6 + 1).cast("int")).as("item"))

    val wSv = Window.partitionBy("id", "field").orderBy("ts_ms", "event_id")
    val newVal = when(col("field") === "cf_blocking_b2g",
        element_at(array(lit("1.5"), lit("2.0")), (col("k") % 2 + 1).cast("int")))
      .when(col("field") === "cf_last_resolved",
        concat(lit("r"), col("k") % 3))
      .when(col("field") === "qa_contact",
        concat(lit("u"), col("k") % 20, lit("@x.com")))
      .otherwise(concat(lit("v"), col("k") % 4))
    val perturbed = when(col("field") === "cf_blocking_b2g",
        element_at(array(lit("2.0"), lit("9.9")), (col("k") % 2 + 1).cast("int")))
      .when(col("field") === "cf_last_resolved", lit("r9"))
      // the pre-1999 numeric qa_contact form: a bare profile id
      .when(col("field") === "qa_contact", (col("k") % 20).cast("string"))
      .otherwise(lit("v9"))
    val chg = ev.filter(col("event_id") % 2 === 1).select(
        col("id"), col("ts_ms"), col("event_id"), col("k"),
        element_at(array(lit("status"), lit("cf_blocking_b2g"),
          lit("cf_last_resolved"), lit("qa_contact")),
          (col("k") % 4 + 1).cast("int")).as("field"))
      .withColumn("new_value", newVal)
      .withColumn("old_value",
        when(col("event_id") % 7 === 0, perturbed)
          .otherwise(coalesce(lag("new_value", 1).over(wSv),
            col("new_value"))))
      .drop("k")

    (ops, chg)
  }
}
