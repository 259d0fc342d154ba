package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Unified-diff replay for DIFF_FIELDS (the reference stores
  * `cf_user_story` history as diffs and reconstructs text by applying
  * them forwards/backwards while walking versions — reference:
  * bugzilla_etl/parse_bug_history.py:1102 ApplyDiff,
  * transform_bugzilla.py:25 DIFF_FIELDS).
  *
  * Clean-room implementation of the standard unified format:
  * hunks `@@ -s,n +s2,n2 @@` with ' ' context, '-' delete, '+' insert.
  * `reverse = true` applies the inverse patch (new → old), which is
  * what backwards history walking needs.
  */
object DiffUtils {

  private val HunkHeader = """@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@.*""".r

  /** Apply `diff` to `text` (both newline-joined). Malformed hunks
    * throw IllegalArgumentException — callers mirror the reference's
    * tolerance by catching and keeping the prior text.
    *
    * Representation caveat: the newline-joined string "" is read as
    * ZERO lines, so a document whose only content is a single empty
    * line collapses to the empty document (exactly as in the
    * reference, which also round-trips line lists through joined
    * text). [[applyDiffLines]] on line vectors has no such ambiguity
    * and round-trips exactly. */
  def applyDiff(text: String, diff: String, reverse: Boolean = false): String =
    applyDiffLines(
      if (text.isEmpty) Vector.empty else text.split("\n", -1).toVector,
      diff.split("\n", -1).toVector, reverse).mkString("\n")

  def applyDiffLines(text: Vector[String], diff: Vector[String],
      reverse: Boolean): Vector[String] = {
    val out = ArrayBuffer[String]()
    var src = 0 // cursor into text (0-based)
    var i = 0
    while (i < diff.length) {
      diff(i) match {
        case HunkHeader(os, _, ns, _) =>
          val start = (if (reverse) ns else os).toInt
          // copy untouched lines before the hunk (1-based header)
          val upTo = math.max(start - 1, 0)
          while (src < upTo && src < text.length) {
            out += text(src); src += 1
          }
          i += 1
          var done = false
          while (i < diff.length && !done) {
            val line = diff(i)
            val op = if (line.isEmpty) ' ' else line.charAt(0)
            val eff = if (reverse) (op match {
              case '+' => '-'
              case '-' => '+'
              case c => c
            }) else op
            op match {
              case '@' => done = true // next hunk
              case _ =>
                eff match {
                  case ' ' =>
                    require(src < text.length, s"context past end at $src")
                    out += text(src); src += 1
                  case '-' =>
                    require(src < text.length, s"delete past end at $src")
                    src += 1 // dropped
                  case '+' =>
                    out += line.drop(1)
                  case _ =>
                    throw new IllegalArgumentException(s"bad diff line: $line")
                }
                i += 1
            }
          }
        case "" => i += 1 // tolerate blank separator lines
        case other =>
          throw new IllegalArgumentException(s"bad hunk header: $other")
      }
    }
    while (src < text.length) { out += text(src); src += 1 }
    out.toVector
  }
}
