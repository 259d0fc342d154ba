package graft

import graft.dedup.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** D15 exact-substring dedup (ExactSubstr, Lee et al. 2021): stride-1
  * window hashing + keep-first removal must equal a brute-force
  * reference on the real corpus, and the fixture cases pin the
  * semantics the window algebra is supposed to deliver — alignment
  * independence, the 16-token threshold, within-doc repeats, and
  * whole-document collapse for exact duplicates. */
class SubstrDedupSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private val W = 16

  /** Independent driver-side reference: hash every stride-1 window of
    * every doc, find hashes with >= 2 occurrences, drop every covered
    * token except those of the lexicographically-first occurrence. */
  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val occs = scala.collection.mutable.Map[String, List[(Long, Int)]]()
    for ((id, ts) <- toks; st <- 0 to ts.length - W) {
      val key = ts.slice(st, st + W).mkString(" ")
      occs(key) = (id, st) :: occs.getOrElse(key, Nil)
    }
    val flagged = scala.collection.mutable.Set[(Long, Int)]()
    for ((_, os) <- occs if os.length >= 2) {
      val keeper = os.minBy { case (id, st) => (id, st) }
      os.filterNot(_ == keeper).foreach(flagged += _)
    }
    toks.map { case (id, ts) =>
      val covered = ts.indices.filter(p =>
        flagged.exists { case (fid, st) =>
          fid == id && p >= st && p < st + W })
      val kept = ts.indices.filterNot(covered.contains).map(ts)
      id -> ((ts.length.toLong, covered.length.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, String)] =
    Dedup.substrDedupFrame(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  private def uniq(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("shared 20-token run is removed from the later doc only, at any alignment") {
    val run20 = uniq("shared", 20)
    val d1 = (uniq("a", 5) ++ run20 ++ uniq("b", 4)).mkString(" ")
    val d2 = (uniq("c", 9) ++ run20 ++ uniq("e", 7)).mkString(" ")
    val out = run(Seq(1L -> d1, 2L -> d2))
    assert(out(1L)._2 == 0L, "first occurrence must be kept")
    assert(out(2L)._2 == 20L, "exactly the shared run must be removed")
    assert(out(2L)._3 == (uniq("c", 9) ++ uniq("e", 7)).mkString(" "))
  }

  test("15-token shared run is below the window threshold: untouched") {
    val run15 = uniq("shared", 15)
    val d1 = (uniq("a", 6) ++ run15 ++ uniq("b", 6)).mkString(" ")
    val d2 = (uniq("c", 6) ++ run15 ++ uniq("e", 6)).mkString(" ")
    val out = run(Seq(1L -> d1, 2L -> d2))
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
  }

  test("within-doc repeat: second occurrence of a 16-token phrase removed") {
    val p = uniq("phrase", 16)
    val d = (p ++ uniq("mid", 10) ++ p).mkString(" ")
    val out = run(Seq(1L -> d))
    assert(out(1L)._2 == 16L)
    assert(out(1L)._3 == (p ++ uniq("mid", 10)).mkString(" "))
  }

  test("exact duplicate docs: later copy fully removed, first intact") {
    val t = uniq("w", 24).mkString(" ")
    val out = run(Seq(1L -> t, 2L -> t))
    assert(out(1L)._2 == 0L)
    assert(out(2L)._2 == 24L && out(2L)._3 == "")
  }

  test("short duplicate docs (< 16 tokens) are below threshold: untouched") {
    val t = uniq("w", 10).mkString(" ")
    val out = run(Seq(1L -> t, 2L -> t))
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
  }

  test("corpus result equals the brute-force reference") {
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val expected = reference(docs)
    val got = run(docs)
    assert(got.size == expected.size)
    val removed = got.values.map(_._2).sum
    assert(removed > 0, "corpus has planted duplicates; some removal expected")
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)} expected $exp")
  }
}
