package graft

import graft.dedup.Dedup
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous curation chain: wave-folded output must match an
  * INDEPENDENT driver implementation of the same incremental contract
  * (scala md5 + union-find — only the minhash sketch itself is shared
  * with the engine, as in the d9 specs), the per-batch report must
  * balance, and a replayed batch must change nothing. */
class StreamingCurationSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text", "n_chars")
  private def wave(i: Int) = docs.filter(col("doc_id") % 3 === i)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long): String = {
    val b = (id * 2654435761L) % 4294967296L % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("waves ≡ independent fold; report balances; replay idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_scur").toString
    (0 to 2).foreach(i =>
      streaming.StreamingCuration.processBatch(wave(i), i, root))
    def readCurated() = spark.read.parquet(s"$root/curated/batch_*")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = readCurated()

    // ---- independent incremental fold ----
    var seenHashes = Set.empty[String]
    var store: Option[org.apache.spark.sql.DataFrame] = None
    val expected = scala.collection.mutable.Set.empty[(Long, String)]
    for (i <- 0 to 2) {
      val rows = wave(i).collect().map(r => (r.getLong(0),
        r.getString(2), r.getAs[Number](3).longValue()))
      val qual = rows.filter(t =>
        t._1 % 97 != 0 && t._2 != null && t._3 >= 100)
      val exact = qual.groupBy(t => md5hex(t._2)).toSeq
        .collect { case (h, g) if !seenHashes.contains(h) => g.minBy(_._1) }
        .sortBy(_._1)
      val exactDf = exact.map(t => (t._1, t._2)).toDF("doc_id", "text")
      // intra-batch components via scala union-find over the engine's
      // pair relation; canonical = component min
      val pairs = Dedup.minhashPairs(exactDf).select("id1", "id2")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val compMin = exact.map(_._1).groupBy(find).map {
        case (_, ids) => (find(ids.head), ids.min)
      }
      val canonical = exact.map(_._1)
        .filter(id => compMin(find(id)) == id).toSet
      val storeMatched = store.fold(Set.empty[Long])(sd =>
        Dedup.incrementalEdges(Dedup.mhBands(exactDf), Dedup.mhBands(sd))
          .select("src").collect().map(_.getLong(0)).toSet)
      expected ++= exact.map(_._1)
        .filter(id => canonical(id) && !storeMatched(id))
        .map(id => (id, splitOf(id)))
      seenHashes ++= qual.map(t => md5hex(t._2))
      store = Some(store.fold(exactDf)(_ unionAll exactDf))
    }
    assert(streamed == expected.toSet)
    assert(streamed.nonEmpty)

    // ---- the stores actually dropped something across waves ----
    val report = spark.read.parquet(s"$root/report/batch_*")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def stage(b: Long, s: String) =
      report.collectFirst { case (`b`, `s`, n) => n }.get
    for (b <- 0L to 2L) {
      assert(stage(b, "raw") >= stage(b, "quality"))
      assert(stage(b, "quality") >= stage(b, "exact_dedup"))
      assert(stage(b, "exact_dedup") >= stage(b, "near_dup"))
      assert(stage(b, "split_train") + stage(b, "split_val") +
        stage(b, "split_test") == stage(b, "near_dup"))
    }
    assert((1L to 2L).exists(b =>
      stage(b, "near_dup") < stage(b, "exact_dedup")),
      "no cross-wave or intra-batch near-dup drop — fixture too weak")

    // ---- at-least-once replay of the last batch ----
    streaming.StreamingCuration.processBatch(wave(2), 2, root)
    assert(readCurated() == streamed, "replay changed the curated set")
  }
}
