package graft

import graft.dedup.Dedup
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous curation chain (now the FULL r6-extended x1 stage
  * list: quality → exact → near-dup → semantic → containment →
  * split): wave-folded output must match an INDEPENDENT driver
  * implementation of the same incremental contract (scala md5 +
  * union-find + first-arrival store fold — only the pair RELATIONS
  * (minhash sketch, sign-band cosine, containment gram sets) are
  * shared with the engine, as in the d9 specs; for the latter two the
  * expectation leans on their proven subset/dict-independence
  * properties: banding is per-vector, so pairs on a subset = full
  * pairs restricted; containment pairs are dictionary-independent, so
  * the one-shot pair set on the union is the streamed pair universe).
  * The per-batch report must balance, and a replayed batch must
  * change nothing. */
class StreamingCurationSpec extends AnyFunSuite {
  import SparkTest._

  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text", "n_chars")
  private def embs = Tables.embeddings(spark, sf)
  private def wave(i: Int) = docs.filter(col("doc_id") % 3 === i)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(id: Long): String = {
    val b = (id % 2147483648L) * 2654435761L % 4294967296L % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("waves ≡ independent fold; report balances; replay idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_scur").toString
    (0 to 2).foreach(i =>
      streaming.StreamingCuration.processBatch(wave(i), i, root, embs))
    def readCurated() = spark.read.parquet(s"$root/curated/batch_*")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = readCurated()

    // ---- independent incremental fold ----
    var seenHashes = Set.empty[String]
    var store: Option[org.apache.spark.sql.DataFrame] = None // minhash
    var semStoreIds = Set.empty[Long]  // semantic-stage inputs so far
    var contDocs = Seq.empty[(Long, String, String)] // containment inputs
    val expected = scala.collection.mutable.Set.empty[(Long, String)]
    // generic union-find over a pair list; returns the canonical
    // (minimum-id) survivors among `ids`
    def canonicals(ids: Seq[Long], pairs: Seq[(Long, Long)]): Set[Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val compMin = ids.groupBy(find).map {
        case (_, g) => (find(g.head), g.min)
      }
      ids.filter(id => compMin(find(id)) == id).toSet
    }
    for (i <- 0 to 2) {
      val rows = wave(i).collect().map(r => (r.getLong(0),
        r.getString(1), r.getString(2), r.getAs[Number](3).longValue()))
      val qual = rows.filter(t =>
        t._1 % 97 != 0 && t._3 != null && t._4 >= 100)
      val exact = qual.groupBy(t => md5hex(t._3)).toSeq
        .collect { case (h, g) if !seenHashes.contains(h) => g.minBy(_._1) }
        .sortBy(_._1)
      val exactDf = exact.map(t => (t._1, t._3)).toDF("doc_id", "text")
      // near-dup: intra-batch components via the engine pair relation,
      // canonical = component min; store matches drop
      val mhPairs = Dedup.minhashPairs(exactDf).select("id1", "id2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val mhCanon = canonicals(exact.map(_._1), mhPairs)
      val storeMatched = store.fold(Set.empty[Long])(sd =>
        Dedup.incrementalEdges(Dedup.mhBands(exactDf), Dedup.mhBands(sd))
          .select("src").collect().map(_.getLong(0)).toSet)
      val keptIds = exact.map(_._1)
        .filter(id => mhCanon(id) && !storeMatched(id))
      // semantic: verified cosine pairs on (batch kept ∪ sem store)
      // vectors — per-vector banding makes this the streamed pair
      // universe; cross-matched batch docs drop, intra components
      // keep their minimum
      val semUniverse = semStoreIds ++ keptIds
      val semPairs = Dedup.embeddingPairsFrame(
          embs.filter(col("vec_id").isin(semUniverse.toSeq: _*)))
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val batchSet = keptIds.toSet
      val crossMatched = semPairs.collect {
        case (a, b) if batchSet(a) && semStoreIds(b) => a
        case (a, b) if batchSet(b) && semStoreIds(a) => b
      }.toSet
      val intraSem = semPairs.filter(p => batchSet(p._1) && batchSet(p._2))
      val semCanon = canonicals(keptIds, intraSem)
      val semIds = keptIds.filter(id => semCanon(id) && !crossMatched(id))
      // containment: one-shot gram-3 pairs on (containment inputs so
      // far ∪ this batch's sem survivors); the CONTAINED side (smaller
      // set, ties by larger id) drops IF it is a current-batch doc
      val batchSem = rows.filter(t => semIds.contains(t._1))
        .map(t => (t._1, t._2, t._3))
      val contUnion = (contDocs ++ batchSem)
        .toDF("doc_id", "source", "text")
      val semIdSet = semIds.toSet
      val containedBatch = Dedup.containmentPairs(contUnion, 0.8, 3)
        .select("id1", "id2", "n1", "n2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .collect { case (id1, id2, n1, n2)
            if semIdSet(id1) || semIdSet(id2) =>
          if (n1 < n2 || (n1 == n2 && id1 > id2)) id1 else id2
        }
        .filter(semIdSet).toSet
      val contIds = semIds.filterNot(containedBatch)
      expected ++= contIds.map(id => (id, splitOf(id)))
      // fold the stores forward (each accumulates its STAGE INPUT)
      seenHashes ++= qual.map(t => md5hex(t._3))
      store = Some(store.fold(exactDf)(_ unionAll exactDf))
      semStoreIds ++= keptIds
      contDocs ++= batchSem
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
      assert(stage(b, "near_dup") >= stage(b, "semantic"))
      assert(stage(b, "semantic") >= stage(b, "containment"))
      assert(stage(b, "split_train") + stage(b, "split_val") +
        stage(b, "split_test") == stage(b, "containment"))
    }
    assert((1L to 2L).exists(b =>
      stage(b, "near_dup") < stage(b, "exact_dedup")),
      "no cross-wave or intra-batch near-dup drop — fixture too weak")
    assert((0L to 2L).exists(b =>
      stage(b, "semantic") < stage(b, "near_dup")),
      "no semantic drop in any wave — fixture too weak")
    // the corpus TRUTH is zero gram-3 containment drops (batch x1 at
    // sf0.01 reports semantic == containment), so the equality above
    // already pins this stage on corpus data; the drop path itself is
    // exercised deterministically by the synthetic-fixture test below

    // ---- at-least-once replay of the last batch ----
    streaming.StreamingCuration.processBatch(wave(2), 2, root, embs)
    assert(readCurated() == streamed, "replay changed the curated set")
  }

  test("containment stage: contained batch doc drops, store doc is " +
      "never retro-dropped, intra-batch keeps the container") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_scurc").toString
    // 12-char tokens keep every doc past the n_chars >= 100 gate while
    // keeping token-set Jaccard far below the minhash band threshold
    // (shared run of 10 tokens inside a 40-token container): the pair
    // must reach the CONTAINMENT stage, not collapse at near-dup
    def words(p: String, n: Int) =
      (1 to n).map(i => f"${p}aaaaaa$i%04d").mkString(" ")
    val wA = words("w", 10); val xA = words("x", 10)
    val docA = wA + " " + words("u", 30)            // container (stored)
    val docB = words("b", 30)                        // unrelated
    val docC = wA                                    // ⊂ A, arrives later
    val docD = xA + " " + words("v", 30)             // intra container
    val docE = xA                                    // ⊂ D, same batch
    // ⊃ A, arrives later; 60 extra tokens keep Jaccard(A, F) at 0.4 so
    // F passes the minhash store (only the containment relation sees it)
    val docF = docA + " " + words("z", 60)
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .select(col("doc_id"), lit("s1").as("source"), col("text"),
        length(col("text")).cast("long").as("n_chars"))
    val noEmb = embs.limit(0)
    streaming.StreamingCuration.processBatch(
      df(1L -> docA, 2L -> docB), 0, root, noEmb)
    streaming.StreamingCuration.processBatch(
      df(4L -> docC, 5L -> docD, 7L -> docE, 8L -> docF), 1, root, noEmb)
    def curated(b: Int) = spark.read
      .parquet(s"$root/curated/batch_$b").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(curated(0) == Set(1L, 2L))
    // C (⊂ stored A) and E (⊂ same-batch D) drop; D keeps as the
    // container; F survives even though stored A ⊂ F — the contained
    // side is the already-published store doc, which never retro-drops
    assert(curated(1) == Set(5L, 8L))
  }
}
