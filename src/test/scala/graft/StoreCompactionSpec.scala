package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Slice compaction (r14 verdict #4): `StoreFs.compactSlices` folds
  * the accumulated `batch_N` slice dirs — minus the newest, which a
  * restarted stream may replay — into one sized dir, row-identically
  * for every reader and without disturbing replay idempotence. */
class StoreCompactionSpec extends AnyFunSuite {
  import SparkTest._
  import streaming.{StoreFs, StreamingDedup}

  private def docs = Tables.documents(spark, sf)

  test("compacted band store ≡ accumulated slices row-for-row; the " +
      "newest slice survives; match output unchanged; replay of the " +
      "newest batch still idempotent") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val (storePath, matchRoot) = (s"$root/store", s"$root/matches")
    val waves = (0 to 3).map(i =>
      docs.filter(col("doc_id") % 4 === i).select("doc_id", "text"))
    waves.zipWithIndex.foreach { case (w, i) =>
      StreamingDedup.processBatch(w, i.toLong, storePath, matchRoot) }
    def storeRows() = spark.read.parquet(s"$storePath/batch_*")
      .collect().map(_.toSeq).toSet
    def dirs() = new java.io.File(storePath).listFiles()
      .map(_.getName).filter(_.startsWith("batch")).toSet
    def probeMatches() = {
      val probe = docs.filter(col("doc_id") % 10 === 1)
        .select("doc_id", "text")
      graft.dedup.Dedup.incrementalMatch(
          graft.dedup.Dedup.mhBands(probe),
          spark.read.parquet(StoreFs.priorBatchDirs(
            spark, storePath, Long.MaxValue): _*),
          probe.select("doc_id"))
        .filter(col("is_dup")).collect().map(_.toSeq).toSet
    }
    val before = storeRows()
    val matchesBefore = probeMatches()
    val folded = StreamingDedup.compactStore(spark, storePath)
    assert(folded == 2, s"expected 2 dirs folded away, got $folded")
    assert(dirs() == Set("batch_2", "batch_3"), dirs().mkString(","))
    assert(storeRows() == before, "compaction changed store rows")
    assert(probeMatches() == matchesBefore)
    assert(matchesBefore.nonEmpty, "fixture produced no matches")
    // at-least-once replay of the NEWEST batch (the only one a
    // restarted stream re-runs): still a pure slice overwrite
    StreamingDedup.processBatch(waves(3), 3L, storePath, matchRoot)
    assert(storeRows() == before, "replay after compaction diverged")
    // idempotent: re-compacting folds nothing further
    assert(StreamingDedup.compactStore(spark, storePath) == 0)
  }

  test("crash recovery: a committed merge (manifest present) resumes " +
      "to the same result; an uncommitted stage is discarded") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_crash").toString
    (0 to 3).foreach(i => Seq((i.toLong, s"v$i")).toDF("id", "v")
      .write.parquet(s"$root/batch_$i"))
    def rows() = spark.read.parquet(s"$root/batch_*")
      .collect().map(_.toSeq).toSet
    val before = rows()
    // simulate a crash AFTER the commit point (merged parquet +
    // manifest written) but BEFORE any source delete or the swap
    val stage = s"$root/.compact.build"
    spark.read.parquet(s"$root/batch_0", s"$root/batch_1", s"$root/batch_2")
      .coalesce(1).write.parquet(stage)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$stage/_sources"),
      "batch_0\nbatch_1\nbatch_2".getBytes("UTF-8"))
    assert(streaming.StoreFs.compactSlices(spark, root) == 2)
    val dirs = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("batch")).toSet
    assert(dirs == Set("batch_2", "batch_3"), dirs.mkString(","))
    assert(rows() == before, "recovery lost or duplicated rows")
    // an UNCOMMITTED stage (no manifest — the write died mid-flight)
    // is junk: discarded, and a fresh compaction proceeds over the
    // intact sources
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_compact_junk").toString
    (0 to 3).foreach(i => Seq((i.toLong, s"v$i")).toDF("id", "v")
      .write.parquet(s"$root2/batch_$i"))
    new java.io.File(s"$root2/.compact.build").mkdirs()
    val before2 = spark.read.parquet(s"$root2/batch_*")
      .collect().map(_.toSeq).toSet
    assert(streaming.StoreFs.compactSlices(spark, root2) == 2)
    assert(spark.read.parquet(s"$root2/batch_*")
      .collect().map(_.toSeq).toSet == before2)
  }

  test("compactSlices is a no-op below 3 slices and ignores non-slice " +
      "dirs") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_noop").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/batch_0")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$root/batch_1")
    assert(StoreFs.compactSlices(spark, root) == 0)
    // a crash-left swap remnant and staging dir must not parse as
    // slices (priorBatchDirs pins the exact batch_<digits> shape)
    new java.io.File(s"$root/batch_5.old").mkdirs()
    new java.io.File(s"$root/.compact.build").mkdirs()
    assert(StoreFs.priorBatchDirs(spark, root, Long.MaxValue).size == 2)
  }
}
