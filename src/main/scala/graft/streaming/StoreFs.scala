package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-directory discovery and cleanup through the Hadoop
  * FileSystem API — the streaming stores (sketch slices, cluster map
  * partitions, DSIR deltas) are framed as the 100 TB production
  * ingest cadence, and production stores live on HDFS/S3/GCS, not a
  * local disk. `java.io.File` silently reports such a store as
  * nonexistent (every batch would then dedup against nothing), while
  * `FileSystem.get(uri, conf)` resolves whatever scheme the path
  * carries (file://, hdfs://, s3a://) with the session's Hadoop conf.
  * One shared implementation — previously three near-copies across
  * the streaming modules. */
object StoreFs {

  private def fs(s: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  /** Store slices holding batches strictly BEFORE `batchId` — replay
    * safety: a re-run batch must not see its own first attempt. */
  def priorBatchDirs(s: SparkSession, storePath: String,
      batchId: Long): Seq[String] = {
    val (f, root) = fs(s, storePath)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      // exact batch_<digits> only: .compact.build staging and a
      // crash-left batch_N.old swap remnant must not parse
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("batch_\\d+"))
      .filter(_.getPath.getName.stripPrefix("batch_").toLong < batchId)
      .map(_.getPath.toString)
  }

  def exists(s: SparkSession, path: String): Boolean = {
    val (f, p) = fs(s, path)
    f.exists(p)
  }

  /** Recursive delete (no-op when absent) — stale-partition cleanup. */
  def deleteDir(s: SparkSession, path: String): Unit = {
    val (f, p) = fs(s, path)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** SLICE COMPACTION (r14 verdict #4): every ingest cadence
    * accumulates `batch_N` parquet dirs without bound — row volume is
    * fine, but small-file debris and per-refresh listing/open costs
    * grow with batch count. This folds all slices EXCEPT THE NEWEST
    * into one combined dir named `batch_<second-newest id>` (the
    * Partitioned.compactDays precedent): readers are unchanged
    * (priorBatchDirs cutoffs see the same ids, rows keep every
    * column — a slice-level merge, not a semantic one), and replay
    * stays idempotent because the only batch a restarted stream can
    * re-run is the NEWEST, which is deliberately left out (a replay
    * overwrites its own slice only, never the folded history).
    * Output file count is sized by bytes (~128 MB targets), retiring
    * the debris. Call at refresh/compaction points, never per batch.
    * Returns the number of dirs folded away (0 = nothing to do). */
  def compactSlices(s: SparkSession, storePath: String): Int = {
    val stage = s"$storePath/.compact.build"
    val f = fs(s, storePath)._1
    // CRASH RECOVERY first: a committed merge (manifest present —
    // written only after the parquet landed) whose source deletes or
    // swap didn't finish resumes here; an uncommitted stage is junk
    if (f.exists(new Path(stage)))
      if (f.exists(new Path(s"$stage/_sources")))
        return finishCompact(s, storePath, stage)
      else deleteDir(s, stage)
    val all = priorBatchDirs(s, storePath, Long.MaxValue)
      .map(p => p -> p.split("batch_").last.toLong)
    if (all.size < 3) return 0
    val newestId = all.map(_._2).max
    val olds = all.filter(_._2 != newestId)
    val src = s.read.parquet(olds.map(_._1): _*)
    val bytes = olds.map { case (p, _) =>
      f.getContentSummary(new Path(p)).getLength }.sum
    val parts = math.max(1L, bytes / (128L << 20)).toInt
    src.coalesce(parts).write.mode("overwrite").parquet(stage)
    // the COMMIT POINT: the manifest (slice dir names, target last)
    // lands only after the merged parquet is complete — from here the
    // merge wins and any crash resumes via finishCompact
    val target = olds.maxBy(_._2)._1.split("/").last
    val names = olds.map(_._1.split("/").last).filter(_ != target) :+ target
    val out = f.create(new Path(s"$stage/_sources"), true)
    out.write(names.mkString("\n").getBytes("UTF-8")); out.close()
    finishCompact(s, storePath, stage)
  }

  /** Complete a committed merge: delete the manifest's source slices
    * (target LAST in the list — its rows live on in the merge) and
    * swap the staged dir into the target's name. Idempotent: every
    * step tolerates having already happened. */
  private def finishCompact(s: SparkSession, storePath: String,
      stage: String): Int = {
    val f = fs(s, storePath)._1
    val in = f.open(new Path(s"$stage/_sources"))
    val names = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList
    in.close()
    val target = names.last
    names.init.foreach(n => deleteDir(s, s"$storePath/$n"))
    swapDir(s, stage, s"$storePath/$target")
    names.size - 1
  }

  /** Land a freshly-built store family: `staging` (a COMPLETE family
    * directory) replaces `target` via two metadata renames — a reader
    * opening the family sees the previous generation or the new one,
    * never an in-progress mix (the r14 ADVICE: an in-place overwrite
    * let a mid-refresh reader pair an atlas with a different g0; the
    * build takes minutes, the swap window is two renames). */
  def swapDir(s: SparkSession, staging: String, target: String): Unit = {
    val (f, st) = fs(s, staging)
    val tg = new Path(target)
    val old = new Path(target + ".old")
    if (f.exists(old)) f.delete(old, true)
    // FileSystem.rename reports failure by RETURNING false (no
    // exception) — an unchecked false here would silently lose the
    // store (target renamed away, staging never landed)
    if (f.exists(tg)) require(f.rename(tg, old),
      s"swapDir: could not retire $target")
    require(f.rename(st, tg), s"swapDir: could not land $staging at $target")
    if (f.exists(old)) f.delete(old, true)
    ()
  }

  /** Conf key for how many fingerprints of one store family survive a
    * [[retentionSweep]] (the live root + N−1 most recent superseded).
    * The sweep protects THIS session's readers (ensure-built stores
    * localCheckpoint eagerly before any sweep); a concurrent EXTERNAL
    * JVM still scanning a superseded fingerprint is protected only by
    * the retained generations — when multiple sessions share a store
    * root, keep the retain at >= 2 (the default); retain = 1 is safe
    * only for a single-writer single-reader deployment. */
  val RetainConf = "spark.graft.storeRetain"
  val DefaultRetain = 2

  def retain(s: SparkSession): Int =
    s.conf.getOption(RetainConf).map(_.toInt).getOrElse(DefaultRetain)

  /** STORE RETENTION (r13 verdict #4). The ensure-built store roots
    * are content-keyed — `graft-<tag>-<path>-<suffix>-fp<fingerprint>`
    * — so every corpus regeneration keys a FRESH build and nothing
    * ever deleted superseded fingerprints: a long-lived deployment
    * (or the probe cadence) accumulated dead graph/vector stores
    * without bound. This sweep keeps the LIVE root plus the
    * `keep − 1` most recently BUILT superseded fingerprints of the
    * same family (same name prefix up to `-fp`) and deletes the rest.
    *
    * Safety under the marker protocol:
    *  - winner-keeps: the live root itself is never touched;
    *  - only roots carrying a `_built` marker are swept — an
    *    in-flight rename target has no marker yet, and `.build-*`
    *    staging dirs are excluded by name, so a concurrent ensure
    *    can always land (it re-keys a fresh root name anyway);
    *  - recency = the `_built` marker's mtime (written last), so the
    *    kept superseded roots are the ones most recently completed —
    *    a reader mid-walk on the previous fingerprint keeps its
    *    store at the default retain of 2;
    *  - idempotent: re-sweeping deletes nothing further.
    *
    * Returns the number of roots deleted. */
  def retentionSweep(s: SparkSession, liveRoot: String,
      keep: Int = DefaultRetain): Int = {
    val (f, live) = fs(s, liveRoot)
    sweepCompleted(f, live, keep)
  }

  /** [[retentionSweep]] core on an already-resolved FileSystem — the
    * form the ensure-build landing path calls. */
  def sweepCompleted(f: FileSystem, live: Path, keep: Int): Int = {
    val name = live.getName
    val cut = name.lastIndexOf("-fp")
    if (cut < 0) return 0
    val family = name.substring(0, cut + 3)
    val parent = live.getParent
    if (parent == null || !f.exists(parent)) return 0
    val completed = f.listStatus(parent).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.startsWith(family) && n != name &&
          !n.contains(".build-")
      }
      .flatMap { st =>
        val m = new Path(st.getPath, "_built")
        if (f.exists(m))
          Some(st.getPath -> f.getFileStatus(m).getModificationTime)
        else None
      }
    val doomed = completed.sortBy(-_._2).drop(math.max(keep - 1, 0))
    doomed.foreach { case (p, _) => f.delete(p, true) }
    doomed.size
  }
}
