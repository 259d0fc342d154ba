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
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_"))
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

  /** Conf key for how many fingerprints of one store family survive a
    * [[retentionSweep]] (the live root + N−1 most recent superseded). */
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
