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
}
