package graft.sources

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** ES index lifecycle with atomic alias swap — the reference creates a
  * fresh timestamped index per full run, bulk-loads into it, and only
  * re-points the public alias once the load succeeds, so readers never
  * see a half-built index and the previous index stays available for
  * rollback (reference: bugzilla_etl/bz_etl.py:131 setup_es — fresh
  * index unless resuming — and :404 alias handling after a
  * successful run).
  *
  * File-system analogue (zero egress): an index = a bulk ndjson
  * directory `<root>/<name>_v<n>`; the alias = a one-line `<name>.alias`
  * file naming the live directory, written atomically via
  * rename. Readers resolve the alias, writers build the next
  * version; [[prune]] is the reference's old-index cleanup. */
object EsIndexManager {

  private def aliasFile(root: String, alias: String): Path =
    Paths.get(root, s"$alias.alias")

  /** The directory the alias currently points at, if any. */
  def resolve(root: String, alias: String): Option[String] = {
    val p = aliasFile(root, alias)
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  /** Next version number for `alias` (existing `<alias>_v<n>` dirs + 1). */
  private def nextVersion(root: String, alias: String): Int = {
    val dir = Paths.get(root)
    if (!Files.exists(dir)) return 1
    val pat = s"${alias}_v(\\d+)".r
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case pat(n) => n.toInt }
      .maxOption.getOrElse(0) + 1
  }

  /** Full-run load: bulk-write `df` into a NEW index version, then
    * atomically swap the alias to it. The alias is only moved after
    * the write completes — a failed write leaves the alias (and its
    * readers) on the previous good index. Returns the new index name. */
  def publish(df: DataFrame, root: String, alias: String,
      idCol: String): String = {
    val name = s"${alias}_v${nextVersion(root, alias)}"
    EsSink.writeBulk(df, alias, idCol, s"$root/$name")
    // atomic swap: write-to-temp + rename
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s".$alias.alias.tmp")
    Files.writeString(tmp, name)
    Files.move(tmp, aliasFile(root, alias),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    name
  }

  /** Drop index versions the alias no longer points at, keeping the
    * newest `keep` spares for rollback. */
  def prune(root: String, alias: String, keep: Int = 1): Seq[String] = {
    val live = resolve(root, alias).toSet
    val pat = s"${alias}_v(\\d+)".r
    val all = Files.list(Paths.get(root)).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n @ pat(v) => (n, v.toInt) }
      .toSeq.sortBy(-_._2)
    val doomed = all.filterNot { case (n, _) => live(n) }.drop(keep).map(_._1)
    doomed.foreach { n =>
      val d = Paths.get(root, n)
      Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
    doomed
  }
}
