package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** One immutable data file inside a table snapshot, with the statistics the
  * upsert planner needs to prune work (Hudi-style file groups without the
  * Hudi runtime): key-range + row count. At 100 TB a table has O(100k)
  * files; the manifest is the only thing the driver reads, and the
  * min/max key interval lets an upsert touch only the files its batch
  * keys can possibly live in.
  */
case class DataFile(
    path: String,                       // relative to table root
    partition: Map[String, String],     // hive-style partition values
    minKey: String,
    maxKey: String,
    numRows: Long)

/** An atomic commit of a table snapshot. `files` is the COMPLETE set of
  * live files at this version (carried-forward + newly written) — readers
  * never list directories, they read the latest manifest. `checkpoint`
  * carries the source watermark (reference: DeltaStreamer stores its source
  * checkpoint in commit metadata — handler.py:88-93).
  */
case class Commit(
    seq: Long,
    action: String,                     // bulk_insert | upsert | cluster | compact | clean
    files: Seq[DataFile],
    schemaJson: String,
    checkpoint: Option[String],
    commitTimeMs: Long,
    extra: Map[String, String] = Map.empty)

/** Filesystem commit timeline. Write protocol: data files first, then the
  * manifest via write-temp + atomic-rename — a reader either sees the old
  * complete snapshot or the new complete snapshot (ST4 exactly-once: re-run
  * of a failed job rewrites data files that no manifest references, then
  * commits once).
  *
  * Local-FS rename is atomic; on an object store the same protocol holds
  * with a conditional PUT. Everything here is driver-side metadata — no
  * Spark job ever depends on listing the data directory.
  */
class Timeline(tableRoot: String) {
  implicit private val fmts: Formats = DefaultFormats
  private val commitsDir: Path = Paths.get(tableRoot, "_graft", "commits")
  private val archiveDir: Path = Paths.get(tableRoot, "_graft", "archive")

  def init(): Unit = Files.createDirectories(commitsDir)

  private def commitPath(seq: Long): Path =
    commitsDir.resolve(f"$seq%012d.commit.json")

  def listCommitSeqs(): Seq[Long] =
    if (!Files.exists(commitsDir)) Seq.empty
    else Files.list(commitsDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".commit.json"))
      .map(_.stripSuffix(".commit.json").toLong)
      .toSeq.sorted

  def latestSeq(): Option[Long] = listCommitSeqs().lastOption

  def read(seq: Long): Commit = {
    val js = Files.readString(commitPath(seq))
    JsonMethods.parse(js).extract[Commit]
  }

  def latest(): Option[Commit] = latestSeq().map(read)

  /** Atomic commit: serialize → temp file → rename into place. */
  def commit(c: Commit): Commit = {
    init()
    val target = commitPath(c.seq)
    require(!Files.exists(target), s"commit ${c.seq} already exists at $target")
    val tmp = commitsDir.resolve(s".${c.seq}.tmp")
    Files.write(tmp, Serialization.write(c).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    c
  }

  /** T3 archiving (reference handler.py:74,92-93: keep 10-15 commits on the
    * active timeline, merge the rest into archive files). */
  def archive(keepLast: Int): Int = {
    val seqs = listCommitSeqs()
    if (seqs.size <= keepLast) return 0
    Files.createDirectories(archiveDir)
    val toArchive = seqs.dropRight(keepLast)
    val merged = toArchive.map(s => Files.readString(commitPath(s)))
      .mkString("[", ",", "]")
    val archiveFile = archiveDir.resolve(
      f"${toArchive.head}%012d-${toArchive.last}%012d.archive.json")
    val tmp = archiveDir.resolve(s".${toArchive.head}.tmp")
    Files.write(tmp, merged.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, archiveFile, StandardCopyOption.ATOMIC_MOVE)
    toArchive.foreach(s => Files.delete(commitPath(s)))
    toArchive.size
  }

  /** T2 cleaning (reference handler.py:90-91: retain N commits of history):
    * delete data files referenced ONLY by commits older than the retained
    * window. Returns deleted file count. */
  def clean(retainCommits: Int): Int = {
    val seqs = listCommitSeqs()
    if (seqs.size <= retainCommits) return 0
    val retained = seqs.takeRight(retainCommits).toSet
    val live: Set[String] =
      seqs.filter(retained).flatMap(s => read(s).files.map(_.path)).toSet
    val dead: Set[String] =
      seqs.filterNot(retained).flatMap(s => read(s).files.map(_.path)).toSet -- live
    dead.foreach { rel =>
      val p = Paths.get(tableRoot, rel)
      if (Files.exists(p)) Files.delete(p)
    }
    dead.size
  }
}
