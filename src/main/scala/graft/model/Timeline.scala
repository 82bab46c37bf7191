package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Per-file min/max statistics for ONE tracked non-key column (the
  * column-stats index — Hudi's metadata-table `column_stats` partition /
  * Delta's per-file stats, kept in the manifest). Values travel as strings
  * (JSON-safe, exact for integral types); `kind` pins the comparison:
  * "long" (INT32/INT64, incl. date/timestamp physical values), "double"
  * (FLOAT/DOUBLE) or "string" (UTF-8 unsigned byte order, same collation
  * as parquet BINARY stats). A column absent from the map simply cannot
  * prune — conservative by construction.
  */
case class ColStat(kind: String, min: String, max: String)

/** One immutable data file inside a table snapshot, with the statistics the
  * upsert planner needs to prune work (Hudi-style file groups without the
  * Hudi runtime): key-range + row count + size. At 100 TB a table has
  * O(100k) files; the manifest is the only thing the driver reads, and the
  * min/max key interval lets an upsert touch only the files its batch
  * keys can possibly live in. `bytes` sizes the rewrite of the affected
  * region so output file counts track data volume, not a constant.
  * `colStats` holds min/max for the table's opt-in tracked columns so
  * non-key range reads can skip files the same way (bounded: only the
  * columns the user registered, not the whole schema — the manifest stays
  * O(files), not O(files × columns)).
  */
case class DataFile(
    path: String,                       // relative to table root
    partition: Map[String, String],     // hive-style partition values
    minKey: String,
    maxKey: String,
    numRows: Long,
    bytes: Long = 0L,
    colStats: Map[String, ColStat] = Map.empty,
    /** Opt-in record-key Bloom filter ("numHashes:base64", ~1 byte/key,
      * [[graft.functions.KeyBloom]] encoding): consulted by the upsert
      * planner and point lookups when key intervals are wide — the
      * z-ordered-layout case, where [minKey, maxKey] covers nearly the
      * whole key space and intervals alone stop pruning. Manifest cost is
      * O(rows) per file; at very large table sizes the blooms belong in a
      * sidecar metadata table, which the encoding here makes portable. */
    keyBloom: Option[String] = None,
    /** Opt-in per-column Bloom filters for the table's registered
      * `bloomColumns` (same encoding, built over the column's canonical
      * string form): the secondary-index analog — equality lookups on a
      * non-key column prune files min/max ranges cannot (a shuffled
      * column spans nearly its whole domain in every file). */
    colBlooms: Map[String, String] = Map.empty)

/** An atomic commit of a table snapshot. `files` is the COMPLETE set of
  * live files at this version (carried-forward + newly written) — readers
  * never list directories, they read the latest manifest. `checkpoint`
  * carries the source watermark (reference: DeltaStreamer stores its source
  * checkpoint in commit metadata — handler.py:88-93). `logFiles` is the
  * MERGE_ON_READ delta-log set: row-level change files not yet compacted
  * into base files (reference handler.py:112-113 MERGE_ON_READ).
  */
case class Commit(
    seq: Long,
    action: String,                     // bulk_insert | upsert | cluster | compact | delta_commit
    files: Seq[DataFile],
    schemaJson: String,
    checkpoint: Option[String],
    commitTimeMs: Long,
    extra: Map[String, String] = Map.empty,
    logFiles: Seq[DataFile] = Seq.empty)

/** On-disk commit record — either shape of a manifest file:
  *
  *  - FULL (checkpoint): `files`/`logFiles` inline — the complete live set.
  *  - DELTA: `baseSeq` + `adds`/`removes` (+ `logAdds`/`logRemoves`) against
  *    the immediately preceding commit.
  *
  * A monolithic manifest rewrites the complete file list on every commit —
  * ~10 MB of JSON per commit at 100k files, so commit I/O grows linearly
  * with table size. The delta shape bounds each commit record by the
  * batch's own churn (the Delta-Lake log-plus-checkpoint design); every
  * [[Timeline.CheckpointInterval]]-th commit is a full checkpoint, so
  * reconstruction reads at most that many records. Old full-shape files
  * parse as records with `baseSeq = None` — forward-compatible.
  */
private[model] case class CommitRecord(
    seq: Long,
    action: String,
    schemaJson: String,
    checkpoint: Option[String],
    commitTimeMs: Long,
    extra: Map[String, String] = Map.empty,
    files: Option[Seq[DataFile]] = None,
    logFiles: Option[Seq[DataFile]] = None,
    baseSeq: Option[Long] = None,
    adds: Option[Seq[DataFile]] = None,
    removes: Option[Seq[String]] = None,
    logAdds: Option[Seq[DataFile]] = None,
    logRemoves: Option[Seq[String]] = None,
    /** BINARY-SIDECAR full checkpoint (the ≥1M-file scale path — the
      * Delta checkpoint.parquet / Hudi metadata-table analog): above
      * [[Timeline.BinarySidecarThreshold]] live files, a full checkpoint
      * stores its file list as a length-prefixed binary sidecar next to
      * the commit record (`<name>`, relative to the commits dir) instead
      * of inline JSON — a 1M-file manifest parses in O(bytes) with no
      * JSON tree, keeping driver reconstruction seconds-bounded. The
      * commit POINT is still the tiny JSON record's CAS; the sidecar is
      * written first and garbage-collected if the CAS loses. */
    filesBin: Option[String] = None,
    logFilesBin: Option[String] = None)

/** Length-prefixed binary encoding of a [[DataFile]] list — the sidecar
  * format behind [[CommitRecord.filesBin]]. Plain streams, no JSON, no
  * reflection: a 1M-entry manifest encodes/decodes in low seconds on one
  * driver core where the JSON shape costs an order of magnitude more in
  * both time and transient heap. Strings are UTF-8 with int length
  * prefixes (bloom encodings exceed `writeUTF`'s 64 KB cap). Versioned
  * magic header so the format can evolve without breaking old tables.
  */
object BinaryManifest {
  private val Magic = 0x47465442 // "GFTB"
  private val Version = 1

  def write(path: Path, files: Seq[DataFile]): Unit = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(path), 1 << 20))
    try writeTo(out, files) finally out.close()
  }

  /** The sidecar bytes in memory — the object-store publish path (a
    * manifest travels as ONE object put/get through the commit seam).
    * Size-bounded by the same reality as [[read]]: the decoded
    * Seq[DataFile] already lives in driver memory, and the encoding is
    * smaller than the decoded form. */
  def encode(files: Seq[DataFile]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1 << 20)
    val out = new java.io.DataOutputStream(bos)
    writeTo(out, files)
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): Seq[DataFile] =
    readFrom(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)), "<bytes>")

  private def writeTo(out: java.io.DataOutputStream, files: Seq[DataFile]): Unit = {
      out.writeInt(Magic); out.writeInt(Version); out.writeInt(files.size)
      files.foreach { f =>
        str(out, f.path)
        out.writeInt(f.partition.size)
        f.partition.foreach { case (k, v) => str(out, k); str(out, v) }
        str(out, f.minKey); str(out, f.maxKey)
        out.writeLong(f.numRows); out.writeLong(f.bytes)
        out.writeInt(f.colStats.size)
        f.colStats.foreach { case (c, s) =>
          str(out, c); str(out, s.kind); str(out, s.min); str(out, s.max)
        }
        opt(out, f.keyBloom)
        out.writeInt(f.colBlooms.size)
        f.colBlooms.foreach { case (c, e) => str(out, c); str(out, e) }
      }
  }

  def read(path: Path): Seq[DataFile] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(path), 1 << 20))
    try readFrom(in, path.toString) finally in.close()
  }

  private def readFrom(in: java.io.DataInputStream, where: String): Seq[DataFile] = {
      require(in.readInt() == Magic, s"not a graft binary manifest: $where")
      val v = in.readInt()
      require(v == Version, s"unsupported binary manifest version $v at $where")
      val n = in.readInt()
      val out = Vector.newBuilder[DataFile]
      out.sizeHint(n)
      var i = 0
      while (i < n) {
        val p = rstr(in)
        val np = in.readInt()
        val part = (0 until np).map(_ => (rstr(in), rstr(in))).toMap
        val mn = rstr(in); val mx = rstr(in)
        val rows = in.readLong(); val bytes = in.readLong()
        val ns = in.readInt()
        val stats = (0 until ns).map(_ =>
          (rstr(in), ColStat(rstr(in), rstr(in), rstr(in)))).toMap
        val kb = ropt(in)
        val nb = in.readInt()
        val cb = (0 until nb).map(_ => (rstr(in), rstr(in))).toMap
        out += DataFile(p, part, mn, mx, rows, bytes, stats, kb, cb)
        i += 1
      }
      out.result()
  }

  private def str(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }
  private def opt(out: java.io.DataOutputStream, s: Option[String]): Unit =
    s match {
      case Some(v) => out.writeBoolean(true); str(out, v)
      case None => out.writeBoolean(false)
    }
  private def rstr(in: java.io.DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, StandardCharsets.UTF_8)
  }
  private def ropt(in: java.io.DataInputStream): Option[String] =
    if (in.readBoolean()) Some(rstr(in)) else None
}

/** Thrown by [[Timeline.commit]] when a DIFFERENT concurrent commit
  * already owns the seq — the optimistic-concurrency conflict signal.
  * A dedicated type (not message text) so retry loops match reliably:
  * substring-matching the message would silently stop retrying on a
  * reword and retry unrelated IllegalStateExceptions that happen to
  * contain the phrase. Extends IllegalStateException so pre-existing
  * catch sites keep working.
  */
class ConcurrentCommitException(msg: String) extends IllegalStateException(msg)

/** Filesystem commit timeline. Write protocol: data files first, then the
  * manifest via write-temp + atomic-rename — a reader either sees the old
  * complete snapshot or the new complete snapshot (ST4 exactly-once: re-run
  * of a failed job rewrites data files that no manifest references, then
  * commits once).
  *
  * Atomic publication goes through a [[CommitStore]]: hard-link CAS on a
  * local filesystem, conditional PUT on an object store — the protocol
  * here is storage-agnostic. Everything is driver-side metadata — no
  * Spark job ever depends on listing the data directory.
  */
class Timeline(tableRoot: String, store: CommitStore = LocalFsCommitStore,
    binarySidecarThreshold: Int = Timeline.BinarySidecarThreshold) {
  implicit private val fmts: Formats = DefaultFormats
  private val commitsDir: Path = Paths.get(tableRoot, "_graft", "commits")
  private val archiveDir: Path = Paths.get(tableRoot, "_graft", "archive")
  private val savepointsDir: Path = Paths.get(tableRoot, "_graft", "savepoints")
  // Memoize manifest parses (a 100k-file manifest is ~10 MB of JSON and
  // latest() runs on every operation). Entries are validated against the
  // file's (mtime, size) on every hit — a rollback+recommit from ANOTHER
  // process reuses a seq with different content and must not be served
  // stale, and an archived manifest must fail the same way everywhere.
  // Bounded to the newest entries so a long-lived timeline cannot leak.
  private val commitCache =
    scala.collection.concurrent.TrieMap.empty[Long, (Long, Long, Commit)]
  private val CacheMax = 64

  def init(): Unit = store.prepare(commitsDir)

  private def commitPath(seq: Long): Path =
    commitsDir.resolve(f"$seq%012d.commit.json")

  def listCommitSeqs(): Seq[Long] =
    store.list(commitsDir)
      .filter(_.endsWith(".commit.json"))
      .map(_.stripSuffix(".commit.json").toLong)
      .sorted

  // ------------------------------------------------ head-pointer protocol
  //
  // On an object store the hot-path cost is REQUEST COUNT, and commit
  // DISCOVERY is the hottest metadata read (latest() runs on every
  // operation; every dependent view's watermark check runs it again).
  // Listing the commits dir is O(active commits) response entries per
  // call AND the one S3 operation allowed to lag a just-finished PUT —
  // so the CAS winner maintains a tiny head-pointer object instead:
  //
  //  - commit(): after winning the record CAS, plain-PUT `_head` = seq.
  //  - latestSeq(): GET `_head`, verify the record exists (one HEAD),
  //    then probe FORWARD key-by-key — a winner that crashed between
  //    CAS and head-PUT leaves the pointer lagging by the crash window,
  //    and the probe heals it (O(1 + lag) requests, zero LISTs).
  //  - rollback()/recovery: LIST remains the ground truth whenever the
  //    pointer is missing or names a deleted record; the result is
  //    written back so the next call is O(1) again.
  //
  // The pointer is a pure CACHE of list-derived truth — every reader
  // verifies against by-key reads (strong on S3), so a stale, lagging,
  // or lost pointer can cause extra requests, never a wrong answer.
  //
  // INVARIANT the forward probe depends on: commit seqs are GAP-FREE.
  // Every allocation in the engine is `latest.seq + 1` under the CAS
  // (there is no other seq-allocation site), so `exists(cur+1)` failing
  // proves `cur` is the head. If a future action ever skips a seq, the
  // healed pointer would silently hide every commit past the gap —
  // change the probe (or close the gap) before changing allocation.

  private val headPath: Path = commitsDir.resolve("_head")

  private def headSeq(): Option[Long] =
    try Some(new String(store.read(headPath), StandardCharsets.UTF_8).trim.toLong)
    catch { case _: Exception => None }

  private def writeHead(seq: Long): Unit =
    try store.put(headPath, seq.toString.getBytes(StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () } // cache, best-effort

  def latestSeq(): Option[Long] = headSeq() match {
    case Some(h) if store.exists(commitPath(h)) =>
      var cur = h
      while (store.exists(commitPath(cur + 1))) cur += 1
      if (cur != h) writeHead(cur) // heal a lagging pointer
      Some(cur)
    case _ =>
      // discovery/recovery path: pointer absent (pre-head timeline,
      // fresh table) or stale-high (rollback) — LIST once, re-seed
      val fromList = listCommitSeqs().lastOption
      fromList.foreach(writeHead)
      fromList
  }

  private def stamp(p: Path): (Long, Long) = store.stamp(p)

  private def cachePut(seq: Long, st: (Long, Long), c: Commit): Unit = {
    commitCache.put(seq, (st._1, st._2, c))
    if (commitCache.size > CacheMax)
      commitCache.keys.toSeq.sorted.dropRight(CacheMax)
        .foreach(commitCache.remove)
  }

  def read(seq: Long): Commit = {
    val p = commitPath(seq)
    val st =
      try stamp(p)
      catch { case e: java.io.IOException => commitCache.remove(seq); throw e }
    commitCache.get(seq) match {
      case Some((m, sz, c)) if m == st._1 && sz == st._2 => c
      case _ =>
        val c = materialize(JsonMethods.parse(new String(store.read(p),
          StandardCharsets.UTF_8)).extract[CommitRecord])
        cachePut(seq, st, c)
        c
    }
  }

  /** Reconstruct the full commit from a record: a delta applies its
    * adds/removes to the (memoized) base — at most
    * [[Timeline.CheckpointInterval]] records deep before a checkpoint.
    * Removed-then-readded ordering: removals first, adds appended, so a
    * file rewritten in place keeps its new stats. */
  private def materialize(r: CommitRecord): Commit = r.baseSeq match {
    case None =>
      def resolve(inline: Option[Seq[DataFile]], bin: Option[String]): Seq[DataFile] =
        inline.getOrElse(bin match {
          case Some(name) =>
            BinaryManifest.decode(store.read(commitsDir.resolve(name)))
          case None => Seq.empty
        })
      Commit(r.seq, r.action, resolve(r.files, r.filesBin), r.schemaJson,
        r.checkpoint, r.commitTimeMs, r.extra,
        resolve(r.logFiles, r.logFilesBin))
    case Some(bs) =>
      val base = read(bs)
      def patch(cur: Seq[DataFile], removes: Option[Seq[String]],
          adds: Option[Seq[DataFile]]): Seq[DataFile] = {
        val dead = removes.getOrElse(Seq.empty).toSet
        cur.filterNot(f => dead(f.path)) ++ adds.getOrElse(Seq.empty)
      }
      Commit(r.seq, r.action,
        patch(base.files, r.removes, r.adds), r.schemaJson,
        r.checkpoint, r.commitTimeMs, r.extra,
        patch(base.logFiles, r.logRemoves, r.logAdds))
  }

  /** Storage shape for a commit: full checkpoint every
    * [[Timeline.CheckpointInterval]]-th seq (and whenever the predecessor
    * is unreadable), delta against seq-1 otherwise. */
  private def toRecord(c: Commit): CommitRecord = {
    val base =
      if (c.seq == 0 || c.seq % Timeline.CheckpointInterval == 0) None
      else try Some(read(c.seq - 1)) catch { case _: Exception => None }
    base match {
      case None => fullRecord(c)
      case Some(b) =>
        // diff on the WHOLE DataFile, not just the path: a path whose
        // stats changed (in-place rewrite, external writer) must travel as
        // remove+add or it would reconstruct with stale stats and corrupt
        // interval pruning
        def diff(prev: Seq[DataFile], next: Seq[DataFile]) = {
          val prevByPath = prev.map(f => f.path -> f).toMap
          val nextByPath = next.map(f => f.path -> f).toMap
          (next.filterNot(f => prevByPath.get(f.path).contains(f)),
            prev.map(_.path).filterNot(p => nextByPath.get(p) == prevByPath.get(p)))
        }
        val (adds, removes) = diff(b.files, c.files)
        val (logAdds, logRemoves) = diff(b.logFiles, c.logFiles)
        CommitRecord(c.seq, c.action, c.schemaJson, c.checkpoint,
          c.commitTimeMs, c.extra, baseSeq = Some(b.seq),
          adds = Some(adds), removes = Some(removes),
          logAdds = Some(logAdds), logRemoves = Some(logRemoves))
    }
  }

  /** Full-checkpoint record shape; above the sidecar threshold the file
    * lists spill to binary sidecars written BEFORE the tiny JSON record —
    * the record's CAS remains the single commit point, and a lost CAS
    * garbage-collects the orphaned sidecars ([[commit]]). */
  private def fullRecord(c: Commit): CommitRecord =
    if (c.files.size + c.logFiles.size <= binarySidecarThreshold)
      CommitRecord(c.seq, c.action, c.schemaJson, c.checkpoint, c.commitTimeMs,
        c.extra, files = Some(c.files), logFiles = Some(c.logFiles))
    else {
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val fb = f"${c.seq}%012d-$tag.files.bin"
      store.put(commitsDir.resolve(fb), BinaryManifest.encode(c.files))
      val lb =
        if (c.logFiles.isEmpty) None
        else {
          val n = f"${c.seq}%012d-$tag.logfiles.bin"
          store.put(commitsDir.resolve(n), BinaryManifest.encode(c.logFiles))
          Some(n)
        }
      CommitRecord(c.seq, c.action, c.schemaJson, c.checkpoint, c.commitTimeMs,
        c.extra, filesBin = Some(fb), logFilesBin = lb)
    }

  /** Sidecar file names referenced by the published record of `seq`. */
  private def sidecarsOf(seq: Long): Seq[String] = {
    val p = commitPath(seq)
    try {
      val r = JsonMethods.parse(new String(store.read(p),
        StandardCharsets.UTF_8)).extract[CommitRecord]
      r.filesBin.toSeq ++ r.logFilesBin.toSeq
    } catch { case _: Exception => Seq.empty }
  }

  private def deleteRecordAndSidecars(seq: Long): Unit = {
    val side = sidecarsOf(seq)
    store.delete(commitPath(seq))
    side.foreach(n => store.delete(commitsDir.resolve(n)))
    ()
  }

  def latest(): Option[Commit] = latestSeq().map(read)

  /** Commit time of `seq` WITHOUT materializing the manifest: served from
    * the commit cache when hot, otherwise extracted textually from the
    * record (a flat top-level field — no JSON tree, no delta-chain
    * reconstruction). Keeps timestamp lookups O(bytes-read) instead of
    * O(manifest-parse) per commit. */
  def commitTimeMs(seq: Long): Long = {
    commitCache.get(seq) match {
      case Some((_, _, c)) => c.commitTimeMs
      case None =>
        val text = new String(store.read(commitPath(seq)), StandardCharsets.UTF_8)
        Timeline.CommitTimeRe.findFirstMatchIn(text) match {
          case Some(m) => m.group(1).toLong
          case None => read(seq).commitTimeMs // malformed? fall back to full parse
        }
    }
  }

  /** Atomic commit: serialize → [[CommitStore.putIfAbsent]] CAS on the
    * commit path. Of two writers that computed the same next seq exactly
    * one wins; the loser's CAS returns false.
    * Idempotent retry: if the existing commit has the same action and file
    * set (a re-run after a successful-but-unacknowledged commit), the
    * collision is absorbed and the existing commit returned; a genuinely
    * different concurrent commit fails loudly.
    */
  def commit(c: Commit): Commit = {
    init()
    val target = commitPath(c.seq)
    val rec = toRecord(c)
    val bytes = Serialization.write(rec).getBytes(StandardCharsets.UTF_8)
    if (store.putIfAbsent(target, bytes)) {
      cachePut(c.seq, stamp(target), c)
      writeHead(c.seq) // the CAS winner advances the head pointer
      c
    } else {
      // CAS lost: this attempt's binary sidecars are referenced by no
      // record — remove them before resolving the collision
      (rec.filesBin.toSeq ++ rec.logFilesBin.toSeq)
        .foreach(n => store.delete(commitsDir.resolve(n)))
      val existing = read(c.seq)
      val same = existing.action == c.action &&
        existing.files.map(_.path).toSet == c.files.map(_.path).toSet &&
        existing.logFiles.map(_.path).toSet == c.logFiles.map(_.path).toSet
      if (same) existing
      else throw new ConcurrentCommitException(
        s"concurrent writer already committed seq ${c.seq} at $target with a different file set")
    }
  }

  private def fullJson(c: Commit): String =
    Serialization.write(CommitRecord(c.seq, c.action, c.schemaJson,
      c.checkpoint, c.commitTimeMs, c.extra,
      files = Some(c.files), logFiles = Some(c.logFiles)))

  /** Rewrite a commit file as a FULL checkpoint (atomic replace) — used at
    * the archive boundary so retained deltas never chain into deleted
    * records. Must run while the commit's base chain is still readable. */
  private def checkpointInPlace(seq: Long): Unit = {
    val c = read(seq)
    val old = sidecarsOf(seq)
    val rec = fullRecord(c)
    store.put(commitPath(seq), Serialization.write(rec).getBytes(StandardCharsets.UTF_8))
    cachePut(seq, stamp(commitPath(seq)), c)
    // sidecars the rewritten record no longer references are dead
    val keep = (rec.filesBin.toSeq ++ rec.logFilesBin.toSeq).toSet
    old.filterNot(keep).foreach(n => store.delete(commitsDir.resolve(n)))
    ()
  }

  /** T3 archiving (reference handler.py:74,92-93: keep 10-15 commits on the
    * active timeline, merge the rest into archive files). Archived records
    * are materialized FULL commits (a delta's base would be deleted with
    * the rest of the window), and the oldest retained commit is
    * checkpointed in place before the window is deleted so every retained
    * delta still chains to a readable base. */
  def archive(keepLast: Int): Int = {
    require(keepLast >= 1, s"archive must retain at least one commit (got $keepLast)")
    val seqs = listCommitSeqs()
    if (seqs.size <= keepLast) return 0
    store.prepare(archiveDir)
    val toArchive = seqs.dropRight(keepLast)
    val merged = toArchive.map(s => fullJson(read(s))).mkString("[", ",", "]")
    val archiveFile = archiveDir.resolve(
      f"${toArchive.head}%012d-${toArchive.last}%012d.archive.json")
    // idempotent: a crashed prior archive of the same window left
    // identical content (full manifests of the same commits) — absorb
    store.putIfAbsent(archiveFile, merged.getBytes(StandardCharsets.UTF_8))
    checkpointInPlace(seqs.takeRight(keepLast).head)
    toArchive.foreach(deleteRecordAndSidecars)
    toArchive.foreach(commitCache.remove)
    toArchive.size
  }

  /** Read a commit wherever it lives: active timeline first, then the
    * archive (full-manifest records survive there) — an incremental
    * consumer that lagged past an `archive()` window must still be able
    * to resolve its baseline and deltas instead of dying on a missing
    * active-timeline file. */
  def readIncludingArchived(seq: Long): Commit =
    try read(seq)
    catch {
      case e: java.nio.file.NoSuchFileException =>
        readArchived().find(_.seq == seq).getOrElse(
          throw new IllegalArgumentException(
            s"commit $seq is on neither the active timeline nor the archive " +
              "(cleaned past retention?)", e))
    }

  /** Commits preserved in the archive (oldest first). */
  def readArchived(): Seq[Commit] =
    store.list(archiveDir)
      .filter(_.endsWith(".archive.json")).sorted
      .flatMap { n =>
        // archived records are always full; legacy archives (whole-Commit
        // JSON) parse identically through the record shape
        JsonMethods.parse(new String(store.read(archiveDir.resolve(n)),
          StandardCharsets.UTF_8)).extract[Seq[CommitRecord]]
          .map(materialize)
      }

  /** Savepoint (Hudi's disaster-recovery pin): persist a SELF-CONTAINED
    * full copy of the commit under `_graft/savepoints/`, and from then on
    * cleaning and rollback treat its files as live. Unlike the active
    * timeline the savepoint survives archiving (its record carries the
    * complete file list, no base chain). */
  def savepoint(seq: Long): Unit = {
    val c = read(seq)
    store.prepare(savepointsDir)
    val target = savepointsDir.resolve(f"$seq%012d.savepoint.json")
    // losing the CAS is fine: a savepoint is immutable, the existing one
    // is byte-equivalent
    store.putIfAbsent(target, fullJson(c).getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Savepointed commits, oldest first (each record self-contained). */
  def listSavepoints(): Seq[Commit] =
    store.list(savepointsDir)
      .filter(_.endsWith(".savepoint.json")).sorted
      .map(n => materialize(JsonMethods.parse(
        new String(store.read(savepointsDir.resolve(n)),
          StandardCharsets.UTF_8)).extract[CommitRecord]))

  /** Read a savepointed snapshot (works even after the commit left the
    * active timeline and the archive). */
  def readSavepoint(seq: Long): Commit =
    listSavepoints().find(_.seq == seq).getOrElse(
      throw new IllegalArgumentException(s"no savepoint at seq $seq"))

  def deleteSavepoint(seq: Long): Boolean =
    store.delete(savepointsDir.resolve(f"$seq%012d.savepoint.json"))

  /** Rollback: discard every commit after `toSeq` and delete the data
    * files only those commits reference (restore-to-savepoint; the
    * operational escape hatch for a bad batch). Single-writer context —
    * callers hold the table lock.
    */
  def rollback(toSeq: Long): Int = {
    val seqs = listCommitSeqs()
    require(seqs.contains(toSeq), s"commit $toSeq not on the active timeline")
    val doomed = seqs.filter(_ > toSeq)
    val keepPaths: Set[String] =
      (seqs.filterNot(_ > toSeq).map(read) ++ readArchived() ++ listSavepoints())
        .flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet
    val dead = doomed.map(read)
      .flatMap(c => (c.files ++ c.logFiles).map(_.path)).toSet -- keepPaths
    dead.foreach(rel => store.delete(Paths.get(tableRoot, rel)))
    doomed.foreach(deleteRecordAndSidecars)
    commitCache.clear()
    writeHead(toSeq) // the pointer must regress with the timeline
    doomed.size
  }

  /** T2 cleaning (reference handler.py:90-91: retain N commits of history):
    * delete data files referenced ONLY by commits older than the retained
    * window. Archived commits are included in the dead-set computation so
    * archive-then-clean cannot leak storage. Returns deleted file count.
    */
  def clean(retainCommits: Int): Int = {
    val seqs = listCommitSeqs()
    val retained = seqs.takeRight(retainCommits).toSet
    val allPaths = (c: Commit) => (c.files ++ c.logFiles).map(_.path)
    val live: Set[String] =
      (seqs.filter(retained).flatMap(s => allPaths(read(s))) ++
        listSavepoints().flatMap(allPaths)).toSet
    val expired = seqs.filterNot(retained).map(read) ++
      readArchived().filterNot(c => retained(c.seq))
    val dead: Set[String] = expired.flatMap(allPaths).toSet -- live
    dead.foreach(rel => store.delete(Paths.get(tableRoot, rel)))
    dead.size
  }
}

object Timeline {
  /** Every Nth commit is stored as a full manifest checkpoint; the ones
    * between are adds/removes deltas. Reconstruction cost is bounded by
    * this depth; commit-file size between checkpoints is bounded by the
    * batch churn, not the table's live-file count. */
  val CheckpointInterval: Int = 10

  /** Above this many live files a full checkpoint spills its file lists
    * to a [[BinaryManifest]] sidecar instead of inline JSON. 100k files
    * (~14 MB JSON) is the measured comfortable ceiling for the JSON
    * shape; a 100 TB table at 128 MB/file carries ~800k-1M entries and
    * needs the O(bytes) binary path to keep driver manifest reads
    * seconds-bounded. Savepoints and archives stay deliberately inline:
    * they are the SELF-CONTAINED disaster-recovery records. */
  val BinarySidecarThreshold: Int = 100000

  /** `commitTimeMs` is a flat top-level field of every record shape (the
    * nested DataFile objects carry no such key), so a textual probe is
    * unambiguous. */
  private[model] val CommitTimeRe = """"commitTimeMs"\s*:\s*(\d+)""".r
}
