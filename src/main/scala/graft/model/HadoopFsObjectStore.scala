package graft.model

import java.nio.file.{Files, Path}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** [[ObjectStore]] over a Hadoop [[FileSystem]] — the DEPLOYABLE store
  * adapter behind the engine's metadata seam. `DirObjectStore` proves
  * the contract on a local directory and `InMemoryObjectStore` in pure
  * memory; this adapter carries the same contract to any filesystem
  * Spark can already reach (s3a://, abfs://, gs://, hdfs://, and the
  * in-memory `graftmem:` stand-in), so a table's metadata plane and its
  * parquet data plane ride ONE connector, credentials and all — the
  * reference deployment is S3-native (templates/aws-dms-to-hudi.yaml:
  * 264-269 raw/curated buckets; handler.py:144 `--target-base-path
  * s3://…`).
  *
  * Mapping (rename-free — no connector's rename is trusted):
  *
  *  - `put` = `create(overwrite = true)` + write + close — one whole-
  *    object PUT on an object-store connector (visible only at close).
  *    On a MATERIALIZING connector (HDFS, raw local) the put stages to
  *    a `.tmp` sibling and renames with OVERWRITE (atomic on HDFS and
  *    POSIX), so a crash mid-put leaves only a list-filtered staging
  *    orphan — never a torn `table.json`, `_head` or registry object
  *    under the final key.
  *  - `putIfNoneMatch` = `create(overwrite = false)` + write + close —
  *    the CAS. The adapter REQUIRES the connector to resolve the
  *    no-overwrite condition ATOMICALLY AT CLOSE (server-side
  *    `If-None-Match: *`): S3A's conditional create (Hadoop 3.4.1+,
  *    `fs.s3a.create.conditional.enabled`), ABFS and GCS atomic
  *    creates, HDFS's namespace create, and [[GraftMemFileSystem]]'s
  *    conditional close all qualify. A connector that only
  *    check-then-writes (e.g. a raw local filesystem under heavy
  *    cross-process racing) narrows the CAS to its own atomicity —
  *    the commit protocol's loser-reads-back absorption still bounds
  *    the damage to a spurious conflict, never a torn record.
  *  - `list` = one recursive `listFiles` under the deepest directory at
  *    or above the prefix — a single prefix LIST on object stores.
  *  - `stat`/`modifiedMillis` = `getFileStatus` (etag analog:
  *    mtime + length, the same stamp [[DirObjectStore]] serves).
  *
  * Directories are a connector artifact, not a store concept: `stat`
  * answers only for FILES, and `deletePrefix` sweeps the emptied
  * directory husk afterwards (a no-op on pure object stores).
  */
class HadoopFsObjectStore(rootUri: HPath, conf: Configuration) extends ObjectStore {
  private val fs: FileSystem = rootUri.getFileSystem(conf)
  private val root: HPath = fs.makeQualified(rootUri)
  private val rootKeyPath: String = root.toUri.getPath.stripSuffix("/")
  private val scheme: String = Option(root.toUri.getScheme).getOrElse("file")

  /** Whether this connector MATERIALIZES the object at create() time
    * (HDFS, raw/local file systems) rather than buffering and PUTting
    * whole at close (s3a/abfs/gs/graftmem). Drives the torn-partial
    * cleanup in [[putIfNoneMatch]]: on a materializing connector a
    * mid-write failure leaves OUR partial bytes occupying the key —
    * which would make every later CAS lose and let readers see a torn
    * record — so the adapter deletes it before surfacing the error; on
    * a buffering connector an existing key is always a COMPLETE object
    * (ours with a lost ack, or a racer's) and must never be deleted. */
  private val materializesAtCreate: Boolean =
    HadoopFsObjectStore.MaterializingSchemes(scheme)

  /** Non-empty when the connector may NOT resolve create(overwrite =
    * false) atomically at close (round-19 verdict: nothing verified the
    * scaladoc's requirement at mount time). Probed at construction —
    * scheme allowlist, the S3A conditional-create switch, then a
    * `hasPathCapability` ask — and logged LOUDLY once per scheme; also
    * exposed here so deployment checks can assert it. A non-atomic CAS
    * narrows to check-then-write: the commit protocol's loser-reads-back
    * absorption still bounds damage to a spurious conflict, but two
    * cross-process racers can both believe they won. */
  val casCapabilityWarning: Option[String] = {
    val capable =
      HadoopFsObjectStore.AtomicCasSchemes(scheme) ||
        (scheme == "s3a" &&
          conf.getBoolean("fs.s3a.create.conditional.enabled", false)) ||
        (try fs.hasPathCapability(root, "fs.capability.create.conditional")
        catch { case _: Exception => false })
    if (capable) None
    else Some(s"HadoopFsObjectStore over '$scheme://': the connector is not " +
      "known to resolve create(overwrite=false) atomically at close, so the " +
      "commit CAS may narrow to check-then-write under cross-process racing " +
      "(S3A needs Hadoop 3.4.1+ with fs.s3a.create.conditional.enabled=true). " +
      "Single-writer deployments are unaffected.")
  }
  casCapabilityWarning.foreach { msg =>
    if (HadoopFsObjectStore.warnedSchemes.add(scheme))
      System.err.println(s"WARN $msg")
  }

  private def pathOf(key: String): HPath = {
    require(key.isEmpty || !key.split('/').contains(".."),
      s"key escapes the store root: $key")
    if (key.isEmpty) root else new HPath(root, key)
  }

  /** Key of a qualified child path, relative to the root ("" = root). */
  private def keyOf(p: HPath): String = {
    val full = p.toUri.getPath
    if (full == rootKeyPath) ""
    else full.stripPrefix(rootKeyPath + "/")
  }

  /** Atomic-replace plain put on materializing connectors: stage to a
    * `.{name}.{uuid}.tmp` sibling (the [[DirObjectStore]] convention —
    * lists filter the suffix) and rename with OVERWRITE, which HDFS and
    * POSIX rename resolve atomically — a crash mid-put leaves only a
    * filtered staging orphan, never a torn object under the final key
    * (closes the round-20 documented caveat). Buffering connectors
    * (s3a/abfs/gs/graftmem) keep the single whole-object PUT — visible
    * only at close, and a staged copy would just double the request
    * count for no atomicity gain. */
  def put(key: String, bytes: Array[Byte]): Unit =
    if (!materializesAtCreate) {
      val out = fs.create(pathOf(key), true)
      try out.write(bytes) finally out.close()
    } else {
      val target = pathOf(key)
      val tmp = stagingSibling(target)
      val out = fs.create(tmp, true)
      try {
        try out.write(bytes) finally out.close()
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case e: Throwable =>
          try { fs.delete(tmp, false); () }
          catch { case _: java.io.IOException => () }
          throw e
      }
    }

  private lazy val fc: org.apache.hadoop.fs.FileContext =
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)

  private def stagingSibling(target: HPath): HPath =
    new HPath(Option(target.getParent).getOrElse(root),
      s".${target.getName}.${java.util.UUID.randomUUID()}.tmp")

  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    val path = pathOf(key)
    // the condition can fail at create (fast path) OR at close (the
    // atomic conditional PUT) — both mean "the key already existed".
    // Detection is TYPED (incl. the RemoteException class-name carry);
    // an AMBIGUOUS IOException resolves by read-back on buffering
    // connectors (an existing key there is always a complete object —
    // CAS lost; absent — nothing durable, surface the error), and on
    // materializing connectors by deleting our own torn partial first
    // (create(false) succeeding proved the key was ours) so later CAS
    // attempts and readers never meet it.
    val out =
      try fs.create(path, false)
      catch {
        case e if HadoopFsObjectStore.isAlreadyExists(e) => return false
        case e: java.io.IOException =>
          if (!materializesAtCreate && stat(key).isDefined) return false
          throw e
      }
    try {
      try out.write(bytes) finally out.close()
      true
    } catch {
      case e if HadoopFsObjectStore.isAlreadyExists(e) => false
      case e: java.io.IOException =>
        // torn-partial cleanup ONLY where create(false) succeeding
        // PROVED the key was ours — i.e. schemes whose create is
        // namespace-atomic (hdfs/viewfs). On file:// create is
        // check-then-write cross-process, so two racers can both pass
        // create(false) and the delete could remove the OTHER process's
        // completed object — rethrow instead and lean on the
        // next-commit-heals property (round-20 advice).
        if (materializesAtCreate && HadoopFsObjectStore.AtomicCasSchemes(scheme)) {
          try { fs.delete(path, false); () }
          catch { case _: java.io.IOException => () }
          throw e
        } else if (!materializesAtCreate && stat(key).isDefined) false
        else throw e
    }
  }

  def get(key: String): Option[Array[Byte]] =
    try {
      val in = fs.open(pathOf(key))
      try {
        val buf = new java.io.ByteArrayOutputStream(1024)
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toByteArray)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  def list(prefix: String): Seq[String] = listStamped(prefix).map(_._1)

  /** Stamps ride the SAME listFiles enumeration (a FileStatus carries
    * the mtime) — no per-key HEAD round on top of the LIST. */
  override def listStamped(prefix: String): Seq[(String, Long)] = {
    // a prefix is not necessarily a directory boundary: list the deepest
    // directory at or above it (one recursive listFiles = one prefix
    // LIST on an object-store connector) and filter by key
    val asPath = pathOf(prefix.stripSuffix("/"))
    val dir =
      if (prefix.isEmpty || prefix.endsWith("/")) asPath
      else if (try fs.getFileStatus(asPath).isDirectory
        catch { case _: java.io.FileNotFoundException => false }) asPath
      else Option(asPath.getParent).getOrElse(root)
    val out = Seq.newBuilder[(String, Long)]
    try {
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val st = it.next()
        // staging siblings (`.{name}.{uuid}.tmp`, the atomic-put path)
        // are never keys — same filter as [[DirObjectStore]]'s walk
        if (st.isFile && !st.getPath.getName.endsWith(".tmp")) {
          val k = keyOf(st.getPath)
          // never serve keys beyond the root (a dir probe that fell back
          // to the root's parent could otherwise leak siblings)
          if (k.startsWith(prefix) && !k.startsWith("..") && k.nonEmpty)
            out += (k -> st.getModificationTime)
        }
      }
    } catch { case _: java.io.FileNotFoundException => () }
    out.result().sortBy(_._1)
  }

  /** One NON-RECURSIVE `listStatus` when the prefix sits on a directory
    * boundary — the ListObjectsV2 `delimiter=/` analog (S3A maps
    * listStatus to exactly that); the recursive default otherwise. */
  override def listPrefixes(prefix: String): Seq[String] = {
    val p = if (prefix.isEmpty || prefix.endsWith("/")) prefix else prefix + "/"
    val dir = pathOf(p.stripSuffix("/"))
    val isDir =
      try fs.getFileStatus(dir).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (!isDir) super.listPrefixes(prefix)
    else try fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(st => p + st.getPath.getName + "/").sorted
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  def delete(key: String): Unit = {
    try fs.delete(pathOf(key), false)
    catch { case _: java.io.FileNotFoundException => () }
    ()
  }

  def stat(key: String): Option[(Long, Long)] =
    try {
      val st = fs.getFileStatus(pathOf(key))
      if (st.isFile) Some((st.getModificationTime, st.getLen)) else None
    } catch { case _: java.io.FileNotFoundException => None }

  override def putFile(key: String, src: Path): Unit =
    if (!materializesAtCreate) {
      val out = fs.create(pathOf(key), true)
      try Files.copy(src, out) finally out.close()
      ()
    } else {
      // same staged atomic replace as [[put]]
      val target = pathOf(key)
      val tmp = stagingSibling(target)
      val out = fs.create(tmp, true)
      try {
        try { Files.copy(src, out); () } finally out.close()
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case e: Throwable =>
          try { fs.delete(tmp, false); () }
          catch { case _: java.io.IOException => () }
          throw e
      }
    }

  override def openStream(key: String): java.io.InputStream =
    try fs.open(pathOf(key))
    catch { case _: java.io.FileNotFoundException =>
      throw new java.nio.file.NoSuchFileException(key)
    }

  override def copy(srcKey: String, dstKey: String): Unit = {
    val in =
      try fs.open(pathOf(srcKey))
      catch { case _: java.io.FileNotFoundException =>
        throw new java.nio.file.NoSuchFileException(srcKey)
      }
    try {
      val out = fs.create(pathOf(dstKey), true)
      try {
        val chunk = new Array[Byte](256 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { out.write(chunk, 0, n); n = in.read(chunk) }
      } finally out.close()
    } finally in.close()
  }

  /** LIST + per-key DELETE (what it costs on S3), then sweep the emptied
    * directory husk the connector may keep (local/HDFS dirs, graftmem
    * markers) — best-effort, and only when no objects remain. */
  override def deletePrefix(prefix: String): Unit = {
    super.deletePrefix(prefix)
    val dir = pathOf(prefix.stripSuffix("/"))
    if (dir != root && list(prefix).isEmpty)
      try { fs.delete(dir, true); () }
      catch { case _: java.io.IOException => () }
  }
}

object HadoopFsObjectStore {
  /** Connector schemes whose create(overwrite = false) resolves the
    * no-overwrite condition ATOMICALLY at create/close: HDFS's namespace
    * create, ABFS/GCS atomic creates, [[GraftMemFileSystem]]'s
    * conditional close. `file` is deliberately absent — a raw local
    * filesystem's create is check-then-write across processes (the
    * documented [[DirObjectStore]]-is-the-local-store caveat); `s3a`
    * qualifies only via its conditional-create switch (probed in the
    * constructor). */
  private[model] val AtomicCasSchemes =
    Set("hdfs", "viewfs", "abfs", "abfss", "gs", "graftmem")

  /** Schemes that materialize the object at create() time (torn partials
    * possible at the key) rather than buffering until close. */
  private[model] val MaterializingSchemes =
    Set("file", "local", "hdfs", "viewfs")

  private val warnedSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Typed already-exists detection: the Hadoop and NIO exception types,
    * the RemoteException class-name carry (an RPC-transported HDFS
    * condition arrives as RemoteException naming the original class),
    * and — last, for connectors that wrap the condition in a plain
    * IOException — the message heuristic. A heuristic misfire converges
    * on CAS-loss semantics, which the protocol's loser-reads-back
    * absorption handles; the read-back fallback in putIfNoneMatch covers
    * the inverse (a 412 wrapped WITHOUT the phrase). */
  private[model] def isAlreadyExists(e: Throwable): Boolean = e match {
    case _: org.apache.hadoop.fs.FileAlreadyExistsException => true
    case _: java.nio.file.FileAlreadyExistsException => true
    case re: org.apache.hadoop.ipc.RemoteException =>
      re.getClassName ==
        classOf[org.apache.hadoop.fs.FileAlreadyExistsException].getName ||
        re.getClassName == classOf[java.nio.file.FileAlreadyExistsException].getName
    case e: java.io.IOException =>
      e.getMessage != null && e.getMessage.contains("already exists")
    case _ => false
  }
}
