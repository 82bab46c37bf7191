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

  def put(key: String, bytes: Array[Byte]): Unit = {
    val out = fs.create(pathOf(key), true)
    try out.write(bytes) finally out.close()
  }

  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean =
    try {
      val out = fs.create(pathOf(key), false)
      try out.write(bytes) finally out.close()
      true
    } catch {
      // the condition can fail at create (fast path) OR at close (the
      // atomic conditional PUT) — both mean "the key already existed"
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: java.io.IOException
          if e.getMessage != null && e.getMessage.contains("already exists") =>
        false
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

  def list(prefix: String): Seq[String] = {
    // a prefix is not necessarily a directory boundary: list the deepest
    // directory at or above it (one recursive listFiles = one prefix
    // LIST on an object-store connector) and filter by key
    val asPath = pathOf(prefix.stripSuffix("/"))
    val dir =
      if (prefix.isEmpty || prefix.endsWith("/")) asPath
      else if (try fs.getFileStatus(asPath).isDirectory
        catch { case _: java.io.FileNotFoundException => false }) asPath
      else Option(asPath.getParent).getOrElse(root)
    val out = Seq.newBuilder[String]
    try {
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          val k = keyOf(st.getPath)
          // never serve keys beyond the root (a dir probe that fell back
          // to the root's parent could otherwise leak siblings)
          if (k.startsWith(prefix) && !k.startsWith("..") && k.nonEmpty)
            out += k
        }
      }
    } catch { case _: java.io.FileNotFoundException => () }
    out.result().sorted
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

  override def putFile(key: String, src: Path): Unit = {
    val out = fs.create(pathOf(key), true)
    try Files.copy(src, out) finally out.close()
    ()
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
