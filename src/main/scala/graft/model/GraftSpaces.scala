package graft.model

import java.net.URI
import java.nio.file.Paths
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, FSDataOutputStream, FileSystem, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Root-prefix → [[ObjectStore]] resolution for the whole engine: a
  * table living at `graftmem:/<space>/<rest>` gets its metadata store
  * carved (by prefix) out of the space's shared store, and any other
  * root gets a [[DirObjectStore]] over the local filesystem — the
  * default deployment. One lookup point means every component that
  * opens a table by ROOT STRING (catalog discovery, dependent-view
  * refresh, SQL CALLs) resolves the same store the table was created
  * with, with zero per-call-site plumbing.
  *
  * The reference deployment is S3-native (templates/aws-dms-to-hudi
  * .yaml:264-269; handler.py:144 `--target-base-path s3://…`); an
  * `s3://bucket/...` root would resolve here to an S3-API store the
  * same way `graftmem:/space/...` resolves to the in-memory one.
  */
object GraftStores {
  /** The metadata store for a table rooted at `root`. */
  def forRoot(root: String): ObjectStore = GraftMem.storeForRoot(root) match {
    case Some(s) => s
    case None => new DirObjectStore(Paths.get(root).toAbsolutePath.normalize)
  }

  /** Whether `root` lives in a mounted (non-local-directory) space. */
  def isMounted(root: String): Boolean = GraftMem.storeForRoot(root).isDefined

  /** `root`'s path with any `scheme:[//authority]` head stripped — the
    * form `input_file_name()` URIs reduce to, so path-relativization
    * logic works identically for local and store-backed roots. */
  def schemelessPath(root: String): String = {
    val stripped = root.replaceFirst("^[A-Za-z][A-Za-z0-9+.-]*:(//[^/]*)?", "")
    if (stripped == root) Paths.get(root).toAbsolutePath.normalize.toString
    else stripped
  }
}

/** Purely in-memory table SPACES: `GraftMem.space("x")` yields the
  * shared [[InMemoryObjectStore]] behind every root of the form
  * `graftmem:/x/...`. [[GraftMemFileSystem]] serves Spark's DATA plane
  * (parquet read/write) over the same store, so a full table lifecycle —
  * staged writes, commits, indexes, views, maintenance — runs without
  * the root ever existing on disk. The in-memory stand-in for the S3
  * deployment shape: data through the Hadoop FS connector, metadata
  * through the object-store API, one backing bucket. */
object GraftMem {
  val Scheme = "graftmem"

  private val spaces =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryObjectStore]()
  /** Explicit override per space — lets tests wrap a space's store
    * (fault injection, request counting) while the FS keeps serving it. */
  private val overrides =
    new java.util.concurrent.ConcurrentHashMap[String, ObjectStore]()
  /** Directory markers per space (object stores have no directories;
    * Hadoop consumers expect mkdirs/getFileStatus to agree). */
  private[model] val dirMarkers =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean]]()

  def space(name: String): ObjectStore =
    Option(overrides.get(name)).getOrElse(rawSpace(name))

  def rawSpace(name: String): InMemoryObjectStore =
    spaces.computeIfAbsent(name, _ => new InMemoryObjectStore)

  /** Route a space's I/O (both planes) through `wrapped` — which must
    * delegate to the space's raw store. */
  def wrapSpace(name: String, wrapped: ObjectStore): Unit =
    overrides.put(name, wrapped)

  def unwrapSpace(name: String): Unit = overrides.remove(name)

  /** Drop a space's objects (test hygiene). */
  def dropSpace(name: String): Unit = {
    spaces.remove(name); overrides.remove(name); dirMarkers.remove(name)
    ()
  }

  /** Register the in-memory filesystem with a Hadoop/Spark conf so
    * `graftmem:/...` paths resolve — one line in any session setup. */
  def install(conf: org.apache.hadoop.conf.Configuration): Unit =
    conf.set(s"fs.$Scheme.impl", classOf[GraftMemFileSystem].getName)

  /** A table root inside `space` — `graftmem:/<space>/<name>`. */
  def root(space: String, name: String): String = s"$Scheme:/$space/$name"

  /** (space, key-within-space) for a graftmem root/path string. */
  private[model] def split(pathNoScheme: String): (String, String) = {
    val p = pathNoScheme.stripPrefix("/")
    val i = p.indexOf('/')
    if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
  }

  private[model] def storeForRoot(root: String): Option[ObjectStore] = {
    val noScheme = if (root.startsWith(s"$Scheme:")) Some(
      root.stripPrefix(s"$Scheme:").replaceFirst("^//[^/]*", ""))
    else None
    noScheme.map { p =>
      val (sp, key) = split(p)
      if (key.isEmpty) space(sp) else new PrefixedObjectStore(space(sp), key)
    }
  }
}

/** Hadoop [[FileSystem]] over [[GraftMem]] spaces — Spark's data plane
  * for in-memory tables. Whole-object semantics like any object-store
  * connector: create buffers and PUTs on close (atomic-or-absent),
  * open serves a snapshot byte array (immutable data contract), rename
  * is per-object key move (the FileOutputCommitter's dir renames move
  * each staged object once, the s3a trade), directories are markers +
  * key-prefix inference. */
class GraftMemFileSystem extends FileSystem {
  private var uri: URI = URI.create(s"${GraftMem.Scheme}:///")
  private var cwd: HPath = new HPath("/")

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"${GraftMem.Scheme}:///")
  }

  override def getScheme: String = GraftMem.Scheme
  override def getUri: URI = uri
  override def getWorkingDirectory: HPath = cwd
  override def setWorkingDirectory(p: HPath): Unit = { cwd = p }

  /** (space store, key) for `f`; key "" = the space root. */
  private def locate(f: HPath): (ObjectStore, String, String) = {
    val abs = makeQualified(f).toUri.getPath
    val (sp, key) = GraftMem.split(abs)
    (GraftMem.space(sp), sp, key)
  }

  private def dirs(sp: String) =
    GraftMem.dirMarkers.computeIfAbsent(sp,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())

  private def status(f: HPath, len: Long, isDir: Boolean, mtime: Long): FileStatus =
    new FileStatus(len, isDir, 1, 32L * 1024 * 1024, mtime, makeQualified(f))

  override def getFileStatus(f: HPath): FileStatus = {
    val (store, sp, key) = locate(f)
    if (key.isEmpty) return status(f, 0, isDir = true, 0L)
    store.stat(key) match {
      case Some((_, len)) =>
        status(f, len, isDir = false, store.modifiedMillis(key).getOrElse(0L))
      case None =>
        if (dirs(sp).contains(key) || store.list(key + "/").nonEmpty)
          status(f, 0, isDir = true, 0L)
        else throw new java.io.FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: HPath): Array[FileStatus] = {
    val (store, sp, key) = locate(f)
    val prefix = if (key.isEmpty) "" else key + "/"
    if (key.nonEmpty && store.stat(key).isDefined)
      return Array(getFileStatus(f))
    val keys = store.list(prefix)
    val markers = {
      import scala.jdk.CollectionConverters._
      dirs(sp).asScala.filter(d => d.startsWith(prefix) && d != key)
    }
    if (keys.isEmpty && markers.isEmpty && key.nonEmpty && !dirs(sp).contains(key))
      throw new java.io.FileNotFoundException(f.toString)
    val directFiles = keys.filter(k => !k.drop(prefix.length).contains("/"))
    // a subdir is visible either through a deeper key/marker (relative
    // name contains '/') or through a DIRECT-CHILD marker (an empty
    // directory created via mkdirs: relative name with no '/') — the
    // latter must list too, or getFileStatus says "directory exists"
    // while the parent's listing omits it (Hadoop committers list
    // parents and trip on that inconsistency)
    val rel = (keys ++ markers).map(_.drop(prefix.length))
    val subdirs = (rel.filter(_.contains("/")).map(_.takeWhile(_ != '/')) ++
      markers.toSeq.map(_.drop(prefix.length)).filterNot(_.contains("/"))
    ).distinct
    val base = makeQualified(f)
    (directFiles.map(k => getFileStatus(new HPath(base, k.drop(prefix.length)))) ++
      subdirs.map(d => status(new HPath(base, d), 0, isDir = true, 0L))).toArray
  }

  override def open(f: HPath, bufferSize: Int): FSDataInputStream = {
    val (store, _, key) = locate(f)
    val bytes = store.get(key).getOrElse(
      throw new java.io.FileNotFoundException(f.toString))
    new FSDataInputStream(new GraftMemInputStream(bytes))
  }

  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val (store, _, key) = locate(f)
    if (!overwrite && store.stat(key).isDefined)
      throw new java.io.IOException(s"already exists: $f")
    val buf = new java.io.ByteArrayOutputStream(64 * 1024)
    val out = new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      // create(overwrite=false) is a CONDITIONAL PUT that resolves at
      // close (S3A's conditional-create shape): the early stat above is
      // a fast-fail courtesy, the putIfNoneMatch here is the atomic
      // truth — two racers that both passed the stat check still
      // serialize on the store's CAS, exactly one close succeeds
      override def close(): Unit = {
        super.close()
        if (overwrite) store.put(key, buf.toByteArray)
        else if (!store.putIfNoneMatch(key, buf.toByteArray))
          throw new java.nio.file.FileAlreadyExistsException(key)
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: HPath, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append on an object store")

  override def rename(src: HPath, dst: HPath): Boolean = {
    val (store, sp, sKey) = locate(src)
    val (_, _, dKey) = locate(dst)
    if (store.stat(sKey).isDefined) {
      // a rename onto an existing DIRECTORY moves src INTO it (the
      // FileOutputCommitter's merge-paths contract)
      val target =
        if (dirs(sp).contains(dKey) || store.list(dKey + "/").nonEmpty)
          dKey + "/" + sKey.split('/').last
        else dKey
      store.copy(sKey, target); store.delete(sKey); true
    } else if (dirs(sp).contains(sKey) || store.list(sKey + "/").nonEmpty) {
      val into = dirs(sp).contains(dKey) || store.list(dKey + "/").nonEmpty
      val base = if (into) dKey + "/" + sKey.split('/').last else dKey
      store.list(sKey + "/").foreach { k =>
        val moved = base + "/" + k.drop(sKey.length + 1)
        store.copy(k, moved); store.delete(k)
      }
      import scala.jdk.CollectionConverters._
      val ds = dirs(sp)
      ds.asScala.filter(d => d == sKey || d.startsWith(sKey + "/")).toList.foreach { d =>
        ds.remove(d); ds.add(base + d.drop(sKey.length))
      }
      true
    } else false
  }

  override def delete(f: HPath, recursive: Boolean): Boolean = {
    val (store, sp, key) = locate(f)
    val isFile = store.stat(key).isDefined
    val children = store.list(key + "/")
    if (isFile) { store.delete(key); true }
    else if (children.nonEmpty || dirs(sp).contains(key)) {
      if (children.nonEmpty && !recursive)
        throw new java.io.IOException(s"non-empty directory: $f")
      children.foreach(store.delete)
      import scala.jdk.CollectionConverters._
      val ds = dirs(sp)
      ds.asScala.filter(d => d == key || d.startsWith(key + "/")).toList
        .foreach(ds.remove)
      true
    } else false
  }

  override def mkdirs(f: HPath, permission: FsPermission): Boolean = {
    val (_, sp, key) = locate(f)
    if (key.nonEmpty) { dirs(sp).add(key); () }
    true
  }
}

/** Seekable, positioned-readable stream over a snapshot byte array. */
private[model] class GraftMemInputStream(bytes: Array[Byte])
    extends java.io.InputStream
    with org.apache.hadoop.fs.Seekable
    with org.apache.hadoop.fs.PositionedReadable {
  private var pos = 0

  override def read(): Int =
    if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }

  override def available(): Int = bytes.length - pos

  def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length)
      throw new java.io.EOFException(s"seek($p) outside [0, ${bytes.length}]")
    pos = p.toInt
  }
  def getPos: Long = pos.toLong
  def seekToNewSource(targetPos: Long): Boolean = false

  def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (position + length > bytes.length)
      throw new java.io.EOFException(s"readFully past end ($position+$length > ${bytes.length})")
    System.arraycopy(bytes, position.toInt, buffer, offset, length)
  }
  def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
