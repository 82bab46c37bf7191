package graft.model

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** Atomic metadata-publish primitives for the commit timeline — the seam
  * between the timeline's protocol (compare-and-swap a commit record,
  * replace a checkpoint) and the storage system's way of providing
  * atomicity. The local-filesystem implementation uses temp-file +
  * hard-link CAS; an object-store implementation maps `putIfAbsent` to a
  * conditional PUT (`If-None-Match: *`) and `put` to a plain PUT —
  * identical protocol, different primitive. Keeping the claim behind a
  * trait makes it testable and portable instead of a comment.
  */
trait CommitStore {
  /** Atomically create `target` with `bytes` iff it does not exist.
    * Returns false (leaving any existing content untouched) when another
    * writer already published the target — the CAS loss signal. */
  def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean

  /** Atomically replace (or create) `target` with `bytes` — readers see
    * either the old complete content or the new, never a torn write. */
  def put(target: Path, bytes: Array[Byte]): Unit

  // ---- metadata READ side (round-17): the timeline's reads, listings
  // and deletes route through the same seam as its writes, so the WHOLE
  // commit protocol — not just the CAS — runs against whatever storage
  // the store speaks. Local-filesystem defaults; an object-store
  // implementation overrides with GET/LIST/DELETE.

  /** The complete content of a published metadata object. Throws
    * java.io.IOException (NoSuchFileException locally) when absent. */
  def read(target: Path): Array[Byte] = Files.readAllBytes(target)

  def exists(target: Path): Boolean = Files.exists(target)

  /** The object NAMES directly under `dir` (no recursion, no dirs);
    * empty when `dir` does not exist. */
  def list(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(dir)) { s =>
        s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.getFileName.toString).toSeq
      }
    }

  /** Delete if present; false when it was already absent. */
  def delete(target: Path): Boolean = Files.deleteIfExists(target)

  /** Change-detection stamp for memoization — any pair that changes
    * whenever the object's content may have (locally: mtime + size; an
    * object store: version/etag + length). Throws java.io.IOException
    * when the object is absent. */
  def stamp(target: Path): (Long, Long) =
    (Files.getLastModifiedTime(target).toMillis, Files.size(target))

  /** Make `dir` writable as a publish location — a real directory on a
    * filesystem, a NO-OP on an object store (keys have no directories). */
  def prepare(dir: Path): Unit = {
    Files.createDirectories(dir)
    ()
  }
}

/** Local-FS store: write a unique temp sibling, publish via hard link.
  *
  * link(2) atomically creates the target with its full content and fails
  * with EEXIST if it already exists — no check-then-rename window
  * (Files.move without REPLACE stats the target first, and two racing
  * writers could both slip through and silently overwrite). Filesystems
  * without hard links (vfat/NFS/SMB report EPERM as FileSystemException,
  * others UnsupportedOperationException) fall back to atomic rename,
  * whose create-if-absent race window is the documented local-FS caveat.
  */
object LocalFsCommitStore extends CommitStore {
  private def tmpFor(target: Path): Path =
    target.resolveSibling(s".${target.getFileName}.${UUID.randomUUID()}.tmp")

  def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = tmpFor(target)
    Files.write(tmp, bytes)
    try {
      try { Files.createLink(target, tmp); Files.deleteIfExists(tmp); true }
      catch {
        case e: java.nio.file.FileAlreadyExistsException => throw e
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.move(tmp, target) // no REPLACE: throws FileAlreadyExists if taken
          true
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        false
    }
  }

  def put(target: Path, bytes: Array[Byte]): Unit = {
    val tmp = tmpFor(target)
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
  }
}
