package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small filesystem helpers shared across the engine. */
object Fs {

  /** Recursively delete `root` if it exists — depth-first, tolerant of
    * entries vanishing concurrently (deleteIfExists). The ONE
    * implementation of the walk-sorted-delete idiom (stage cleanup,
    * orphan GC, catalog snapshot retirement) so a hardening fix lands
    * everywhere at once. */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root))
      Using.resource(Files.walk(root)) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
}
