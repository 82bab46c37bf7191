package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CdcSource

/** Raw-zone listing: the driver walk and the distributed walk (wide
  * zones fan subtree listings out as Spark tasks) must return the
  * identical (mtime, path) set — the incremental watermark is computed
  * from it, so a single missed or duplicated file is an ingest bug. */
class ListingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkZone(nDirs: Int, filesPerDir: Int): String = {
    val root = Files.createTempDirectory("graft-listing").toString
    (0 until nDirs).foreach { d =>
      val dir = Paths.get(root, f"2026/08/$d%02d")
      Files.createDirectories(dir)
      (0 until filesPerDir).foreach { f =>
        Files.writeString(dir.resolve(s"part-$f.parquet"), "x")
      }
      // noise the listing must skip
      Files.writeString(dir.resolve("_SUCCESS"), "")
      Files.writeString(dir.resolve(".hidden.parquet"), "")
    }
    root
  }

  test("narrow zone lists driver-side; wide zone lists distributed; same contract") {
    // narrow: 3 first-level entries <= threshold -> driver walk
    val narrow = mkZone(3, 4)
    val n = CdcSource.listDataFiles(spark, s"$narrow/2026/08")
    assert(n.size == 12)
    assert(n == n.sorted)
    assert(n.forall(_._2.endsWith(".parquet")))

    // wide: > DistributedListThreshold first-level dirs -> Spark tasks
    val wide = mkZone(CdcSource.DistributedListThreshold + 8, 2)
    val w = CdcSource.listDataFiles(spark, s"$wide/2026/08")
    assert(w.size == (CdcSource.DistributedListThreshold + 8) * 2)
    assert(w == w.sorted)
    assert(!w.exists(f => f._2.contains("_SUCCESS") || f._2.contains(".hidden")))
    // the distributed result carries real mtimes (watermark input)
    assert(w.forall(_._1 > 0L))
  }

  test("flat wide zone: many first-level files, zero subdirs — no crash") {
    // regression: the distributed branch once gated on TOTAL level-1
    // entries, so an unpartitioned zone with >threshold files and no
    // subdirs tried parallelize(Seq.empty, 0) and threw at collect()
    val root = Files.createTempDirectory("graft-listing-flat").toString
    val n = CdcSource.DistributedListThreshold + 10
    (0 until n).foreach { i =>
      Files.writeString(Paths.get(root, s"part-$i.parquet"), "x")
    }
    val got = CdcSource.listDataFiles(spark, root)
    assert(got.size == n)
    assert(got == got.sorted)
  }

  test("wide zone gate counts DIRECTORIES: many flat files plus a few subdirs stay driver-side") {
    val root = Files.createTempDirectory("graft-listing-flatmix").toString
    (0 until CdcSource.DistributedListThreshold + 5).foreach { i =>
      Files.writeString(Paths.get(root, s"part-$i.parquet"), "x")
    }
    Files.createDirectories(Paths.get(root, "sub"))
    Files.writeString(Paths.get(root, "sub", "nested.parquet"), "x")
    val got = CdcSource.listDataFiles(spark, root)
    assert(got.size == CdcSource.DistributedListThreshold + 6)
  }

  test("mixed zone: first-level files AND subdirectories both list") {
    val root = Files.createTempDirectory("graft-listing-mix").toString
    Files.writeString(Paths.get(root, "top.parquet"), "x")
    Files.createDirectories(Paths.get(root, "sub"))
    Files.writeString(Paths.get(root, "sub", "nested.parquet"), "x")
    val got = CdcSource.listDataFiles(spark, root).map(_._2)
    assert(got.exists(_.endsWith("top.parquet")))
    assert(got.exists(_.endsWith("nested.parquet")))
    assert(got.size == 2)
  }
}
