package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftTable
import graft.sync.CatalogSync

/** S5 — persistent metastore sync: the hard-link snapshot + external
  * table must expose exactly the manifest's live files to a session that
  * shares only the metastore, and must follow the table across commits.
  */
class CatalogSyncSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("persistent sync reads the current snapshot by name from a fresh session") {
    val root = Files.createTempDirectory("graft-sync-spec").toString
    val t = new GraftTable(spark, root, Seq("id"), orderingField = "seq")
    t.bulkInsert(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv", t)
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT id, v FROM graft_spec.kv").as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))

    // a commit later the same name must serve the NEW snapshot, not stale
    // files awaiting cleaning
    t.upsert(Seq((2L, "b2", 2L), (3L, "c", 2L)).toDF("id", "v", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv", t)
    assert(spark.newSession().sql("SELECT id, v FROM graft_spec.kv")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("persistent sync preserves hive partition dirs of a partitioned table") {
    val root = Files.createTempDirectory("graft-sync-part").toString
    val t = new GraftTable(spark, root, Seq("id"), partitionFields = Seq("p"),
      orderingField = "seq")
    t.bulkInsert(Seq((1L, "x", "a", 1L), (2L, "y", "b", 1L), (3L, "z", "b", 1L))
      .toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_part", t)
    val got = spark.newSession()
      .sql("SELECT id, p FROM graft_spec.kv_part WHERE p = 'b'")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "b"), (3L, "b")))

    // second commit: new partition value + update inside an existing one.
    // Same schema ⇒ the in-place repoint path (ALTER SET LOCATION +
    // partition add/update) must serve the new snapshot — and the entry
    // stays continuously resolvable (no drop+recreate gap).
    t.upsert(Seq((2L, "y2", "b", 2L), (4L, "w", "c", 2L))
      .toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_part", t)
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT id, v, p FROM graft_spec.kv_part")
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "x", "a"), (2L, "y2", "b"), (3L, "z", "b"), (4L, "w", "c")))
    // partition pruning still works against the repointed entry
    assert(fresh.sql("SELECT id FROM graft_spec.kv_part WHERE p = 'c'")
      .as[Long].collect().toSet == Set(4L))
  }

  test("partition values with backslashes and quotes survive the in-place repoint") {
    val root = Files.createTempDirectory("graft-sync-esc").toString
    val t = new GraftTable(spark, root, Seq("id"), partitionFields = Seq("p"),
      orderingField = "seq")
    t.bulkInsert(Seq((1L, "x", """dir\sub""", 1L), (2L, "y", "it's", 1L))
      .toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_esc", t)
    // second sync exercises the ALTER ... PARTITION path on the escaped specs
    t.upsert(Seq((3L, "z", """dir\sub""", 2L)).toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_esc", t)
    val fresh = spark.newSession()
    assert(fresh.sql("""SELECT id FROM graft_spec.kv_esc WHERE p = 'dir\\sub'""")
      .as[Long].collect().toSet == Set(1L, 3L))
    assert(fresh.sql("SELECT id FROM graft_spec.kv_esc WHERE p = \"it's\"")
      .as[Long].collect().toSet == Set(2L))
  }

  test("partition-layout change falls back to recreate instead of corrupt in-place sync") {
    val rootA = Files.createTempDirectory("graft-sync-layout-a").toString
    val tA = new GraftTable(spark, rootA, Seq("id"), partitionFields = Seq("p"),
      orderingField = "seq")
    tA.bulkInsert(Seq((1L, "x", "a", 1L), (2L, "y", "b", 1L)).toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_layout", tA)
    // same columns, but now UNPARTITIONED: the in-place path would either
    // throw on SHOW PARTITIONS or leave stale partition metadata
    val rootB = Files.createTempDirectory("graft-sync-layout-b").toString
    val tB = new GraftTable(spark, rootB, Seq("id"), orderingField = "seq")
    tB.bulkInsert(Seq((1L, "x", "a", 2L), (3L, "z", "c", 2L)).toDF("id", "v", "p", "seq"))
    CatalogSync.syncPersistent(spark, "graft_spec", "kv_layout", tB)
    assert(spark.newSession().sql("SELECT id, p FROM graft_spec.kv_layout")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (3L, "c")))
  }
}
