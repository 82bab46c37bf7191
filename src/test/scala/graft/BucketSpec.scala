package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable

/** The BUCKET index (Hudi BUCKET index type): hash-bucketed file layout
  * as synthetic `_graft_bucket=<k>` hive dirs, planner pre-filter by
  * touched bucket, zero index structures to maintain. */
class BucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-bucket").toString

  private def rows(n: Int, tag: String, seq: String) =
    spark.range(1, n + 1)
      .selectExpr("id", s"concat('$tag', id) AS v", s"'$seq' AS trx_seq")

  test("bucketed table reaches the same snapshot as a plain table") {
    val plain = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val bucketed = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, bucketCount = 8)
    Seq(plain, bucketed).foreach { t =>
      t.bulkInsert(rows(2000, "a", "001"))
      t.upsert(rows(2000, "b", "002").filter($"id" % 7 === 0))
      t.upsert(rows(2000, "c", "003").filter($"id" % 13 === 0)
        .withColumn(Meta.Deleted, lit(true)))
    }
    val p = plain.readUser().select("id", "v").as[(Long, String)].collect().toMap
    val b = bucketed.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(b == p, "bucketed and plain layouts must agree on the merged state")
    // the bucket is layout only: no schema column, no user-visible trace
    assert(!bucketed.readUser().columns.contains(GraftTable.BucketCol))
    // every data file carries its bucket in the manifest partition map
    val files = bucketed.latestCommit().get.files
    assert(files.forall(_.partition.contains(GraftTable.BucketCol)))
    assert(files.map(_.partition(GraftTable.BucketCol)).toSet.size > 1,
      "2000 keys across 8 buckets must occupy more than one bucket")
  }

  test("upsert planner pre-drops every file outside the touched buckets") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 8 * 1024, bucketCount = 8)
    t.bulkInsert(rows(4000, "a", "001"))
    val files = t.latestCommit().get.files
    val byBucket = files.groupBy(_.partition(GraftTable.BucketCol))
    assert(byBucket.size > 4, s"expected spread over buckets, got ${byBucket.keySet}")
    // single-key update: candidates are bounded by ONE bucket's files
    val kb = GraftTable.bucketOfKey(f"${57L}%019d", 8).toString
    val c = t.upsert(Seq((57L, "upd", "002")).toDF("id", "v", "trx_seq"))
    assert(t.lastPlanner == "bucket")
    val rewritten = c.extra("files_rewritten").toInt
    assert(rewritten <= byBucket(kb).size,
      s"rewrote $rewritten, bucket $kb only has ${byBucket(kb).size} files")
    // untouched files carried path-identical
    val carriedPaths = c.files.map(_.path).toSet
    val untouchedBefore = files.filterNot(_.partition(GraftTable.BucketCol) == kb)
    assert(untouchedBefore.forall(f => carriedPaths(f.path)),
      "files in other buckets must carry path-identical")
    assert(t.readUser().filter($"id" === 57).select("v").as[String].head() == "upd")
  }

  test("point lookups veto by bucket before interval work; config round-trips") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 8 * 1024, bucketCount = 8)
    t.bulkInsert(rows(4000, "a", "001"))
    val got = t.readKeys(Seq(12L, 3999L))
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got == Set((12L, "a12"), (3999L, "a3999")))
    // the driver-side hash and the write-path expression must agree:
    // probe a key through the veto and still find it
    val reopened = GraftTable.open(spark, t.root)
    assert(reopened.bucketCount == 8, "descriptor must carry bucketCount")
    assert(reopened.readKeys(Seq(777L)).count() == 1)
  }

  test("driver-side bucketOfKey equals the write-path expression for every key") {
    val n = 16
    val keys = spark.range(0, 500)
      .select(concat(lit("k"), col("id")).as("k"))
    val mism = keys.withColumn("e", GraftTable.bucketExprOf(col("k"), n))
      .collect()
      .count(r => GraftTable.bucketOfKey(r.getString(0), n) != r.getInt(1))
    assert(mism == 0, s"$mism driver/executor bucket disagreements")
  }

  test("SQL CREATE TABLE with bucket_count creates a bucketed table") {
    graft.sql.GraftSql.install(spark)
    val root = tmp()
    spark.sql(
      s"""CREATE TABLE graft.bkt_sql (id BIGINT, v STRING) LOCATION '$root'
          TBLPROPERTIES ('record_key'='id', 'bucket_count'='4')""")
    spark.sql("INSERT INTO graft.bkt_sql VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val t = GraftTable.open(spark, root)
    assert(t.bucketCount == 4)
    assert(t.latestCommit().get.files.forall(_.partition.contains(GraftTable.BucketCol)))
    assert(spark.sql("SELECT count(*) AS n FROM graft.bkt_sql").as[Long].head() == 3)
  }

  test("SQL DML and maintenance run unchanged on a bucketed table") {
    val t = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, bucketCount = 8)
    t.bulkInsert(rows(1000, "a", "001"))
    graft.sql.GraftSql.register(spark, "bkt_dml", t)
    spark.sql("UPDATE graft.bkt_dml SET v = 'upd' WHERE id <= 100").collect()
    spark.sql("DELETE FROM graft.bkt_dml WHERE id > 900").collect()
    Seq((50L, "merged", "009"), (2000L, "fresh", "009"))
      .toDF("id", "v", "trx_seq").createOrReplaceTempView("bkt_dml_src")
    spark.sql(
      """MERGE INTO graft.bkt_dml t USING bkt_dml_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET v = s.v
         WHEN NOT MATCHED THEN INSERT *""")
    t.cluster(smallFileBytes = 8 * 1024)
    val got = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(got.size == 901, s"1000 - 100 deleted + 1 fresh = 901, got ${got.size}")
    assert(got(50L) == "merged" && got(100L) == "upd" &&
      got(101L) == "a101" && got(2000L) == "fresh")
    assert(!got.contains(950L))
    // every post-maintenance file still carries its bucket
    assert(t.latestCommit().get.files.forall(
      _.partition.contains(GraftTable.BucketCol)))
    // catalog SQL point query rides the bucket veto + interval stab
    graft.sql.GraftScanMetrics.clear()
    assert(spark.sql("SELECT v FROM graft.bkt_dml WHERE id = 500")
      .as[String].head() == "a500")
    val (admitted, total) = graft.sql.GraftScanMetrics.lastScan("graft.bkt_dml").get
    assert(admitted < total, s"point query must file-skip: $admitted/$total")
  }

  test("law: seeded random CDC batches reach the plain table's exact state") {
    val rnd = new scala.util.Random(7)
    val plain = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    val bucketed = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 16 * 1024, bucketCount = 8)
    val batches = (1 to 3).map { seq =>
      val ops = (1 to 300).map { _ =>
        val id = rnd.nextInt(1500).toLong
        val del = rnd.nextInt(10) == 0
        (id, s"v$seq-$id", f"$seq%03d", del)
      }
      ops.toDF("id", "v", "trx_seq", Meta.Deleted)
    }
    Seq(plain, bucketed).foreach { t =>
      t.bulkInsert(rows(1000, "base", "000"))
      batches.foreach(t.upsert(_))
    }
    val p = plain.readUser().select("id", "v").as[(Long, String)].collect().toMap
    val b = bucketed.readUser().select("id", "v").as[(Long, String)].collect().toMap
    assert(b == p, "random CDC fold must be layout-independent")
  }

  test("a batch omitting the table's ordering column is refused, loudly") {
    // the silent alternative: NULL ordering loses every merge tie, so an
    // upsert would commit successfully and drop all its updates
    val t = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001")).toDF("id", "v", "trx_seq"))
    val e = intercept[IllegalArgumentException](
      t.upsert(Seq((1L, "b")).toDF("id", "v")))
    assert(e.getMessage.contains("trx_seq"))
    // an ordering-FREE table (pure-SQL lifecycle) still merges fine
    val free = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 16 * 1024)
    free.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
    free.upsert(Seq((1L, "b")).toDF("id", "v"))
    assert(free.readUser().select("v").as[String].head() == "b")
    // reserved engine names can never become user columns via ALTER
    intercept[IllegalArgumentException](
      free.addColumn("_hoodie_is_deleted", org.apache.spark.sql.types.BooleanType))
    intercept[IllegalArgumentException](
      free.addColumn(GraftTable.BucketCol, org.apache.spark.sql.types.IntegerType))
  }

  test("bucketCount refuses partitioned and non-global configurations") {
    intercept[IllegalArgumentException](new GraftTable(spark, tmp(), Seq("id"),
      partitionFields = Seq("p"), bucketCount = 4))
    intercept[IllegalArgumentException](new GraftTable(spark, tmp(), Seq("id"),
      globalIndex = false, bucketCount = 4))
  }

  test("MOR bucketed: logs bucket like base files; compaction scopes per bucket") {
    val plain = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 8 * 1024, tableType = GraftTable.MergeOnRead)
    val bkt = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 8 * 1024, tableType = GraftTable.MergeOnRead,
      bucketCount = 8)
    // two keys far apart in KEY space but in the SAME bucket: the delta
    // log's interval spans nearly the whole table, so interval overlap
    // alone would rewrite every bucket — the bucket scope must not
    val loId = (1L to 100L).find(i =>
      GraftTable.bucketOfKey(f"$i%019d", 8) == GraftTable.bucketOfKey(f"${3900L}%019d", 8))
      .getOrElse(fail("no low id shares bucket with 3900"))
    Seq(plain, bkt).foreach { t =>
      t.bulkInsert(rows(4000, "a", "001"))
      t.upsert(Seq((loId, "lo", "002"), (3900L, "hi", "002"))
        .toDF("id", "v", "trx_seq"))
    }
    // merged view equal with logs outstanding
    assert(bkt.readUser().select("id", "v").as[(Long, String)].collect().toMap ==
      plain.readUser().select("id", "v").as[(Long, String)].collect().toMap)
    // logs carry their bucket
    assert(bkt.latestCommit().get.logFiles.forall(
      _.partition.contains(GraftTable.BucketCol)))
    val targetBucket = GraftTable.bucketOfKey(f"${3900L}%019d", 8).toString
    val baseFiles = bkt.latestCommit().get.files
    val inBucket = baseFiles.count(_.partition(GraftTable.BucketCol) == targetBucket)
    val cB = bkt.compact()
    val cP = plain.compact()
    assert(cB.extra("files_rewritten").toInt <= inBucket,
      s"bucket-scoped compaction must rewrite <= $inBucket files, " +
        s"got ${cB.extra("files_rewritten")}")
    assert(cP.extra("files_rewritten").toInt > cB.extra("files_rewritten").toInt,
      "the unbucketed table must rewrite MORE under the same wide-interval log")
    // post-compaction snapshots still agree
    assert(bkt.readUser().select("id", "v").as[(Long, String)].collect().toMap ==
      plain.readUser().select("id", "v").as[(Long, String)].collect().toMap)
  }
}
