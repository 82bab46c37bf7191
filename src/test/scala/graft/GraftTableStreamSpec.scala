package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftTable
import graft.sql.GraftSql

/** `spark.readStream.table("graft.<name>")` — the DSv2 micro-batch
  * source over the commit timeline: snapshot-then-changes delivery,
  * checkpoint resume without re-delivery, manifest-injected partition
  * values, maintenance commits never re-feeding. */
class GraftTableStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Drain the stream once into a RECOVERABLE (parquet) sink — the
    * memory sink cannot resume from a checkpoint, which is the very
    * contract under test. */
  private def runOnce(table: String, ck: String, out: String): Unit = {
    val q = spark.readStream.table(table)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
  }

  private def sunk(out: String): Set[(Long, String)] =
    spark.read.parquet(out).select("id", "v").as[(Long, String)].collect().toSet

  test("snapshot then changes, with checkpoint resume") {
    val root = Files.createTempDirectory("graft-catstream").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catstream_t1", t)
    val ck = Files.createTempDirectory("graft-catstream-ck").toString
    val out = Files.createTempDirectory("graft-catstream-out").toString + "/sink"

    runOnce("graft.catstream_t1", ck, out)
    val b1 = sunk(out)
    assert(b1 == Set((1L, "a"), (2L, "b")), s"initial batch must be the snapshot: $b1")

    // a new commit, then resume from the SAME checkpoint: only the new
    // commit's files feed; nothing already consumed re-delivers
    t.upsert(Seq((3L, "c", "002")).toDF("id", "v", "trx_seq"))
    runOnce("graft.catstream_t1", ck, out)
    val b2 = sunk(out)
    assert(b2 == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"resume must append exactly the new commit's rows: $b2")

    // no new commits: another resume delivers nothing
    runOnce("graft.catstream_t1", ck, out)
    assert(sunk(out) == b2, "idle resume must deliver no rows")
  }

  test("maintenance commits do not re-feed; MOR delta logs are change-exact") {
    val root = Files.createTempDirectory("graft-catstream-mor").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead)
    t.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catstream_t2", t)
    val ck = Files.createTempDirectory("graft-catstream-mor-ck").toString
    val out = Files.createTempDirectory("graft-catstream-mor-out").toString + "/sink"
    runOnce("graft.catstream_t2", ck, out)
    assert(sunk(out).size == 2)

    t.upsert(Seq((2L, "b2", "002")).toDF("id", "v", "trx_seq")) // delta log
    t.compact() // maintenance: must NOT re-feed the rewritten base files
    runOnce("graft.catstream_t2", ck, out)
    val delta = sunk(out) -- Set((1L, "a"), (2L, "b"))
    assert(delta == Set((2L, "b2")), s"change-exact delta expected, got $delta")
  }

  test("partitioned table: partition values injected from the manifest") {
    val root = Files.createTempDirectory("graft-catstream-part").toString
    val t = new GraftTable(spark, root, Seq("id"), partitionFields = Seq("p"),
      targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "x", "a1", "001"), (2L, "y", "b1", "001"))
      .toDF("id", "p", "v", "trx_seq"))
    GraftSql.register(spark, "catstream_t3", t)
    val ck = Files.createTempDirectory("graft-catstream-part-ck").toString
    val out = Files.createTempDirectory("graft-catstream-part-out").toString + "/sink"
    runOnce("graft.catstream_t3", ck, out)
    val rows = spark.read.parquet(out).select("id", "p", "v")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set((1L, "x", "a1"), (2L, "y", "b1")),
      s"partition column must carry manifest values: $rows")
  }

  test("table-to-table streaming: readStream.table into ContinuousIngest.sink") {
    val srcRoot = Files.createTempDirectory("graft-t2t-src").toString
    val src = new GraftTable(spark, srcRoot, Seq("id"), targetFileBytes = 16 * 1024)
    src.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "t2t_src", src)
    val dst = new GraftTable(spark,
      Files.createTempDirectory("graft-t2t-dst").toString, Seq("id"),
      targetFileBytes = 16 * 1024)
    val ck = Files.createTempDirectory("graft-t2t-ck").toString

    def chainOnce(): Unit = {
      val q = graft.streaming.ContinuousIngest.sink(
        spark.readStream.table("graft.t2t_src"), dst, ck)
      assert(q.awaitTermination(120000))
    }
    chainOnce()
    assert(dst.readUser().select("id", "v").as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b")))

    // upstream moves; the chain resumes from its checkpoint and the
    // downstream converges through the idempotent latest-wins upsert
    src.upsert(Seq((2L, "b2", "002"), (3L, "c", "002")).toDF("id", "v", "trx_seq"))
    chainOnce()
    assert(dst.readUser().select("id", "v").as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // replaying the same chain again changes nothing (exactly-once)
    val seqBefore = dst.latestCommit().get.seq
    chainOnce()
    assert(dst.readUser().count() == 3)
    assert(dst.latestCommit().get.seq == seqBefore, "idle chain must not commit")
  }

  test("startingVersion: fresh stream delivers exactly the post-N changes") {
    val root = Files.createTempDirectory("graft-catstream-sv").toString
    // MOR: incremental batches are the delta LOGS — change-exact, so the
    // delivered sets can be asserted literally (COW would re-deliver
    // rewritten files' untouched keys, the documented at-least-once)
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024,
      tableType = GraftTable.MergeOnRead)
    t.bulkInsert(Seq((1L, "a", "001"), (2L, "b", "001")).toDF("id", "v", "trx_seq"))
    val seqAfterLoad = t.latestCommit().get.seq
    t.upsert(Seq((3L, "c", "002")).toDF("id", "v", "trx_seq"))
    val seqAfterC = t.latestCommit().get.seq
    t.upsert(Seq((2L, "b2", "003"), (4L, "d", "003")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catstream_sv", t)
    def drainFrom(sv: String): Set[(Long, String)] = {
      val ck = Files.createTempDirectory("graft-catstream-sv-ck").toString
      val out = Files.createTempDirectory("graft-catstream-sv-out").toString + "/sink"
      val q = spark.readStream.option("startingVersion", sv)
        .table("graft.catstream_sv")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      sunk(out)
    }
    // after the baseline: no snapshot — only the two upserts' rows
    assert(drainFrom(seqAfterLoad.toString) ==
      Set((3L, "c"), (2L, "b2"), (4L, "d")),
      "post-baseline start must skip the snapshot")
    // mid-timeline: only the last commit
    assert(drainFrom(seqAfterC.toString) == Set((2L, "b2"), (4L, "d")))
    // latest: nothing until a NEW commit lands, then exactly that commit
    val ck = Files.createTempDirectory("graft-catstream-svl-ck").toString
    val out = Files.createTempDirectory("graft-catstream-svl-out").toString + "/sink"
    def drainLatest(): Unit = {
      val q = spark.readStream.option("startingVersion", "latest")
        .table("graft.catstream_sv")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000))
    }
    drainLatest()
    assert(!Files.exists(java.nio.file.Paths.get(out)) || sunk(out).isEmpty,
      "latest must deliver nothing already committed")
    t.upsert(Seq((5L, "e", "004")).toDF("id", "v", "trx_seq"))
    drainLatest() // same checkpoint: resumes from the pinned offset
    assert(sunk(out) == Set((5L, "e")))
    // a garbage startingVersion fails loudly at stream construction
    val bad = intercept[Exception] {
      val q = spark.readStream.option("startingVersion", "not-a-seq")
        .table("graft.catstream_sv")
        .writeStream.format("parquet")
        .option("path", Files.createTempDirectory("graft-sv-bad").toString + "/x")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sv-bad-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000)); q.stop()
    }
    assert(bad.getMessage != null)
  }

  test("writeStream.toTable: staged epochs upsert, checkpoint resumes exactly-once") {
    val srcRoot = Files.createTempDirectory("graft-catsink-src").toString
    val root = Files.createTempDirectory("graft-catsink").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catsink_t1", t)
    val ck = Files.createTempDirectory("graft-catsink-ck").toString
    def feed(rows: (Long, String, String)*): Unit =
      rows.toDF("id", "v", "trx_seq").write.mode("append").parquet(srcRoot)
    def drain(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v STRING, trx_seq STRING").parquet(srcRoot)
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .toTable("graft.catsink_t1")
      assert(q.awaitTermination(120000), "sink stream did not drain in time")
    }
    // first drain: new key + an update of an existing key — latest wins
    feed((2L, "b", "002"), (1L, "a2", "002"))
    drain()
    def state: Map[Long, String] = spark.table("graft.catsink_t1")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "a2", 2L -> "b"), s"epoch upsert: $state")
    // checkpoint resume: only the NEW file feeds; the old epoch is not
    // re-applied (and would be absorbed by latest-wins if it were)
    feed((3L, "c", "003"))
    drain()
    assert(state == Map(1L -> "a2", 2L -> "b", 3L -> "c"), s"resume: $state")
    // idle resume: no rows, no commit churn
    val seqBefore = t.latestCommit().get.seq
    drain()
    assert(t.latestCommit().get.seq == seqBefore,
      "an empty epoch must not commit")
    // the staging area cleans up after every committed epoch — no row
    // files AND no leftover per-query directory chain
    val stage = java.nio.file.Paths.get(root, "_graft", "stream_stage")
    assert(!Files.exists(stage) || scala.util.Using.resource(
        Files.walk(stage))(_.filter(Files.isRegularFile(_)).count()) == 0L,
      "no staged row files may survive a committed epoch")
    assert(!Files.exists(stage) || scala.util.Using.resource(
        Files.list(stage))(_.count()) == 0L,
      "finished queries must not leave per-query stage directories behind")
  }

  test("streaming sink interleaves with batch writers under the table lock") {
    // the sink's per-epoch commit is the SAME locked upsert as any batch
    // writer — interleaving the two must land on the precombine order
    // (trx_seq), not on arrival order
    val srcRoot = Files.createTempDirectory("graft-catsink-mix-src").toString
    val root = Files.createTempDirectory("graft-catsink-mix").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "base", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catsink_mix", t)
    val ck = Files.createTempDirectory("graft-catsink-mix-ck").toString
    def feed(rows: (Long, String, String)*): Unit =
      rows.toDF("id", "v", "trx_seq").write.mode("append").parquet(srcRoot)
    def drain(): Unit = {
      val q = spark.readStream
        .schema("id LONG, v STRING, trx_seq STRING").parquet(srcRoot)
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).toTable("graft.catsink_mix")
      assert(q.awaitTermination(120000))
    }
    feed((2L, "s1", "010"))
    drain()
    t.upsert(Seq((2L, "b1", "005"), (3L, "b2", "011")).toDF("id", "v", "trx_seq"))
    feed((3L, "s2", "007"), (4L, "s3", "012"))
    drain()
    val state = spark.table("graft.catsink_mix")
      .select("id", "v").as[(Long, String)].collect().toMap
    // key 2: stream's 010 beats the later-arriving batch 005;
    // key 3: batch 011 beats the later-arriving stream 007
    assert(state == Map(1L -> "base", 2L -> "s1", 3L -> "b2", 4L -> "s3"),
      s"precombine order must win over arrival order: $state")
  }

  test("writeStream.toTable into a partitioned table lands hive-partitioned") {
    val srcRoot = Files.createTempDirectory("graft-catsink-part-src").toString + "/zone"
    Seq((1L, "a", "x", "001"), (2L, "b", "y", "001"), (3L, "a", "z", "001"))
      .toDF("id", "p", "v", "trx_seq").write.parquet(srcRoot)
    val root = Files.createTempDirectory("graft-catsink-part").toString
    val t = new GraftTable(spark, root, Seq("id"), partitionFields = Seq("p"),
      targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq.empty[(Long, String, String, String)]
      .toDF("id", "p", "v", "trx_seq"))
    GraftSql.register(spark, "catsink_part", t)
    val ck = Files.createTempDirectory("graft-catsink-part-ck").toString
    val q = spark.readStream
      .schema("id LONG, p STRING, v STRING, trx_seq STRING").parquet(srcRoot)
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .toTable("graft.catsink_part")
    assert(q.awaitTermination(120000))
    assert(spark.table("graft.catsink_part").select("id", "p", "v")
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z")))
    // the sink routed through the table's own write path: every file
    // carries its manifest partition value
    assert(t.latestCommit().get.files.nonEmpty &&
      t.latestCommit().get.files.forall(_.partition.contains("p")),
      "streamed rows must land under the table's hive partition layout")
  }

  test("complete-mode epoch with zero rows overwrites the table to empty") {
    // the contract: under truncate (outputMode complete), the table must
    // equal THIS epoch's result — an empty result empties the table
    // rather than keeping the prior epoch's rows
    val root = Files.createTempDirectory("graft-sink-complete").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "stale", "001")).toDF("id", "v", "trx_seq"))
    val w = new graft.streaming.GraftStreamingWrite(
      t, t.readUser().schema, "q-complete-test", overwrite = true)
    w.commit(0L, Array.empty)
    assert(t.readUser().count() == 0,
      "an empty complete-mode epoch must overwrite to empty")
  }

  test("RowCodec round-trips every supported type through the staging format") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("y", ByteType),
      StructField("s", ShortType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("str", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("ntz", TimestampNTZType),
      StructField("dec", DecimalType(18, 4)),
      StructField("arr", ArrayType(LongType)),
      StructField("sarr", ArrayType(StringType))))
    val rows = Seq(
      Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, "héllo ﬀ𝄞",
        Array[Byte](0, 1, -1, 127), java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-02-29 23:59:59.123456"),
        java.time.LocalDateTime.of(2024, 2, 29, 12, 0, 0, 987654000),
        new java.math.BigDecimal("12345.6789"),
        Seq(1L, null, 3L), Seq("a", null, "")),
      Row(null, null, null, null, null, null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val internals = df.queryExecution.toRdd.map(_.copy()).collect()
    val file = Files.createTempDirectory("graft-rowcodec").resolve("r.bin")
    val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(file))
    internals.foreach(r => graft.streaming.RowCodec.write(out, r, schema))
    out.close()
    val back = graft.streaming.RowCodec.readAll(file, schema).toSeq
    assert(back.length == 2)
    val re = spark.createDataFrame(spark.sparkContext.parallelize(back), schema)
    assert(re.exceptAll(df).count() == 0 && df.exceptAll(re).count() == 0,
      "staged rows must round-trip value-exactly, nulls and temporals included")
    // unsupported LEAF types are still rejected loudly, anywhere in the
    // nesting (round-13: struct/map themselves are now supported)
    intercept[IllegalArgumentException](graft.streaming.RowCodec.validate(
      StructType(Seq(StructField("st", StructType(Seq(
        StructField("x", CalendarIntervalType))))))))
    intercept[IllegalArgumentException](graft.streaming.RowCodec.validate(
      StructType(Seq(StructField("m", MapType(StringType, NullType))))))
  }

  test("RowCodec round-trips nested STRUCT/MAP/ARRAY with nulls at every level") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inner = StructType(Seq(
      StructField("x", LongType), StructField("s", StringType)))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StructType(Seq(
        StructField("a", LongType),
        StructField("nested", inner),
        StructField("tags", ArrayType(StringType))))),
      StructField("m", MapType(StringType, LongType)),
      StructField("deep", MapType(StringType, StructType(Seq(
        StructField("v", DoubleType))))),
      StructField("aos", ArrayType(inner)),
      StructField("aoa", ArrayType(ArrayType(LongType)))))
    graft.streaming.RowCodec.validate(schema)
    val rows = Seq(
      // fully populated
      Row(1L,
        Row(10L, Row(7L, "in"), Seq("t1", "t2")),
        Map("k1" -> 1L, "k2" -> 2L),
        Map("d" -> Row(2.5)),
        Seq(Row(1L, "a"), Row(2L, "b")),
        Seq(Seq(1L, 2L), Seq(3L))),
      // nulls at every nesting level: null struct field, null nested
      // struct, null array element, null map value, null inner leaf
      Row(2L,
        Row(null, null, Seq("only", null)),
        Map("k" -> null),
        Map("d2" -> Row(null)),
        Seq(null, Row(null, null)),
        Seq(null, Seq(null, 9L))),
      // whole containers null
      Row(3L, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val internals = df.queryExecution.toRdd.map(_.copy()).collect()
    val file = Files.createTempDirectory("graft-rowcodec-nested").resolve("r.bin")
    val out = new java.io.DataOutputStream(java.nio.file.Files.newOutputStream(file))
    internals.foreach(r => graft.streaming.RowCodec.write(out, r, schema))
    out.close()
    val back = graft.streaming.RowCodec.readAll(file, schema).toSeq
    assert(back.length == 3)
    val re = spark.createDataFrame(spark.sparkContext.parallelize(back), schema)
    // set ops refuse MAP columns — canonicalize maps to sorted entry arrays
    import org.apache.spark.sql.functions.{col, map_entries, sort_array}
    def canon(d: org.apache.spark.sql.DataFrame) = d.select(col("id"), col("st"),
      sort_array(map_entries(col("m"))).as("m"),
      sort_array(map_entries(col("deep"))).as("deep"),
      col("aos"), col("aoa"))
    assert(canon(re).exceptAll(canon(df)).count() == 0 &&
      canon(df).exceptAll(canon(re)).count() == 0,
      "nested rows must round-trip value-exactly, nulls at every level included")
  }

  test("writeStream.toTable matches the foreachBatch sink's final state") {
    // the graded contract: the DSv2 sink reaches the SAME final table
    // state as ContinuousIngest.sink over the same stream
    val srcRoot = Files.createTempDirectory("graft-catsink2-src").toString + "/zone"
    Seq((1L, "x", "001"), (2L, "y", "001"), (2L, "y2", "002"))
      .toDF("id", "v", "trx_seq").write.parquet(srcRoot)
    def drainInto(name: String, viaTable: Boolean): Map[Long, String] = {
      val root = Files.createTempDirectory(s"graft-$name").toString
      val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
      // commit 0 pins the schema — the same empty bulk insert SQL CREATE
      // does, and what toTable needs to resolve the sink schema up front
      t.bulkInsert(Seq.empty[(Long, String, String)].toDF("id", "v", "trx_seq"))
      GraftSql.register(spark, name, t)
      val ck = Files.createTempDirectory(s"graft-$name-ck").toString
      val src = spark.readStream
        .schema("id LONG, v STRING, trx_seq STRING").parquet(srcRoot)
      val q =
        if (viaTable) src.writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).toTable(s"graft.$name")
        else graft.streaming.ContinuousIngest.sink(src, t, ck)
      assert(q.awaitTermination(120000))
      t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    }
    val viaV2 = drainInto("catsink_v2", viaTable = true)
    val viaFeb = drainInto("catsink_feb", viaTable = false)
    assert(viaV2 == viaFeb && viaV2 == Map(1L -> "x", 2L -> "y2"),
      s"DSv2 sink ($viaV2) must equal the foreachBatch sink ($viaFeb)")
  }

  test("column pruning flows into the stream schema") {
    val root = Files.createTempDirectory("graft-catstream-prune").toString
    val t = new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)
    t.bulkInsert(Seq((1L, "a", "001")).toDF("id", "v", "trx_seq"))
    GraftSql.register(spark, "catstream_t4", t)
    val ck = Files.createTempDirectory("graft-catstream-prune-ck").toString
    val q = spark.readStream.table("graft.catstream_t4").select("v")
      .writeStream.format("memory").queryName("catstream_pr")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(spark.table("catstream_pr").columns.toSeq == Seq("v"))
    assert(spark.table("catstream_pr").as[String].collect().toSeq == Seq("a"))
  }
}
