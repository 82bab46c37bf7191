package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable
import graft.streaming.ContinuousIngest

class MorStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("MOR: delta commits append logs, merged read resolves latest-wins + deletes") {
    val t = new GraftTable(spark, tmp("mor"), Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    t.bulkInsert(Seq((1L, "a", "010", false), (2L, "b", "010", false), (3L, "c", "010", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    val c1 = t.upsert(Seq((1L, "a2", "020", false), (4L, "d", "021", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(c1.action == "delta_commit")
    assert(c1.logFiles.nonEmpty && c1.files.nonEmpty)
    val c2 = t.upsert(Seq((2L, "b", "030", true), (1L, "a-stale", "015", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(c2.action == "delta_commit")
    assert(c2.logFiles.size > c1.logFiles.size) // logs accumulate, base untouched
    assert(c2.files.map(_.path) == c1.files.map(_.path))
    val got = t.readUser().select("id", "v").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
  }

  test("MOR: compaction folds logs into base; snapshot unchanged; schema evolves via log") {
    val t = new GraftTable(spark, tmp("mor-c"), Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead)
    t.bulkInsert(Seq((1L, "a", "010", false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    t.upsert(Seq((2L, "b", "extra", "020", false)).toDF("id", "v", "v2", "trx_seq", Meta.Deleted))
    val before = t.readUser().select("id", "v", "v2")
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(before == Seq((1L, "a", None), (2L, "b", Some("extra"))))
    val cc = t.compact()
    assert(cc.action == "compact" && cc.logFiles.isEmpty)
    val after = t.readUser().select("id", "v", "v2")
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(after == before)
  }

  test("MOR: inline compaction triggers every N delta commits") {
    val t = new GraftTable(spark, tmp("mor-i"), Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead, compactEvery = 2)
    t.bulkInsert(Seq((1L, "a", "010", false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    t.upsert(Seq((1L, "a2", "020", false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    val c = t.upsert(Seq((1L, "a3", "030", false)).toDF("id", "v", "trx_seq", Meta.Deleted))
    assert(c.action == "compact") // 2nd delta commit triggered inline compaction
    assert(c.logFiles.isEmpty)
    assert(t.readUser().select("v").as[String].head() == "a3")
  }

  test("streaming: AvailableNow drains new raw files into the table via foreachBatch") {
    val raw = tmp("stream-raw")
    val ck = tmp("stream-ck")
    val t = new GraftTable(spark, tmp("stream-table"), Seq("id"),
      targetFileBytes = 16 * 1024)
    Seq((1L, "a", "010", false), (2L, "b", "010", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.mode("append").parquet(raw)
    ContinuousIngest.drain(spark, raw, t, ck)
    assert(t.readUser().count() == 2)
    val seqAfterFirst = t.latestCommit().get.seq

    // second drain with nothing new: stream checkpoint yields no batch
    ContinuousIngest.drain(spark, raw, t, ck)
    assert(t.latestCommit().get.seq == seqAfterFirst)

    // drop an update + a delete, drain again → merged
    Seq((1L, "a2", "020", false), (2L, "b", "021", true))
      .toDF("id", "v", "trx_seq", Meta.Deleted)
      .coalesce(1).write.mode("append").parquet(raw)
    ContinuousIngest.drain(spark, raw, t, ck)
    val got = t.readUser().select("id", "v").as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "a2")))
  }

  test("size-based compaction triggers when log bytes cross the base-bytes ratio") {
    val t = new GraftTable(spark, tmp("morsz"), Seq("id"),
      targetFileBytes = 16 * 1024, tableType = GraftTable.MergeOnRead,
      compactLogBytesRatio = 0.5)
    t.bulkInsert((1L to 200L).map(i => (i, s"v$i", "010", false))
      .toDF("id", "v", "trx_seq", Meta.Deleted))
    val baseBytes = t.latestCommit().get.files.map(_.bytes).sum
    // append small deltas until their cumulative bytes exceed half the base
    var compacted = false
    var i = 0
    while (!compacted && i < 40) {
      i += 1
      val c = t.upsert(Seq((i.toLong, s"u$i", f"${100 + i}%03d", false))
        .toDF("id", "v", "trx_seq", Meta.Deleted))
      compacted = c.action == "compact"
      if (!compacted)
        assert(c.logFiles.map(_.bytes).sum <= 0.5 * baseBytes + 16 * 1024,
          "logs grew far past the ratio without compacting")
    }
    assert(compacted, s"no compaction in $i delta commits")
    assert(t.latestCommit().get.logFiles.isEmpty)
    // the merged result survived the automatic fold: every upserted key
    // carries its update, untouched keys keep the bulk-insert value
    val got = t.readUser().select("id", "v").as[(Long, String)].collect().toMap
    (1 to i).foreach(k => assert(got(k.toLong) == s"u$k", s"key $k"))
    assert(got(200L) == "v200")
  }

  test("live ProcessingTime loop commits batches incrementally and matches the batch result") {
    val t = graft.queries.CdcScenario.continuousLive(spark, "/root/testdata/sf0.001")
    // three incremental commits: bulk load + two upserts
    assert(t.history().map(_.action) == Seq("bulk_insert", "upsert", "upsert"))
    val batch = graft.queries.CdcScenario.main(spark, "/root/testdata/sf0.001")
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.select($"o_orderkey", $"o_orderstatus",
        $"o_totalprice".cast("decimal(18,2)")).as[(Long, String, BigDecimal)]
        .collect().sortBy(_._1).toSeq
    assert(key(t.readUser()) == key(batch.readUser()))
  }
}
