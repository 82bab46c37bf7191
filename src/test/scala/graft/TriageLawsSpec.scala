package graft

import java.nio.file.Files
import org.apache.spark.sql.{Column, sources => sf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftTable

/** SOUNDNESS LAW for the catalog manifest triage: for ANY conjunction of
  * source filters, the triaged scan plus the residual predicate must
  * equal the untriaged scan plus the same predicate — a file may only
  * ever be skipped when no matching row can live in it. Driven by a
  * seeded random predicate generator over key / stats / bloom /
  * partition columns, against COW, partitioned and MOR-with-logs
  * fixtures (the three soundness regimes). A single missing row here is
  * the worst bug the engine can have (silently wrong SQL results), so
  * this law gets fuzz coverage, not just the hand-picked spec cases.
  */
class TriageLawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-triage-$tag").toString

  /** (filters, residual) pairs the generator can emit. */
  private def predicates(rnd: scala.util.Random): (Seq[sf.Filter], Column) = {
    def keyVal(): Long = rnd.nextLong(4200) - 100 // includes misses + negatives
    def scoreVal(): Long = rnd.nextLong(13000) - 500
    val choices: Seq[() => (sf.Filter, Column)] = Seq(
      () => { val v = keyVal(); (sf.EqualTo("id", v), col("id") === v) },
      () => {
        val vs = Array.fill(rnd.nextInt(4) + 1)(keyVal())
        (sf.In("id", vs.map(_.asInstanceOf[Any])), col("id").isin(vs.toIndexedSeq: _*))
      },
      () => { val v = keyVal(); (sf.GreaterThan("id", v), col("id") > v) },
      () => { val v = keyVal(); (sf.LessThanOrEqual("id", v), col("id") <= v) },
      () => { val v = scoreVal(); (sf.GreaterThanOrEqual("score", v), col("score") >= v) },
      () => { val v = scoreVal(); (sf.LessThan("score", v), col("score") < v) },
      () => { val v = scoreVal(); (sf.EqualTo("score", v), col("score") === v) },
      () => {
        val v = s"p${rnd.nextInt(5)}" // sometimes a missing partition
        (sf.EqualTo("part", v), col("part") === v)
      },
      () => {
        val v = s"t${rnd.nextInt(4000) + 1}" // bloom column probe
        (sf.EqualTo("tag", v), col("tag") === v)
      })
    val n = rnd.nextInt(3) + 1
    val picked = Seq.fill(n)(choices(rnd.nextInt(choices.size))())
    (picked.map(_._1), picked.map(_._2).reduce(_ && _))
  }

  private def law(t: GraftTable, rounds: Int, seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = t.readUser().cache()
    try {
      (1 to rounds).foreach { i =>
        val (filters, residual) = predicates(rnd)
        val pruned = t.readUserPruned(filters)
        val got = pruned.df.filter(residual)
          .orderBy("id").collect().map(_.toString).toSeq
        val want = base.filter(residual)
          .orderBy("id").collect().map(_.toString).toSeq
        assert(got == want,
          s"round $i: triage dropped/added rows for $filters " +
            s"(admitted ${pruned.admittedFiles}/${pruned.totalFiles}); " +
            s"got ${got.size} rows, want ${want.size}")
      }
    } finally { base.unpersist(); () }
  }

  test("COW with stats + blooms: triaged == untriaged under random conjunctions") {
    val t = new GraftTable(spark, tmp("cow"), Seq("id"),
      targetFileBytes = 8 * 1024, statsColumns = Seq("score"),
      keyBlooms = true, bloomColumns = Seq("tag"))
    t.bulkInsert(spark.range(1, 4001).selectExpr(
      "id", "id * 3 AS score", "concat('t', id) AS tag",
      "concat('p', id % 3) AS part", "'001' AS trx_seq"))
    assert(t.latestCommit().get.files.size >= 4)
    law(t, rounds = 40, seed = 11L)
  }

  test("partitioned non-global: triaged == untriaged under random conjunctions") {
    val t = new GraftTable(spark, tmp("part"), Seq("id"),
      partitionFields = Seq("part"), globalIndex = false,
      targetFileBytes = 8 * 1024, statsColumns = Seq("score"))
    t.bulkInsert(spark.range(1, 3001).selectExpr(
      "id", "id * 3 AS score", "concat('t', id) AS tag",
      "concat('p', id % 3) AS part", "'001' AS trx_seq"))
    law(t, rounds = 30, seed = 12L)
  }

  test("MOR with outstanding logs: triaged == untriaged (key triage only)") {
    val t = new GraftTable(spark, tmp("mor"), Seq("id"),
      targetFileBytes = 8 * 1024, statsColumns = Seq("score"),
      tableType = GraftTable.MergeOnRead)
    t.bulkInsert(spark.range(1, 3001).selectExpr(
      "id", "id * 3 AS score", "concat('t', id) AS tag",
      "concat('p', id % 3) AS part", "'001' AS trx_seq"))
    // delta logs: moved score values + a re-tag, so stats-based pruning
    // over base files would be UNSOUND — the law proves it stands down
    t.upsert(spark.range(1, 101).selectExpr(
      "id", "id AS score", "concat('t', id + 5000) AS tag",
      "concat('p', id % 3) AS part", "'002' AS trx_seq"))
    assert(t.latestCommit().get.logFiles.nonEmpty)
    law(t, rounds = 30, seed = 13L)
  }
}
