package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Meta
import graft.operators.GraftTable
import graft.llm.{Dedup, IncrementalDedup}

/** Shared fixture for the incremental-dedup suites. The original single
  * suite was the test run's longest (≈11 min serial); it is split into
  * [[IncrementalDedupSpec]] (wave parity), [[IncrementalDedupLayoutSpec]]
  * (state layouts / engine-choice parity) and
  * [[IncrementalDedupLifecycleSpec]] (lifecycle + concurrency) so the
  * parallel test groups can spread it across JVMs. */
trait IncrementalDedupSpecBase extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  protected def tmp(): String =
    Files.createTempDirectory("graft-idd").toString

  protected def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  protected val P = IncrementalDedup.Params()

  /** w-word running sentence: "w<a> w<a+1> ... w<b>". Two sentences
    * overlapping by k words share k-2 trigram shingles. */
  protected def sent(a: Int, b: Int): String = (a to b).map(i => s"w$i").mkString(" ")

  protected def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "text")
  }

  /** Full-state parity: every live doc labeled, label = batch comp for
    * clustered docs, own id for singletons; stored thash/n_sh exact. */
  protected def assertParity(src: GraftTable, state: GraftTable, clue: String): Unit = {
    val s = spark
    import s.implicits._
    val corpus = src.readUser().select(col("id"), col("text"))
    val batch = Dedup.minhashComponents(corpus, "id", "text",
        P.threshold, P.bands, P.rows, P.maxBandFreq)
      .as[(Long, Long)].collect().toMap
    val expected = corpus.select(col("id")).as[Long].collect().sorted
      .map(id => (id, batch.getOrElse(id, id))).toSeq
    val got = state.readUser().select(col("id"), col("comp"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected, s"$clue: state labels != batch recompute")
    // signature-store integrity: the FULL stored (thash, n_sh) tuples
    // must match a recompute — a corrupted thash or shingle count would
    // silently break future waves' glue and size-bound pruning (the
    // round-15 verdict found the previous id-only compare was a no-op)
    val sigGot = state.readUser().select(col("id"), col("thash"), col("n_sh"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val sigExp = IncrementalDedup.signaturesOf(corpus, "id", "text")
      .select(col("id"), col("thash"), col("n_sh"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(sigGot == sigExp, s"$clue: stored (thash, n_sh) != recompute")
  }
}
