package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Classifier, IncrementalClassifier}
import graft.model.Meta
import graft.operators.GraftTable

/** The incremental classifier-score view's contract: scores are EXACT
  * under the bootstrap-frozen model — a wave-maintained view equals
  * batch-scoring the final corpus with the stored weights — deletions
  * retract, training is explicitly NOT incremental (retrain() is the
  * model-refresh operation), and stale windows refuse. */
class IncrementalClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-icls").toString

  private def meta(df: org.apache.spark.sql.DataFrame, seq: Int, del: Boolean) =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(del))

  // planted-signal corpus: %3==0 docs carry the positive markers
  private def corpus(n: Int) = (0L until n.toLong).map { i =>
    val base = s"doc $i body with shared tokens alpha beta gamma"
    val text =
      if (i % 3 == 0) s"$base reviewed cited edited"
      else if (i % 3 == 1) s"$base winner prize click"
      else base
    (i, text)
  }.toDF("id", "text")

  test("wave-maintained scores equal a batch re-score under the frozen model") {
    val src = new GraftTable(spark, tmp(), Seq("id"), targetFileBytes = 64 * 1024)
    val docs0 = corpus(300)
    src.bulkInsert(meta(docs0, 1, del = false))
    val view = IncrementalClassifier.create(spark, src, tmp(),
      "id", "text", "id % 3 = 0", dims = 128, rounds = 3)

    // bootstrap equals the direct batch path (same model, same docs)
    val direct0 = Classifier.perceptronScores(docs0, "id", "text",
      col("id") % 3 === 0, dims = 128, rounds = 3)
      .select(col("doc_id").as("id"), col("y"), col("score"), col("pred"))
      .as[(Long, Int, Long, Int)].collect().toSet
    def viewRows() = view.readUser()
      .select(col("id"), col("y"), col("score"), col("pred"))
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(viewRows() == direct0)

    // wave: rewrite %5 docs, delete %7 docs — refresh applies both
    src.upsert(meta(docs0.filter(col("id") % 5 === 0)
      .withColumn("text", concat(lit("changed "), col("text"))), 2,
      del = false))
    src.upsert(meta(docs0.filter(col("id") % 7 === 0), 3, del = true))
    val (from, to) = IncrementalClassifier.refresh(spark, view)
    assert(from == 0L && to == 2L)

    // expected: FINAL corpus scored through the FROZEN (bootstrap)
    // weights — the spec's exactness contract
    val w = Classifier.perceptronWeights(docs0, "id", "text",
      col("id") % 3 === 0, dims = 128, rounds = 3)
    val finalDocs = docs0.filter(col("id") % 7 =!= 0)
      .withColumn("text", when(col("id") % 5 === 0,
        concat(lit("changed "), col("text"))).otherwise(col("text")))
    val expected = Classifier.scorePlan(
      Classifier.hashedFeatures(
        finalDocs.select(col("id").as("doc_id"), col("text")),
        "doc_id", "text", 128, binary = true), w.toSeq)
      .join(finalDocs.select(col("id").as("doc_id"),
        when(col("id") % 3 === 0, 1).otherwise(-1).as("y")), "doc_id")
      .select(col("doc_id"), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(viewRows() == expected)

    // idempotent: refreshing at head is a no-op window
    val (f2, t2) = IncrementalClassifier.refresh(spark, view)
    assert(f2 == t2)

    // retrain: new model over the CURRENT corpus, everything re-scored
    IncrementalClassifier.retrain(spark, view, rounds = 3)
    val w2 = Classifier.perceptronWeights(finalDocs, "id", "text",
      col("id") % 3 === 0, dims = 128, rounds = 3)
    val retrained = Classifier.scorePlan(
      Classifier.hashedFeatures(
        finalDocs.select(col("id").as("doc_id"), col("text")),
        "doc_id", "text", 128, binary = true), w2.toSeq)
      .join(finalDocs.select(col("id").as("doc_id"),
        when(col("id") % 3 === 0, 1).otherwise(-1).as("y")), "doc_id")
      .select(col("doc_id"), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(viewRows() == retrained)
  }

  test("hands-free: a viewMaintain source refreshes the classifier view; stale window refuses") {
    val src = new GraftTable(spark, tmp(), Seq("id"),
      targetFileBytes = 64 * 1024, viewMaintain = true)
    src.bulkInsert(meta(corpus(60), 1, del = false))
    val view = IncrementalClassifier.create(spark, src, tmp(),
      "id", "text", "id % 3 = 0", dims = 64, rounds = 2)
    src.upsert(meta(Seq((60L, "fresh doc reviewed cited edited"))
      .toDF("id", "text"), 2, del = false))
    assert(IncrementalClassifier.appliedSeq(
      GraftTable.open(spark, view.root)) == Some(1L),
      "the commit's walk must refresh the classifier view hands-free")
    assert(view.readUser().filter(col("id") === 60L).count() == 1)
    // a rolled-back source refuses loudly instead of serving drift
    src.rollback(0L)
    val e = intercept[IllegalStateException](
      IncrementalClassifier.refresh(spark, view))
    assert(e.getMessage.contains("BELOW"))
  }
}
