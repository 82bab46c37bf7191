package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based corpus filtering — the GPT-3/LLaMA curation recipe
  * (and fastText's architecture): score every document with a LINEAR
  * model over hashed bag-of-words features, trained against a cheap
  * label. Complements the rule-based C4 filter
  * ([[TextAnalysis.qualityFilterStats]]): real pipelines bootstrap a
  * classifier from heuristic or source-derived labels ("books+wiki vs
  * random crawl") and keep what scores high.
  *
  * The learner is a FULL-BATCH PERCEPTRON on purpose: every quantity —
  * feature counts, weights, scores, updates — is an exact integer, so
  * training and scoring replicate digit-for-digit on any engine (the
  * same reason [[Sampling]] does integer cross-multiplication and
  * [[TextAnalysis.bpeTrain]] counts in integers; a logistic learner's
  * exp/division would drift by libm ulps per round and compound).
  *
  * Scale shape: the feature table is ONE token-census hash aggregate
  * over the corpus (map-side combined — the word-count shape); each
  * round is a broadcast join against the O(dims) weight vector plus two
  * hash aggregates; only the weight vector (dims+1 longs) ever reaches
  * the driver. Training cost is rounds × two shuffles of the feature
  * table — at 100 TB one trains on a sampled slice and scores the full
  * corpus with the final broadcast weights (one scan).
  */
object Classifier {

  /** Token → feature id in [0, dims): the shared portable hash
    * ([[graft.functions.PortableHash.hex4]]) mod dims — NOT JVM
    * hashCode. */
  def featureId(tok: Column, dims: Int): Column =
    graft.functions.PortableHash.hex4(tok) % dims

  /** Hashed SET-of-words features: (doc_id, f, cnt) plus a constant bias
    * feature at id `dims` for EVERY doc (an empty text still scores).
    * `binary = true` (default) records PRESENCE (cnt 1) — the classic
    * text-classifier featurization, and the one that keeps full-batch
    * perceptron steps from being swamped by high-frequency tokens;
    * `binary = false` keeps raw counts. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      dims: Int, binary: Boolean = true): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tk"))
      .filter(col("tk") =!= "")
      .select(col("doc_id"), featureId(col("tk"), dims).as("f"))
    val tokens =
      if (binary) hashed.distinct().withColumn("cnt", lit(1L))
      else hashed.groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
    tokens.unionByName(docs.select(col(idCol).as("doc_id"),
      lit(dims).as("f"), lit(1L).as("cnt")))
  }

  /** Train `rounds` full-batch perceptron rounds against `posLabel`
    * (+1 where true, −1 otherwise) and return every document scored by
    * the final weights: (doc_id, y, score, pred). Prediction is
    * sign(w·x) with score 0 → −1 (the tie rule is part of the
    * contract). Per round: misclassified docs contribute y·cnt to each
    * of their features' weights — order-independent integer sums, so
    * the trained model is deterministic. */
  def perceptronScores(docs: DataFrame, idCol: String, textCol: String,
      posLabel: Column, dims: Int = 512, rounds: Int = 4,
      binary: Boolean = true): DataFrame = {
    val labels = docs.select(col(idCol).as("doc_id"),
      when(posLabel, 1).otherwise(-1).as("y"))
    val w = perceptronWeights(docs, idCol, textCol, posLabel, dims, rounds, binary)
    // The returned plan scores through a FRESH (uncached) feature
    // subtree, deliberately: the persisted table above exists to
    // amortize the 2·rounds scans of the training loop and is released
    // here; the output pass pays ONE more codegen'd feature-hash scan
    // when the caller acts. The alternatives are both worse at scale —
    // keeping the cache pinned leaks corpus-sized executor storage past
    // the call, and an eager localCheckpoint materializes a row per
    // document at call time AND trades lineage recovery for pinned
    // blocks. Lazy + recompute keeps the result a plain Catalyst plan
    // (prunable, pushdown-friendly); callers that will act repeatedly
    // can cache it themselves.
    scorePlan(hashedFeatures(docs, idCol, textCol, dims, binary), w.toSeq)
      .join(labels, "doc_id")
      .select(col("doc_id"), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
  }

  /** The training loop alone: `rounds` full-batch perceptron rounds,
    * returning the dims+1 weight vector (bias last). Factored out so a
    * TRAINED MODEL can outlive the call — [[IncrementalClassifier]]
    * freezes these weights in its state's timeline and scores later
    * document waves without retraining. Deterministic (integer sums). */
  def perceptronWeights(docs: DataFrame, idCol: String, textCol: String,
      posLabel: Column, dims: Int = 512, rounds: Int = 4,
      binary: Boolean = true): Array[Long] = {
    val feats = hashedFeatures(docs, idCol, textCol, dims, binary)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = docs.select(col(idCol).as("doc_id"),
      when(posLabel, 1).otherwise(-1).as("y"))
    val w = Array.fill(dims + 1)(0L)
    for (_ <- 1 to rounds) {
      val mis = scorePlan(feats, w.toSeq).join(labels, "doc_id")
        .filter(when(col("score") > 0, 1).otherwise(-1) =!= col("y"))
        .select("doc_id", "y")
      feats.join(mis, "doc_id")
        .groupBy("f").agg(sum(col("cnt") * col("y")).as("d"))
        .collect()
        .foreach(r => w(r.getInt(0)) += r.getLong(1))
    }
    // the cache amortized the 2·rounds training scans; release it — the
    // caller's scoring pass re-derives features as a plain Catalyst plan
    feats.unpersist(blocking = false)
    w
  }

  /** The one scoring plan every perceptron pass runs — training rounds
    * and the final output both come through here, so the plan-shape
    * contract (the O(dims) weight vector BROADCASTS onto the feature
    * table; the corpus is never nested-looped) is auditable on the
    * exact constructor the algorithm uses. */
  private[graft] def scorePlan(feats: DataFrame, w: Seq[Long]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val weightDf = w.zipWithIndex.map { case (v, i) => (i, v) }.toDF("f", "w")
    feats.join(broadcast(weightDf), "f")
      .groupBy("doc_id").agg(sum(col("cnt") * col("w")).as("score"))
  }
}
