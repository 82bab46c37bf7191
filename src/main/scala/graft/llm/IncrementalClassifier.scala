package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraftTable

/** Incrementally-maintained classifier SCORES — the curation-gate view
  * (round-18 stretch): a crawl-drop pipeline gates documents through a
  * quality classifier ([[Classifier]], the GPT-3/LLaMA recipe), and a
  * per-drop rerun re-scored the WHOLE corpus. This view keeps the
  * per-document (y, score, pred) table current from the source's
  * change feed instead: each wave scores ONLY the changed documents
  * through the stored weight vector (one broadcast join over the
  * wave's features — work ∝ delta) and retracts deleted ones.
  *
  * TRAINING STAYS FULL-BATCH AND FROZEN AT BOOTSTRAP, deliberately.
  * A perceptron's weights depend on every training document through
  * the round structure — an incremental retrain is not
  * delta-decomposable (a single flipped document can reroute every
  * subsequent round), so "incremental training" would be a silent
  * approximation. The honest contract, stated in the spec: scores are
  * EXACT under the bootstrap-trained model (digit-identical to batch
  * re-scoring the final corpus with those weights); refreshing the
  * MODEL is an explicit full retrain ([[retrain]] — re-stamps the
  * weights and re-scores the corpus in one commit). This mirrors how
  * production curation actually deploys classifiers: train once on a
  * labeled slice, score every drop, retrain on cadence.
  *
  * State table: keyed by `id`, columns (id, y, score, pred); the
  * weight vector (dims+1 longs, a few KB) rides the state's own
  * timeline in the spec metadata, so any session can refresh from the
  * table alone.
  */
object IncrementalClassifier {
  val SrcRootKey = "cls_src_root"
  val IdColKey = "cls_id_col"
  val TextColKey = "cls_text_col"
  val PosLabelKey = "cls_pos_label_sql"
  val DimsKey = "cls_dims"
  val BinaryKey = "cls_binary"
  val WeightsKey = "cls_weights"
  val AppliedSeqKey = "cls_applied_seq"

  private val StateCols = Seq("id", "y", "score", "pred")

  def appliedSeq(state: GraftTable): Option[Long] =
    state.historyNewestFirst()
      .flatMap(_.extra.get(AppliedSeqKey)).map(_.toLong).nextOption()

  private[graft] def specOf(state: GraftTable): Option[Map[String, String]] =
    state.historyNewestFirst().find(_.extra.contains(SrcRootKey)).map(_.extra)

  private def weightsOf(spec: Map[String, String]): Array[Long] =
    spec(WeightsKey).split(",").map(_.toLong)

  private def specMeta(srcRoot: String, idCol: String, textCol: String,
      posLabelSql: String, dims: Int, binary: Boolean,
      w: Array[Long]): Map[String, String] =
    Map(SrcRootKey -> srcRoot, IdColKey -> idCol, TextColKey -> textCol,
      PosLabelKey -> posLabelSql, DimsKey -> dims.toString,
      BinaryKey -> binary.toString, WeightsKey -> w.mkString(","))

  /** Same id contract as the sibling incremental views
    * ([[IncrementalDedup]], [[IncrementalSpanCensus]],
    * [[IncrementalSegmentDedup]]): the state is keyed by a LONG id, so
    * a null (or negative) id after the cast would silently become a
    * null record key at bootstrap and in every wave. Fail loudly. */
  private def requireValidIds(ids: DataFrame, where: String): Unit =
    if (ids.filter(col("id").isNull || col("id") < 0).limit(1).count() > 0)
      throw new IllegalStateException(
        s"null or negative document id in $where: the classifier state is " +
          "keyed by a non-negative LONG id — filter or remap ids first")

  /** Scored rows of `docs` under frozen weights `w` — the one scoring
    * plan bootstrap, waves and retrain all share (broadcast O(dims)
    * weight join; the documents never nested-loop). */
  private def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      posLabelSql: String, dims: Int, binary: Boolean,
      w: Array[Long]): DataFrame = {
    val labels = docs.select(col(idCol).cast("long").as("doc_id"),
      when(expr(posLabelSql), 1).otherwise(-1).as("y"))
    Classifier.scorePlan(
      Classifier.hashedFeatures(
        docs.select(col(idCol).cast("long").as("doc_id"), col(textCol)),
        "doc_id", textCol, dims, binary), w.toSeq)
      .join(labels, "doc_id")
      .select(col("doc_id").as("id"), col("y"), col("score"),
        when(col("score") > 0, 1).otherwise(-1).as("pred"))
  }

  /** Create a SELF-DESCRIBING classifier-score view at `location`:
    * train on the source's current snapshot, score it, freeze the
    * weights in the bootstrap commit. `posLabelSql` is a SQL boolean
    * over the source's columns (the cheap-label construction). */
  def create(spark: SparkSession, src: GraftTable, location: String,
      idCol: String, textCol: String, posLabelSql: String,
      dims: Int = 512, rounds: Int = 4, binary: Boolean = true): GraftTable = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      textCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"id/text column names must be plain identifiers: $idCol, $textCol")
    require(!posLabelSql.contains(";"), "label expression may not contain ';'")
    val state = new GraftTable(spark, location, Seq("id"),
      clusterSmallFileBytes = GraftTable.StateClusterSmallFileBytes)
    require(state.history().isEmpty,
      s"$location already holds a committed table — create needs a fresh location")
    val at = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    val docs = src.readAsOf(at)
    requireValidIds(docs.select(col(idCol).cast("long").as("id")),
      "the bootstrap snapshot")
    val w = Classifier.perceptronWeights(docs, idCol, textCol,
      expr(posLabelSql), dims, rounds, binary)
    state.bulkInsert(
      scoreDocs(docs, idCol, textCol, posLabelSql, dims, binary, w),
      extraMeta = specMeta(src.root, idCol, textCol, posLabelSql, dims,
        binary, w) + (AppliedSeqKey -> at.toString))
    src.registerDependentView(state.root)
    state
  }

  /** Catch the view up to its source's head from nothing but the spec
    * in its own timeline (the hands-free `viewMaintain` entry point).
    * Returns (fromSeq, toSeq) applied. */
  def refresh(spark: SparkSession, state: GraftTable): (Long, Long) = {
    val spec = specOf(state).getOrElse(throw new IllegalStateException(
      s"no $SrcRootKey spec in the view's timeline — not a created classifier view"))
    val src = GraftTable.open(spark, spec(SrcRootKey))
    val from = appliedSeq(state).getOrElse(throw new IllegalStateException(
      s"classifier view carries no $AppliedSeqKey watermark — create first"))
    val to = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    if (to < from) throw new IllegalStateException(
      s"source head $to is BELOW the view's applied watermark $from — " +
        "the source was rolled back or restored past the view; " +
        "re-create against the restored corpus")
    if (to > from) maintain(src, state, spec, from, to)
    (from, to)
  }

  /** Apply the `(fromSeq, toSeq]` change feed: score inserted/updated
    * documents through the FROZEN weights, retract deleted ones — one
    * atomic merge commit carrying data + watermark. Work ∝ the wave. */
  private def maintain(src: GraftTable, state: GraftTable,
      spec: Map[String, String], fromSeq: Long, toSeq: Long): Unit = {
    val idCol = spec(IdColKey); val textCol = spec(TextColKey)
    val img = src.changesDiffImages(fromSeq, toSeq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // _after is null only for D rows, _before only for I rows — the
      // coalesce covers every op with one id-column scan of the wave
      requireValidIds(img.select(
        coalesce(col("_after")(idCol), col("_before")(idCol))
          .cast("long").as("id")),
        s"the ($fromSeq, $toSeq] change feed")
      val upserts = img.filter(col("op").isin("I", "U"))
        .select(col("_after").as("_r")).select(col("_r.*"))
      val scored = scoreDocs(upserts, idCol, textCol, spec(PosLabelKey),
        spec(DimsKey).toInt, spec(BinaryKey).toBoolean, weightsOf(spec))
      // retractions ride the same merge with the pred = 0 sentinel
      // (never a real prediction — sign() only emits ±1)
      val removed = img.filter(col("op") === "D")
        .select(col("_before")(idCol).cast("long").as("id"),
          lit(0).as("y"), lit(0L).as("score"), lit(0).as("pred"))
        .join(scored.select(col("id")), Seq("id"), "left_anti")
      state.mergeInto(scored.unionByName(removed),
        whenMatchedSet = StateCols.filter(_ != "id")
          .map(c => c -> col(s"src_$c")).toMap,
        whenMatchedDelete = Some(col("src_pred") === 0),
        insertWhenNotMatched = true,
        insertWhenNotMatchedCond = Some(col("src_pred") =!= 0),
        extraMeta = spec.removed(AppliedSeqKey) +
          (AppliedSeqKey -> toSeq.toString),
        preCommit = Some(() => {
          val cur = appliedSeq(state)
          if (cur != Some(fromSeq)) throw new IllegalStateException(
            s"stale maintenance window ($fromSeq, $toSeq]: the view's " +
              s"applied watermark is ${cur.getOrElse("absent")} — " +
              "re-read the watermark (concurrent refresh?)")
        }))
      ()
    } finally { img.unpersist(blocking = false); () }
  }

  /** Explicit MODEL refresh: retrain on the source's current snapshot,
    * re-score everything, re-stamp the new weights — the scheduled
    * "retrain on cadence" operation, as one overwrite commit. */
  def retrain(spark: SparkSession, state: GraftTable,
      rounds: Int = 4): Long = {
    val spec = specOf(state).getOrElse(throw new IllegalStateException(
      s"no $SrcRootKey spec in the view's timeline — not a created classifier view"))
    val src = GraftTable.open(spark, spec(SrcRootKey))
    val idCol = spec(IdColKey); val textCol = spec(TextColKey)
    val dims = spec(DimsKey).toInt; val binary = spec(BinaryKey).toBoolean
    val at = src.latestCommit().map(_.seq).getOrElse(
      throw new IllegalStateException("source table has no commits"))
    val docs = src.readAsOf(at)
    requireValidIds(docs.select(col(idCol).cast("long").as("id")),
      "the retrain snapshot")
    val w = Classifier.perceptronWeights(docs, idCol, textCol,
      expr(spec(PosLabelKey)), dims, rounds, binary)
    state.insertOverwriteTable(
      scoreDocs(docs, idCol, textCol, spec(PosLabelKey), dims, binary, w),
      extraMeta = specMeta(src.root, idCol, textCol, spec(PosLabelKey),
        dims, binary, w) + (AppliedSeqKey -> at.toString))
    at
  }
}
