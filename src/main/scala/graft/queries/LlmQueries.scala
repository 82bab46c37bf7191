package graft.queries

import java.nio.file.Files
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Classifier, Dedup, IncrementalDedup, Multimodal, Sampling, Scrub, Similarity, TextAnalysis}
import graft.model.Meta
import graft.operators.GraftTable

/** CDC-lifecycle fixtures for the INCREMENTAL llm operators: the
  * documents corpus as a keyed table receiving insert / update / delete
  * waves, with the maintained state graded against a DuckDB recompute
  * of the FINAL corpus (the waves are SQL-reconstructible by design:
  * bootstrap = docs with id % 7 != 0; wave 1 inserts the % 7 == 0 docs;
  * wave 2 rewrites every % 13 == 0 doc's text to a unique single token
  * — a zero-shingle singleton, exercising retract-split + rewire; wave
  * 3 deletes every % 11 == 0 doc — splits and label moves). */
object LlmScenario {
  private val cache = TrieMap[String, GraftTable]()

  private def meta(df: DataFrame, seq: Int, deleted: Boolean): DataFrame =
    df.withColumn(Meta.Ordering, lit(f"$seq%020d"))
      .withColumn(Meta.Deleted, lit(deleted))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Q.t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))

  private def waves(s: SparkSession, dir: String, src: GraftTable): Unit = {
    val d = docs(s, dir)
    val id = col("id")
    src.upsert(meta(d.filter(id % 7 === 0), 2, deleted = false))
    src.upsert(meta(d.filter(id % 13 === 0)
      .withColumn("text", concat(lit("uniq"), id.cast("string"))), 3,
      deleted = false))
    src.upsert(meta(d.filter(id % 11 === 0), 4, deleted = true))
  }

  /** Incrementally-maintained MinHash cluster state through the 3-wave
    * CDC lifecycle ([[graft.llm.IncrementalDedup]]): created at the
    * bootstrap corpus, refreshed once per wave — each refresh is
    * delta-proportional (only changed texts re-shingle; partners
    * point-fetch). The graded clusters must equal the recursive-CTE
    * components oracle over the FINAL live corpus. */
  def incrDedup(s: SparkSession, dir: String): GraftTable =
    cache.getOrElseUpdate(s"incrdedup:$dir", {
      val base = Files.createTempDirectory("graft-llm-idd")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      val state = IncrementalDedup.create(s, src, s"$base/state", "id", "text")
      val d = docs(s, dir)
      val id = col("id")
      src.upsert(meta(d.filter(id % 7 === 0), 2, deleted = false))
      IncrementalDedup.refresh(s, state)
      src.upsert(meta(d.filter(id % 13 === 0)
        .withColumn("text", concat(lit("uniq"), id.cast("string"))), 3,
        deleted = false))
      IncrementalDedup.refresh(s, state)
      src.upsert(meta(d.filter(id % 11 === 0), 4, deleted = true))
      IncrementalDedup.refresh(s, state)
      state
    })

  /** Incrementally-maintained CLASSIFIER-SCORE view (round-18): the
    * model trains ONCE at bootstrap (frozen weights — retraining is
    * not delta-decomposable, see [[graft.llm.IncrementalClassifier]]),
    * then each wave scores only its changed documents through the
    * stored weight vector and retracts deletions. Graded against
    * DuckDB training the same perceptron on the ORIGINAL corpus and
    * batch-scoring the SQL-reconstructed FINAL corpus with it. */
  def incrClassifier(s: SparkSession, dir: String): GraftTable =
    cache.getOrElseUpdate(s"incrcls:$dir", {
      val base = Files.createTempDirectory("graft-llm-icls")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      val id = col("id")
      val enriched = docs(s, dir).select(id,
        concat(col("text"),
          when(id % 4 === 0, lit(" reviewed cited edited"))
            .when(id % 4 === 1, lit(" winner prize click"))
            .otherwise(lit(""))).as("text"))
      src.bulkInsert(meta(enriched, 1, deleted = false))
      val state = graft.llm.IncrementalClassifier.create(
        s, src, s"$base/state", "id", "text", "id % 4 = 0")
      // wave 1: %13 docs rewritten — re-scored under the frozen model
      src.upsert(meta(enriched.filter(id % 13 === 0)
        .withColumn("text", concat(lit("upd "), col("text"))), 2,
        deleted = false))
      graft.llm.IncrementalClassifier.refresh(s, state)
      // wave 2: %17 docs deleted — retracted from the score view
      src.upsert(meta(enriched.filter(id % 17 === 0), 3, deleted = true))
      graft.llm.IncrementalClassifier.refresh(s, state)
      state
    })

  /** Incrementally-maintained SEGMENT-DEDUP state through the same
    * 3-wave CDC lifecycle ([[graft.llm.IncrementalSegmentDedup]]): the
    * per-document (n_segs, n_dup_segs, kept_md5) table kept current
    * from the change feed — df boundary crossings rewrite UNCHANGED
    * partner documents through the posting point-reads. */
  def incrSegments(s: SparkSession, dir: String): graft.llm.IncrementalSegmentDedup.State =
    segCache.getOrElseUpdate(s"incrseg:$dir", {
      val base = Files.createTempDirectory("graft-llm-isd")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      val st = graft.llm.IncrementalSegmentDedup.create(
        s, src, s"$base/state", "id", "text")
      val d = docs(s, dir)
      val id = col("id")
      src.upsert(meta(d.filter(id % 7 === 0), 2, deleted = false))
      graft.llm.IncrementalSegmentDedup.refresh(s, st)
      src.upsert(meta(d.filter(id % 13 === 0)
        .withColumn("text", concat(lit("uniq"), id.cast("string"))), 3,
        deleted = false))
      graft.llm.IncrementalSegmentDedup.refresh(s, st)
      src.upsert(meta(d.filter(id % 11 === 0), 4, deleted = true))
      graft.llm.IncrementalSegmentDedup.refresh(s, st)
      st
    })

  private val segCache =
    TrieMap[String, graft.llm.IncrementalSegmentDedup.State]()

  /** Incrementally-maintained duplicated-SPAN census through the same
    * 3-wave CDC lifecycle ([[graft.llm.IncrementalSpanCensus]]): the
    * per-document (n_shingles, n_dup, dup_ratio) table kept current
    * from the change feed — df boundary crossings move UNCHANGED
    * partner documents by pure posting arithmetic (no text re-read). */
  def incrSpans(s: SparkSession, dir: String): graft.llm.IncrementalSpanCensus.State =
    spanCache.getOrElseUpdate(s"incrspan:$dir", {
      val base = Files.createTempDirectory("graft-llm-ispan")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      val st = graft.llm.IncrementalSpanCensus.create(
        s, src, s"$base/state", "id", "text")
      val d = docs(s, dir)
      val id = col("id")
      src.upsert(meta(d.filter(id % 7 === 0), 2, deleted = false))
      graft.llm.IncrementalSpanCensus.refresh(s, st)
      src.upsert(meta(d.filter(id % 13 === 0)
        .withColumn("text", concat(lit("uniq"), id.cast("string"))), 3,
        deleted = false))
      graft.llm.IncrementalSpanCensus.refresh(s, st)
      src.upsert(meta(d.filter(id % 11 === 0), 4, deleted = true))
      graft.llm.IncrementalSpanCensus.refresh(s, st)
      st
    })

  private val spanCache =
    TrieMap[String, graft.llm.IncrementalSpanCensus.State]()

  /** The span-census lifecycle driven from PURE SQL: `CALL
    * create_span_state` bootstraps the three-table state, three CDC
    * waves land on the source, and ONE `CALL refresh_span_state`
    * catches it up across all three windows. */
  def sqlSpanState(s: SparkSession, dir: String): GraftTable =
    cache.getOrElseUpdate(s"sqlspan:$dir", {
      val base = Files.createTempDirectory("graft-llm-sqlspan")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      graft.sql.GraftSql.register(s, "span_src", src)
      s.sql("CALL create_span_state('span_src', 'span_state_v', " +
        s"'$base/state', 'id', 'text')").collect()
      waves(s, dir, src)
      val out = s.sql("CALL refresh_span_state('span_state_v')").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      require(out("from_seq") == "0" && out("to_seq") == "3",
        s"one CALL must catch up all three waves: $out")
      src
    })

  /** The segment-dedup lifecycle driven from PURE SQL: `CALL
    * create_segment_state` bootstraps the three-table state, three CDC
    * waves land on the source, and ONE `CALL refresh_segment_state`
    * catches it up across all three windows. The graded read is plain
    * SQL over the registered output table. */
  /** The classifier-score lifecycle driven from PURE SQL: `CALL
    * create_classifier_view` trains + bootstraps (weights frozen in the
    * view's timeline), two CDC waves land, ONE `CALL
    * refresh_classifier_view` catches up across both windows; the
    * graded read is plain SQL over the registered view. */
  def sqlClassifierState(s: SparkSession, dir: String): Unit = {
    cache.getOrElseUpdate(s"sqlcls:$dir", {
      val base = Files.createTempDirectory("graft-llm-sqlcls")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      val id = col("id")
      val enriched = docs(s, dir).select(id,
        concat(col("text"),
          when(id % 4 === 0, lit(" reviewed cited edited"))
            .when(id % 4 === 1, lit(" winner prize click"))
            .otherwise(lit(""))).as("text"))
      src.bulkInsert(meta(enriched, 1, deleted = false))
      graft.sql.GraftSql.register(s, "cls_src", src)
      s.sql("CALL create_classifier_view('cls_src', 'cls_view_v', " +
        s"'$base/view', 'id', 'text', 'id % 4 = 0')").collect()
      src.upsert(meta(enriched.filter(id % 13 === 0)
        .withColumn("text", concat(lit("upd "), col("text"))), 2,
        deleted = false))
      src.upsert(meta(enriched.filter(id % 17 === 0), 3, deleted = true))
      val out = s.sql("CALL refresh_classifier_view('cls_view_v')").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      require(out("from_seq") == "0" && out("to_seq") == "2",
        s"one CALL must catch up both waves: $out")
      src
    })
    ()
  }

  def sqlSegmentState(s: SparkSession, dir: String): GraftTable =
    cache.getOrElseUpdate(s"sqlseg:$dir", {
      val base = Files.createTempDirectory("graft-llm-sqlseg")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      graft.sql.GraftSql.register(s, "seg_src", src)
      s.sql("CALL create_segment_state('seg_src', 'seg_state_v', " +
        s"'$base/state', 'id', 'text')").collect()
      waves(s, dir, src)
      val out = s.sql("CALL refresh_segment_state('seg_state_v')").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      require(out("from_seq") == "0" && out("to_seq") == "3",
        s"one CALL must catch up all three waves: $out")
      src
    })

  /** The same lifecycle driven from PURE SQL: `CALL create_dedup_state`
    * bootstraps the self-describing state, three CDC waves land on the
    * source, and ONE `CALL refresh_dedup_state` catches it up across
    * all three windows from nothing but its own recorded spec +
    * watermark. The graded read is plain SQL over the state table. */
  def sqlDedupState(s: SparkSession, dir: String): GraftTable =
    cache.getOrElseUpdate(s"sqldedup:$dir", {
      val base = Files.createTempDirectory("graft-llm-sqldedup")
      val src = new GraftTable(s, s"$base/src", Seq("id"),
        targetFileBytes = 256 * 1024)
      src.bulkInsert(meta(docs(s, dir).filter(col("id") % 7 =!= 0), 1,
        deleted = false))
      graft.sql.GraftSql.register(s, "dedup_src", src)
      s.sql("CALL create_dedup_state('dedup_src', 'dedup_state_v', " +
        s"'$base/state', 'id', 'text')").collect()
      waves(s, dir, src)
      val out = s.sql("CALL refresh_dedup_state('dedup_state_v')").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toMap
      require(out("from_seq") == "0" && out("to_seq") == "3",
        s"one CALL must catch up all three waves: $out")
      src
    })
}

/** Graded queries for the LLM-training-data operator families (dedup,
  * similarity search, text analysis, multimodal) over the provisioned
  * `documents` / `embeddings` testdata. Every query carries a DuckDB
  * oracle: exact operators directly; MinHash-LSH against the exact-Jaccard
  * pair set it provably recovers; SimHash and IVF against full SQL
  * replications of their own algorithms; the rolling hash against its
  * collision census. Only `tr3_agg_hll` (approximate by nature) remains
  * rows-only.
  */
object LlmQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    // ---- dedup family
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactStats(t(s, dir, "documents"), "text")),
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5,
        maxDocFreq = Some(100))),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text", threshold = 0.5)),
    // asymmetric containment C(A→B) = |A∩B|/|A| — catches excerpts/subset
    // docs whose Jaccard stays low because the big doc dilutes the union
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, maxDocFreq = Some(100))),
    // maxDist=3 keeps the 4-chunk pigeonhole EXACT (d≤3 ⇒ ≥1 chunk equal,
    // so candidate generation provably misses nothing) — the graded result
    // is the complete Hamming-≤3 pair set, oracle-checked end to end
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3)),
    // the dense-bucket cap's recall loss as a GRADED observable: census
    // of (chunk, value) buckets holding more distinct signatures than a
    // deliberately tiny cap would admit (the corpus-audit a pipeline
    // runs before trusting a capped pair generator)
    "dedup_cap_audit" -> ((s, dir) =>
      Dedup.simhashCapAudit(t(s, dir, "documents"), "doc_id", "text",
        maxChunkFreq = 4)),
    // near-dup GROUPS via the components-oriented API: star edges (one
    // per member of an identical-text group) ∪ rep-level verified pairs
    // feed CC — identical components to the pairs path, edges LINEAR in
    // duplicate-cluster size instead of quadratic
    "dedup_clusters" -> ((s, dir) =>
      Dedup.jaccardComponents(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5, maxDocFreq = Some(100))
        .groupBy(col("comp").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))),
    // same star-edge shape on the MinHash-LSH generator (the crawl-scale
    // path: banded candidates on DISTINCT texts only)
    "dedup_minhash_components" -> ((s, dir) =>
      Dedup.minhashComponents(t(s, dir, "documents"), "doc_id", "text",
          threshold = 0.5)
        .groupBy(col("comp").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))),
    // SimHash flavor of the components API (round-14): identical
    // signatures glue via star edges, distinct signatures via rep-level
    // Hamming-verified pairs — same clusters as the pair graph, linear
    // edges
    "dedup_simhash_components" -> ((s, dir) =>
      Dedup.simhashComponents(t(s, dir, "documents"), "doc_id", "text",
          maxDist = 3)
        .groupBy(col("comp").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))),
    // INCREMENTALLY-MAINTAINED near-dup clusters (round-16): the corpus
    // as a keyed CDC table — bootstrap, insert / text-update / delete
    // waves, one IncrementalDedup refresh per wave — and the maintained
    // components must equal the recursive-CTE oracle over the FINAL
    // live corpus (the same exact-Jaccard components contract as
    // dedup_minhash_components, re-targeted at the post-wave snapshot)
    "dedup_incremental" -> ((s, dir) =>
      IncrementalDedup.clusters(LlmScenario.incrDedup(s, dir))
        .groupBy(col("comp").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))),
    // INCREMENTALLY-MAINTAINED classifier scores (round-18): the
    // curation gate kept current from the change feed — waves score
    // only changed docs through the bootstrap-frozen weights; the
    // maintained view must equal DuckDB's batch score of the FINAL
    // corpus under the same (original-corpus-trained) model
    "text_classifier_incr" -> ((s, dir) =>
      LlmScenario.incrClassifier(s, dir).readUser()
        .select(col("id").as("doc_id"), col("y"), col("score"), col("pred"))),
    // the classifier view managed from PURE SQL (CALL
    // create_classifier_view / refresh_classifier_view) — same
    // frozen-model oracle, read back as a plain SELECT
    "sql_classifier_state" -> ((s, dir) => {
      LlmScenario.sqlClassifierState(s, dir)
      s.sql("""SELECT id AS doc_id, y, score, pred
               FROM graft.cls_view_v""")
    }),
    // INCREMENTALLY-MAINTAINED segment dedup (round-16 stretch,
    // implemented): the per-document segment census/kept-text table
    // maintained from the change feed — df=2 boundary crossings rewrite
    // UNCHANGED partner docs via the posting point-reads — graded
    // against the batch segment-dedup oracle over the final corpus
    "text_segment_dedup_incr" -> ((s, dir) =>
      graft.llm.IncrementalSegmentDedup.output(
        LlmScenario.incrSegments(s, dir))),
    // the SEGMENT state managed from PURE SQL (CALL create_segment_state /
    // refresh_segment_state), read back as a plain SELECT over the
    // registered output table — same final-corpus oracle
    "sql_segment_state" -> ((s, dir) => {
      LlmScenario.sqlSegmentState(s, dir)
      s.sql("""SELECT id, n_segs, n_dup_segs, kept_md5
               FROM graft.seg_state_v""")
    }),
    // the dedup state managed from PURE SQL (CALL create_dedup_state /
    // refresh_dedup_state) and read back as a plain SQL aggregate over
    // the registered state table — same final-corpus oracle
    "sql_dedup_state" -> ((s, dir) => {
      LlmScenario.sqlDedupState(s, dir)
      s.sql("""SELECT comp AS cluster_id, COUNT(*) AS n_docs,
                      concat_ws(',', transform(array_sort(collect_list(id)),
                        x -> CAST(x AS STRING))) AS members
               FROM graft.dedup_state_v
               GROUP BY comp HAVING COUNT(*) >= 2""")
    }),
    // duplicated-passage census: per-doc share of 3-gram shingles whose
    // corpus document frequency >= 2 (the boilerplate/copied-span signal)
    "dedup_spans" -> ((s, dir) =>
      Dedup.duplicatedSpanStats(t(s, dir, "documents"), "doc_id", "text", n = 3)),
    // INCREMENTALLY-MAINTAINED span census (round-17): the same per-doc
    // table kept current from the change feed — the last corpus-
    // quadratic curation step to go incremental. Boundary crossings
    // move UNCHANGED partners by posting arithmetic (no text re-read);
    // graded against the batch census over the final corpus
    "dedup_spans_incr" -> ((s, dir) =>
      graft.llm.IncrementalSpanCensus.output(LlmScenario.incrSpans(s, dir))),
    // the SPAN state managed from PURE SQL (CALL create_span_state /
    // refresh_span_state), read back as a plain SELECT over the
    // registered output table — same final-corpus oracle
    "sql_span_state" -> ((s, dir) => {
      LlmScenario.sqlSpanState(s, dir)
      s.sql("""SELECT id, n_shingles, n_dup, dup_ratio
               FROM graft.span_state_v""")
    }),
    // CCNet-style segment dedup: remove 8-word segments that appear
    // verbatim in >= 2 docs; graded artifact includes the md5 of the
    // RECONSTRUCTED deduped text, proving the transformation itself
    "text_segment_dedup" -> ((s, dir) =>
      TextAnalysis.segmentDedup(t(s, dir, "documents"), "doc_id", "text")),
    // eval-set decontamination: exact-hash anti-join against a held-out corpus
    "dedup_decontaminate" -> ((s, dir) =>
      Dedup.decontaminate(t(s, dir, "documents"), "text", col("source") === "src0")),
    // n-gram overlap decontamination (GPT-3 recipe): flag any train doc
    // sharing a word 3-gram with the eval slice (n=3 keeps the overlap
    // non-vacuous on this corpus; production would use 8-13)
    "dedup_ngram_decontaminate" -> ((s, dir) =>
      Dedup.ngramDecontaminate(t(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", n = 3)),
    // deterministic per-language mixing sample (hash-bucket thresholds /65536)
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedStats(t(s, dir, "documents"), "doc_id", "lang", "n_chars",
        Map("en" -> 58982, "de" -> 39321, "es" -> 26214, "fr" -> 26214,
          "zh" -> 13107))),
    // deterministic train/val/test split by salted content hash —
    // membership is a per-doc invariant (eval stays uncontaminated when
    // the corpus grows); ~90/5/5 cuts out of 65536
    "sample_split" -> ((s, dir) =>
      Sampling.splitCensus(t(s, dir, "documents"), "doc_id", "text",
        Seq(("train", 58982), ("val", 62259), ("test", 65536)))),
    // exact-size uniform sample: k smallest salted hashes (TakeOrdered)
    "sample_uniform" -> ((s, dir) =>
      Sampling.uniformSampleK(t(s, dir, "documents"), "doc_id", k = 100)),
    // per-stratum exact-k: the 25 smallest salted hashes WITHIN each
    // language — one hash shuffle + per-group window, no global sort
    "sample_uniform_per_lang" -> ((s, dir) =>
      Sampling.uniformSampleKPerGroup(t(s, dir, "documents"), "doc_id", "lang",
        k = 25)),
    // weighted Bernoulli sample: keep probability ∝ n_chars (capped at 1),
    // decided in exact integer arithmetic — replicated digit-for-digit
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedStats(t(s, dir, "documents"), "doc_id", "lang",
        "n_chars", unitWeight = 2000L)),
    // contiguous token-budget sharding via the distributed prefix sum
    // (in-partition windows + broadcast offsets — no global window)
    "sample_pack_shards" -> ((s, dir) =>
      Sampling.packShards(t(s, dir, "documents"), "doc_id",
          size(split(col("text"), " ")), budget = 2000L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"),
          min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))),

    // ---- text quality / featurization
    // Gopher-style repetition signals: top-bigram and duplicate-bigram ratios
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")),
    // corpus top-20 vocabulary, deterministically ranked
    "text_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(t(s, dir, "documents"), "text", k = 20)),
    // per-doc top-3 keywords by tf/df (integer-ratio tf-idf)
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", k = 3)),
    // gzipped-JSONL corpus ingestion (the canonical LLM interchange
    // format): the corpus round-trips through Spark's native text-codec
    // path as 4 .json.gz shards; the census only survives exact
    // text/integer round-tripping
    "src_jsonl_gz" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      graft.sources.CdcSource.readJsonl(s, jsonlFixture(s, dir), schema)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          countDistinct(col("text")).as("n_texts"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),
    // BPE tokenizer TRAINING (Sennrich et al.): 8 merge rounds learned
    // from the corpus word census — one corpus pass, then vocabulary-local
    // rounds; the graded artifact is the merge table itself
    "text_bpe_merges" -> ((s, dir) => bpe(s, dir)._1),
    // the token census after applying all 8 learned merges in order —
    // proves the rewrite, not just the statistics
    "text_bpe_tokens" -> ((s, dir) =>
      bpe(s, dir)._2
        .select(explode(split(col("sym"), "  ")).as("token"), col("freq"))
        .groupBy(col("token")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("token").asc).limit(20)),
    // C4-style rule filter: min length + lexical diversity + stopword density
    "text_filter_quality" -> ((s, dir) =>
      TextAnalysis.qualityFilterStats(t(s, dir, "documents"), "lang", "text",
        minTokens = 30, minTtr = 0.4, minStopRatio = 0.03)),
    // THE CURATION PIPELINE END TO END — quality gate → exact dedup →
    // near-dup clustering keep-one → deterministic sample → token-budget
    // packing, one composed job graded against the same chain in SQL
    "llm_curation_e2e" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val qual = docs.filter(TextAnalysis.qualityKeep(col("text"), 30, 0.4, 0.03))
      // localCheckpoint: the quality scan + full-corpus dedup window feed
      // FOUR consumers (connected-components edges, the survivors
      // anti-join, and packShards' bounds + prefix branches) — truncate
      // once instead of recomputing per consumer; the checkpoint is tiny
      // (the filtered doc subset)
      val uniq = qual.withColumn("_rn", row_number().over(
          Window.partitionBy(col("text")).orderBy(col("doc_id"))))
        .filter(col("_rn") === 1).drop("_rn")
        .localCheckpoint()
      val pairs = Dedup.jaccardPairs(uniq, "doc_id", "text",
        threshold = 0.5, maxDocFreq = Some(100))
      val removed = Dedup.connectedComponents(pairs, "ia", "ib")
        .filter(col("id") =!= col("comp"))
      val survivors = uniq.join(removed.select(col("id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      val sampled = survivors.filter(
        Sampling.hashBucket(col("doc_id"), "cur") < 32768)
      Sampling.packShards(sampled, "doc_id",
          size(split(col("text"), " ")), budget = 2000L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"),
          min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
    }),
    // the dedup pipeline end-to-end: pairs -> components -> keep one
    // representative (the min-id label) per cluster
    "dedup_keep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // groups consumer → components API (linear star edges, no member
      // pair expansion)
      val comp = Dedup.jaccardComponents(docs, "doc_id", "text",
        threshold = 0.5, maxDocFreq = Some(100))
      val removed = comp.filter(col("id") =!= col("comp"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(comp.agg(count(lit(1)).as("n_in_clusters")))
        .crossJoin(removed.agg(count(lit(1)).as("n_removed")))
        .select(col("n_docs"), col("n_in_clusters"), col("n_removed"),
          (col("n_docs") - col("n_removed")).as("n_kept"))
    }),

    // ---- similarity search
    "sim_topk_brute" -> ((s, dir) =>
      Similarity.bruteTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5)),
    "sim_topk_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5, nprobe = 2)),
    // TRAINED coarse quantizer: 3 Lloyd k-means rounds (seeded init, exact
    // SQL replication of every iteration in the oracle), final-centroid
    // assignment, probe nprobe cells — the full IVF build+search pipeline
    "sim_topk_ivf_trained" -> ((s, dir) =>
      Similarity.ivfTrainedTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nprobe = 2, kCells = 4, iters = 3)),
    "dedup_cosine" -> ((s, dir) =>
      Similarity.cosineTopPairsBlocked(t(s, dir, "embeddings"), "vec_id", "embedding",
        topN = 20, blocks = 8)),
    // int8 scalar-quantized ranking (faiss SQ8 shape): integer dot
    // products end to end, exact in any engine
    "sim_topk_int8" -> ((s, dir) =>
      Similarity.int8TopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5)),
    // Matryoshka truncation: exact ranking on the first 32 of 64 dims —
    // half the serving bandwidth. Graded on exact replication of the
    // truncated ranking; recall vs the full rank is the embedding's
    // property (these random vectors have no MRL prefix structure)
    "sim_topk_mrl" -> ((s, dir) =>
      Similarity.truncatedTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, dims = 32)),
    // two-stage rerank (faiss refine): int8 shortlist bounds the
    // candidates, exact float cosine reranks only those — the serving
    // pattern where the exact scorer touches |queries|×shortlist rows
    "sim_topk_rerank" -> ((s, dir) =>
      Similarity.int8RerankTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, shortlist = 20)),
    // product quantization (faiss PQ/ADC): 4 per-subspace k-means
    // codebooks, vectors compressed to 4 codes, queries rank by the
    // asymmetric table-lookup distance — full SQL replication including
    // every codebook training round
    "sim_topk_pq" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, m = 4, kCodes = 8, iters = 2)),
    // LSH cosine near-dup ACCURACY CONTRACT (tr3_agg_hll style): the corpus
    // gets deterministic planted near-dups (every 5th vector twinned with
    // its first two coordinates negated — exact float math, replicated
    // digit-for-digit in SQL; planted cosines spread 0.90..0.999). Graded:
    // the exact ≥0.9 pair count (bit-identical on both engines), zero LSH
    // false positives (structural: candidates are exactly re-scored), and
    // recall ≥ 0.95 against the exact set — fixed seed, so the outcome is
    // deterministic, not flaky.
    "dedup_cosine_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val pert = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> IF(i < 2, -x, x))").as("embedding"))
      val corpus = emb.unionByName(pert)
      val exact = Similarity.cosineThresholdPairsBlocked(corpus, "vec_id", "embedding",
        threshold = 0.9, blocks = 8)
      val lsh = Similarity.lshCosinePairs(corpus, "vec_id", "embedding",
        threshold = 0.9)
      val matched = lsh.select(col("ia"), col("ib"))
        .join(exact.select(col("ia"), col("ib")), Seq("ia", "ib"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(matched.agg(count(lit(1)).as("n_matched")))
        .select(col("n_exact"),
          (col("n_lsh") - col("n_matched")).as("n_false_pos"),
          // recall >= 0.95 in exact integer arithmetic
          (col("n_matched") * 20 >= col("n_exact") * 19).as("recall_ok"))
    }),

    // SemDeDup (Abbas et al. 2023): trained k-means cells bound the pair
    // candidates, lower-id-wins drop within each cell at cosine >= 0.9.
    // Same planted twin corpus as the LSH contract so real semantic dups
    // exist; the oracle replicates every Lloyd round + the drop SET.
    "dedup_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val pert = emb.filter(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          expr("transform(embedding, (x, i) -> IF(i < 2, -x, x))").as("embedding"))
      Similarity.semanticDedup(emb.unionByName(pert), "vec_id", "embedding",
        threshold = 0.9, kCells = 4, iters = 3)
    }),

    // ---- text analysis
    // text normalization (pre-tokenization cleanup): control chars
    // stripped, whitespace runs collapsed, trimmed — census + md5 of the
    // transformation. The corpus is already clean, so (text_pii_scrub
    // style) BOTH sides plant the same deterministic noise first
    "text_normalize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.normalizeStats(
        docs.select(col("doc_id"), concat(col("text"), plantedNoise).as("text")),
        "doc_id", "text")
    }),

    // Unicode NFC canonicalization (the round-11 "honestly out of
    // scope" closed): planted combining sequences — an unattached
    // acute, a precomposed control, a double composition — normalize
    // through the native codegen'd expression; the census + hash of
    // the TRANSFORMED text grade the composition itself
    "text_nfc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tail = when(col("doc_id") % 3 === 0, lit(" cafe\u0301"))
        .when(col("doc_id") % 3 === 1, lit(" caf\u00e9"))
        .otherwise(lit(" A\u030angstro\u0308m"))
      TextAnalysis.nfcStats(
        docs.select(col("doc_id"), concat(col("text"), tail).as("text")),
        "doc_id", "text")
    }),

    // sentence segmentation census: planted terminal punctuation (the
    // corpus itself has none) exercises multi-sentence, single-sentence
    // and fragment-only shapes
    "text_sentences" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tail = when(col("doc_id") % 3 === 0,
          lit(". First planted sentence! And a second one? trailing frag"))
        .when(col("doc_id") % 3 === 1, lit(". Single tail sentence."))
        .otherwise(lit(" no terminal punctuation here"))
      TextAnalysis.sentenceStats(
        docs.select(col("doc_id"), concat(col("text"), tail).as("text")),
        "doc_id", "text")
    }),

    "text_stats" -> ((s, dir) =>
      TextAnalysis.stats(t(s, dir, "documents"), "doc_id", "text")),
    // character-class census (script-detection gate): exact integer
    // length-delta counts, codegen'd regexp_replace at scan speed
    "text_script_census" -> ((s, dir) =>
      TextAnalysis.scriptCensus(t(s, dir, "documents"), "doc_id", "text")),
    // temperature-scaled mixing weights (alpha = 1/2, IEEE-exact sqrt):
    // the multilingual data-mixing computation
    "sample_mixture_weights" -> ((s, dir) =>
      Sampling.mixtureWeights(t(s, dir, "documents"), "doc_id", "lang")),
    // the mixture APPLIED: α=1/2 temperature downsampling at a β=0.5 doc
    // budget — per-lang keep gate, census exact on both engines
    "sample_mixture_apply" -> ((s, dir) =>
      Sampling.mixtureSampleStats(t(s, dir, "documents"), "doc_id", "lang")),
    // CCNet-style fluency gate: per-doc mean negative log-prob under the
    // corpus's own add-1 bigram LM
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.bigramScore(t(s, dir, "documents"), "doc_id", "text")),
    // power-of-2 sequence-length histogram (context-length planning):
    // integer-exact bucketing via length(bin(n))-1
    "text_length_buckets" -> ((s, dir) =>
      TextAnalysis.lengthBuckets(t(s, dir, "documents"), "text")),
    // count-based bigram LM with add-1 smoothing: exact integer censuses,
    // one IEEE-exact division — the KenLM-statistics shape
    "text_ngram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLm(t(s, dir, "documents"), "text", topN = 30)),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")),
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "lang", "text")),
    // rolling-hash collision census: the wrapping 64-bit hash itself is not
    // DuckDB-expressible (per-value exactness is pinned by
    // StatefulStreamSpec against a JVM reference), but its AGREEMENT
    // contract is — n_pairs == n_texts asserts the hash is a pure function
    // of the text (the hard determinism contract); hash_ok asserts the
    // collision count stays under 3 + n/1000, a bound a sound 64-bit hash
    // never approaches (birthday bound) but a degenerate one always blows,
    // without asserting the literally-collision-free census that a single
    // legitimate collision on a larger corpus would flip
    "text_rolling_hash" -> ((s, dir) => {
      graft.functions.RollingHashFunctions.register(s)
      t(s, dir, "documents")
        .select(col("text"),
          graft.functions.RollingHashFunctions.rollingHash(col("text")).as("rh"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_texts"),
          countDistinct(col("rh")).as("n_hashes"),
          countDistinct(col("text"), col("rh")).as("n_pairs"))
        .select(col("n_docs"), col("n_texts"), col("n_pairs"),
          ((col("n_texts") - col("n_hashes")) <=
            lit(3) + col("n_texts") / lit(1000)).as("hash_ok"))
    }),
    "text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(TextAnalysis.fingerprint(t(s, dir, "documents"), "text")).as("n_unique"))),

    // fixed-window character chunking (RAG / training-window primitive):
    // per-chunk identity, offsets and content hash, byte-exact
    "text_char_chunks" -> ((s, dir) =>
      TextAnalysis.charChunks(t(s, dir, "documents"), "doc_id", "text",
        window = 120, stride = 80)),

    // chunk-level near-dup pairs: posting-list join on chunk hash with a
    // boilerplate document-frequency cap — never all-pairs
    "dedup_chunks" -> ((s, dir) =>
      Dedup.chunkOverlapPairs(t(s, dir, "documents"), "doc_id", "text",
        window = 120, stride = 80, minShared = 2, maxDf = 50)),

    // exact duplicated-substring census via sorted-suffix neighbor LCPs
    // (the Lee et al. suffix-array dedup, as relational operators)
    "dedup_suffix" -> ((s, dir) =>
      Dedup.suffixDuplication(t(s, dir, "documents"), "doc_id", "text",
        minMatch = 20, maxSuffix = 60, buckets = 128)),

    // the stride-q cost knob graded: every 4th suffix start sampled —
    // recall for runs of length >= minMatch + 3 unchanged, volume /4
    "dedup_suffix_stride" -> ((s, dir) =>
      Dedup.suffixDuplication(t(s, dir, "documents"), "doc_id", "text",
        minMatch = 20, maxSuffix = 60, buckets = 128, stride = 4)),

    // the removal half: duplicated runs CUT, text rebuilt from the gaps,
    // graded on the census + md5 of the cleaned text
    "dedup_suffix_removal" -> ((s, dir) =>
      Dedup.suffixDedupTexts(t(s, dir, "documents"), "doc_id", "text",
        minMatch = 20, maxSuffix = 60, buckets = 128)),

    // clean→dedup end-to-end: planted noise normalized away, then
    // duplicated substrings cut from the CLEANED text, censused per
    // source — the round-11 families composed into one chain
    "llm_clean_dedup_e2e" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cleaned = docs.select(col("doc_id"),
        TextAnalysis.normalized(concat(col("text"), plantedNoise)).as("text"))
      Dedup.suffixDedupTexts(cleaned, "doc_id", "text",
          minMatch = 20, maxSuffix = 60, buckets = 128)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("clean_chars"),
          sum(col("removed_chars")).as("removed_chars"),
          countDistinct(col("kept_md5")).as("n_unique_kept"))
    }),

    // classifier-based filtering (GPT-3/LLaMA recipe, fastText shape):
    // hashed set-of-words + full-batch perceptron — all-integer, so
    // training AND scoring replicate digit-for-digit. The synthetic
    // corpus draws every doc from ONE token distribution (no natural
    // class signal — verified: every label degenerates to majority), so
    // like text_pii_scrub BOTH sides plant the same deterministic
    // markers; the classifier must LEARN them from labels alone
    // (separation reached: LlmSpec pins 100% on the planted fixture)
    "text_classifier_quality" -> ((s, dir) => {
      val enriched = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" reviewed cited edited"))
            .when(col("doc_id") % 4 === 1, lit(" winner prize click"))
            .otherwise(lit(""))).as("text"))
      Classifier.perceptronScores(enriched, "doc_id", "text",
        posLabel = col("doc_id") % 4 === 0, dims = 512, rounds = 4)
    }),

    // ---- content scrubbing (PII redaction + URL-policy filtering)
    // The corpus carries no natural PII, so BOTH sides append the same
    // deterministic doc_id-derived contact line (variable email/IP
    // multiplicity, incl. zero) before scrubbing — the graded artifact is
    // the per-doc census plus the hash of the actually-redacted text.
    "text_pii_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val enriched = docs.select(col("doc_id"),
        concat(col("text"),
          expr("repeat(concat(' reach user', doc_id, '@mail.example.com'), cast(doc_id % 3 as int) + 1)"),
          expr("repeat(concat(' node 10.', doc_id % 256, '.', (doc_id * 7) % 256, '.', (doc_id * 13) % 256), cast(doc_id % 2 as int))"),
          concat(lit(" call "), (col("doc_id") % 900 + 100).cast("string"), lit("-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).as("text"))
      Scrub.piiAudit(enriched, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          md5(col("redacted")).as("red_md5"))
    }),
    // payment-card PII: candidate digit runs + codegen'd Luhn validation +
    // redaction of VALID cards only. The appended numbers are known
    // fixtures (two Luhn-valid, one invalid, one too short to be a
    // candidate), so the oracle states ground truth as constants — the
    // engine's Luhn arithmetic is graded against known answers
    "text_card_audit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val enriched = docs.select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" pay 4532015112830366"))
            .when(col("doc_id") % 4 === 1, lit(" pay 1234567890123456"))
            .when(col("doc_id") % 4 === 2, lit(" ref 123456789012"))
            .otherwise(lit(" pay 4111111111111111"))).as("text"))
      Scrub.cardAudit(enriched, "doc_id", "text")
        .select(col("doc_id"), col("n_candidates"), col("n_valid"),
          md5(col("redacted")).as("red_md5"))
    }),
    // crawl-style URL canonicalization: messy doc_id-derived URLs (mixed
    // case, tracking params, fragments) normalized identically on both
    // sides — the dedup key a crawl pipeline groups by
    "text_url_canonical" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val id = col("doc_id")
      val u1 = concat(lit("HTTP://Site"), (id % 7).cast("string"),
        lit(".Example.org/Page"), (id % 13).cast("string"),
        lit("/?utm_source=s"), id.cast("string"),
        lit("&ref="), (id % 3).cast("string"), lit("#top"))
      val u2 = concat(lit("https://WWW.Ref"), (id % 5).cast("string"),
        lit(".net/x/?utm_c=9"))
      docs.select(id,
        Scrub.canonicalizeUrl(u1).as("c1"),
        Scrub.canonicalizeUrl(u2).as("c2"))
    }),
    // per-domain reference census with a broadcast blocklist anti-join
    "text_domain_census" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val enriched = docs.select(
        concat(col("text"),
          lit(" see http://site"), (col("doc_id") % 7).cast("string"),
          lit(".example.org/p and https://www.ref"),
          (col("doc_id") % 5).cast("string"), lit(".net/q")).as("text"))
      Scrub.domainCensus(enriched, "text",
        Seq("site0.example.org", "www.ref1.net"))
    }),

    // ---- multimodal binary columns
    "mm_binary" -> ((s, dir) =>
      Multimodal.asBinaryTable(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          sha2(col("payload"), 256).as("b_sha"))),
    // REAL codec path: decode the P6 image and emit pixel features
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s,
        Multimodal.asPpmTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL codec path: render docs as genuine P6 PPM images, then parse
    // headers and nearest-neighbor resize with the dependency-free codec
    "mm_ppm" -> ((s, dir) =>
      Multimodal.ppmStats(s,
        Multimodal.asPpmTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL audio codec path: render docs as genuine 16-bit PCM WAVs, then
    // parse the chunk list, compute RMS (exact integer sums) and decimate
    "mm_wav" -> ((s, dir) =>
      Multimodal.wavStats(s,
        Multimodal.asWavTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL nearest-neighbor resize (pixel-sum proves source-pixel choice)
    "mm_transform" -> ((s, dir) =>
      Multimodal.transform(s,
        Multimodal.asPpmTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL COMPRESSED image path: render docs as genuine GIF87a (LZW
    // entropy coding), then inflate the sub-blocks back and prove the
    // pixels via exact cycle arithmetic — a broken LZW cannot fake these
    "mm_gif" -> ((s, dir) =>
      Multimodal.gifStats(s,
        Multimodal.asGifTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("w"), col("h"), col("n_px"), col("f0"),
          col("px_sum"))),
    // REAL MP4-family container path: encode docs as structurally valid
    // ISO-BMFF (ftyp/moov/trak…/mdat), then demux by walking the box
    // tree generically — counts, movie header, and an md5 that proves
    // the walk reached the exact mdat byte range
    "mm_mp4" -> ((s, dir) =>
      Multimodal.mp4Stats(s,
        Multimodal.asMp4Table(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL COMPRESSED video path: animated GIF — demux the container AND
    // inflate each frame's LZW before any pixel can be proven
    "mm_gif_video" -> ((s, dir) =>
      Multimodal.gifVideoStats(s,
        Multimodal.asGifVideoTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // REAL video path: render docs as multi-frame PPM streams (the
    // ffmpeg image2pipe/ppm container), demux by walking frame headers,
    // keep every 2nd frame, pixel-sum the kept frames
    "mm_video" -> ((s, dir) =>
      Multimodal.videoStats(s,
        Multimodal.asPpmVideoTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")),
    // SECOND real compressed-image family: QOI (RLE + rolling index +
    // wrap-around delta ops — dictionary-free, unlike GIF's LZW); the
    // decode must reproduce the byte-cycle channel sums exactly
    "mm_qoi" -> ((s, dir) =>
      Multimodal.qoiStats(s,
        Multimodal.asQoiTable(s, t(s, dir, "documents"), "doc_id", "text"), "doc_id")
        .select(col("doc_id"), col("w"), col("h"), col("n_px"), col("rgb_sum"))),
    // REAL COMPRESSED audio (IMA ADPCM 4:1): adaptive 4-bit quantization
    // of an audio-like byte-driven waveform — structural facts exact,
    // quality graded as a deterministic accuracy contract
    "mm_adpcm" -> ((s, dir) =>
      Multimodal.adpcmStats(s, t(s, dir, "documents"), "doc_id", "text")),
    // Common Crawl-shaped WARC ingestion: the corpus packed into
    // per-record-gzipped WARC shards (WET extracted-text layout), then
    // inflated and demuxed back — graded on a 4-way exact census the
    // decode chain cannot fake
    "mm_warc" -> ((s, dir) =>
      Multimodal.warcStats(s,
        Multimodal.asWarcTable(s, t(s, dir, "documents"), "doc_id", "text")))
  )

  /** Gzipped JSONL corpus fixture: the documents table written once per
    * dir as 4 `.json.gz` shards through Spark's own codec path. */
  private val jsonlCache = scala.collection.concurrent.TrieMap[String, String]()
  private def jsonlFixture(s: org.apache.spark.sql.SparkSession, dir: String): String =
    jsonlCache.getOrElseUpdate(dir, {
      val path = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/corpus"
      t(s, dir, "documents").repartition(4)
        .write.option("compression", "gzip").json(path)
      path
    })

  /** Shared BPE training per testdata dir: both graded rows (the merge
    * table and the post-merge token census) come from ONE training run. */
  private val bpeCache =
    scala.collection.concurrent.TrieMap[String,
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]()
  private def bpe(s: org.apache.spark.sql.SparkSession, dir: String) =
    bpeCache.getOrElseUpdate(dir,
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text", rounds = 8))

  /** Generated CTE chain replicating the BPE training loop in DuckDB:
    * w0 = the word census as double-space-joined symbol strings; each
    * round r: p_r = adjacent-pair counts, b_r = the argmax merge
    * ((n DESC, pair) — the same tie-break the engine uses), w_r = the
    * vocabulary with the winning pair fused via the same space-padded
    * plain `replace`. Pure string/aggregate SQL — no fp anywhere. */
  private def bpeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= """w0 AS (SELECT trim(regexp_replace(w, '(.)', '\1  ', 'g')) AS sym, freq FROM (
         SELECT w, COUNT(*) AS freq FROM (
           SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
           FROM documents) t
         WHERE len(w) > 0 GROUP BY w))"""
    for (r <- 1 to rounds) {
      sb ++= s""",
       p$r AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (
           SELECT freq, unnest(list_transform(range(1, len(ss)),
             i -> ss[i] || ' ' || ss[i + 1])) AS pair
           FROM (SELECT freq, string_split(sym, '  ') AS ss FROM w${r - 1})) t
         GROUP BY pair),
       b$r AS (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1),
       w$r AS (SELECT trim(replace(' ' || sym || ' ',
           ' ' || replace(b.pair, ' ', '  ') || ' ',
           ' ' || replace(b.pair, ' ', '') || ' ')) AS sym, freq
         FROM w${r - 1}, b$r b)"""
    }
    sb.toString
  }

  private val langScore: String => String = markers =>
    s"len(list_filter(string_split(text, ' '), x -> x IN ($markers)))"

  /** ONE definition of the planted normalization noise (Spark side) —
    * `text_normalize` and `llm_clean_dedup_e2e` must plant byte-identical
    * bytes or the chained oracle diverges from the census oracle. */
  private[queries] def plantedNoise: org.apache.spark.sql.Column =
    when(col("doc_id") % 3 === 0,
        concat(expr("chr(9)"), lit("x "), expr("chr(7)")))
      .when(col("doc_id") % 3 === 1, lit("  double  spaced  tail "))
      .otherwise(lit(""))

  /** The SQL twin of [[plantedNoise]]. */
  private val plantedNoiseSql: String =
    """CASE WHEN doc_id % 3 = 0 THEN chr(9) || 'x ' || chr(7)
            WHEN doc_id % 3 = 1 THEN '  double  spaced  tail '
            ELSE '' END"""

  /** The sorted-suffix LCP CTE chain (sfx → nb → sc) over `src` — ONE
    * definition shared by the census, removal and chained-e2e oracles so
    * the three replications of the same algorithm can never drift. */
  private def suffixLcpCtes(src: String, stride: Int = 1): String =
    s"""sfx AS (
           SELECT doc_id, CAST(gs + 1 AS INT) AS pos,
                  substr(text, CAST(gs + 1 AS INT), 60) AS s
           FROM (SELECT doc_id, text,
                   unnest(range(0, greatest(length(text) - 20 + 1, 0), $stride)) AS gs
                 FROM $src)),
         nb AS (
           SELECT doc_id, pos, s,
                  lead(s) OVER (ORDER BY s, doc_id, pos) AS nxt,
                  lag(s)  OVER (ORDER BY s, doc_id, pos) AS prv
           FROM sfx),
         sc AS (
           SELECT doc_id, pos,
             greatest(
               CASE WHEN nxt IS NULL THEN 0 ELSE
                 len(list_filter(range(1, least(length(s), length(nxt)) + 1),
                     k -> substr(s, 1, CAST(k AS INT)) = substr(nxt, 1, CAST(k AS INT)))) END,
               CASE WHEN prv IS NULL THEN 0 ELSE
                 len(list_filter(range(1, least(length(s), length(prv)) + 1),
                     k -> substr(s, 1, CAST(k AS INT)) = substr(prv, 1, CAST(k AS INT)))) END
             ) AS lcp
           FROM nb)"""

  /** The interval-merge + gap-surgery CTE chain (iv → … → keptt) over
    * the LCPs, reading text from `src`; pairs with [[suffixLcpCtes]]. */
  private def suffixRemovalCtes(src: String): String =
    s"""iv AS (SELECT doc_id, pos AS s, pos + lcp AS e FROM sc WHERE lcp >= 20),
         mg0 AS (
           SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
                 ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -1) THEN 1 ELSE 0 END AS new_seg
           FROM iv),
         mg1 AS (
           SELECT doc_id, s, e,
             SUM(new_seg) OVER (PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
           FROM mg0),
         mg AS (SELECT doc_id, seg, MIN(s) AS s, MAX(e) AS e
                FROM mg1 GROUP BY doc_id, seg),
         gp AS (
           SELECT doc_id, s,
             COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS o
           FROM mg),
         gaps AS (
           SELECT g.doc_id, g.o,
             substr(d.text, CAST(g.o AS INT), CAST(g.s - g.o AS INT)) AS piece
           FROM gp g JOIN $src d USING (doc_id)),
         tails AS (
           SELECT m.doc_id, m.le AS o,
             substr(d.text, CAST(m.le AS INT),
                    CAST(length(d.text) - m.le + 1 AS INT)) AS piece
           FROM (SELECT doc_id, MAX(e) AS le FROM mg GROUP BY doc_id) m
           JOIN $src d USING (doc_id)),
         keptt AS (
           SELECT doc_id, string_agg(piece, '' ORDER BY o) AS kept
           FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tails)
           GROUP BY doc_id)"""

  /** DuckDB replay of [[graft.llm.Classifier.perceptronScores]], every
    * round unrolled as CTEs. All-integer arithmetic on both engines, so
    * the weights — and therefore scores and predictions — are identical
    * by construction, not by tolerance. */
  private def perceptronOracle(dims: Int, rounds: Int): String = {
    def nib(i: Int, mult: Int) =
      s"(strpos('0123456789abcdef', substr(md5(tk), $i, 1)) - 1) * $mult"
    val hash =
      s"((${nib(1, 4096)} + ${nib(2, 256)} + ${nib(3, 16)} + ${nib(4, 1)}) % $dims)"
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (SELECT t.doc_id, CAST(SUM(t.cnt * w.w) AS BIGINT) AS score
           FROM tok t JOIN w${r - 1} w USING (f) GROUP BY t.doc_id),
         m$r AS (SELECT l.doc_id, l.y FROM lab l JOIN s$r s USING (doc_id)
                 WHERE (CASE WHEN s.score > 0 THEN 1 ELSE -1 END) <> l.y),
         u$r AS (SELECT t.f, CAST(SUM(t.cnt * m.y) AS BIGINT) AS d
                 FROM tok t JOIN m$r m USING (doc_id) GROUP BY t.f),
         w$r AS (SELECT w.f, w.w + COALESCE(u.d, 0) AS w
                 FROM w${r - 1} w LEFT JOIN u$r u USING (f))"""
    }.mkString(",\n         ")
    s"""WITH enr AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 4 = 0 THEN ' reviewed cited edited'
                  WHEN doc_id % 4 = 1 THEN ' winner prize click'
                  ELSE '' END AS text
           FROM documents),
         tok0 AS (
           SELECT doc_id, $hash AS f
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
                 FROM enr)
           WHERE tk <> ''),
         tok AS (
           SELECT DISTINCT doc_id, f, CAST(1 AS BIGINT) AS cnt FROM tok0
           UNION ALL
           SELECT doc_id, $dims AS f, CAST(1 AS BIGINT) FROM enr),
         lab AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE -1 END AS y
                 FROM enr),
         w0 AS (SELECT CAST(gs AS INT) AS f, CAST(0 AS BIGINT) AS w
                FROM (SELECT unnest(range(0, ${dims + 1})) AS gs)),
         $roundCtes
         SELECT l.doc_id, CAST(l.y AS INT) AS y,
           CAST(s.score AS BIGINT) AS score,
           CAST(CASE WHEN s.score > 0 THEN 1 ELSE -1 END AS INT) AS pred
         FROM (SELECT t.doc_id, CAST(SUM(t.cnt * w.w) AS BIGINT) AS score
               FROM tok t JOIN w$rounds w USING (f) GROUP BY t.doc_id) s
         JOIN lab l USING (doc_id)"""
  }

  /** The incremental variant's oracle: train w{rounds} on the ORIGINAL
    * enriched corpus (the frozen-at-bootstrap model), then batch-score
    * the SQL-reconstructed FINAL corpus (%13 docs rewritten, %17 docs
    * deleted) with those weights — exactly what the maintained view
    * must equal, digit for digit. */
  private def perceptronIncrOracle(dims: Int, rounds: Int): String = {
    def nib(i: Int, mult: Int) =
      s"(strpos('0123456789abcdef', substr(md5(tk), $i, 1)) - 1) * $mult"
    val hash =
      s"((${nib(1, 4096)} + ${nib(2, 256)} + ${nib(3, 16)} + ${nib(4, 1)}) % $dims)"
    val roundCtes = (1 to rounds).map { r =>
      s"""s$r AS (SELECT t.doc_id, CAST(SUM(t.cnt * w.w) AS BIGINT) AS score
           FROM tok t JOIN w${r - 1} w USING (f) GROUP BY t.doc_id),
         m$r AS (SELECT l.doc_id, l.y FROM lab l JOIN s$r s USING (doc_id)
                 WHERE (CASE WHEN s.score > 0 THEN 1 ELSE -1 END) <> l.y),
         u$r AS (SELECT t.f, CAST(SUM(t.cnt * m.y) AS BIGINT) AS d
                 FROM tok t JOIN m$r m USING (doc_id) GROUP BY t.f),
         w$r AS (SELECT w.f, w.w + COALESCE(u.d, 0) AS w
                 FROM w${r - 1} w LEFT JOIN u$r u USING (f))"""
    }.mkString(",\n         ")
    s"""WITH enr AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 4 = 0 THEN ' reviewed cited edited'
                  WHEN doc_id % 4 = 1 THEN ' winner prize click'
                  ELSE '' END AS text
           FROM documents),
         tok0 AS (
           SELECT doc_id, $hash AS f
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
                 FROM enr)
           WHERE tk <> ''),
         tok AS (
           SELECT DISTINCT doc_id, f, CAST(1 AS BIGINT) AS cnt FROM tok0
           UNION ALL
           SELECT doc_id, $dims AS f, CAST(1 AS BIGINT) FROM enr),
         lab AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE -1 END AS y
                 FROM enr),
         w0 AS (SELECT CAST(gs AS INT) AS f, CAST(0 AS BIGINT) AS w
                FROM (SELECT unnest(range(0, ${dims + 1})) AS gs)),
         $roundCtes,
         finaldocs AS (
           SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN 'upd ' || text ELSE text END AS text
           FROM enr WHERE doc_id % 17 <> 0),
         ftok0 AS (
           SELECT doc_id, $hash AS f
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tk
                 FROM finaldocs)
           WHERE tk <> ''),
         ftok AS (
           SELECT DISTINCT doc_id, f, CAST(1 AS BIGINT) AS cnt FROM ftok0
           UNION ALL
           SELECT doc_id, $dims AS f, CAST(1 AS BIGINT) FROM finaldocs),
         flab AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN 1 ELSE -1 END AS y
                  FROM finaldocs)
         SELECT l.doc_id, CAST(l.y AS INT) AS y,
           CAST(s.score AS BIGINT) AS score,
           CAST(CASE WHEN s.score > 0 THEN 1 ELSE -1 END AS INT) AS pred
         FROM (SELECT t.doc_id, CAST(SUM(t.cnt * w.w) AS BIGINT) AS score
               FROM ftok t JOIN w$rounds w USING (f) GROUP BY t.doc_id) s
         JOIN flab l USING (doc_id)"""
  }

  val oracles: Map[String, String] = Map(
    "text_classifier_incr" -> perceptronIncrOracle(dims = 512, rounds = 4),
    "sql_classifier_state" -> perceptronIncrOracle(dims = 512, rounds = 4),
    // QOI channel stream = the doc's byte cycle (pixel j channels are
    // bytes 3j, 3j+1, 3j+2 mod L), so rgb_sum follows the same cycle
    // arithmetic as the GIF oracle with n -> 3wh
    "mm_qoi" ->
      """WITH m AS (SELECT doc_id, text, COALESCE(strlen(text), 0) AS L
         FROM documents),
         s AS (SELECT doc_id, text, L,
           CAST(L % 40 + 1 AS BIGINT) AS w,
           CAST(L % 24 + 1 AS BIGINT) AS h
         FROM m),
         t2 AS (SELECT doc_id, L, w, h, w * h * 3 AS mch,
           list_transform(range(1, CAST(L + 1 AS INT)),
             i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
         FROM s)
         SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           CAST(w * h AS BIGINT) AS n_px,
           CAST(CASE WHEN L = 0 THEN 0 ELSE
             (mch // L) * list_aggregate(codes, 'sum')
             + CASE WHEN mch % L = 0 THEN 0
                    ELSE list_aggregate(codes[1:CAST(mch % L AS INT)], 'sum') END
             END AS BIGINT) AS rgb_sum
         FROM t2""",
    // ADPCM contract: sample count and block size are exact layout
    // arithmetic (12-byte header + one nibble per code); the first sample
    // ships verbatim; the 4-bit quantizer's relative RMS error stays
    // under 5% on the audio-like fixture (measured max 1.6% — the
    // deterministic bound, not a statistical one)
    "mm_adpcm" ->
      """SELECT doc_id,
           CAST(COALESCE(strlen(text), 0) AS BIGINT) AS n_samples,
           CAST(12 + COALESCE(strlen(text), 0) // 2 AS BIGINT) AS adpcm_bytes,
           TRUE AS first_exact, TRUE AS quality_ok
         FROM documents""",
    // the WARC shards must demux back to exactly the source corpus:
    // per-shard record count, decoded char total, distinct texts, and
    // the id sum recovered from the target URIs
    "mm_warc" ->
      """SELECT CAST(doc_id // 16 AS BIGINT) AS shard_id,
           COUNT(*) AS n_records, CAST(SUM(len(text)) AS BIGINT) AS chars,
           COUNT(DISTINCT text) AS n_texts,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM documents GROUP BY shard_id""",
    // the compressed corpus must round-trip exactly: the census over the
    // decoded shards equals the census over the source table
    "src_jsonl_gz" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
           COUNT(DISTINCT text) AS n_texts,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         FROM documents GROUP BY lang""",
    // the BPE merge table: every round's winning pair, its fused symbol
    // and its corpus count — replicated round by round in pure string SQL
    "text_bpe_merges" ->
      s"""WITH ${bpeCtes(8)}
         SELECT * FROM (${(1 to 8).map(r =>
           s"SELECT $r AS round, pair, replace(pair, ' ', '') AS merged, n AS freq FROM b$r")
           .mkString(" UNION ALL ")})""",
    // the token census after all 8 merges are applied to the vocabulary
    "text_bpe_tokens" ->
      s"""WITH ${bpeCtes(8)}
         SELECT token, CAST(SUM(freq) AS BIGINT) AS n FROM (
           SELECT unnest(string_split(sym, '  ')) AS token, freq FROM w8) t
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "dedup_exact" ->
      """SELECT CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_groups,
         COUNT(CASE WHEN n > 1 THEN 1 END) AS n_dup_groups,
         CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT) AS n_redundant
         FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1)""",

    // df-capped variant (maxDocFreq=100): shingles above the cap drop from
    // both the index and the per-doc counts — same semantics as the engine
    "dedup_jaccard" -> jaccardSql(Some(100)),
    // directed containment from the same shingle CTEs: each undirected
    // pair scores both directions against its own shingle count
    "dedup_containment" ->
      s"""WITH ${jaccardCtes(Some(100))},
         d AS (
           SELECT ia AS id_in, ib AS id_out, CAST(inter AS DOUBLE) / ca.n AS c
           FROM pairs JOIN cnt ca ON ia = ca.doc_id
           UNION ALL
           SELECT ib, ia, CAST(inter AS DOUBLE) / cb.n
           FROM pairs JOIN cnt cb ON ib = cb.doc_id)
         SELECT id_in, id_out, round(c, 4) AS containment
         FROM d WHERE c >= 0.8""",
    // MinHash-LSH with 16 bands x 4 rows has ~100% recall at J>=0.5 on this
    // corpus (planted near-dups are J~0.8+); candidates are exact-verified,
    // so the result set equals the exact Jaccard pairs.
    "dedup_minhash" -> jaccardSql(None),

    // full exact replication of the SimHash pipeline in SQL: md5-digit
    // token bits → per-bit ±1 sums → sign bits → all-pairs Hamming ≤ 3
    // (the oracle may brute-force pairs; the engine's chunk-bucketed
    // candidates are provably complete at d≤3, so the sets must be equal)
    "dedup_simhash" ->
      s"""WITH $simhashPairCtes
         SELECT ia, ib, dist FROM pairs WHERE dist <= 3""",

    // components over the exact Hamming-<=3 pair graph (recursive-CTE
    // reachability, min-id labels) — the oracle for the star-edge
    // simhash components
    "dedup_simhash_components" ->
      s"""WITH RECURSIVE $simhashPairCtes,
         jp AS (SELECT ia, ib FROM pairs WHERE dist <= 3),
         e AS (SELECT ia AS u, ib AS v FROM jp UNION SELECT ib, ia FROM jp),
         reach(id, r) AS (
           SELECT u, u FROM e
           UNION
           SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
         comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
         SELECT cluster_id, COUNT(*) AS n_docs,
                string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
         FROM comp GROUP BY cluster_id""",

    // same signature pipeline as dedup_simhash, then: chunk c of a sig =
    // its 16 bits 16c..16c+15 as an integer; bucket census over DISTINCT
    // signatures; capped = buckets with > 4 distinct sigs
    "dedup_cap_audit" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         t2 AS (SELECT doc_id, substr(md5(w), 1, 16) AS m FROM tok WHERE length(w) > 0),
         bits AS (SELECT doc_id, b,
             SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, b // 4 + 1, 1)) - 1)
                            >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM t2 CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
           GROUP BY doc_id, b),
         sigs AS (SELECT doc_id, list(CASE WHEN s > 0 THEN 1 ELSE 0 END ORDER BY b) AS sig
                  FROM bits GROUP BY doc_id),
         reps AS (SELECT DISTINCT sig FROM sigs),
         chunks AS (SELECT c AS bk1,
             CAST(list_aggregate(list_transform(range(0, 16),
               j -> sig[c * 16 + j + 1] * (1 << j)), 'sum') AS BIGINT) AS bk2
           FROM reps CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cc),
         cnt AS (SELECT bk1, bk2, COUNT(*) AS n FROM chunks GROUP BY 1, 2)
         SELECT CAST(COALESCE(SUM(CASE WHEN n > 4 THEN 1 END), 0) AS BIGINT) AS capped_buckets,
           CAST(COALESCE(SUM(CASE WHEN n > 4 THEN n END), 0) AS BIGINT) AS capped_sig_rows
         FROM cnt""",

    "dedup_clusters" -> clustersSql(),

    // components over the UNCAPPED jaccard pair graph — the oracle for
    // the star-edge minhash components (LSH recall at 16×4 is complete
    // on this corpus, pinned by dedup_minhash)
    "dedup_minhash_components" -> clustersSql(None),

    // the incremental state's clusters vs the SAME components oracle
    // re-targeted at the final live corpus: waves only remove planted
    // pairs or add original planted texts (the rewritten %13 docs are
    // zero-shingle singletons), so LSH recall completeness carries over
    "dedup_incremental" -> clustersSql(None, "corpus", incrCorpusCte),

    // identical final-corpus oracle for the SQL-lifecycle variant
    "sql_dedup_state" -> clustersSql(None, "corpus", incrCorpusCte),

    // the batch segment-dedup oracle re-targeted at the final corpus
    // (same waves as dedup_incremental): the maintained per-doc table
    // must equal the full recompute digit for digit, kept_md5 included
    "text_segment_dedup_incr" -> incrSegmentsSql,

    // identical final-corpus oracle for the SQL-lifecycle variant
    "sql_segment_state" -> incrSegmentsSql,

    // the batch span-census oracle re-targeted at the final corpus: the
    // maintained per-doc table must equal the full recompute digit for
    // digit — the %13-rewritten docs (single token, no 3-gram) have no
    // row, exercising the retraction path
    "dedup_spans_incr" -> incrSpansSql,

    // identical final-corpus oracle for the SQL-lifecycle variant
    "sql_span_state" -> incrSpansSql,

    "dedup_keep" -> keepSql,

    // the same five-stage chain, digit for digit: C4 gate, min-id exact
    // dedup, recursive-CTE near-dup components over the SURVIVORS' pair
    // graph, salted-hash 50% sample, window-cumsum packing
    "llm_curation_e2e" ->
      s"""WITH RECURSIVE
         qual AS (SELECT doc_id, text FROM (
             SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
           WHERE len(w) >= 30
             AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.4
             AND CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to',
               'in','is','on','for','with'))) AS DOUBLE) / len(w) >= 0.03),
         uniq AS (SELECT doc_id, text FROM (
             SELECT doc_id, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM qual) WHERE rn = 1),
         ${jaccardCtes(Some(100), "uniq")},
         jp AS (SELECT ia, ib FROM scored WHERE j >= 0.5),
         ee AS (SELECT ia AS u, ib AS v FROM jp UNION SELECT ib, ia FROM jp),
         reach(id, r) AS (
           SELECT u, u FROM ee
           UNION
           SELECT ee.u, reach.r FROM ee JOIN reach ON ee.v = reach.id),
         comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         surv AS (SELECT doc_id, text FROM uniq
           WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)),
         samp AS (SELECT doc_id, text FROM (
             SELECT doc_id, text,
               (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS bucket
             FROM (SELECT doc_id, text,
               md5('cur:' || CAST(doc_id AS VARCHAR)) AS m FROM surv))
           WHERE bucket < 32768),
         tok AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM samp),
         c AS (SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
           FROM tok)
         SELECT CAST(pre // 2000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS tok_sum,
           MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM c GROUP BY 1""",

    "text_filter_quality" ->
      """WITH s AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
         m AS (SELECT lang, len(w) AS n_tok,
               CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
               CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to',
                 'in','is','on','for','with'))) AS DOUBLE) / len(w) AS stopr
               FROM s)
         SELECT lang, COUNT(*) AS n_docs,
           COUNT(CASE WHEN n_tok >= 30 AND ttr >= 0.4 AND stopr >= 0.03
                 THEN 1 END) AS n_kept
         FROM m GROUP BY lang""",

    // same 3-gram construction as the engine's shingles (distinct per doc,
    // empty/null-gram filtered)
    "dedup_ngram_decontaminate" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id, source,
                  unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
                FROM w),
         sh0 AS (SELECT doc_id, source, s FROM sh
                 WHERE s IS NOT NULL AND length(s) > 0),
         ev AS (SELECT DISTINCT s FROM sh0 WHERE source = 'src0'),
         fl AS (SELECT DISTINCT doc_id FROM sh0
                WHERE source <> 'src0' AND s IN (SELECT s FROM ev))
         SELECT (SELECT COUNT(*) FROM documents WHERE source <> 'src0') AS n_train,
                (SELECT COUNT(*) FROM fl) AS n_flagged,
                (SELECT COUNT(*) FROM documents WHERE source <> 'src0')
                  - (SELECT COUNT(*) FROM fl) AS n_clean""",

    // 8-word segments, distinct-doc frequency, kept text rebuilt in
    // segment order (string_agg ORDER BY pos) — digit-for-digit
    "text_segment_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         segs AS (SELECT doc_id, s['pos'] AS pos, s['seg'] AS seg FROM
           (SELECT doc_id, unnest(list_transform(
               range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
               i -> {'pos': i, 'seg': array_to_string(w[i * 8 + 1 : (i + 1) * 8], ' ')})) AS s
            FROM w)),
         dfq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
         SELECT doc_id, COUNT(*) AS n_segs,
           COUNT(CASE WHEN df >= 2 THEN 1 END) AS n_dup_segs,
           md5(COALESCE(string_agg(seg, ' ' ORDER BY pos)
             FILTER (WHERE df < 2), '')) AS kept_md5
         FROM segs JOIN dfq USING (seg)
         GROUP BY doc_id""",

    // same 3-gram shingle construction as the jaccard family (distinct per
    // doc), df over the whole corpus, integral counts + one division
    "dedup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
                FROM w),
         sh0 AS (SELECT doc_id, s FROM sh WHERE s IS NOT NULL AND length(s) > 0),
         dfq AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s)
         SELECT doc_id, COUNT(*) AS n_shingles,
           COUNT(CASE WHEN df >= 2 THEN 1 END) AS n_dup,
           round(CAST(COUNT(CASE WHEN df >= 2 THEN 1 END) AS DOUBLE) / COUNT(*), 4) AS dup_ratio
         FROM sh0 JOIN dfq USING (s)
         GROUP BY doc_id""",

    "dedup_decontaminate" ->
      """WITH h AS (SELECT source, md5(text) AS hh FROM documents),
         ev AS (SELECT DISTINCT hh FROM h WHERE source = 'src0'),
         tr AS (SELECT hh FROM h WHERE source <> 'src0')
         SELECT (SELECT COUNT(*) FROM tr) AS n_train,
                (SELECT COUNT(*) FROM ev) AS n_eval,
                (SELECT COUNT(*) FROM tr WHERE hh IN (SELECT hh FROM ev)) AS n_removed,
                (SELECT COUNT(*) FROM tr WHERE hh NOT IN (SELECT hh FROM ev)) AS n_kept""",

    // same salted-md5 bucket, digit-by-digit: bucket = first 4 hex digits
    // of md5('mix:' || id) as an int in [0, 65536)
    // same salted nibble-hash bucket, CASE over the cumulative cuts
    "sample_split" ->
      """WITH h AS (SELECT doc_id, length(text) AS n,
             md5('split:' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
         b AS (SELECT doc_id, n,
               (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS bucket FROM h)
         SELECT CASE WHEN bucket < 58982 THEN 'train'
                     WHEN bucket < 62259 THEN 'val'
                     ELSE 'test' END AS split,
           COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_chars
         FROM b GROUP BY 1""",

    "sample_stratified" ->
      """WITH h AS (SELECT lang, n_chars,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
         b AS (SELECT lang, n_chars,
               (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS bucket FROM h),
         k AS (SELECT lang, n_chars, bucket,
             CASE lang WHEN 'en' THEN 58982 WHEN 'de' THEN 39321
                       WHEN 'es' THEN 26214 WHEN 'fr' THEN 26214
                       WHEN 'zh' THEN 13107 ELSE 0 END AS th FROM b)
         SELECT lang, COUNT(*) AS n_total,
           COUNT(CASE WHEN bucket < th THEN 1 END) AS n_sampled,
           CAST(COALESCE(SUM(CASE WHEN bucket < th THEN n_chars END), 0) AS BIGINT) AS mass_sampled
         FROM k GROUP BY lang""",

    "sample_uniform" ->
      """SELECT doc_id, md5('samp:' || CAST(doc_id AS VARCHAR)) AS h
         FROM documents ORDER BY h LIMIT 100""",

    "sample_uniform_per_lang" ->
      """SELECT lang, doc_id, rk FROM (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5('gsamp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         WHERE rk <= 25""",

    // same salted-md5 bucket as the stratified oracle; keep decision is the
    // integer cross-multiplication bucket·2000 < n_chars·65536
    "sample_weighted" ->
      """WITH h AS (SELECT lang, n_chars,
             md5('wsamp:' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
         b AS (SELECT lang, n_chars,
               (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
             + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
             + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) AS bucket FROM h),
         k AS (SELECT lang, n_chars,
               CAST(bucket AS BIGINT) * 2000 < CAST(COALESCE(n_chars, 0) AS BIGINT) * 65536 AS keep
               FROM b)
         SELECT lang, COUNT(*) AS n_total,
           COUNT(CASE WHEN keep THEN 1 END) AS n_sampled,
           CAST(COALESCE(SUM(CASE WHEN keep THEN n_chars END), 0) AS BIGINT) AS mass_sampled
         FROM k GROUP BY lang""",

    // the oracle's single-machine window cumsum defines the semantics the
    // distributed prefix sum must reproduce exactly
    "sample_pack_shards" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
         c AS (SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
           FROM t)
         SELECT CAST(pre // 2000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS tok_sum,
           MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
         FROM c GROUP BY 1""",

    // the engine really encodes + parses + resizes P6 images; the oracle
    // recomputes the geometry arithmetic the round trip must reproduce
    "mm_ppm" ->
      """SELECT doc_id,
           strlen(COALESCE(text, '')) % 64 + 1 AS w,
           strlen(COALESCE(text, '')) % 48 + 1 AS h,
           (strlen(COALESCE(text, '')) % 64 + 1) * (strlen(COALESCE(text, '')) % 48 + 1) * 3 AS n_rgb,
           greatest((strlen(COALESCE(text, '')) % 64 + 1) // 2, 1) AS rw,
           greatest((strlen(COALESCE(text, '')) % 48 + 1) // 2, 1) AS rh,
           greatest((strlen(COALESCE(text, '')) % 64 + 1) // 2, 1)
             * greatest((strlen(COALESCE(text, '')) % 48 + 1) // 2, 1) * 3 AS n_rgb_resized
         FROM documents""",

    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
                 i -> w[i] || ' ' || w[i + 1])) AS g FROM w),
         c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
         a AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
               MAX(cnt) AS top_bigram_cnt,
               CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS dup_bigram_occ
               FROM c GROUP BY 1)
         SELECT doc_id, n_bigrams, top_bigram_cnt, dup_bigram_occ,
           CAST(top_bigram_cnt AS DOUBLE) / n_bigrams AS top2_ratio,
           CAST(dup_bigram_occ AS DOUBLE) / n_bigrams AS dup_ratio
         FROM a""",

    "text_vocab" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         c AS (SELECT word, COUNT(*) AS cnt FROM t GROUP BY 1),
         r AS (SELECT word, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS rank FROM c)
         SELECT word, cnt, rank FROM r WHERE rank <= 20""",

    "text_tfidf" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
         dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         s AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score
               FROM tf JOIN dfq USING (term)),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term ASC) AS rn FROM s)
         SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3""",

    "sim_topk_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
         s AS (SELECT qid, e.vec_id AS nid,
             list_aggregate(list_transform(list_zip(qv, e.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
           FROM q, embeddings e WHERE e.vec_id <> q.qid)
         SELECT qid, rnk, nid, round(cos, 6) AS cos FROM
           (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM s)
         WHERE rnk <= 5""",

    // exact replication of the IVF algorithm itself (not an agreement
    // proxy): per-cell mean centroids, nprobe=2 nearest cells per query,
    // exact cosine within probed cells. Centroid averages are FP-order-
    // sensitive across engines but only rank CELLS (discrete, far apart);
    // the graded cosines are computed from raw vectors — bit-identical.
    "sim_topk_ivf" ->
      """WITH e AS (SELECT vec_id, label AS cell, embedding FROM embeddings),
         dim AS (SELECT cell, unnest(list_transform(range(1, len(embedding) + 1),
                   i -> {'i': i, 'v': CAST(embedding[i] AS DOUBLE)})) AS s FROM e),
         cdim AS (SELECT cell, s.i AS i, AVG(s.v) AS a FROM dim GROUP BY cell, s.i),
         cent AS (SELECT cell, list(a ORDER BY i) AS cv FROM cdim GROUP BY cell),
         q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
         pc AS (SELECT qid, qv, cell,
             list_aggregate(list_transform(list_zip(qv, cv),
               z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])), 'sum') AS cdist
           FROM q CROSS JOIN cent),
         probe AS (SELECT qid, qv, cell FROM
             (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, cell) AS crn FROM pc)
           WHERE crn <= 2),
         s AS (SELECT p.qid, e.vec_id AS nid,
             list_aggregate(list_transform(list_zip(p.qv, e.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(p.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
           FROM probe p JOIN e ON p.cell = e.cell AND e.vec_id <> p.qid)
         SELECT qid, rnk, nid, round(cos, 6) AS cos FROM
           (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM s)
         WHERE rnk <= 5""",

    // full SQL replication of the TRAINED-IVF pipeline: seeded k-means init,
    // 3 unrolled Lloyd rounds, final-centroid assignment, nprobe=2 probe,
    // exact cosine (raw float vectors — bit-identical doubles) in probed
    // cells. Centroid means are fp-order-sensitive across engines but only
    // rank discrete cells (same caveat as sim_topk_ivf, proven green).
    "sim_topk_ivf_trained" ->
      s"""WITH ${kmeansCtes(4, 3)},
         af AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(e.v, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cell) AS rn
             FROM e CROSS JOIN c3 c) WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qv, v AS qd FROM e WHERE vec_id < 20),
         pc AS (SELECT qid, qv, cell,
             list_aggregate(list_transform(list_zip(qd, cv),
               z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum') AS cdist
           FROM q CROSS JOIN c3),
         probe AS (SELECT qid, qv, cell FROM
             (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cdist, cell) AS crn FROM pc)
           WHERE crn <= 2),
         s AS (SELECT p.qid, m.vec_id AS nid,
             list_aggregate(list_transform(list_zip(p.qv, m.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(p.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(m.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
           FROM probe p JOIN af ON p.cell = af.cell
           JOIN e m ON m.vec_id = af.vec_id AND m.vec_id <> p.qid)
         SELECT qid, rnk, nid, round(cos, 6) AS cos FROM
           (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM s)
         WHERE rnk <= 5""",

    // n_pairs = n_texts ⇔ deterministic function of text (hard contract);
    // hash_ok = bounded collision count (soft quality gate, always TRUE for
    // a working 64-bit hash at any graded corpus size)
    "text_rolling_hash" ->
      """SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT text) AS n_texts,
         COUNT(DISTINCT text) AS n_pairs,
         TRUE AS hash_ok
         FROM documents""",

    // full replication of PQ training/encoding/ADC (64 dims = 4 subspaces
    // of 16; centroid fp noise only picks discrete codes; the graded
    // adist is rounded to 4dp and sums in fixed subspace order)
    "sim_topk_pq" -> pqSql(m = 4, sub = 16, kCodes = 8, iters = 2, k = 5),

    // exact replication of the int8 quantizer + integer ranking: amax as
    // FLOAT (exact), the scale division in double (identical expression
    // order), round() half-away-from-zero in both engines, then pure
    // 64-bit integer dot products
    "sim_topk_int8" ->
      """WITH qz AS (SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS amax,
             embedding FROM embeddings),
         qv AS (SELECT vec_id,
             list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0
               ELSE CAST(round(CAST(x AS DOUBLE) * 127 / amax) AS INT) END) AS q
           FROM qz),
         qs AS (SELECT vec_id AS qid, q AS qa FROM qv WHERE vec_id < 20),
         s AS (SELECT qid, n.vec_id AS nid,
             CAST(list_aggregate(list_transform(list_zip(qa, n.q),
               z -> CAST(z[1] AS BIGINT) * z[2]), 'sum') AS BIGINT) AS qdot
           FROM qs, qv n WHERE n.vec_id <> qs.qid)
         SELECT qid, rnk, nid, qdot FROM
           (SELECT qid, nid, qdot,
              row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid) AS rnk FROM s)
         WHERE rnk <= 5""",

    // the brute oracle over list_slice'd vectors — same double cosine,
    // same tie rule, 32-dim prefix on both sides
    "sim_topk_mrl" ->
      """WITH q AS (SELECT vec_id AS qid, list_slice(embedding, 1, 32) AS qv
             FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id, list_slice(embedding, 1, 32) AS v FROM embeddings),
         s AS (SELECT qid, c.vec_id AS nid,
             list_aggregate(list_transform(list_zip(qv, c.v),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(c.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
           FROM q, c WHERE c.vec_id <> q.qid)
         SELECT qid, rnk, nid, round(cos, 6) AS cos FROM
           (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM s)
         WHERE rnk <= 5""",

    // the rerank pipeline replayed whole: the int8 shortlist CTEs (same
    // quantizer and integer dots as sim_topk_int8) feed the brute
    // oracle's exact double cosine over ONLY the shortlisted pairs
    "sim_topk_rerank" ->
      """WITH qz AS (SELECT vec_id,
             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS amax,
             embedding FROM embeddings),
         qv AS (SELECT vec_id,
             list_transform(embedding, x -> CASE WHEN amax = 0 THEN 0
               ELSE CAST(round(CAST(x AS DOUBLE) * 127 / amax) AS INT) END) AS q
           FROM qz),
         qs AS (SELECT vec_id AS qid, q AS qa FROM qv WHERE vec_id < 20),
         s AS (SELECT qid, n.vec_id AS nid,
             CAST(list_aggregate(list_transform(list_zip(qa, n.q),
               z -> CAST(z[1] AS BIGINT) * z[2]), 'sum') AS BIGINT) AS qdot
           FROM qs, qv n WHERE n.vec_id <> qs.qid),
         short AS (SELECT qid, nid FROM
             (SELECT qid, nid,
                row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, nid) AS rnk
              FROM s)
           WHERE rnk <= 20),
         r AS (SELECT sh.qid, sh.nid,
             list_aggregate(list_transform(list_zip(qe.embedding, n.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(qe.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(n.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
           FROM short sh
           JOIN embeddings n ON n.vec_id = sh.nid
           JOIN embeddings qe ON qe.vec_id = sh.qid)
         SELECT qid, rnk, nid, round(cos, 6) AS cos FROM
           (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM r)
         WHERE rnk <= 5""",

    // the oracle recomputes the exact >=0.9 pair count over the SAME
    // planted corpus (bit-identical float construction and double
    // accumulation); the LSH-side columns are stated as the contract the
    // engine must meet — zero false positives, recall >= 0.95
    "dedup_cosine_lsh" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         pert AS (SELECT vec_id + 100000 AS vec_id,
             list_transform(range(1, len(embedding) + 1),
               i -> CASE WHEN i <= 2 THEN -embedding[i] ELSE embedding[i] END) AS embedding
           FROM e WHERE vec_id % 5 = 0),
         corpus AS (SELECT * FROM e UNION ALL SELECT * FROM pert),
         n AS (SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
           FROM corpus),
         p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum') / (a.nm * b.nm) AS cos
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT COUNT(*) AS n_exact, CAST(0 AS BIGINT) AS n_false_pos,
                TRUE AS recall_ok
         FROM p WHERE cos >= 0.9""",

    // full replication: planted corpus, every Lloyd round (kmeansCtes over
    // the corpus CTE), final assignment, within-cell pair scores from the
    // raw floats (bit-identical doubles), lower-id-wins drop set
    "dedup_semantic" ->
      s"""WITH corpus AS (
           SELECT vec_id, embedding FROM embeddings
           UNION ALL
           SELECT vec_id + 100000,
             list_transform(range(1, len(embedding) + 1),
               i -> CASE WHEN i <= 2 THEN -embedding[i] ELSE embedding[i] END)
           FROM embeddings WHERE vec_id % 5 = 0),
         ${kmeansCtes(4, 3, "corpus")},
         af AS (SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(e.v, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cell) AS rn
             FROM e CROSS JOIN c3 c) WHERE rn = 1),
         m AS (SELECT af.vec_id, af.cell, c.embedding,
             sqrt(list_aggregate(list_transform(c.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
           FROM af JOIN corpus c ON af.vec_id = c.vec_id),
         d AS (SELECT DISTINCT a.cell, b.vec_id AS id
           FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum')
             / (a.nm * b.nm) >= 0.9)
         SELECT m.cell, COUNT(*) AS n_members,
           CAST(COALESCE(MAX(dc.nd), 0) AS BIGINT) AS n_dropped,
           CAST(COALESCE(MAX(dc.ds), 0) AS BIGINT) AS dropped_id_sum
         FROM m LEFT JOIN (SELECT cell, COUNT(*) AS nd, SUM(id) AS ds
                           FROM d GROUP BY cell) dc ON m.cell = dc.cell
         GROUP BY m.cell""",

    // exact integer censuses + one IEEE-exact double division
    "text_ngram_lm" ->
      """WITH tok AS (SELECT list_filter(
             string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
           FROM documents),
         bg AS (SELECT unnest(list_transform(range(1, len(w)),
             i -> {'w1': w[i], 'w2': w[i + 1]})) AS b
           FROM tok WHERE len(w) >= 2),
         c AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, SUM(c12) AS c1 FROM c GROUP BY w1),
         v AS (SELECT COUNT(DISTINCT w2) AS v FROM c)
         SELECT w1, w2, c12,
           round(CAST(c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE), 6) AS p
         FROM c JOIN c1 USING (w1) CROSS JOIN v
         ORDER BY c12 DESC, w1, w2 LIMIT 30""",

    "text_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents WHERE len(string_split(text, ' ')) > 0),
         b AS (SELECT CAST(length(bin(n)) - 1 AS INT) AS b, n FROM t)
         SELECT CAST(1 << b AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS token_mass
         FROM b GROUP BY b""",

    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id, list_filter(
             string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS w
           FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
             i -> {'w1': w[i], 'w2': w[i + 1]})) AS b
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
         c AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY 1, 2),
         c1 AS (SELECT w1, SUM(c12) AS c1 FROM c GROUP BY w1),
         v AS (SELECT COUNT(DISTINCT w2) AS v FROM c)
         SELECT p.doc_id, COUNT(*) AS n_bigrams,
           round(-avg(ln(CAST(c.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))), 4) AS nll
         FROM p JOIN c USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
         GROUP BY p.doc_id""",

    "dedup_cosine" ->
      """WITH n AS (SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm
           FROM embeddings),
         p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), 'sum') / (a.nm * b.nm) AS cos
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT ia, ib, round(cos, 6) AS cos FROM p
         ORDER BY cos DESC, ia, ib LIMIT 20""",

    // same greedy char-class segmentation regex (RE2 and Java agree on
    // it — no lookbehind anywhere), same integer-sum/count average
    "text_sentences" ->
      """WITH e AS (SELECT doc_id, text ||
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN '. First planted sentence! And a second one? trailing frag'
             WHEN 1 THEN '. Single tail sentence.'
             ELSE ' no terminal punctuation here' END AS t
         FROM documents),
         m AS (SELECT doc_id, t,
             regexp_extract_all(t, '[^.!?]+[.!?]+') AS ms FROM e)
         SELECT doc_id, CAST(len(ms) AS INT) AS n_full,
           length(trim(regexp_replace(t, '[^.!?]+[.!?]+', '', 'g'))) > 0 AS has_frag,
           round(CASE WHEN len(ms) = 0 THEN 0.0 ELSE
             CAST(list_aggregate(list_transform(ms, x -> length(x)), 'sum') AS DOUBLE)
               / len(ms) END, 4) AS avg_full_len,
           CAST(COALESCE(list_aggregate(list_transform(ms, x -> length(x)), 'max'), 0) AS INT)
             AS max_full_len
         FROM m""",

    // DuckDB's nfc_normalize implements the same Unicode canonical
    // composition as the engine's native expression; chr() plants the
    // identical combining marks (769 = U+0301 acute, 778 = U+030A ring,
    // 776 = U+0308 diaeresis) — lengths in code points both sides, md5
    // over the composed UTF-8 both sides
    "text_nfc" ->
      """WITH e AS (SELECT doc_id, text ||
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN ' cafe' || chr(769)
             WHEN 1 THEN ' caf' || chr(233)
             ELSE ' A' || chr(778) || 'ngstro' || chr(776) || 'm' END AS t
         FROM documents)
         SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after,
           nfc_normalize(t) <> t AS changed,
           md5(nfc_normalize(t)) AS nfc_md5
         FROM e""",

    // the SHARED planted noise, same two regexes (DuckDB needs the
    // explicit 'g' flag), same trim — the md5 pins the transformation
    "text_normalize" ->
      s"""WITH e AS (SELECT doc_id, text || $plantedNoiseSql AS t FROM documents),
         n AS (SELECT doc_id, t,
             trim(regexp_replace(regexp_replace(t,
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
               '[ \\t\\n\\r]+', ' ', 'g')) AS c
           FROM e)
         SELECT doc_id, CAST(length(t) AS BIGINT) AS n_before,
           CAST(length(c) AS BIGINT) AS n_after,
           c <> t AS changed, md5(c) AS norm_md5
         FROM n""",

    "text_stats" ->
      """SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_types,
         round(CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)), 'sum') AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS avg_wlen,
         round(CAST(len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS stop_ratio,
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 4) AS ttr
         FROM documents""",

    "text_script_census" ->
      """SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS INT) AS n_latin,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digit,
         CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS INT) AS n_space,
         CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
         CAST(length(regexp_replace(text, '[A-Za-z0-9 .,;:!?]', '', 'g')) AS INT) AS n_other,
         round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
               / length(text), 4) AS latin_ratio
         FROM documents""",

    "sample_mixture_weights" ->
      """WITH c AS (SELECT lang, COUNT(doc_id) AS n_docs FROM documents GROUP BY lang),
              z AS (SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z FROM c)
         SELECT c.lang, c.n_docs, round(sqrt(CAST(c.n_docs AS DOUBLE)) / z.z, 6) AS p
         FROM c, z""",

    // the applied mixture gate: same q arithmetic (round 6 BEFORE the
    // 65536 threshold — the normalizer-ulp shield), same salted nibble
    // hash as sample_stratified
    "sample_mixture_apply" ->
      """WITH c AS (SELECT lang, COUNT(doc_id) AS n_docs FROM documents GROUP BY lang),
         nrm AS (SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z,
                        SUM(n_docs) AS n_all FROM c),
         th AS (SELECT lang,
             least(1.0, round(0.5 * n_all /
               (sqrt(CAST(n_docs AS DOUBLE)) * z), 6)) AS q
           FROM c, nrm),
         k AS (SELECT d.lang, th.q,
             CASE WHEN
                 (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1)
               < CAST(floor(q * 65536) AS INT) THEN 1 ELSE 0 END AS keep
           FROM (SELECT lang, md5('mixapply:' || CAST(doc_id AS VARCHAR)) AS m
                 FROM documents) d
           JOIN th ON d.lang IS NOT DISTINCT FROM th.lang)
         SELECT lang, COUNT(*) AS n_total, CAST(SUM(keep) AS BIGINT) AS n_kept, q
         FROM k GROUP BY lang, q""",

    "text_langid" ->
      s"""WITH s AS (SELECT doc_id,
           ${langScore("'der','die','das','und','schnell'")} AS s_de,
           ${langScore("'the','a','fast','slow','order'")} AS s_en,
           ${langScore("'el','la','los','rapido','orden'")} AS s_es,
           ${langScore("'le','la','les','vite','ordre'")} AS s_fr,
           ${langScore("'de','shi','kuai','man','biao'")} AS s_zh
           FROM documents)
         SELECT doc_id,
           CASE WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en'
                WHEN s_es = g THEN 'es' WHEN s_fr = g THEN 'fr'
                ELSE 'zh' END AS lang_pred,
           CAST(g AS INT) AS best_score
         FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM s)""",

    "text_tokens" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS bpe_tokens
         FROM documents GROUP BY lang""",

    "text_fingerprint" ->
      """SELECT source, COUNT(*) AS n_docs,
         COUNT(DISTINCT md5(lower(regexp_replace(trim(text), ' +', ' ', 'g')))) AS n_unique
         FROM documents GROUP BY source""",

    // same chunk explode + df-capped posting self-join, fully in SQL
    "dedup_chunks" ->
      """WITH chunks AS (
           SELECT doc_id, md5(substr(text, CAST(gs AS INT) * 80 + 1, 120)) AS h
           FROM (SELECT doc_id, text,
                   unnest(range(0, greatest(1, (length(text) - 1) // 80 + 1))) AS gs
                 FROM documents)),
         dist AS (SELECT DISTINCT doc_id, h FROM chunks),
         rare AS (SELECT h FROM dist GROUP BY h HAVING COUNT(*) <= 50)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_chunks
         FROM (SELECT dist.* FROM dist JOIN rare USING (h)) a
         JOIN (SELECT dist.* FROM dist JOIN rare USING (h)) b
           ON a.h = b.h AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    // every perceptron round replayed as CTEs (the sim_topk_ivf_trained
    // protocol): same md5-nibble feature hash, same integer updates, same
    // sign tie rule — the model is exact, so the replication is too
    "text_classifier_quality" -> perceptronOracle(dims = 512, rounds = 4),

    // the full removal pipeline replayed from the SHARED CTE generators:
    // same suffix-LCP chain, same running-max interval merge, same
    // gap/tail surgery, pieces re-joined with an ORDER BY that mirrors
    // the order-pinned array_sort
    "dedup_suffix_removal" ->
      s"""WITH ${suffixLcpCtes("documents")},
         ${suffixRemovalCtes("documents")}
         SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           CAST(length(d.text) - length(COALESCE(k.kept, d.text)) AS BIGINT)
             AS removed_chars,
           md5(COALESCE(k.kept, d.text)) AS kept_md5
         FROM documents d LEFT JOIN keptt k USING (doc_id)""",

    // the chain replayed: planted noise + normalization prelude, then
    // the SHARED removal CTEs over the CLEANED text, source census
    "llm_clean_dedup_e2e" ->
      s"""WITH e AS (SELECT doc_id, text || $plantedNoiseSql AS t FROM documents),
         cln AS (SELECT doc_id,
             trim(regexp_replace(regexp_replace(t,
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
               '[ \\t\\n\\r]+', ' ', 'g')) AS text
           FROM e),
         ${suffixLcpCtes("cln")},
         ${suffixRemovalCtes("cln")},
         per_doc AS (
           SELECT d.doc_id, length(d.text) AS n_chars,
             length(d.text) - length(COALESCE(k.kept, d.text)) AS removed,
             md5(COALESCE(k.kept, d.text)) AS kept_md5
           FROM cln d LEFT JOIN keptt k USING (doc_id))
         SELECT s.source, COUNT(*) AS n_docs,
           CAST(SUM(p.n_chars) AS BIGINT) AS clean_chars,
           CAST(SUM(p.removed) AS BIGINT) AS removed_chars,
           COUNT(DISTINCT p.kept_md5) AS n_unique_kept
         FROM per_doc p JOIN documents s USING (doc_id)
         GROUP BY s.source""",

    // the same shared CTE generator at stride 4 — DuckDB range() takes
    // the identical step, so the sampled suffix multiset matches
    "dedup_suffix_stride" ->
      s"""WITH ${suffixLcpCtes("documents", stride = 4)}
         SELECT doc_id, COUNT(*) AS n_sfx,
           CAST(SUM(CASE WHEN lcp >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS dup_positions,
           CAST(MAX(lcp) AS BIGINT) AS max_dup_len
         FROM sc GROUP BY doc_id""",

    // the full suffix-sort algorithm replayed from the SHARED CTE
    // generator: same global sorted-neighbor LCPs (the engine's range
    // bucketing is layout only — DuckDB replays the semantics with one
    // global window), same prefix-closed LCP-by-filter-length trick
    // (DuckDB list_filter lambda = Spark's codegen'd higher-order filter)
    "dedup_suffix" ->
      s"""WITH ${suffixLcpCtes("documents")}
         SELECT doc_id, COUNT(*) AS n_sfx,
           CAST(SUM(CASE WHEN lcp >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS dup_positions,
           CAST(MAX(lcp) AS BIGINT) AS max_dup_len
         FROM sc GROUP BY doc_id""",

    // unnest(range(...)) replicates the chunk explode (DuckDB's
    // generate_series is not lateral-correlatable); // is floor division,
    // substr/length/md5 are 1-based char semantics both sides
    "text_char_chunks" ->
      """SELECT doc_id, CAST(gs AS INT) AS chunk_idx,
           CAST(gs * 80 AS INT) AS start_pos,
           CAST(length(substr(text, CAST(gs AS INT) * 80 + 1, 120)) AS INT) AS chunk_len,
           md5(substr(text, CAST(gs AS INT) * 80 + 1, 120)) AS chunk_md5
         FROM (SELECT doc_id, text,
                 unnest(range(0, greatest(1, (length(text) - 1) // 80 + 1))) AS gs
               FROM documents)""",

    // same deterministic enrichment, then the same RE2-compatible regexes
    // (DuckDB needs the explicit 'g' flag where Spark replaces all by
    // default); counts cast to INT to match Spark's size()
    "text_pii_scrub" ->
      """WITH e AS (SELECT doc_id,
           text
           || repeat(' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com',
                     CAST(doc_id % 3 AS INT) + 1)
           || repeat(' node 10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 13) % 256 AS VARCHAR),
                     CAST(doc_id % 2 AS INT))
           || ' call ' || CAST(doc_id % 900 + 100 AS VARCHAR)
           || '-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
           || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
         FROM documents)
         SELECT doc_id,
           CAST(COALESCE(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')), 0) AS INT) AS n_emails,
           CAST(COALESCE(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')), 0) AS INT) AS n_ips,
           CAST(COALESCE(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')), 0) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
               '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS red_md5
         FROM e""",

    // ground truth by construction: 4532015112830366 and 4111111111111111
    // are Luhn-valid, 1234567890123456 is not, 123456789012 is 12 digits
    // (below the 13-16 candidate window)
    "text_card_audit" ->
      """WITH e AS (SELECT doc_id, text ||
           CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN ' pay 4532015112830366'
             WHEN 1 THEN ' pay 1234567890123456'
             WHEN 2 THEN ' ref 123456789012'
             ELSE ' pay 4111111111111111' END AS t
         FROM documents)
         SELECT doc_id,
           CAST(CASE WHEN doc_id % 4 = 2 THEN 0 ELSE 1 END AS INT) AS n_candidates,
           CAST(CASE WHEN doc_id % 4 IN (0, 3) THEN 1 ELSE 0 END AS INT) AS n_valid,
           md5(CASE WHEN doc_id % 4 = 0 THEN replace(t, '4532015112830366', '<CARD>')
                    WHEN doc_id % 4 = 3 THEN replace(t, '4111111111111111', '<CARD>')
                    ELSE t END) AS red_md5
         FROM e""",
    // same canonicalization pipeline, CTE-chained; DuckDB regexp_replace
    // needs the explicit 'g' only on the mid-list utm strip (all other
    // patterns are anchored/single); scheme+host lowercased, path kept
    "text_url_canonical" -> {
      def noUtm(e: String) =
        s"""regexp_replace(regexp_replace(regexp_replace($e,
            '&utm_[^&]*', '', 'g'), '\\?utm_[^&]*&', '?'), '\\?utm_[^&]*$$', '')"""
      def canon(e: String) =
        s"""lower(regexp_extract($e, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
            || lower(regexp_extract($e, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
            || regexp_replace(regexp_replace($e,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+', ''), '/$$', '')"""
      s"""WITH u AS (SELECT doc_id,
           'HTTP://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.org/Page'
             || CAST(doc_id % 13 AS VARCHAR) || '/?utm_source=s'
             || CAST(doc_id AS VARCHAR) || '&ref=' || CAST(doc_id % 3 AS VARCHAR)
             || '#top' AS u1,
           'https://WWW.Ref' || CAST(doc_id % 5 AS VARCHAR) || '.net/x/?utm_c=9' AS u2
         FROM documents),
         f AS (SELECT doc_id, regexp_replace(u1, '#.*$$', '') AS f1,
                      regexp_replace(u2, '#.*$$', '') AS f2 FROM u),
         q AS (SELECT doc_id, ${noUtm("f1")} AS q1, ${noUtm("f2")} AS q2 FROM f)
         SELECT doc_id, ${canon("q1")} AS c1, ${canon("q2")} AS c2 FROM q"""
    },
    "text_domain_census" ->
      """WITH e AS (SELECT text || ' see http://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.example.org/p and https://www.ref' || CAST(doc_id % 5 AS VARCHAR)
           || '.net/q' AS t FROM documents),
         d AS (SELECT unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain FROM e)
         SELECT domain, COUNT(*) AS n_refs FROM d
         WHERE domain NOT IN ('site0.example.org', 'www.ref1.net')
         GROUP BY domain""",

    "mm_binary" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(length(text) % 640 AS INT) AS width,
         CAST(length(text) % 480 AS INT) AS height,
         sha256(text) AS b_sha
         FROM documents""",

    // pixel j of the rendered raster is text byte (j % L): the oracle
    // recomputes first/middle-pixel features and the exact pixel sum via
    // cycle arithmetic (full cycles x total + prefix remainder)
    "mm_features" ->
      """WITH m AS (SELECT doc_id, text, COALESCE(length(text), 0) AS L
         FROM documents),
         m2 AS (SELECT doc_id, text, L,
           CAST(L % 64 + 1 AS INT) AS w,
           CAST(L % 48 + 1 AS INT) AS h
         FROM m),
         s AS (SELECT doc_id, text, L, w, h, CAST(w AS BIGINT) * h * 3 AS n,
           list_transform(range(1, CAST(L + 1 AS INT)),
             i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
         FROM m2)
         SELECT doc_id AS id, w, h,
           CASE WHEN L = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END AS f0,
           CASE WHEN L = 0 THEN 0
                ELSE ascii(substr(text, CAST((n // 2) % L AS INT) + 1, 1)) END AS fmid,
           CAST(CASE WHEN L = 0 THEN 0 ELSE
             (n // L) * list_aggregate(codes, 'sum')
             + CASE WHEN n % L = 0 THEN 0
                    ELSE list_aggregate(codes[1:CAST(n % L AS INT)], 'sum') END
             END AS BIGINT) AS px_sum
         FROM s""",

    // the engine really LZW-encodes + inflates GIFs; the oracle recomputes
    // the pixel features from cycle arithmetic (pixel j = text byte j % L,
    // one palette index per pixel)
    "mm_gif" ->
      """WITH m AS (SELECT doc_id, text, COALESCE(strlen(text), 0) AS L
         FROM documents),
         s AS (SELECT doc_id, text, L,
           CAST(L % 48 + 1 AS BIGINT) AS w,
           CAST(L % 32 + 1 AS BIGINT) AS h
         FROM m),
         t2 AS (SELECT doc_id, text, L, w, h, w * h AS n,
           list_transform(range(1, CAST(L + 1 AS INT)),
             i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS codes
         FROM s)
         SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
           CAST(n AS BIGINT) AS n_px,
           CASE WHEN L = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END AS f0,
           CAST(CASE WHEN L = 0 THEN 0 ELSE
             (n // L) * list_aggregate(codes, 'sum')
             + CASE WHEN n % L = 0 THEN 0
                    ELSE list_aggregate(codes[1:CAST(n % L AS INT)], 'sum') END
             END AS BIGINT) AS px_sum
         FROM t2""",

    // the engine really demuxes + LZW-inflates animated GIFs; the oracle
    // recomputes the kept-frame pixel sums (frame fr pixel j = text byte
    // (j + fr) % L) digit-for-digit — the mm_video arithmetic with the
    // GIF geometry
    "mm_gif_video" ->
      """WITH m AS (SELECT doc_id, text, COALESCE(strlen(text), 0) AS L
         FROM documents),
         g AS (SELECT doc_id, text, L,
           CAST(L % 3 + 2 AS BIGINT) AS f,
           CAST(L % 16 + 1 AS BIGINT) AS w,
           CAST(L % 12 + 1 AS BIGINT) AS h
         FROM m),
         s AS (SELECT doc_id, text, L, f, w, h,
           (f + 1) // 2 AS kept, w * h AS n
         FROM g),
         px AS (SELECT doc_id, f, w, h, kept, n,
           CASE WHEN L = 0 THEN 0 ELSE
             list_aggregate(list_transform(list_filter(range(0, f), fr -> fr % 2 = 0),
               fr -> list_aggregate(list_transform(range(0, n),
                 j -> CAST(ascii(substr(text, CAST((j + fr) % L AS INT) + 1, 1)) AS BIGINT)),
                 'sum')), 'sum') END AS px_kept
         FROM s)
         SELECT doc_id, CAST(f AS INT) AS n_frames, CAST(w AS INT) AS w,
           CAST(h AS INT) AS h, CAST(kept AS INT) AS n_kept,
           CAST(px_kept AS BIGINT) AS px_kept
         FROM px""",

    // the engine really encodes + box-walks ISO-BMFF; the oracle
    // recomputes the construction arithmetic (4 fixed boxes + 4 per
    // track; duration = byte length at timescale 1000) and the media
    // hash (mdat payload IS the text bytes, so md5(text) must equal the
    // demuxed-range digest — a wrong offset cannot fake it)
    "mm_mp4" ->
      """SELECT doc_id,
           CAST(4 + 4 * (length(COALESCE(text, '')) % 3 + 1) AS INT) AS n_boxes,
           CAST(length(COALESCE(text, '')) % 3 + 1 AS INT) AS n_tracks,
           1000 AS timescale,
           CAST(length(COALESCE(text, '')) AS BIGINT) AS duration_ms,
           CAST(length(COALESCE(text, '')) AS INT) AS mdat_len,
           md5(COALESCE(text, '')) AS mdat_md5
         FROM documents""",

    // the engine really encodes + chunk-walks + decimates PCM WAVs; the
    // oracle recomputes the sample math (one 16-bit sample per ASCII byte,
    // RMS from exact integer sums of squares — bit-identical doubles)
    "mm_wav" ->
      """WITH v AS (SELECT doc_id,
           list_transform(range(1, COALESCE(length(text), 0) + 1),
             i -> CAST((ascii(substr(text, i, 1)) - 100) * 257 AS BIGINT)) AS s
         FROM documents),
         d AS (SELECT doc_id, s,
           list_transform(range(0, CAST(ceil(len(s) / 4.0) AS BIGINT)),
             j -> s[j * 4 + 1]) AS sd
         FROM v)
         SELECT doc_id, 8000 AS sr, 1 AS ch,
           CAST(len(s) AS INT) AS n_samples,
           CASE WHEN len(s) = 0 THEN 0.0 ELSE
             sqrt(list_aggregate(list_transform(s, x -> x * x), 'sum')
                  / CAST(len(s) AS DOUBLE)) END AS rms,
           2000 AS sr_dec,
           CAST(len(sd) AS INT) AS n_dec,
           CASE WHEN len(sd) = 0 THEN 0.0 ELSE
             sqrt(list_aggregate(list_transform(sd, x -> x * x), 'sum')
                  / CAST(len(sd) AS DOUBLE)) END AS rms_dec
         FROM d""",

    // full SQL replication of the nearest-neighbor resize: output byte p
    // maps to source byte ((((y*h//rh)*w + x*w//rw)*3 + channel) % L)
    "mm_transform" ->
      """WITH m0 AS (SELECT doc_id, text, COALESCE(length(text), 0) AS L
         FROM documents),
         m AS (SELECT doc_id, text, L,
           CAST(L % 64 + 1 AS BIGINT) AS w,
           CAST(L % 48 + 1 AS BIGINT) AS h
         FROM m0),
         g AS (SELECT doc_id, text, L, w, h,
           greatest(w // 2, 1) AS rw, greatest(h // 2, 1) AS rh FROM m),
         px AS (SELECT doc_id, w, h, rw, rh,
           CASE WHEN L = 0 THEN 0 ELSE
             list_aggregate(list_transform(range(0, rw * rh * 3),
               p -> CAST(ascii(substr(text,
                 CAST(((((p // 3 // rw) * h // rh) * w + ((p // 3) % rw) * w // rw) * 3 + p % 3) % L AS INT) + 1,
                 1)) AS BIGINT)), 'sum') END AS px_sum_resized
         FROM g)
         SELECT doc_id AS id, CAST(rw AS INT) AS rw, CAST(rh AS INT) AS rh,
           CAST(px_sum_resized AS BIGINT) AS px_sum_resized
         FROM px""",

    // the engine really renders, demuxes and frame-samples PPM streams;
    // the oracle recomputes the container arithmetic (frame byte length =
    // 9 + digits(w) + digits(h) header + w*h*3 raster) and the kept-frame
    // pixel sums (frame f pixel j = text byte (j+f) % L) digit-for-digit
    "mm_video" ->
      """WITH m AS (SELECT doc_id, text, COALESCE(strlen(text), 0) AS L
         FROM documents),
         g AS (SELECT doc_id, text, L,
           CAST(L % 4 + 2 AS BIGINT) AS f,
           CAST(L % 8 + 1 AS BIGINT) AS w,
           CAST(L % 6 + 1 AS BIGINT) AS h
         FROM m),
         s AS (SELECT doc_id, text, L, f, w, h,
           9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
             + w * h * 3 AS frame_len,
           (f + 1) // 2 AS kept,
           w * h * 3 AS n
         FROM g),
         px AS (SELECT doc_id, f, w, h, frame_len, kept, n,
           CASE WHEN L = 0 THEN 0 ELSE
             list_aggregate(list_transform(list_filter(range(0, f), fr -> fr % 2 = 0),
               fr -> list_aggregate(list_transform(range(0, n),
                 j -> CAST(ascii(substr(text, CAST((j + fr) % L AS INT) + 1, 1)) AS BIGINT)),
                 'sum')), 'sum') END AS px_kept
         FROM s)
         SELECT doc_id, CAST(f AS INT) AS n_frames, CAST(w AS INT) AS w,
           CAST(h AS INT) AS h, CAST(f * frame_len AS BIGINT) AS total_bytes,
           CAST(kept AS INT) AS n_kept,
           CAST(kept * frame_len AS BIGINT) AS kept_bytes,
           CAST(px_kept AS BIGINT) AS px_kept
         FROM px"""
  )

  /** CTE chain replicating [[graft.llm.Similarity.kmeansCentroids]] exactly:
    * salted-md5 seeded init (cell = hash rank), then `iters` unrolled Lloyd
    * rounds — assignment by squared L2 with ties to the lower cell, update
    * by per-cell per-dimension AVG. Ends with centroid CTE `c$iters`. */
  private def kmeansCtes(kCells: Int, iters: Int,
      src: String = "embeddings"): String = {
    val sb = new StringBuilder
    sb ++= s"""e AS (SELECT vec_id, embedding,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM $src),
         c0 AS (SELECT cell, v AS cv FROM (
             SELECT row_number() OVER (
                 ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell, v
             FROM e) WHERE cell < $kCells)"""
    (1 to iters).foreach { i =>
      sb ++= s""",
         a$i AS (SELECT vec_id, v, cell FROM (
             SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(e.v, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cell) AS rn
             FROM e CROSS JOIN c${i - 1} c) WHERE rn = 1),
         c${i}d AS (SELECT cell, s.i AS i, AVG(s.v) AS a FROM
             (SELECT cell, unnest(list_transform(range(1, len(v) + 1),
               i -> {'i': i, 'v': v[i]})) AS s FROM a$i) GROUP BY cell, s.i),
         c$i AS (SELECT cell, list(a ORDER BY i) AS cv FROM c${i}d GROUP BY cell)"""
    }
    sb.toString
  }

  /** Parameterized k-means CTE chain for SUB-VECTOR codebooks (the PQ
    * oracle): like [[kmeansCtes]] but over `vExpr` (a slice of the
    * doubles CTE `e`), with per-subspace salt and CTE-name prefix `p`.
    * Emits `${p}e` (vec_id, v = the slice) and centroids `${p}c$iters`. */
  private def kmeansSubCtes(p: String, vExpr: String, kCells: Int,
      iters: Int, salt: String): String = {
    val sb = new StringBuilder
    sb ++= s"""${p}e AS (SELECT vec_id, $vExpr AS v FROM e),
         ${p}c0 AS (SELECT cell, v AS cv FROM (
             SELECT row_number() OVER (
                 ORDER BY md5('$salt:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell, v
             FROM ${p}e) WHERE cell < $kCells)"""
    (1 to iters).foreach { i =>
      sb ++= s""",
         ${p}a$i AS (SELECT vec_id, v, cell FROM (
             SELECT n.vec_id, n.v, c.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 list_aggregate(list_transform(list_zip(n.v, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum'), c.cell) AS rn
             FROM ${p}e n CROSS JOIN ${p}c${i - 1} c) WHERE rn = 1),
         ${p}c${i}d AS (SELECT cell, s.i AS i, AVG(s.v) AS a FROM
             (SELECT cell, unnest(list_transform(range(1, len(v) + 1),
               i -> {'i': i, 'v': v[i]})) AS s FROM ${p}a$i) GROUP BY cell, s.i),
         ${p}c$i AS (SELECT cell, list(a ORDER BY i) AS cv FROM ${p}c${i}d GROUP BY cell)"""
    }
    sb.toString
  }

  /** The full PQ/ADC oracle: m per-subspace k-means codebooks, per-vector
    * argmin codes, per-query centroid distance tables, ranking by the
    * code-looked-up distance sum in fixed subspace order. */
  private def pqSql(m: Int, sub: Int, kCodes: Int, iters: Int, k: Int): String = {
    val dist = (a: String, b: String) =>
      s"""list_aggregate(list_transform(list_zip($a, $b),
           z -> (z[1] - z[2]) * (z[1] - z[2])), 'sum')"""
    val subspaces = (0 until m).map { j =>
      kmeansSubCtes(s"s$j", s"v[${j * sub + 1}:${(j + 1) * sub}]", kCodes, iters, s"pq$j")
    }.mkString(",\n         ")
    val codes = (0 until m).map { j =>
      s"""n$j AS (SELECT vec_id, cell AS code_$j FROM (
             SELECT p.vec_id, c.cell,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 ${dist("p.v", "c.cv")}, c.cell) AS rn
             FROM s${j}e p CROSS JOIN s${j}c$iters c) WHERE rn = 1)"""
    }.mkString(",\n         ")
    val qtabs = (0 until m).map { j =>
      s"""qd$j AS (SELECT p.vec_id AS qid, c.cell AS code_$j,
             ${dist("p.v", "c.cv")} AS d_$j
           FROM s${j}e p CROSS JOIN s${j}c$iters c WHERE p.vec_id < 20)"""
    }.mkString(",\n         ")
    val codeJoins = (1 until m)
      .map(j => s"JOIN n$j ON n$j.vec_id = n0.vec_id").mkString("\n           ")
    val tabJoins = (0 until m)
      .map(j => s"JOIN qd$j ON qd$j.qid = q.qid AND qd$j.code_$j = n$j.code_$j")
      .mkString("\n           ")
    val adist = (0 until m).map(j => s"qd$j.d_$j").mkString(" + ")
    s"""WITH e AS (SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         $subspaces,
         $codes,
         $qtabs,
         q AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < 20),
         adc AS (SELECT q.qid, n0.vec_id AS nid, $adist AS adist
           FROM q
           JOIN n0 ON n0.vec_id <> q.qid
           $codeJoins
           $tabJoins)
         SELECT qid, rnk, nid, round(adist, 4) AS adist FROM
           (SELECT qid, nid, adist,
              row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rnk FROM adc)
         WHERE rnk <= $k"""
  }

  /** Shared CTE chain deriving the exact-Jaccard pair scores (pre-threshold)
    * — the common prefix of the jaccard, minhash and clusters oracles. */
  private def jaccardCtes(maxDocFreq: Option[Int], src: String = "documents"): String = {
    val dfFilter = maxDocFreq
      .map(cap => s"AND s NOT IN (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > $cap)")
      .getOrElse("")
    s"""words AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
              FROM words),
       sh0 AS (SELECT doc_id, s FROM sh WHERE s IS NOT NULL AND length(s) > 0),
       shc AS (SELECT doc_id, s FROM sh0 WHERE TRUE $dfFilter),
       cnt AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
       pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
                 FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       scored AS (SELECT ia, ib, CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS j
                  FROM pairs JOIN cnt ca ON ia = ca.doc_id JOIN cnt cb ON ib = cb.doc_id)"""
  }

  private def jaccardSql(maxDocFreq: Option[Int]): String =
    s"""WITH ${jaccardCtes(maxDocFreq)}
       SELECT ia, ib, round(j, 4) AS jaccard FROM scored WHERE j >= 0.5"""

  /** Connected components of the thresholded Jaccard pair graph via a
    * recursive CTE: enumerate every (vertex, reachable-vertex) pair, take
    * the min reachable id as the cluster label. Exponential in nothing on
    * the tiny planted clusters; the ENGINE side is the scalable path. */
  /** Shared SimHash signature + brute-force pair CTEs (DuckDB): token
    * md5-digit bits → per-bit ±1 sums → sign bits → all-pairs Hamming
    * distance. The engine's chunk-bucketed candidates are provably
    * complete at d≤3, so results over these exact pairs are the oracle
    * for both the pair and the components surface. */
  private def simhashPairCtes: String =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         t2 AS (SELECT doc_id, substr(md5(w), 1, 16) AS m FROM tok WHERE length(w) > 0),
         bits AS (SELECT doc_id, b,
             SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, b // 4 + 1, 1)) - 1)
                            >> (b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
           FROM t2 CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
           GROUP BY doc_id, b),
         sigs AS (SELECT doc_id, list(CASE WHEN s > 0 THEN 1 ELSE 0 END ORDER BY b) AS sig
                  FROM bits GROUP BY doc_id),
         pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
             CAST(list_aggregate(list_transform(list_zip(a.sig, b.sig),
               z -> CASE WHEN z[1] <> z[2] THEN 1 ELSE 0 END), 'sum') AS INT) AS dist
           FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)"""

  private def clusterCtes(maxDocFreq: Option[Int] = Some(100),
      src: String = "documents", prelude: String = ""): String =
    s"""WITH RECURSIVE $prelude${jaccardCtes(maxDocFreq, src)},
       jp AS (SELECT ia, ib FROM scored WHERE j >= 0.5),
       e AS (SELECT ia AS u, ib AS v FROM jp UNION SELECT ib, ia FROM jp),
       reach(id, r) AS (
         SELECT u, u FROM e
         UNION
         SELECT e.u, reach.r FROM e JOIN reach ON e.v = reach.id),
       comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)"""

  private def clustersSql(maxDocFreq: Option[Int] = Some(100),
      src: String = "documents", prelude: String = ""): String =
    s"""${clusterCtes(maxDocFreq, src, prelude)}
       SELECT cluster_id, COUNT(*) AS n_docs,
              string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS members
       FROM comp GROUP BY cluster_id"""

  /** The batch segment-dedup oracle over the post-wave corpus — shared
    * by the API-driven and SQL-lifecycle graded variants. */
  private def incrSegmentsSql: String =
    s"""WITH $incrCorpusCte
       w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       segs AS (SELECT doc_id, s['pos'] AS pos, s['seg'] AS seg FROM
         (SELECT doc_id, unnest(list_transform(
             range(0, CAST(ceil(len(w) / 8.0) AS BIGINT)),
             i -> {'pos': i, 'seg': array_to_string(w[i * 8 + 1 : (i + 1) * 8], ' ')})) AS s
          FROM w)),
       dfq AS (SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
       SELECT doc_id AS id, COUNT(*) AS n_segs,
         COUNT(CASE WHEN df >= 2 THEN 1 END) AS n_dup_segs,
         md5(COALESCE(string_agg(seg, ' ' ORDER BY pos)
           FILTER (WHERE df < 2), '')) AS kept_md5
       FROM segs JOIN dfq USING (seg)
       GROUP BY doc_id"""

  /** The batch duplicated-span census over the post-wave corpus —
    * shared by the API-driven and SQL-lifecycle graded variants. */
  private def incrSpansSql: String =
    s"""WITH $incrCorpusCte
       w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                  i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
              FROM w),
       sh0 AS (SELECT doc_id, s FROM sh WHERE s IS NOT NULL AND length(s) > 0),
       dfq AS (SELECT s, COUNT(*) AS df FROM sh0 GROUP BY s)
       SELECT doc_id AS id, COUNT(*) AS n_shingles,
         COUNT(CASE WHEN df >= 2 THEN 1 END) AS n_dup,
         round(CAST(COUNT(CASE WHEN df >= 2 THEN 1 END) AS DOUBLE) / COUNT(*), 4) AS dup_ratio
       FROM sh0 JOIN dfq USING (s)
       GROUP BY doc_id"""

  /** The FINAL live corpus after [[LlmScenario]]'s three CDC waves,
    * reconstructed in pure SQL (the waves are modular-arithmetic
    * transforms by design): %13 texts rewritten to a unique single
    * token, %11 docs deleted. */
  private def incrCorpusCte: String =
    """corpus AS (SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN 'uniq' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
       FROM documents WHERE doc_id % 11 <> 0),
       """

  private def keepSql: String =
    s"""${clusterCtes()}
       SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
              (SELECT COUNT(*) FROM comp) AS n_in_clusters,
              (SELECT COUNT(*) FROM comp WHERE id <> cluster_id) AS n_removed,
              (SELECT COUNT(*) FROM documents)
                - (SELECT COUNT(*) FROM comp WHERE id <> cluster_id) AS n_kept"""
}
