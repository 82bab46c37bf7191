package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Sampling, Similarity}

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Corpus where every doc has an exact twin at doc_id + 100000. */
  private lazy val twins = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100).cache()
    docs.union(docs.withColumn("doc_id", $"doc_id" + 100000L))
  }

  test("exact dedup counts every planted twin") {
    val row = Dedup.exactStats(twins, "text").collect()(0)
    assert(row.getAs[Long]("n_docs") == 200)
    assert(row.getAs[Long]("n_dup_groups") == 100)
    assert(row.getAs[Long]("n_redundant") == 100)
  }

  test("MinHash-LSH recalls all exact twins with jaccard 1.0") {
    val pairs = Dedup.minhashPairs(twins, "doc_id", "text", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val twinPairs = pairs.filter { case (a, b, _) => b == a + 100000L }
    assert(twinPairs.length == 100)
    assert(twinPairs.forall(_._3 == 1.0))
  }

  test("minhash band join survives a planted 1k-identical cluster; cap spares copies") {
    // the crawl-scale hazard: 1000 byte-identical copies of one page.
    // Pre-collapse, the band self-join emitted bands × n²/2 rows for it;
    // collapsed, the cluster is ONE band representative and candidates
    // are exactly the true member pairs
    val n = 1000
    val cluster = (1L to n.toLong).map(i =>
      (i, "the same boilerplate page body repeated verbatim across the crawl"))
    val nearA = (2001L, "alpha beta gamma delta epsilon zeta eta theta")
    val nearB = (2002L, "alpha beta gamma delta epsilon zeta eta iota")
    val far = (3001L, "something else entirely about unrelated topics ten words long")
    val docs = (cluster ++ Seq(nearA, nearB, far)).toDF("doc_id", "text")
    val truePairs = n.toLong * (n - 1) / 2
    val cands = Dedup.minhashCandidates(Dedup.shingles(docs, "doc_id", "text"),
      "doc_id", bands = 16, rows = 4, maxBandFreq = 1024).count()
    assert(cands >= truePairs && cands <= truePairs + 20,
      s"candidate volume must be output-proportional, got $cands for $truePairs true pairs")
    // the TIGHTEST cap (every 2+-distinct-signature bucket dropped) must
    // not lose a single identical-cluster pair: copies carry no bucket
    // density, so only the cross-signature near-dup pair may disappear
    val capped = Dedup.minhashPairs(docs, "doc_id", "text",
        threshold = 0.5, maxBandFreq = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.length == truePairs,
      s"cap=1 must keep exactly the identical-cluster pairs, got ${capped.length}")
    assert(capped.forall(_._3 == 1.0))
    assert(capped.forall { case (a, b, _) => a <= n && b <= n })
    // the default cap changes nothing: all cluster pairs verified at 1.0,
    // extras (if the near pair's bands collide) only among the near twins
    val dflt = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dflt.count { case (a, b, _) => a <= n && b <= n } == truePairs)
    assert(dflt.forall { case (a, b, _) =>
      (a <= n && b <= n) || (a == 2001L && b == 2002L) })
  }

  test("suffix census survives a 1e5-instance hot value; AQE splits the skewed instance join") {
    // one 100k-char single-character doc: every interior position yields
    // the SAME 60-char truncated suffix, so one value carries ~1e5
    // instances into the sfx⋈valLcp instance join — the boilerplate-value
    // regime at crawl scale. The value collapse absorbs it everywhere
    // except that final join, where AQE's skew split is the guard this
    // fixture pins (thresholds lowered to make 7 MB of hot rows count as
    // skew at test scale).
    // 100k docs of ONE 20-char string: each contributes a single
    // instance of a single suffix value — a 1e5-instance hot value whose
    // shuffle partition stays >threshold because the distinct doc_ids
    // resist the shuffle codec (a periodic 'a'*L doc also plants a hot
    // value, but zstd flattens its constant rows below any threshold —
    // it rides along here for the census assertions only)
    val R = "qZ3kF8pLw2NvXs9TbYd0"
    val hotMany = spark.range(1, 100001)
      .select((col("id") + 100L).as("doc_id"), lit(R).as("text"))
    val rest = Seq(
      (1L, "a" * 100000),
      (2L, "completely distinct words forming no twenty char duplicate runs"),
      (3L, "another unrelated body of text with its own vocabulary entirely"))
    val docs = hotMany.unionByName(rest.toDF("doc_id", "text"))
    // at REAL hot-value scale the distinct-value side stays small and
    // AQE resolves the instance join as a runtime BROADCAST (no skew
    // possible at all — the multiset side never shuffles on s); forbid
    // broadcast here to pin the OTHER guard: when distinct values are
    // too many to broadcast, the sort-merge path must skew-split the
    // hot value's partition
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    // the hot rows are identical strings — they compress ~250:1 in the
    // shuffle, so the byte thresholds must sit far below the raw size
    spark.conf.set(keys(0), "8k")
    spark.conf.set(keys(1), "8k")
    spark.conf.set(keys(2), "2")
    spark.conf.set(keys(3), "-1")
    spark.conf.set(keys(4), "-1")
    spark.conf.set(keys(5), "true")
    try {
      val df = Dedup.suffixDuplication(docs, "doc_id", "text",
        minMatch = 20, maxSuffix = 60, buckets = 8)
      val rows = df.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // census exact under both hot values: every copy of R is one fully
      // duplicated 20-char suffix; the periodic doc has all 99,981
      // starts duplicated (interior suffixes identical, tail suffixes of
      // length 20..59 proper prefixes of the run); neighbors untouched
      assert(rows.size == 100003)
      assert(rows(101L) == ((1L, 1L, 20L)) && rows(100100L) == ((1L, 1L, 20L)))
      assert(rows.count(_._2 == ((1L, 1L, 20L))) == 100000)
      assert(rows(1L) == ((99981L, 99981L, 60L)), s"periodic doc census: ${rows(1L)}")
      assert(rows(2L)._2 == 0L && rows(3L)._2 == 0L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected an AQE skew-split marker in the executed plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) if v != null => spark.conf.set(k, v)
      case (k, _) => spark.conf.unset(k)
    }
  }

  test("components API: a 10k-identical cluster costs linear edges, same components") {
    // the pairs API would expand this cluster to ~5·10⁷ member pairs
    // before CC collapsed them; the components edge list must stay O(n)
    val n = 10000
    val cluster = (1L to n.toLong).map(i =>
      (i, "the same boilerplate page body repeated verbatim across the crawl"))
    val nearA = (20001L, "alpha beta gamma delta epsilon zeta eta theta")
    val nearB = (20002L, "alpha beta gamma delta epsilon zeta eta iota")
    val far = (30001L, "something else entirely about unrelated topics ten words long")
    val docs = (cluster ++ Seq(nearA, nearB, far)).toDF("doc_id", "text")
    val edges = Dedup.minhashComponentEdges(docs, "doc_id", "text",
      threshold = 0.5, bands = 16, rows = 4, maxBandFreq = 1024)
    val ec = edges.count()
    assert(ec >= n - 1 && ec <= n + 20,
      s"edge list must be linear in cluster size: got $ec for $n members")
    val comp = Dedup.minhashComponents(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to n.toLong).forall(comp.get(_).contains(1L)),
      "every identical member lands in the min-id component")
    assert(comp.get(20001L).contains(20001L) && comp.get(20002L).contains(20001L))
    assert(!comp.contains(30001L), "the unpaired doc appears in no component")
  }

  test("components == pairs-CC bit for bit, incl. the df-capped identical group") {
    // mixed corpus: real docs, an 80-copy group (under the df cap — must
    // cluster via star edges), and a 150-copy group whose every shingle
    // exceeds df cap 100 (must vanish from BOTH paths — the survivor pin)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(60)
    val g80 = (1L to 80L).map(i =>
      (500000L + i, "an eighty copy group body that stays under the document frequency cap"))
    val g150 = (1L to 150L).map(i =>
      (600000L + i, "a over cap group body appearing one hundred fifty times in the corpus"))
    val docs = real.union((g80 ++ g150).toDF("doc_id", "text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"comp").as[(Long, Long)].collect().toSet
    val viaPairs = norm(Dedup.connectedComponents(
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, Some(100)), "ia", "ib"))
    val viaStar = norm(Dedup.jaccardComponents(docs, "doc_id", "text", 0.5, Some(100)))
    assert(viaStar == viaPairs,
      s"star components must equal pairs components (star ${viaStar.size} vs pairs ${viaPairs.size})")
    assert(viaStar.count(_._2 == 500001L) == 80, "the 80-group clusters whole")
    assert(!viaStar.exists(_._1 > 600000L), "the df-capped group vanishes from both")
    // and the minhash flavor agrees with ITS pairs path (no df cap)
    val mhPairs = norm(Dedup.connectedComponents(
      Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5), "ia", "ib"))
    val mhStar = norm(Dedup.minhashComponents(docs, "doc_id", "text", threshold = 0.5))
    assert(mhStar == mhPairs)
  }

  test("simhash components: linear star edges, clusters equal the pairs-CC") {
    // a 5000-copy identical group must cost ~5000 star edges, never
    // ~12.5M member pairs; near-sigs connect via rep-level pairs
    val n = 5000
    val cluster = (1L to n.toLong).map(i =>
      (i, "the same boilerplate page body repeated verbatim across the crawl"))
    val nearA = (20001L, "alpha beta gamma delta epsilon zeta eta theta kappa")
    val nearB = (20002L, "alpha beta gamma delta epsilon zeta eta theta lambda")
    val far = (30001L, "something else entirely about unrelated topics ten words long")
    val docs = (cluster ++ Seq(nearA, nearB, far)).toDF("doc_id", "text")
    val ec = Dedup.simhashComponentEdges(docs, "doc_id", "text",
      maxDist = 3, maxChunkFreq = 1024).count()
    assert(ec >= n - 1 && ec <= n + 20,
      s"edge list must be linear in cluster size: got $ec for $n members")
    val comp = Dedup.simhashComponents(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to n.toLong).forall(comp.get(_).contains(1L)),
      "every identical member lands in the min-id component")
    // equivalence on a mixed real corpus: components == CC over the
    // full simhashPairs member-pair graph, bit for bit
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"comp").as[(Long, Long)].collect().toSet
    val viaPairs = norm(Dedup.connectedComponents(
      Dedup.simhashPairs(real, "doc_id", "text", maxDist = 3), "ia", "ib"))
    val viaStar = norm(Dedup.simhashComponents(real, "doc_id", "text", maxDist = 3))
    assert(viaStar == viaPairs,
      s"star components must equal pairs components (${viaStar.size} vs ${viaPairs.size})")
  }

  test("simhash chunk join survives an identical cluster; tight cap spares copies") {
    // same guards as minhash: copies collapse to one chunk-join row, so
    // even a cap of 1 keeps every identical-cluster pair at distance 0
    val n = 300
    val cluster = (1L to n.toLong).map(i =>
      (i, "the very same boilerplate page body repeated across the crawl"))
    val far = Seq((9001L, "something wholly unrelated about other topics entirely"))
    val docs = (cluster ++ far).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(docs, "doc_id", "text",
        maxDist = 3, maxChunkFreq = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val truePairs = n.toLong * (n - 1) / 2
    assert(capped.length == truePairs,
      s"cap=1 must keep exactly the cluster pairs, got ${capped.length}")
    assert(capped.forall { case (a, b, d) => a <= n && b <= n && d == 0 })
    // default cap: same cluster pairs; extras only if the far doc's
    // simhash genuinely lands within distance 3 (deterministic either way)
    val dflt = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(dflt.count { case (a, b, _) => a <= n && b <= n } == truePairs)
  }

  test("dense-bucket cap hits are observable, never silent") {
    import graft.llm.CapObservability
    // five DISTINCT texts that share a word prefix: their simhash
    // signatures differ, but several chunks collide — with cap=1 every
    // shared (chunk, value) bucket holding 2+ distinct signatures is
    // capped and must be REPORTED through the observation metric.
    // AQE off: with every bucket capped the candidate branch is
    // runtime-empty, and AQE's empty-propagation would prune the
    // CollectMetrics node (the documented edge the audit query covers).
    val docs = (1L to 5L).map(i =>
      (i, s"shared boilerplate preamble common across pages variant $i"))
      .toDF("doc_id", "text")
    val mark = CapObservability.marker()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3, maxChunkFreq = 1)
      .count()
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // listener delivery is async — poll THIS run's observations (the
    // marker scopes the read, so concurrent dedup runs can't interfere)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var seen = CapObservability.cappedSince(mark).lastOption
    while ((seen.isEmpty || seen.exists(_._1 == 0L)) &&
        System.nanoTime() < deadline) {
      Thread.sleep(50); seen = CapObservability.cappedSince(mark).lastOption
    }
    assert(seen.exists(_._1 > 0L),
      s"capped buckets must surface in the observation metric, got $seen")
    assert(seen.exists(_._2 >= seen.get._1),
      "every capped bucket contributes at least one capped signature row")
    // the deterministic audit census agrees with the inline observation
    val audit = Dedup.simhashCapAudit(docs, "doc_id", "text", maxChunkFreq = 1)
      .collect()(0)
    assert((audit.getLong(0), audit.getLong(1)) == seen.get,
      s"audit ${(audit.getLong(0), audit.getLong(1))} vs observed $seen")
  }

  test("SimHash places exact twins at hamming distance 0") {
    val pairs = Dedup.simhashPairs(twins, "doc_id", "text", maxDist = 0)
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    (0 until 100).foreach { _ => }
    val ids = twins.filter($"doc_id" < 100000L).select($"doc_id").as[Long].collect()
    assert(ids.forall(id => pairs.contains((id, id + 100000L))))
  }

  test("IVF probing every cell reproduces the brute-force top-k exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nCells = emb.select($"label").distinct().count().toInt
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
        col("vec_id") < 10, k = 3, nprobe = nCells)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("trained IVF probing every cell reproduces brute force; training is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // with nprobe = kCells every cell is searched, so the k-means
    // partition must be invisible: result == exact brute force
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", col("vec_id") < 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val trained = Similarity.ivfTrainedTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 3, nprobe = 4, kCells = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(trained == brute)
    // seeded init + deterministic iteration: two runs, identical centroids
    val c1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(c1 == c2)
    assert(c1.nonEmpty && c1.size <= 4)
  }

  test("PQ: an exact copy of the query attains the minimal ADC distance; runs are identical") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant an exact copy of query vector 3 at id 100003: adist(q, copy) =
    // sum over subspaces of min-centroid distance — the provable minimum
    val copy = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("label"), col("embedding"))
    val corpus = emb.select(col("vec_id"), col("label"), col("embedding")).unionByName(copy)
    val r1 = Similarity.pqTopK(corpus, "vec_id", "embedding", col("vec_id") === 3,
      k = 10, m = 4, kCodes = 4, iters = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val copyDist = r1.find(_._2 == 100003L)
      .getOrElse(fail(s"copy not in top-10: ${r1.toSeq}"))._3
    assert(r1.forall(_._3 >= copyDist),
      s"copy's adist $copyDist must be the minimum (got ${r1.toSeq})")
    val r2 = Similarity.pqTopK(corpus, "vec_id", "embedding", col("vec_id") === 3,
      k = 10, m = 4, kCodes = 4, iters = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(r1.toSeq == r2.toSeq, "PQ must be deterministic across runs")
  }

  test("IVF with partial probe returns a subset ranking consistent with brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      col("vec_id") < 10, k = 3, nprobe = 2)
    // every returned neighbor really is in one of the probed cells and
    // scores are monotonically decreasing per query
    val byQ = ivf.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("blocked cosine top-pairs equals the all-pairs nested-loop baseline") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopPairs(emb, "vec_id", "embedding", topN = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val blocked = Similarity.cosineTopPairsBlocked(emb, "vec_id", "embedding",
        topN = 20, blocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(blocked == exact)
    // and the blocked plan must contain no nested-loop join
    val plan = Similarity.cosineTopPairsBlocked(emb, "vec_id", "embedding", 20, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("hyperplane-LSH recalls planted embedding near-dups at threshold 0.9") {
    // plant near-identical twins: vector + tiny perturbation on one dim
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val twinsEmb = (base ++ base.map { case (id, v) =>
      val w = v.clone(); w(0) = w(0) + 0.01f; (id + 1000L, w)
    }).toDF("vec_id", "embedding")
    val got = Similarity.lshCosinePairs(twinsEmb, "vec_id", "embedding",
        threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = base.map { case (id, _) => (id, id + 1000L) }.toSet
    assert(planted.subsetOf(got))
    // candidates come from band-signature equality: no nested-loop join
    val plan = Similarity.lshCosinePairs(twinsEmb, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("jaccard hot-shingle cap bounds the candidate set on a planted stop-shingle") {
    // 40 docs: unique 6-word body + the SAME 5-word boilerplate sentence.
    // Every boilerplate trigram has df=40, so without a cap the inverted
    // index emits all 40*39/2 = 780 candidate pairs; with the cap the hot
    // shingles drop from index AND counts and no pair shares anything.
    val docs = (0 until 40).map { i =>
      (i.toLong, s"unique$i word$i token$i alpha$i beta$i gamma$i " +
        "common boilerplate sentence shared everywhere")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.0,
      maxDocFreq = None)  // explicit opt-out: the cap is ON by default
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.0,
      maxDocFreq = Some(10))
    assert(uncapped.count() == 780L)  // the p² blowup the cap exists to stop
    assert(capped.count() == 0L)
    // and on a corpus with REAL near-dups the cap must not lose them:
    // twins share all their shingles, none of which exceed df=2
    val cappedTwins = Dedup.jaccardPairs(twins, "doc_id", "text",
      threshold = 0.99, maxDocFreq = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cappedTwins.count { case (a, b) => b == a + 100000L } == 100)
  }

  test("connected components labels a long chain, a triangle and singles-pair") {
    // chain 1..6 forces multiple propagation rounds; triangle 10-11-12;
    // isolated edge 20-21. Min label wins in every component.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 6L).forall(got(_) == 1L))
    assert((10L to 12L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 11)
  }

  test("semanticDedup drops exactly the lower-priority twin within a cell") {
    import graft.llm.Similarity
    // two tight direction-clusters; ids 1/2 near-parallel (cos ~ 1),
    // id 3 orthogonal-ish in its own neighborhood
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.04f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.04f, 0.999f, 0.0f)),
      (5L, Array(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.95, kCells = 2, iters = 2)
      .select("n_members", "n_dropped", "dropped_id_sum")
      .as[(Long, Long, Long)].collect().toSeq
    // whatever the trained cells are, each twin pair collapses to its
    // lower id: exactly 2 and 4 are dropped across all cells
    assert(got.map(_._2).sum == 2 && got.map(_._3).sum == 6,
      s"expected drops {2, 4}, got $got")
    assert(got.map(_._1).sum == 5)
  }

  test("semanticDedup cell-size contract holds at kCells >> default") {
    import graft.llm.Similarity
    // the scaladoc contract, production-shaped kCells: PRECISION is
    // exact at any cell count (only true cos>=threshold pairs drop) and
    // an EXACT duplicate can never escape — identical vectors tie on
    // distance to every centroid and the tie-break sends both to the
    // same (lower) cell, at any kCells. Near-parallel-but-distinct
    // pairs MAY split across cells as k grows: that is the recall
    // trade the contract documents, not a defect.
    val twins = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)))   // exact duplicate of 1
    val spread = (10L until 26L).map { i =>
      val a = (i - 10).toFloat / 16 * 6.283f
      (i, Array(0.0f, 0.1f * (i - 10), math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val emb = (twins ++ spread).toDF("vec_id", "embedding")
    for (k <- Seq(2, 12)) {
      val r = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.999, kCells = k, iters = 3)
        .select("n_members", "n_dropped", "dropped_id_sum")
        .as[(Long, Long, Long)].collect()
      // membership is a partition of the corpus at any k
      assert(r.map(_._1).sum == 18, s"kCells=$k members=$r")
      // the exact duplicate is caught, and NOTHING else drops
      // (precision: the spread vectors share no cos>=0.999 pair)
      assert(r.map(_._2).sum == 1 && r.map(_._3).sum == 2,
        s"kCells=$k expected drop set {2}, got $r")
    }
  }

  test("scriptCensus counts character classes exactly and disjointly") {
    import graft.llm.TextAnalysis
    val docs = Seq((1L, "Ab1 c,d!"), (2L, "xyz")).toDF("doc_id", "text")
    val got = TextAnalysis.scriptCensus(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, Int, Int, Int, Double)].collect()
      .sortBy(_._1).toSeq
    // "Ab1 c,d!": 8 chars = 4 latin + 1 digit + 1 space + 2 punct + 0 other
    assert(got == Seq(
      (1L, 8, 4, 1, 1, 2, 0, 0.5),
      (2L, 3, 3, 0, 0, 0, 0, 1.0)))
  }

  test("mixtureWeights computes sqrt-temperature mixing probabilities") {
    import graft.llm.Sampling
    // counts 9/4/1 -> sqrt 3/2/1, z = 6: the alpha=1/2 flattening gives
    // the small stratum 1/6 instead of 1/14
    val docs = (Seq.fill(9)("big") ++ Seq.fill(4)("mid") ++ Seq("small"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val got = Sampling.mixtureWeights(docs, "doc_id", "lang")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("big", 9L, 0.5), ("mid", 4L, 0.333333), ("small", 1L, 0.166667)))
  }

  test("lengthBuckets files boundary lengths exactly (1, 2, 7, 8 tokens)") {
    import graft.llm.TextAnalysis
    // powers of 2 are the fp-fragile boundary: 8 tokens MUST land in
    // bucket_lo=8, never 4 (the log2-via-ln failure mode)
    val docs = Seq(
      (1L, "a"),                      // 1 token  -> bucket 1
      (2L, "a b"),                    // 2 tokens -> bucket 2
      (3L, "a b c"),                  // 3 tokens -> bucket 2
      (4L, "a b c d e f g"),          // 7 tokens -> bucket 4
      (5L, "a b c d e f g h")         // 8 tokens -> bucket 8
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lengthBuckets(docs, "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 2L, 5L), (4L, 1L, 7L), (8L, 1L, 8L)))
  }

  test("bigramScore: self-scored corpus matches hand-computed add-1 NLL") {
    import graft.llm.TextAnalysis
    // corpus: "a b" ×2, "a c" ×1 → bigram counts (a,b)=2, (a,c)=1;
    // context c1(a)=3; vocab {b,c} → V=2.
    // P(b|a) = (2+1)/(3+2) = 0.6 ; P(c|a) = (1+1)/(3+2) = 0.4
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val nllB = math.round(-math.log(0.6) * 10000) / 10000.0
    val nllC = math.round(-math.log(0.4) * 10000) / 10000.0
    assert(got == Seq((1L, 1L, nllB), (2L, 1L, nllB), (3L, 1L, nllC)))
    // fluency ordering: the rarer transition scores strictly worse
    assert(nllC > nllB)
  }

  test("bigramLm computes exact add-1 conditional probabilities") {
    import graft.llm.TextAnalysis
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "a cat sat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(docs, "text", topN = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // bigrams: the-cat x2, cat-sat x2, cat-ran, a-cat; V(w2) = {cat, sat, ran}
    assert(got(("the", "cat"))._1 == 2L && got(("cat", "sat"))._1 == 2L)
    // p(cat | the) = (2 + 1) / (2 + 3) = 0.6 exactly
    assert(got(("the", "cat"))._2 == 0.6)
    // p(sat | cat) = (2 + 1) / (3 + 3) = 0.5
    assert(got(("cat", "sat"))._2 == 0.5)
    // p(ran | cat) = (1 + 1) / (3 + 3) round 6
    assert(got(("cat", "ran"))._2 == 0.333333)
  }

  test("large-star/small-star converges in log rounds on a 256-node chain") {
    // a path graph is the adversarial case for min-label propagation
    // (rounds ∝ diameter = 255); star contraction must land in O(log n)
    val edges = (0L until 255L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponentsCounted(edges, "a", "b")
    assert(rounds <= 10, s"chain took $rounds rounds (diameter-bound behavior)")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 256 && got.forall(_._2 == 0L))
  }

  test("dedup posting queries pin no RDDs and reuse the shingle exchange") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text")
    mh.collect()
    val jc = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.5, maxDocFreq = Some(100))
    jc.collect()
    val ct = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.8, maxDocFreq = Some(100))
    ct.collect()
    // the session must be exactly as it was: no cache outlives the query
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "dedup queries left cached RDDs behind")
    // ...because the shingle subtree's exchange is REUSED, not re-run:
    // one scan→explode→distinct per query, shared by every consumer
    Seq("minhash" -> mh, "jaccard" -> jc, "containment" -> ct).foreach {
      case (name, q) =>
        assert(q.queryExecution.executedPlan.toString.contains("ReusedExchange"),
          s"$name plan recomputes the shingle subtree instead of reusing its exchange")
    }
  }

  test("connectedComponents releases every intermediate checkpoint, pins only the result") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (20L, 21L)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val comp = Dedup.connectedComponents(edges, "a", "b")
    // superseded per-round label snapshots and the edge checkpoint are
    // unpersisted eagerly; only the RETURNED labels may stay (their
    // lineage is truncated — unpersisting them would break the caller)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size <= 1,
      s"connectedComponents left ${pinned.size} checkpoints pinned (expect <= 1)")
    // and the survivor is genuinely the result: still fully readable
    assert(comp.count() == 11)
  }

  test("ISO-BMFF box walk round-trips the tree and refuses corrupt sizes") {
    import graft.llm.Mp4Codec
    val media = "the media payload bytes".getBytes("US-ASCII")
    val f = Mp4Codec.encode(timescale = 1000, duration = 2345L,
      nTracks = 2, mdat = media)
    val boxes = Mp4Codec.walk(f)
    val paths = boxes.map(_._1)
    // tree order, parents before children, both tracks materialized
    assert(paths.head == "ftyp" && paths.last == "mdat")
    assert(paths.count(_ == "moov/trak") == 2 &&
      paths.count(_ == "moov/trak/mdia/mdhd") == 2)
    assert(boxes.size == 4 + 4 * 2)
    // offsets + declared sizes tile the file exactly
    val top = boxes.filter(b => !b._1.contains("/"))
    assert(top.map(_._3).sum == f.length)
    assert(Mp4Codec.mvhd(f) == ((1000, 2345L)))
    assert(Mp4Codec.mdat(f).toSeq == media.toSeq,
      "the demuxed mdat range must be byte-exact")
    // a corrupted child size that overruns its parent fails loudly
    val bad = f.clone()
    val moovOff = boxes.collectFirst { case ("moov/mvhd", o, _, _) => o }.get.toInt
    java.nio.ByteBuffer.wrap(bad, moovOff, 4).putInt(1 << 28)
    val e = intercept[IllegalArgumentException](Mp4Codec.walk(bad))
    assert(e.getMessage.contains("overruns"))
    // size < 8 is never a box
    val bad2 = f.clone()
    java.nio.ByteBuffer.wrap(bad2, 0, 4).putInt(3)
    intercept[IllegalArgumentException](Mp4Codec.walk(bad2))
  }

  test("ISO-BMFF special box sizes: 64-bit largesize and size-0 to-end-of-file") {
    import graft.llm.Mp4Codec
    val media = "large media payload".getBytes("US-ASCII")
    val f = Mp4Codec.encode(timescale = 1000, duration = 777L,
      nTracks = 1, mdat = media)
    // rewrite the trailing mdat as a largesize box: size=1 marker, tag,
    // then the 8-byte true size before the same payload
    val mdatOff = Mp4Codec.walk(f).collectFirst { case ("mdat", o, _, _) => o }.get.toInt
    val big = new Array[Byte](f.length + 8)
    System.arraycopy(f, 0, big, 0, mdatOff)
    val bb = java.nio.ByteBuffer.wrap(big, mdatOff, 16)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(1)
    bb.put("mdat".getBytes("US-ASCII"))
    bb.putLong(16L + media.length)
    System.arraycopy(media, 0, big, mdatOff + 16, media.length)
    val boxes = Mp4Codec.walk(big)
    val (o16, s16, h16) = boxes.collectFirst {
      case ("mdat", o, s, h) => (o, s, h) }.get
    assert(h16 == 16 && s16 == 16L + media.length && o16 == mdatOff.toLong)
    assert(Mp4Codec.mdat(big).toSeq == media.toSeq,
      "largesize header must not shift the demuxed payload")
    assert(Mp4Codec.mvhd(big) == ((1000, 777L)))
    // size==0: the final box extends to end of file
    val zero = f.clone()
    java.nio.ByteBuffer.wrap(zero, mdatOff, 4).putInt(0)
    assert(Mp4Codec.mdat(zero).toSeq == media.toSeq)
    // a truncated largesize header refuses loudly
    val short = java.util.Arrays.copyOfRange(big, 0, mdatOff + 12)
    val e = intercept[IllegalArgumentException](Mp4Codec.walk(short))
    assert(e.getMessage.contains("truncated largesize") ||
      e.getMessage.contains("truncated box header"))
  }

  test("GIF LZW round-trips random, repetitive and dictionary-overflow payloads exactly") {
    import graft.llm.GifCodec
    val rnd = new scala.util.Random(7)
    // random bytes (KwKwK cases), heavy repetition (deep LZW chains), and
    // a 100k-pixel image that overflows the 4096-entry dictionary and
    // forces the Clear-code reset path the small graded corpus never hits
    val cases = Seq(
      (3, 2, Array.tabulate(6)(i => (i * 37).toByte)),
      (1, 1, Array[Byte](0)),
      (64, 64, Array.fill(64 * 64)((rnd.nextInt(256) - 128).toByte)),
      (50, 40, Array.tabulate(2000)(i => (i % 3).toByte)),        // aaabbb-ish runs
      (400, 250, Array.fill(400 * 250)((rnd.nextInt(7) - 3).toByte)) // > 4096 dict entries
    )
    cases.foreach { case (w, h, px) =>
      val gif = GifCodec.encode(w, h, px)
      val (dw, dh, dpx) = GifCodec.decode(gif)
      assert(dw == w && dh == h, s"geometry mismatch for $w x $h")
      assert(java.util.Arrays.equals(dpx, px), s"pixel mismatch for $w x $h")
      // the repetitive cases must actually COMPRESS (LZW earning its keep)
      if (px.length >= 2000 && px.toSet.size <= 8)
        assert(gif.length < px.length, s"no compression on repetitive $w x $h")
    }
  }

  test("animated GIF demux round-trips every frame and skips extension blocks") {
    import graft.llm.GifCodec
    val rnd = new scala.util.Random(11)
    val (w, h) = (17, 9)
    val frames = (0 until 4).map(_ => Array.fill(w * h)((rnd.nextInt(256) - 128).toByte))
    val gif = GifCodec.encodeFrames(w, h, frames)
    val got = GifCodec.decodeFrames(gif)
    assert(got.size == 4)
    got.zip(frames).foreach { case ((dw, dh, dpx), px) =>
      assert(dw == w && dh == h && java.util.Arrays.equals(dpx, px))
    }
    // foreign encoders emit graphic-control extensions before frames:
    // splice one in (0x21 label, 4-byte block, terminator) and re-demux
    val splice = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val at = 13 + 768 // header + logical screen descriptor + global palette
    val withExt = gif.take(at) ++ splice ++ gif.drop(at)
    val got2 = GifCodec.decodeFrames(withExt)
    assert(got2.size == 4 && java.util.Arrays.equals(got2.head._3, frames.head))
  }

  test("duplicated-span census: exact twins score 1.0, unique docs 0.0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),          // twin of 1: all shingles shared
      (3L, "zeta eta theta iota kappa lambda")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)) && got(2L) == ((3L, 3L, 1.0)))
    assert(got(3L) == ((4L, 0L, 0.0)))
  }

  test("int8 quantization: a scaled copy of a vector ranks first (quantizer is scale-invariant)") {
    val emb = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 2.0f)),
      (1L, Array(0.25f, -0.5f, 0.125f, 1.0f)),   // 0 scaled by 0.5: same int8 codes
      (2L, Array(-2.0f, 1.0f, 3.0f, -0.5f))).toDF("vec_id", "embedding")
    val rows = Similarity.int8TopK(emb, "vec_id", "embedding", col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.head == ((1, 1L, rows.head._3)) && rows.head._3 > 0,
      s"scaled copy must rank first with a positive integer dot (got ${rows.toSeq})")
    // per-group sampler: every lang keeps exactly k, ranks 1..k
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val per = Sampling.uniformSampleKPerGroup(docs, "doc_id", "lang", k = 5)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    per.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 5), s"lang $lang ranks: ${rs.toSeq}")
    }
  }

  test("decontaminate removes exactly the train docs hash-matching the eval set") {
    val docs = Seq(
      ("eval", "alpha"), ("eval", "beta"), ("eval", "beta"),
      ("train", "alpha"), ("train", "alpha"), ("train", "gamma"),
      ("train", "delta")).toDF("split", "text")
    val r = Dedup.decontaminate(docs, "text", $"split" === "eval").collect()(0)
    assert(r.getAs[Long]("n_train") == 4 && r.getAs[Long]("n_eval") == 2)
    assert(r.getAs[Long]("n_removed") == 2 && r.getAs[Long]("n_kept") == 2)
  }

  test("repetition stats flag a stuffed doc and clear a clean one") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "spam ham spam ham spam ham"),      // "spam ham" x3, "ham spam" x2
      (2L, "one two three four five"),          // all bigrams unique
      (3L, "solo")).toDF("doc_id", "text")      // no bigrams -> omitted
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_bigrams") == 5)
    assert(got(1L).getAs[Long]("top_bigram_cnt") == 3)
    assert(got(1L).getAs[Long]("dup_bigram_occ") == 5)
    assert(got(1L).getAs[Double]("dup_ratio") == 1.0)
    assert(got(2L).getAs[Long]("top_bigram_cnt") == 1)
    assert(got(2L).getAs[Double]("dup_ratio") == 0.0)
    assert(!got.contains(3L))
  }

  test("vocabulary ranks by count desc then word asc and stops at k") {
    import graft.llm.TextAnalysis
    val docs = Seq((1L, "b a b c a b"), (2L, "c a d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("a", 3L, 1), ("b", 3L, 2), ("c", 2L, 3)))
  }

  test("tfidf keywords surface the doc-specific term over corpus-wide ones") {
    import graft.llm.TextAnalysis
    // "rare" appears only in doc 1 (df=1); "common" in all three (df=3)
    val docs = Seq((1L, "common rare common"), (2L, "common x"), (3L, "common y"))
      .toDF("doc_id", "text")
    val top1 = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(top1(1L) == (("rare", 1.0)))       // tf=1/df=1 beats tf=2/df=3
    assert(top1(2L) == (("x", 1.0)))
    assert(top1(3L) == (("y", 1.0)))
  }

  test("uniform k-sample is deterministic, sized k, and hash-ordered") {
    import graft.llm.Sampling
    val docs = (0 until 500).map(i => (i.toLong, "t")).toDF("doc_id", "text")
    val a = Sampling.uniformSampleK(docs, "doc_id", 50).collect()
    val b = Sampling.uniformSampleK(docs, "doc_id", 50).collect()
    assert(a.length == 50)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    val hashes = a.map(_.getString(1))
    assert(hashes.toSeq == hashes.sorted.toSeq)
  }

  test("PPM codec round-trips, honors header comments, and resizes for real") {
    import graft.llm.PpmCodec
    val rgb = Array.tabulate(4 * 2 * 3)(i => (i * 7 % 256).toByte)
    val img = PpmCodec.encode(4, 2, rgb)
    val (w, h, back) = PpmCodec.decode(img)
    assert(w == 4 && h == 2 && back.toSeq == rgb.toSeq)
    // netpbm comment between header tokens must be skipped
    val commented = "P6\n# a comment\n4 2\n255\n".getBytes("US-ASCII") ++ rgb
    assert(PpmCodec.decode(commented)._1 == 4)
    // channel means are real pixel math
    val flat = PpmCodec.encode(2, 2, Array.fill(12)(10.toByte))
    assert(PpmCodec.meanRgb(flat) == ((10.0, 10.0, 10.0)))
    // nearest-neighbor 2x downscale of a 2x2 checker keeps the top-left pixel
    val checker = PpmCodec.encode(2, 2,
      Array[Byte](0, 0, 0, -1, -1, -1, -1, -1, -1, 0, 0, 0))
    val (rw, rh, rp) = PpmCodec.decode(PpmCodec.resizeNearest(checker, 1, 1))
    assert(rw == 1 && rh == 1 && rp.toSeq == Seq[Byte](0, 0, 0))
  }

  test("PPM stream demuxes frames, samples every k-th, stays a valid stream") {
    import graft.llm.PpmCodec
    // five frames, distinct contents, mixed geometry (real streams may vary)
    val frames = (0 until 5).map { f =>
      val (w, h) = if (f == 4) (3, 1) else (2, 2)
      PpmCodec.encode(w, h, Array.tabulate(w * h * 3)(j => ((j + f * 10) % 256).toByte))
    }
    val stream = PpmCodec.encodeStream(frames)
    val offs = PpmCodec.frameOffsets(stream)
    assert(offs.size == 5)
    assert(offs.map(_._2).sum == stream.length)
    // decode returns the frames byte-exactly
    val dec = PpmCodec.decodeStream(stream)
    assert(dec.map(d => (d._1, d._2)) == Seq((2, 2), (2, 2), (2, 2), (2, 2), (3, 1)))
    assert(dec(3)._3.toSeq == Array.tabulate(12)(j => ((j + 30) % 256).toByte).toSeq)
    // sample k=2 keeps frames 0, 2, 4 — and the result re-demuxes cleanly
    val sampled = PpmCodec.sampleStream(stream, 2)
    val sdec = PpmCodec.decodeStream(sampled)
    assert(sdec.size == 3)
    assert(sdec(0)._3.toSeq == dec(0)._3.toSeq)
    assert(sdec(1)._3.toSeq == dec(2)._3.toSeq)
    assert(sdec(2)._3.toSeq == dec(4)._3.toSeq)
    // a truncated stream fails loudly, never silently drops the tail
    intercept[IllegalArgumentException] {
      PpmCodec.frameOffsets(stream.dropRight(1))
    }
  }

  test("asPpmTable renders empty and null docs as 1x1 black instead of crashing") {
    import graft.llm.{Multimodal, PpmCodec}
    val docs = Seq((1L, "hello"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = Multimodal.asPpmTable(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val (w2, h2, rgb2) = PpmCodec.decode(rows(2L))
    val (w3, h3, rgb3) = PpmCodec.decode(rows(3L))
    assert(w2 == 1 && h2 == 1 && rgb2.toSeq == Seq[Byte](0, 0, 0))
    assert(w3 == 1 && h3 == 1 && rgb3.toSeq == Seq[Byte](0, 0, 0))
    assert(PpmCodec.decode(rows(1L))._1 == "hello".length % 64 + 1)
  }

  test("quality filter keeps the clean doc and drops short/repetitive/stopword-free ones") {
    import graft.llm.TextAnalysis
    val clean = "the quick brown fox jumps over a lazy dog with great style " * 3
    val docs = Seq(
      ("en", clean.trim),                      // long, diverse, has stopwords
      ("en", "too short to pass the bar"),     // fails min length
      ("en", ("spam " * 40).trim),             // ttr collapses
      ("en", ("alpha beta gamma delta epsilon zeta eta theta " * 5).trim)) // no stopwords
      .toDF("lang", "text")
    val r = TextAnalysis.qualityFilterStats(docs, "lang", "text",
      minTokens = 30, minTtr = 0.25, minStopRatio = 0.03).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4 && r.getAs[Long]("n_kept") == 1)
  }

  test("stratified sampling is deterministic and lands near the target rate") {
    import graft.llm.Sampling
    val docs = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh", 10))
      .toDF("doc_id", "lang", "n_chars")
    // en keep-rate 1/2 (32768/65536), zh dropped (absent stratum)
    val stats = Sampling.stratifiedStats(docs, "doc_id", "lang", "n_chars",
      Map("en" -> 32768)).collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (enTotal, enKept, enMass) = stats("en")
    assert(enTotal == 1000 && stats("zh") == ((1000L, 0L, 0L)))
    assert(enKept > 400 && enKept < 600)      // binomial(1000, .5) well inside
    assert(enMass == enKept * 10)
    // byte-for-byte reproducible: a second evaluation keeps the same docs
    val keep = Sampling.stratifiedKeep($"doc_id", $"lang", Map("en" -> 32768), "mix")
    val a = docs.filter(keep).select($"doc_id").as[Long].collect().toSet
    val b = docs.filter(keep).select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.size == enKept)
  }

  test("WavCodec round-trips PCM, tolerates extra chunks, decimates correctly") {
    import graft.llm.WavCodec
    val stereo = Array.tabulate(200)(i => ((i % 17) * 1000 - 8000).toShort)
    val wav = WavCodec.encode(44100, 2, stereo)
    assert(WavCodec.decode(wav) == ((44100, 2, stereo)) ||
      WavCodec.decode(wav)._3.sameElements(stereo))
    // inject a LIST chunk between fmt and data — chunk walk must skip it
    val (head, tail) = wav.splitAt(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val (r2, c2, s2) = WavCodec.decode(head ++ listChunk ++ tail)
    assert(r2 == 44100 && c2 == 2 && s2.sameElements(stereo))
    // decimate keeps whole frames (both channels) and divides the rate
    val dec = WavCodec.decimate(wav, 4)
    val (r3, c3, s3) = WavCodec.decode(dec)
    assert(r3 == 11025 && c3 == 2 && s3.length == 50)
    assert(s3(0) == stereo(0) && s3(1) == stereo(1) &&
      s3(2) == stereo(8) && s3(3) == stereo(9))
    // RMS: integer-exact sum of squares
    val mono = WavCodec.encode(8000, 1, Array[Short](3, -4))
    assert(WavCodec.rms(mono) == math.sqrt(12.5))
  }

  test("piiAudit redacts emails/IPs/phones and zeroes counts on null text") {
    import graft.llm.Scrub
    val docs = Seq(
      (1L, "mail bob@x.example.com twice bob@x.example.com from 10.0.0.7 call 555-123-4567"),
      (2L, "clean document, no pii at all"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Scrub.piiAudit(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1).getInt(1) == 2 && rows(1).getInt(2) == 1 && rows(1).getInt(3) == 1)
    assert(rows(1).getString(4) ==
      "mail <EMAIL> twice <EMAIL> from <IP> call <PHONE>")
    assert(rows(2).getInt(1) == 0 && rows(2).getString(4) == "clean document, no pii at all")
    // null text: counts are 0 (not null), redacted stays null
    assert(rows(3).getInt(1) == 0 && rows(3).getInt(2) == 0 && rows(3).getInt(3) == 0)
    assert(rows(3).isNullAt(4))
  }

  test("packShards matches sequential greedy packing and is partition-count independent") {
    import graft.llm.Sampling
    val docs = (1L to 100L).map(i => (i, s"d$i", (i % 7 + 1) * 10)).toDF("id", "t", "tok")
    def run(p: Int) = Sampling.packShards(docs, "id", $"tok", budget = 100, partitions = p)
      .select($"id", $"shard").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // sequential reference: shard = floor(exclusive running total / budget)
    var cum = 0L
    val want = (1L to 100L).map { i =>
      val tok = (i % 7 + 1) * 10
      val shard = cum / 100
      cum += tok
      (i, shard)
    }
    assert(run(1) == want)
    assert(run(7) == want)   // distributed prefix sum = single-machine result
    assert(run(13) == want)
  }

  test("ngram decontamination flags exactly the train docs sharing an n-gram with eval") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "eval"),
      (2L, "zz alpha beta gamma yy", "train"),   // shares 'alpha beta gamma'
      (3L, "delta epsilon zeta eta", "train"),   // no shared 3-gram
      (4L, "beta gamma delta qq rr", "train")    // shares 'beta gamma delta'
    ).toDF("doc_id", "text", "source")
    val r = Dedup.ngramDecontaminate(docs, "doc_id", "text",
      col("source") === "eval", n = 3).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 1)
  }

  test("canonicalizeUrl strips fragments/utm, lowercases scheme+host, keeps path case") {
    import graft.llm.Scrub
    val urls = Seq(
      "HTTP://Example.COM/Path/?utm_a=1&id=2&utm_b=3#frag",
      "https://a.org/p?utm_only=x",
      "https://a.org/dir/",
      "HtTpS://B.NET/CaseKept?q=UP").toDF("u")
    val got = urls.select(Scrub.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == Seq(
      "http://example.com/Path/?id=2",
      "https://a.org/p",
      "https://a.org/dir",
      "https://b.net/CaseKept?q=UP"))
  }

  test("domainCensus counts URL hosts and drops blocklisted domains") {
    import graft.llm.Scrub
    val docs = Seq(
      "see http://a.example.org/x and https://b.example.net/y",
      "again http://a.example.org/z",
      "blocked https://evil.example.com/p").toDF("text")
    val rows = Scrub.domainCensus(docs, "text", Seq("evil.example.com"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("a.example.org" -> 2L, "b.example.net" -> 1L))
  }

  test("bpeTrain learns the reference merge sequence with greedy overlap fusion") {
    import graft.llm.TextAnalysis
    // "aaab" x3 + "aab" x2: round 1 pair counts — (a,a): 2*3 + 1*2 = 8
    // (two overlapping occurrences in 'aaab' both count), (a,b): 5.
    // Merge (a,a) -> greedy left-to-right: 'aaab' -> [aa, a, b] (NOT
    // [a, aa, b]), 'aab' -> [aa, b]. Round 2: (aa,a)=3, (aa,b)=2,
    // (a,b)=3 -> tie on 3, lexicographic picks '(a b)'... "a b" < "aa a"
    // (space 0x20 < 'a') so merge (a,b). Round 3: (aa,ab)=3, (aa,b)=2
    // -> merge (aa,ab).
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("aab")).toDF("text")
    val (merges, words) = TextAnalysis.bpeTrain(docs, "text", rounds = 3)
    val got = merges.as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a a", "aa", 8L), (2, "a b", "ab", 3L),
      (3, "aa ab", "aaab", 3L)))
    val vocab = words.as[(String, Long)].collect().toMap
    assert(vocab == Map("aaab" -> 3L, "aa  b" -> 2L))
  }

  test("WarcCodec round-trips records through gzip members and rejects truncation") {
    import graft.llm.WarcCodec
    import graft.llm.WarcCodec.WarcRecord
    val records = Seq(
      WarcRecord("conversion", "doc://1", "hello world".getBytes("UTF-8")),
      WarcRecord("conversion", "doc://2", Array[Byte](0, 1, 2, -1, 127)), // binary payload
      WarcRecord("response", "http://x/y", Array.empty[Byte]))
    for (gz <- Seq(true, false)) {
      val shard = WarcCodec.encode(records, gzipPerRecord = gz)
      val back = WarcCodec.decode(shard)
      assert(back.map(_.warcType) == records.map(_.warcType))
      assert(back.map(_.targetUri) == records.map(_.targetUri))
      assert(back.zip(records).forall { case (a, b) =>
        java.util.Arrays.equals(a.payload, b.payload) })
    }
    // per-record members really are independent gzip members: a shard of
    // 3 records contains 3 gzip magics
    val gzShard = WarcCodec.encode(records, gzipPerRecord = true)
    val magics = gzShard.sliding(2).count(w =>
      (w(0) & 0xFF) == 0x1f && (w(1) & 0xFF) == 0x8b)
    assert(magics >= 3)
    // truncated payload fails loudly, never resynchronizes silently
    val plain = WarcCodec.encode(records, gzipPerRecord = false)
    val e = intercept[IllegalArgumentException](
      WarcCodec.decode(plain.dropRight(3)))
    assert(e.getMessage.contains("terminator") || e.getMessage.contains("truncated"))
  }

  test("QoiCodec round-trips every op family and compresses repetition") {
    import graft.llm.QoiCodec
    def roundTrip(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
      val enc = QoiCodec.encode(w, h, px)
      val (w2, h2, px2) = QoiCodec.decode(enc)
      assert(w2 == w && h2 == h)
      assert(java.util.Arrays.equals(px2, px))
      enc
    }
    // flat image: pure RUN ops — must genuinely compress
    val flat = Array.fill[Byte](30 * 20 * 3)(77)
    assert(roundTrip(30, 20, flat).length < flat.length / 10)
    // smooth gradient: DIFF/LUMA paths (small per-pixel deltas)
    val grad = Array.tabulate[Byte](16 * 16 * 3)(k => ((k / 3) % 256).toByte)
    roundTrip(16, 16, grad)
    // alternating pair: INDEX hits after the first occurrences
    val alt = Array.tabulate[Byte](10 * 10 * 3)(k =>
      if ((k / 3) % 2 == 0) 10 else 200.toByte)
    roundTrip(10, 10, alt)
    // adversarial: pseudo-random bytes (RGB literals dominate), incl. the
    // wrap-around delta edges 255->0
    val rnd = Array.tabulate[Byte](13 * 7 * 3)(k => ((k * 73 + 11) % 256).toByte)
    roundTrip(13, 7, rnd)
    // malformed input fails loudly
    intercept[IllegalArgumentException](QoiCodec.decode(Array[Byte](1, 2, 3)))
    val good = QoiCodec.encode(2, 2, new Array[Byte](12))
    intercept[IllegalArgumentException](QoiCodec.decode(good.dropRight(1)))
  }

  test("AdpcmCodec: deterministic, exact on constants, tracks ramps, fails loudly") {
    import graft.llm.AdpcmCodec
    // constant signal: every code is 0 (vpdiff = step>>3 rounds to ... no:
    // diff 0 -> code 0 -> vpdiff = step>>3 = 0 at index 0 (7>>3) -> the
    // predictor never moves: constants reproduce EXACTLY
    val const = Array.fill[Short](100)(1234)
    assert(AdpcmCodec.decode(AdpcmCodec.encode(const)).toSeq == const.toSeq)
    // slow ramp: small deltas track within the first quantization steps
    val ramp = Array.tabulate[Short](500)(i => (i * 16).toShort)
    val dr = AdpcmCodec.decode(AdpcmCodec.encode(ramp))
    assert(dr.length == 500 && dr(0) == 0)
    val maxDev = ramp.zip(dr).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDev <= 64, s"ramp tracking deviated by $maxDev")
    // deterministic: identical bytes on re-encode
    assert(java.util.Arrays.equals(AdpcmCodec.encode(ramp), AdpcmCodec.encode(ramp)))
    // 4:1 layout: 12-byte header + one nibble per non-first sample
    assert(AdpcmCodec.encode(ramp).length == 12 + 500 / 2)
    assert(AdpcmCodec.encode(Array.empty[Short]).length == 12)
    assert(AdpcmCodec.decode(AdpcmCodec.encode(Array.empty[Short])).isEmpty)
    // malformed input fails loudly
    intercept[IllegalArgumentException](AdpcmCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      AdpcmCodec.decode(AdpcmCodec.encode(ramp).dropRight(5)))
  }

  test("bpeTrain stops when the vocabulary runs out of pairs") {
    import graft.llm.TextAnalysis
    val docs = Seq("ab ab cd").toDF("text")
    val (merges, words) = TextAnalysis.bpeTrain(docs, "text", rounds = 10)
    // round 1 merges (a,b) n=2; round 2 merges (c,d) n=1; then every word
    // is a single symbol and training stops early
    assert(merges.count() == 2)
    assert(words.select("sym").as[String].collect().toSet == Set("ab", "cd"))
  }

  test("suffixDuplication: sorted-suffix neighbor census is exact") {
    val docs = Seq((1L, "ABCDEFGHIJ"), (2L, "ABCDEFGHIJ"),
      (3L, "KLMNOPQRST"), (4L, "XYXYXYXYXYXY"), (5L, "abc"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.suffixDuplication(docs, "doc_id", "text",
      minMatch = 5, maxSuffix = 8, buckets = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 6L, 8L), // twin doc: every suffix duplicated, LCP capped at 8
      (2L, 6L, 6L, 8L),
      (3L, 6L, 0L, 0L), // unique content: nothing duplicated
      (4L, 8L, 8L, 8L)), // periodic self-repetition counts too
      s"unexpected census: $got")
    // doc 5 is shorter than minMatch: no suffixes, absent from the census
  }

  test("perceptronScores: full-batch integer perceptron learns and is exact") {
    val docs = Seq((1L, "good good", "en"), (2L, "bad bad", "de"))
      .toDF("doc_id", "text", "lang")
    val got = graft.llm.Classifier.perceptronScores(docs, "doc_id", "text",
      posLabel = $"lang" === "en", dims = 512, rounds = 4)
      .orderBy("doc_id").as[(Long, Int, Long, Int)].collect().toSeq
    // binary features: doc 1 = {good, bias}, doc 2 = {bad, bias}
    // round 1: w=0, all score 0 -> pred -1, doc 1 misclassified ->
    //   w[good] += 1, w[bias] += 1
    // round 2: doc 2 scores +1 (bias) -> misclassified ->
    //   w[bad] -= 1, w[bias] -= 1
    // rounds 3-4: both correct, no updates. Final: +1 and -1.
    assert(got == Seq((1L, 1, 1L, 1), (2L, -1, -1L, -1)),
      s"unexpected perceptron trace: $got")
    // determinism: a second training run reproduces the exact scores
    val again = graft.llm.Classifier.perceptronScores(docs, "doc_id", "text",
      posLabel = $"lang" === "en", dims = 512, rounds = 4)
      .orderBy("doc_id").as[(Long, Int, Long, Int)].collect().toSeq
    assert(again == got)
    // a planted marker among shared filler vocabulary is LEARNED: perfect
    // separation incl. unmarked negatives (the graded fixture's shape)
    val planted = (0L until 40L).map { i =>
      val filler = s"alpha beta gamma delta w${i % 5}"
      val text = if (i % 4 == 0) s"$filler curated verified"
        else if (i % 4 == 1) s"$filler junk clickbait" else filler
      (i, text, i % 4 == 0)
    }.toDF("doc_id", "text", "is_pos")
    val sep = graft.llm.Classifier.perceptronScores(planted, "doc_id", "text",
      posLabel = $"is_pos", dims = 512, rounds = 4)
    assert(sep.filter($"pred" =!= $"y").count() == 0,
      "planted signal must separate perfectly")
  }

  test("truncatedTopK: full-width slice is identity; prefix slice is consistent") {
    import graft.llm.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // dims = full width: slicing is a no-op, the ranking must be exact
    val full = Similarity.truncatedTopK(emb, "vec_id", "embedding",
      $"vec_id" < 5, k = 5, dims = 64).collect().toSet
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      $"vec_id" < 5, k = 5).collect().toSet
    assert(full == brute)
    // prefix slice = brute over pre-sliced vectors (one definition)
    val pre = emb.selectExpr("vec_id", "slice(embedding, 1, 32) AS embedding")
    assert(Similarity.truncatedTopK(emb, "vec_id", "embedding",
        $"vec_id" < 5, k = 5, dims = 32).collect().toSet ==
      Similarity.bruteTopK(pre, "vec_id", "embedding",
        $"vec_id" < 5, k = 5).collect().toSet)
    // NOTE: recall vs the full ranking is the EMBEDDING's property, not
    // the operator's — this corpus's random vectors have no matryoshka
    // prefix structure, so no recall contract is asserted here
  }

  test("int8RerankTopK: full-width shortlist equals the exact ranking") {
    import graft.llm.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
      $"vec_id" < 5, k = 5).collect().toSet
    // shortlist = everything: the refine stage sees every candidate, so
    // the two-stage result must equal the exact one bit for bit
    val full = Similarity.int8RerankTopK(emb, "vec_id", "embedding",
      $"vec_id" < 5, k = 5, shortlist = n).collect().toSet
    assert(full == brute, "full-width rerank must reproduce the exact top-k")
    // a narrow shortlist still returns k ranked rows per query
    val narrow = Similarity.int8RerankTopK(emb, "vec_id", "embedding",
      $"vec_id" < 5, k = 5, shortlist = 8)
    assert(narrow.groupBy("qid").count().select("count").as[Long]
      .collect().forall(_ == 5L))
  }

  test("assignSplit is a per-doc invariant; census sums; bad cuts refuse") {
    val docs = (1L to 300L).map(i => (i, s"text body $i")).toDF("doc_id", "text")
    val cuts = Seq(("train", 58982), ("val", 62259), ("test", 65536))
    val all = Sampling.assignSplit(docs, "doc_id", cuts)
      .as[(Long, String)].collect().toMap
    // growing the corpus never moves a document's split — the property
    // that keeps eval sets uncontaminated across refreshes
    val sub = Sampling.assignSplit(docs.filter($"doc_id" <= 100), "doc_id", cuts)
      .as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => all(id) == s },
      "a document's split must not depend on the rest of the corpus")
    assert(all.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(all.values.count(_ == "train") > 240,
      "a ~90% cut must dominate deterministically")
    val census = Sampling.splitCensus(docs, "doc_id", "text", cuts)
      .as[(String, Long, Long)].collect()
    assert(census.map(_._2).sum == 300, "every doc lands in exactly one split")
    // malformed cuts refuse loudly: not ending at 65536, non-increasing
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, "doc_id", Seq(("a", 100), ("b", 200))))
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, "doc_id", Seq(("a", 70000), ("b", 65536))))
  }

  test("mixtureSampleStats: α=1/2 thresholds exact, tail stratum keeps all") {
    // 9/4/1 docs -> √n = 3/2/1, z = 6, N = 14, β = 0.5:
    //   q_en = 7/(3·6) = 0.388889, q_de = 7/12 = 0.583333, q_zh -> clamp 1
    val docs = ((1 to 9).map(i => (i.toLong, "en")) ++
      (10 to 13).map(i => (i.toLong, "de")) ++ Seq((14L, "zh")))
      .toDF("doc_id", "lang")
    val got = graft.llm.Sampling.mixtureSampleStats(docs, "doc_id", "lang")
      .orderBy("lang")
      .as[(String, Long, Long, Double)].collect().toSeq
    val byLang = got.map(r => r._1 -> r).toMap
    assert(byLang("en")._4 == 0.388889 && byLang("de")._4 == 0.583333 &&
      byLang("zh")._4 == 1.0, s"unexpected thresholds: $got")
    assert(byLang("zh")._3 == 1L, "q=1 must keep the whole tail stratum")
    assert(got.forall(r => r._3 <= r._2))
    // deterministic: the census reproduces exactly
    val again = graft.llm.Sampling.mixtureSampleStats(docs, "doc_id", "lang")
      .orderBy("lang").as[(String, Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("suffix census survives planted skew and is bucket-layout-independent") {
    // the round-11 hazard fixture, both skew modes planted: a third of
    // the corpus opens with the same long prefix (Zipfian prefix mass —
    // the case an 8-char-prefix window would funnel onto one task) and a
    // 60-doc byte-identical cluster plants the hot-VALUE case
    val hot = (1L to 40L).map(i => (i, s"COMMONOPENING shared boilerplate $i tail ${i * 7}"))
    val ident = (41L to 100L).map(i => (i, "IDENTICAL DOCUMENT BODY REPEATED VERBATIM"))
    val uniq = (101L to 120L).map(i => (i, s"distinct content ${i * 13} q${i % 7} z${i * 31}"))
    val docs = (hot ++ ident ++ uniq).toDF("doc_id", "text")
    val minMatch = 10
    val maxSuffix = 24
    def census(buckets: Int) =
      graft.llm.Dedup.suffixDuplication(docs, "doc_id", "text",
          minMatch, maxSuffix, buckets)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val got = census(7)
    // partition-count-independence: 1 bucket (degenerate global sort),
    // 7 (boundaries slice through the hot prefix run), 64 (more buckets
    // than sampled values) must all agree bit for bit
    assert(census(1) == got && census(64) == got,
      "the census must not depend on the bucket layout")
    // brute-force suffix-array oracle: sort ALL truncated suffixes
    // byte-wise, take each one's max adjacent LCP
    def lcpOf(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val all = (hot ++ ident ++ uniq).flatMap { case (id, t) =>
      (1 to t.length - minMatch + 1).map(p =>
        (id, p, t.substring(p - 1, math.min(t.length, p - 1 + maxSuffix))))
    }
    val sorted = all.sortBy(_._3)(graft.functions.RangeBucket.Utf8Ordering)
    val expect = sorted.indices.map { i =>
      val (id, _, s) = sorted(i)
      val l = if (i > 0) lcpOf(s, sorted(i - 1)._3) else 0
      val r = if (i < sorted.length - 1) lcpOf(s, sorted(i + 1)._3) else 0
      (id, math.max(l, r))
    }.groupBy(_._1).toSeq.map { case (id, xs) =>
      (id, xs.size.toLong, xs.count(_._2 >= minMatch).toLong, xs.map(_._2).max.toLong)
    }.sortBy(_._1)
    assert(got == expect, s"census disagrees with the brute-force suffix array")
  }

  test("suffixDedupTexts cuts duplicated runs and rebuilds the gaps") {
    val docs = Seq((1L, "ABCDEFGHIJ"), (2L, "ABCDEFGHIJ"), (3L, "KLMNOPQRST"),
      (5L, "abcdeDUPLICATEDRUNxyzfg"), (6L, "DUPLICATEDRUN"))
      .toDF("doc_id", "text")
    val got = graft.llm.Dedup.suffixDedupTexts(docs, "doc_id", "text",
      minMatch = 5, maxSuffix = 8, buckets = 2)
      .orderBy("doc_id").select("doc_id", "n_chars", "removed_chars")
      .as[(Long, Long, Long)].collect().toSeq
    // twins fully duplicated -> fully removed; unique doc untouched; the
    // shared 13-char run cut out of the middle of doc 5, both copies
    assert(got == Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 10L, 0L),
      (5L, 23L, 13L), (6L, 13L, 13L)), s"unexpected removal census: $got")
    val kept5 = graft.llm.Dedup.suffixDedupTexts(docs, "doc_id", "text", 5, 8, 2)
      .filter($"doc_id" === 5).select("kept_md5").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("abcdexyzfg".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(kept5 == expect, "the rebuilt text must be exactly the two gaps")
  }

  test("sentenceStats segments terminated runs and flags the fragment tail") {
    val docs = Seq(
      (1L, "One. Two two! Three?"),     // 3 full, no frag
      (2L, "No punctuation at all"),    // fragment only
      (3L, "Lead sentence. tail frag"), // 1 full + frag
      (4L, "")).toDF("doc_id", "text")  // nothing
    val got = graft.llm.TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Boolean, Double, Int)].collect().toSeq
    // lengths include the terminator and any leading space of the run:
    // "One." 4, " Two two!" 9, " Three?" 7 → avg 20/3
    assert(got == Seq(
      (1L, 3, false, math.round(20.0 / 3 * 10000) / 10000.0, 9),
      (2L, 0, true, 0.0, 0),
      (3L, 1, true, 14.0, 14),
      (4L, 0, false, 0.0, 0)), s"unexpected census: $got")
  }

  test("normalizeStats strips controls, collapses whitespace, pins the hash") {
    val docs = Seq(
      (1L, "a\u0007b\t\tc  d "), // bell stripped, tabs+runs collapse, trim
      (2L, "clean text"),        // untouched
      (3L, "")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.normalizeStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_before", "n_after", "changed")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // "a\u0007b\t\tc  d " -> "ab c d": 10 chars -> 6
    assert(got == Seq((1L, 10L, 6L, true), (2L, 10L, 10L, false),
      (3L, 0L, 0L, false)), s"unexpected census: $got")
    val h = graft.llm.TextAnalysis.normalizeStats(docs, "doc_id", "text")
      .filter($"doc_id" === 1).select("norm_md5").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("ab c d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h == expect)
  }

  test("charChunks: fixed-window overlap chunking is offset-exact") {
    val docs = Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.charChunks(docs, "doc_id", "text",
      window = 5, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_pos", "chunk_len")
      .as[(Long, Int, Int, Int)].collect().toSeq
    // len 8, stride 3 -> starts 0,3,6; windows clamp at the tail
    assert(got == Seq((1L, 0, 0, 5), (1L, 1, 3, 5), (1L, 2, 6, 2),
      (2L, 0, 0, 2), (3L, 0, 0, 0)), s"unexpected chunking: $got")
    // overlap really repeats content: chunk 1 of doc 1 starts at 'd'
    val c1 = graft.llm.TextAnalysis.charChunks(docs, "doc_id", "text", 5, 3)
      .filter($"doc_id" === 1 && $"chunk_idx" === 1)
      .select("chunk_md5").as[String].head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("defgh".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(c1 == expect)
  }
}
