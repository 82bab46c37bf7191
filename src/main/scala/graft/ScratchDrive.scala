package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling driver (not part of the graded surface). */
object ScratchDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMED $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    if (args.headOption.contains("postings-crossover")) {
      // Measure BOTH crossing-partner lookup paths of the segment-dedup
      // maintainer at the RangeReadCap boundary (round-16 advice): a wave
      // with crossings just UNDER the cap runs the per-hash range-read
      // union; just OVER runs the single posting scan. Each doc is one
      // unique 3-word segment; the wave inserts an identical-text partner
      // per doc, so every segment crosses df 1→2 at once.
      import spark.implicits._
      import graft.llm.{IncrementalSegmentDedup => ISD}
      import graft.model.Meta
      def drive(nCross: Int, label: String): Unit = (1 to 3).foreach { i =>
        val base = java.nio.file.Files.createTempDirectory("graft-xover")
        val src = new graft.operators.GraftTable(spark, s"$base/src",
          Seq("id"), targetFileBytes = 256 * 1024)
        val docs = (0 until nCross).map(j => (j.toLong, s"w$j x$j y$j"))
        src.bulkInsert(docs.toDF("id", "text")
          .withColumn(Meta.Ordering, lit(f"${1}%020d"))
          .withColumn(Meta.Deleted, lit(false)))
        val st = ISD.create(spark, src, s"$base/state", "id", "text", 3)
        src.upsert(docs.map { case (j, t) => (j + 10000000L, t) }
          .toDF("id", "text")
          .withColumn(Meta.Ordering, lit(f"${2}%020d"))
          .withColumn(Meta.Deleted, lit(false)))
        timed(s"$label run$i (crossings=$nCross)")(
          ISD.maintain(src, st, "id", "text", 3, 0L, 1L))
      }
      drive(graft.llm.IncrementalSegmentDedup.RangeReadCap - 6, "range-read path")
      drive(graft.llm.IncrementalSegmentDedup.RangeReadCap + 6, "scan path")
      spark.stop()
      return
    }

    if (args.headOption.contains("state-files")) {
      // bootstrap file counts of every IVM state kind — the stats-balloon
      // census (a state bootstrapped as one-file-per-row poisons every
      // later wave with per-file open overhead)
      import spark.implicits._
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("id"), col("text"))
      val base = java.nio.file.Files.createTempDirectory("graft-sfiles")
      val src = new graft.operators.GraftTable(spark, s"$base/src", Seq("id"))
      src.bulkInsert(d.withColumn("trx_seq", lit(f"${1}%020d")))
      def files(t: graft.operators.GraftTable): Int =
        t.latestCommit().map(_.files.size).getOrElse(-1)
      val dd = graft.llm.IncrementalDedup.create(spark, src, s"$base/dd", "id", "text")
      println(s"FILES dedup_state=${files(dd)}")
      val sc = graft.llm.IncrementalSpanCensus.create(spark, src, s"$base/span", "id", "text")
      println(s"FILES span_df=${files(sc.df)} span_post=${files(sc.post)} span_out=${files(sc.out)}")
      val sg = graft.llm.IncrementalSegmentDedup.create(spark, src, s"$base/seg", "id", "text")
      println(s"FILES seg_df=${files(sg.df)} seg_post=${files(sg.post)} seg_out=${files(sg.out)}")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val osrc = new graft.operators.GraftTable(spark, s"$base/osrc", Seq("o_orderkey"))
      osrc.bulkInsert(orders.withColumn("trx_seq", lit(f"${1}%020d")))
      val agg = graft.operators.IncrementalAgg.create(spark, osrc, s"$base/agg",
        Seq("o_orderstatus"), Seq("total" -> "CAST(o_totalprice AS DECIMAL(18,2))"))
      println(s"FILES agg_state=${files(agg)}")
      spark.stop()
      return
    }

    if (args.headOption.contains("incr-span-opt")) {
      // round-21: the Bench w_incr_span fixture on the PRODUCTION state
      // layout (MOR aux tables) with the driver wave path on/off —
      // optional second arg "plans" dumps the merge-delta plans once
      import spark.implicits._
      val dumpPlans = args.lift(1).contains("plans")
      Seq(("driver", graft.llm.IncrementalDedup.DriverWaveCap),
          ("distributed", 0),
          ("driver", graft.llm.IncrementalDedup.DriverWaveCap),
          ("distributed", 0)).zipWithIndex.foreach { case ((tag, cap), i) =>
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("graft-ivms")
        val src = new graft.operators.GraftTable(spark, s"$base/src", Seq("id"))
        src.bulkInsert(d.withColumn("trx_seq", lit(f"${1}%020d")))
        src.upsert(d.filter(col("id") % 13 === 0)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
          .withColumn("trx_seq", lit(f"${2}%020d")))
        val st = graft.llm.IncrementalSpanCensus.stateAt(spark, s"$base/state")
        graft.llm.IncrementalSpanCensus.bootstrap(src, st, "id", "text", 3, 0L)
        spark.conf.set(graft.llm.IncrementalDedup.DriverWaveCapKey, cap.toString)
        if (dumpPlans && i < 2)
          spark.conf.set(graft.llm.IvmAux.ExplainKey, "true")
        // per-Spark-stage attribution: stages >= 100 ms with task count
        val probe = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val info = sc.stageInfo
            val ms = (for {s <- info.submissionTime; c <- info.completionTime}
              yield c - s).getOrElse(-1L)
            if (ms >= 100) println(f"SPARKSTAGE ${info.stageId}%4d ${ms}%6d ms " +
              f"tasks=${info.numTasks}%3d ${info.name.take(120)}")
          }
        }
        spark.sparkContext.addSparkListener(probe)
        graft.util.StageTimer.enable()
        try timed(s"w_incr_span $tag run$i")(
          graft.llm.IncrementalSpanCensus.maintain(src, st, "id", "text", 3,
            0L, 1L))
        finally spark.sparkContext.removeSparkListener(probe)
        spark.conf.unset(graft.llm.IvmAux.ExplainKey)
        spark.conf.unset(graft.llm.IncrementalDedup.DriverWaveCapKey)
        println(s"SPAN-STAGES $tag run$i: " + graft.util.StageTimer.collect()
          .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
        println(s"SPAN-FILES $tag run$i: df=" +
          st.df.latestCommit().map(c => s"${c.files.size}+${c.logFiles.size}log")
            .getOrElse("-") + " post=" +
          st.post.latestCommit().map(c => s"${c.files.size}+${c.logFiles.size}log")
            .getOrElse("-") + " out=" +
          st.out.latestCommit().map(_.files.size).getOrElse(-1) + " actions=" +
          st.post.history().map(_.action).mkString(","))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("incr-span")) {
      // interleaved fold-on/fold-off A/B with stage splits
      import spark.implicits._
      Seq(("fold", graft.operators.GraftTable.StateClusterSmallFileBytes),
          ("nofold", 0L), ("fold", graft.operators.GraftTable.StateClusterSmallFileBytes),
          ("nofold", 0L)).zipWithIndex.foreach { case ((tag, sc0), i) =>
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("graft-ivms")
        val src = new graft.operators.GraftTable(spark, s"$base/src", Seq("id"))
        src.bulkInsert(d.withColumn("trx_seq", lit(f"${1}%020d")))
        src.upsert(d.filter(col("id") % 13 === 0)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
          .withColumn("trx_seq", lit(f"${2}%020d")))
        val st = graft.llm.IncrementalSpanCensus.State(
          new graft.operators.GraftTable(spark, s"$base/state/df", Seq("sh"),
            clusterSmallFileBytes = sc0),
          new graft.operators.GraftTable(spark, s"$base/state/post",
            Seq("sh", "id"), clusterSmallFileBytes = sc0),
          new graft.operators.GraftTable(spark, s"$base/state/out", Seq("id"),
            clusterSmallFileBytes = sc0))
        graft.llm.IncrementalSpanCensus.bootstrap(src, st, "id", "text", 3, 0L)
        graft.util.StageTimer.enable()
        timed(s"w_incr_span $tag run$i")(
          graft.llm.IncrementalSpanCensus.maintain(src, st, "id", "text", 3,
            0L, 1L))
        println(s"SPAN-STAGES $tag run$i: " + graft.util.StageTimer.collect()
          .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
        println(s"SPAN-FILES $tag run$i: df=" +
          st.df.latestCommit().map(_.files.size).getOrElse(-1) + " post=" +
          st.post.latestCommit().map(_.files.size).getOrElse(-1) + " out=" +
          st.out.latestCommit().map(_.files.size).getOrElse(-1) + " actions=" +
          st.post.history().map(_.action).mkString(","))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("incr-span-old")) {
      // the Bench w_incr_span fixture in isolation (round-18: the 10 s
      // bench reading vs the r17 6.2-6.5 s floor — load or regression?)
      import spark.implicits._
      (1 to 3).foreach { i =>
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("graft-ivms")
        val src = new graft.operators.GraftTable(spark, s"$base/src", Seq("id"))
        src.bulkInsert(d.withColumn("trx_seq", lit(f"${1}%020d")))
        src.upsert(d.filter(col("id") % 13 === 0)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
          .withColumn("trx_seq", lit(f"${2}%020d")))
        // deliberately FOLD-OFF (clusterSmallFileBytes = 0): the r17
        // fixture configuration, for like-for-like comparisons against
        // pre-fold-config rounds; the interleaved A/B above carries the
        // production config
        val st = graft.llm.IncrementalSpanCensus.State(
          new graft.operators.GraftTable(spark, s"$base/state/df", Seq("sh"),
            clusterSmallFileBytes = 0L),
          new graft.operators.GraftTable(spark, s"$base/state/post",
            Seq("sh", "id"), clusterSmallFileBytes = 0L),
          new graft.operators.GraftTable(spark, s"$base/state/out", Seq("id"),
            clusterSmallFileBytes = 0L))
        graft.llm.IncrementalSpanCensus.bootstrap(src, st, "id", "text", 3, 0L)
        timed(s"w_incr_span run$i")(
          graft.llm.IncrementalSpanCensus.maintain(src, st, "id", "text", 3,
            0L, 1L))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("suffix")) {
      // round-22: dedup_suffix attribution — the most expensive untouched
      // line (9.0–9.8 s in both r21 runs) on a 1.5M-char corpus that
      // should take a fraction of that. Per-Spark-stage split + plan.
      val probe = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val ms = (for {s <- info.submissionTime; c <- info.completionTime}
            yield c - s).getOrElse(-1L)
          if (ms >= 50) println(f"SPARKSTAGE ${info.stageId}%4d ${ms}%6d ms " +
            f"tasks=${info.numTasks}%3d ${info.name.take(120)}")
        }
      }
      spark.sparkContext.addSparkListener(probe)
      try (1 to 3).foreach { i =>
        // part timings: the explode/aggregate passes vs the boundary
        // sample vs the assembled census
        val docs = graft.queries.Q.t(spark, sfDir, "documents")
        timed(s"parts.multiset run$i")(
          graft.llm.Dedup.suffixMultiset(docs, "doc_id", "text", 20, 60)
            .write.format("noop").mode("overwrite").save())
        timed(s"parts.byval run$i")(
          graft.llm.Dedup.suffixMultiset(docs, "doc_id", "text", 20, 60)
            .groupBy(col("s")).agg(count(lit(1)).as("cnt"))
            .write.format("noop").mode("overwrite").save())
        timed(s"parts.cand run$i") {
          val nStarts = length(col("_t")) - lit(19)
          val n = docs.filter(length(col("text")) >= 20)
            .select(col("text").as("_t"))
            .orderBy(md5(col("_t")), col("_t")).limit(2048)
            .dropDuplicates("_t")
            .orderBy(md5(col("_t")), col("_t")).limit(512)
            .select(explode(sequence(lit(1), nStarts,
              greatest(lit(1), (nStarts / 64).cast("int")))).as("p"), col("_t"))
            .select(col("_t").substr(col("p"), lit(60)).as("s"))
            .distinct()
            .collect().length
          println(s"cand n=$n")
        }
        val df = SparkEntry.queries("dedup_suffix")(spark, sfDir)
        timed(s"dedup_suffix run$i")(
          df.write.format("noop").mode("overwrite").save())
        if (i == 1) println(df.queryExecution.executedPlan.toString.take(8000))
      } finally spark.sparkContext.removeSparkListener(probe)
      spark.stop()
      return
    }

    if (args.headOption.contains("incr-join")) {
      // round-22: the Bench w_incr_join fixture in isolation — regressed
      // in BOTH r21 runs (7.03 @8c / 9.66 @32c vs r20's 5.40) with the
      // merge stage blamed (3.7–6.8 s). Stage split + SPARKSTAGE probe.
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val k = col("o_orderkey")
      def tmp(tag: String): String =
        java.nio.file.Files.createTempDirectory(s"graft-ivmj-$tag").toString
      def stamp(df: org.apache.spark.sql.DataFrame, seq: Int) =
        df.withColumn("trx_seq", lit(f"$seq%020d"))
      val probe = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val ms = (for {s <- info.submissionTime; c <- info.completionTime}
            yield c - s).getOrElse(-1L)
          if (ms >= 50) println(f"SPARKSTAGE ${info.stageId}%4d ${ms}%6d ms " +
            f"tasks=${info.numTasks}%3d ${info.name.take(120)}")
        }
      }
      (1 to 3).foreach { i =>
        val mergeBase = new graft.operators.GraftTable(spark, tmp("base") + "/t",
          Seq("o_orderkey"), targetFileBytes = 1024 * 1024)
        mergeBase.bulkInsert(stamp(orders, 1))
        val plannerBatch = stamp(orders.filter(k % 13 === 0)
          .withColumn("o_orderstatus", lit("Z")), 2)
        val cust = spark.read.parquet(s"$sfDir/customer.parquet")
          .select(col("c_custkey"), col("c_mktsegment"),
            col("c_acctbal").cast("decimal(12,2)").as("c_acctbal"))
        val ck = col("c_custkey")
        val l = mergeBase.cloneTo(tmp("l") + "/t")
        l.upsert(plannerBatch)
        val r = new graft.operators.GraftTable(spark, tmp("r") + "/t",
          Seq("c_custkey"))
        r.bulkInsert(stamp(cust.filter(ck % 11 =!= 0), 1))
        r.upsert(stamp(cust.filter(ck % 11 === 0)
          .withColumn("c_mktsegment", lit("LATE")), 2)
          .withColumn(graft.model.Meta.Deleted, lit(false))
          .unionByName(stamp(cust.filter(ck % 13 === 0 && ck % 11 =!= 0), 2)
            .withColumn(graft.model.Meta.Deleted, lit(true))))
        val view = new graft.operators.GraftTable(spark, tmp("v") + "/t",
          Seq("o_orderkey"))
        val on = Seq("o_custkey" -> "c_custkey")
        graft.operators.IncrementalJoin.bootstrap(l, r, view, on, 0L, 0L)
        spark.sparkContext.addSparkListener(probe)
        graft.util.StageTimer.enable()
        try timed(s"w_incr_join run$i")(
          graft.operators.IncrementalJoin.maintain(l, r, view, on, 0L, 1L, 0L, 1L))
        finally spark.sparkContext.removeSparkListener(probe)
        println(s"JOIN-STAGES run$i: " + graft.util.StageTimer.collect()
          .map { case (kk, v) => f"$kk=$v%.2f" }.mkString(" ") +
          s" converted=${graft.operators.GraftTable.lastMergeSourceConverted}")
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("sql-ddl")) {
      // the Bench w_sql_ddl fixture, statement by statement — round-18
      // verdict #7: the only bench line trending up (2.42 → 2.86/3.08)
      graft.sql.GraftSql.install(spark)
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      orders.createOrReplaceTempView("bench_ddl_src")
      (1 to 3).foreach { i =>
        val loc = java.nio.file.Files
          .createTempDirectory("graft-ddlprof").toString + "/t"
        timed(s"ctas run$i")(spark.sql(
          s"""CREATE TABLE graft.bench_ddlp LOCATION '$loc'
              TBLPROPERTIES ('record_key'='o_orderkey')
              AS SELECT * FROM bench_ddl_src"""))
        timed(s"insert run$i")(spark.sql(
          """INSERT INTO graft.bench_ddlp
             SELECT * FROM bench_ddl_src WHERE o_orderkey % 13 = 0"""))
        timed(s"drop run$i")(spark.sql("DROP TABLE graft.bench_ddlp"))
      }
      spark.stop()
      return
    }

    if (args.headOption.contains("incr-dedup")) {
      // the Bench w_incr_dedup fixture in isolation, with stage splits —
      // the candidates-stage A/B harness (round-18 verdict #3)
      import spark.implicits._
      (1 to 3).foreach { i =>
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast("long").as("id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("graft-ivmd")
        val src = new graft.operators.GraftTable(spark, s"$base/src", Seq("id"))
        src.bulkInsert(d.withColumn("trx_seq", lit(f"${1}%020d")))
        src.upsert(d.filter(col("id") % 13 === 0)
          .withColumn("text", concat(lit("uniq"), col("id").cast("string")))
          .withColumn("trx_seq", lit(f"${2}%020d")))
        val state = new graft.operators.GraftTable(spark, s"$base/state",
          Seq("id"),
          clusterSmallFileBytes = graft.operators.GraftTable.StateClusterSmallFileBytes)
        graft.llm.IncrementalDedup.bootstrap(src, state, "id", "text",
          graft.llm.IncrementalDedup.Params(), 0L)
        // per-Spark-stage attribution inside the wave (temporary probe):
        // stages >= 100 ms with task count and first-RDD name
        val probe = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val info = sc.stageInfo
            val ms = (for {s <- info.submissionTime; c <- info.completionTime}
              yield c - s).getOrElse(-1L)
            if (ms >= 100) println(f"SPARKSTAGE ${info.stageId}%4d ${ms}%6d ms " +
              f"tasks=${info.numTasks}%3d ${info.name.take(120)}")
          }
        }
        spark.sparkContext.addSparkListener(probe)
        graft.util.StageTimer.enable()
        // removal in finally: a thrown wave must not leave the probe
        // registered (duplicate SPARKSTAGE lines on later iterations)
        try timed(s"w_incr_dedup run$i")(
          graft.llm.IncrementalDedup.maintain(src, state, "id", "text",
            graft.llm.IncrementalDedup.Params(), 0L, 1L))
        finally spark.sparkContext.removeSparkListener(probe)
        println(s"STAGES run$i: " + graft.util.StageTimer.collect()
          .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
        println(s"STATE run$i: " + state.history().map(c =>
          s"${c.seq}:${c.action}:${c.files.size}f").mkString(" "))
      }
      spark.stop()
      return
    }

    (1 to 3).foreach { i =>
      println(s"--- run $i ---")
      val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
      val t = new graft.operators.GraftTable(spark, root, Seq("o_orderkey"),
        targetFileBytes = 1024 * 1024)
      val full = timed("plan fullLoad")(graft.queries.CdcScenario.fullLoad(spark, sfDir))
      timed("bulkInsert")(t.bulkInsert(full))
      val a = timed("plan batchA")(graft.queries.CdcScenario.batchA(spark, sfDir))
      timed("upsertA")(t.upsert(a))
      val b = timed("plan batchB")(graft.queries.CdcScenario.batchB(spark, sfDir))
      timed("upsertB")(t.upsert(b))
      timed("read+agg")(t.readUser()
        .groupBy(col("o_orderstatus")).agg(count(lit(1))).collect())
    }
    spark.stop()
  }
}
