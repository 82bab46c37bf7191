package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * FAILURES ARE LOUD. A query that throws gets (a) its message written to
  * `<outDir>/<name>/_error.txt` (the dir exists but holds no parquet, so
  * any downstream compare sees a hard error instead of a missing row),
  * (b) a line in `<outDir>/__failures.json`, and (c) a non-zero process
  * exit listing the broken names. Round 9 proved the alternative: a
  * swallowed exception made 7 broken queries VANISH from the graded set
  * instead of showing red. */
object Verify {

  /** Dump every query; returns the names that failed. Artifact contract
    * pinned by VerifyHarnessSpec. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame]): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val failed = Seq.newBuilder[String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failed += name
        val d = Paths.get(outDir, name)
        // clear any PRIOR run's parquet first: a failure that throws
        // before the overwrite-save deletes anything would otherwise
        // leave stale green results beside the error marker
        graft.util.Fs.deleteRecursively(d)
        Files.createDirectories(d)
        Files.writeString(d.resolve("_error.txt"),
          s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    val fs = failed.result()
    val q = graft.util.Json.quote _
    Files.writeString(Paths.get(outDir, "__failures.json"),
      fs.map(q).mkString("[", ",", "]"))
    fs
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtension")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the dump (driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val failed = run(spark, sfDir, outDir,
      SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) })
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // Written even when queries failed: the oracle set must stay complete
    // so the failed names still show as graded-and-broken, not ungraded.
    val q = graft.util.Json.quote _
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: " +
          failed.sorted.mkString(", "))
      sys.exit(2)
    }
  }
}
