ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsdmstohudispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- Parallel forked test groups (round-22 verdict #1) ----
// The serial suite takes ~40 min on this host (405 tests, almost all
// fixed-cost-bound: tiny fixtures, many Spark job rounds on local[4]);
// the ~2.5x-slower grading sandbox killed the forked JVM mid-run (the
// round-21 red gate). Suites are pure-function tests over per-test temp
// dirs with an in-memory catalog, so they parallelize safely ACROSS
// JVMs: each group gets its own forked JVM (own SparkSession at
// local[4]/4 shuffle partitions), groups run concurrently, and the
// wall-clock floor drops from the suite SUM to the heaviest group.
// Weights are the measured r22 serial seconds; unknown suites get a
// default and greedy bin-packing keeps groups balanced.
val testSuiteWeights: Map[String, Int] = Map(
  "graft.StreamingWindowSpec" -> 253,
  "graft.IncrementalSegmentDedupSpec" -> 257,
  "graft.LlmSpec" -> 242,
  "graft.IncrementalDedupSpec" -> 300,
  "graft.IncrementalDedupLayoutSpec" -> 240,
  "graft.IncrementalDedupLifecycleSpec" -> 180,
  "graft.IncrementalSpanCensusSpec" -> 140,
  "graft.StatefulStreamSpec" -> 75,
  "graft.IncrementalJoinSpec" -> 109,
  "graft.GraftSqlSpec" -> 104,
  "graft.DataSkippingSpec" -> 109,
  "graft.SoakSpec" -> 110,
  "graft.MergeSpec" -> 70,
  "graft.WriteOpsSpec" -> 60,
  "graft.GraftTableStreamSpec" -> 46,
  "graft.PipelineSpec" -> 39,
  "graft.InMemoryLifecycleSpec" -> 34,
  "graft.PlanShapeSpec" -> 34,
  "graft.IncrementalClassifierSpec" -> 35,
  "graft.IncrementalAggSpec" -> 35,
  "graft.TsNormSpec" -> 26,
  "graft.ObjectStoreSpec" -> 25,
  "graft.NestedEvolveSpec" -> 25,
  "graft.ViewMaintainSpec" -> 20,
)
val testGroupCount = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // -Xmx LAST-WINS in HotSpot: groups run 8 JVMs at once, so each gets a
  // smaller heap than the single serial JVM did (tiny fixtures; the
  // serial 8g run never approached 3g of live data)
  val opts = (Test / javaOptions).value.toVector :+ "-Xmx4g"
  val sorted = tests.sortBy(t => -testSuiteWeights.getOrElse(t.name, 15))
  val bins = Array.fill(testGroupCount)(
    (scala.collection.mutable.ListBuffer[sbt.TestDefinition](), Array(0)))
  sorted.foreach { t =>
    val (buf, w) = bins.minBy(_._2(0))
    buf += t
    w(0) += testSuiteWeights.getOrElse(t.name, 15)
  }
  bins.toSeq.zipWithIndex.filter(_._1._1.nonEmpty).map { case ((buf, _), i) =>
    Tests.Group(s"g$i", buf.toSeq,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
// default caps forked test groups at 1 — allow the groups to actually
// run concurrently (each JVM is local[4]; 8 groups fit a 32-way box)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(32))
