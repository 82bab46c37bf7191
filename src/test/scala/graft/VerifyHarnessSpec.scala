package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the loud-failure contract of the correctness harness: a broken
  * query must leave a visible artifact trail (`_error.txt` in its output
  * dir + an entry in `__failures.json`) and be reported by `Verify.run` —
  * never silently vanish from the graded set (the round-9 failure mode:
  * 7 broken queries were simply MISSING from CORRECTNESS_r09.json). */
class VerifyHarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a throwing query leaves _error.txt + __failures.json and is returned") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("verify-harness").toString
    val failed = Verify.run(spark, "/unused", out, Map(
      "good" -> ((s, _) => s.range(3).select(col("id"))),
      "bad" -> ((_, _) => throw new IllegalStateException("deliberate failure"))))
    assert(failed == Seq("bad"))
    // the good query dumped parquet as usual
    assert(Files.list(Paths.get(out, "good")).anyMatch(_.toString.endsWith(".parquet")))
    // the bad query's dir exists and is loud: _error.txt, no parquet
    val err = Paths.get(out, "bad", "_error.txt")
    assert(Files.exists(err))
    assert(Files.readString(err).contains("deliberate failure"))
    assert(!Files.list(Paths.get(out, "bad")).anyMatch(_.toString.endsWith(".parquet")))
    // the machine-readable failure list names it
    assert(Files.readString(Paths.get(out, "__failures.json")) == "[\"bad\"]")
  }

  test("an all-green dump writes an empty failure list") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("verify-harness-ok").toString
    val failed = Verify.run(spark, "/unused", out, Map(
      "only" -> ((s, _) => s.range(1).select(col("id")))))
    assert(failed.isEmpty)
    assert(Files.readString(Paths.get(out, "__failures.json")) == "[]")
  }
}
