package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Spark can derive an Encoder without the test-class scope. */
case class UserSess(lastTsUs: Long, nSessions: Long)

/** ST5 — custom streaming state via flatMapGroupsWithState: gap-based
  * sessionization per user running in an actual stream, compared to the
  * batch islands computation (the same spec st_session_window grades).
  */
class StatefulStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState sessionization equals the batch islands computation") {
    val events = graft.queries.Q.t(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", unix_micros($"ts").as("ts_us"))
    val dir = Files.createTempDirectory("stateful").toString
    events.write.mode("overwrite").parquet(dir)

    // batch truth: new session when gap >= 30 min
    val gapUs = 30L * 60 * 1000000
    val batch = events.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = 1 + ts.zip(ts.drop(1)).count { case (a, b) => b - a >= gapUs }
        (u, sessions.toLong)
      }.toSet

    val streamed = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[UserSess]) => {
          val ts = it.map(_._2).toSeq.sorted
          var (last, n) = state.getOption.map(s => (s.lastTsUs, s.nSessions)).getOrElse((Long.MinValue, 0L))
          ts.foreach { t =>
            if (last == Long.MinValue || t - last >= gapUs) n += 1
            last = t
          }
          state.update(UserSess(last, n))
          Iterator((user, n))
        })
      .toDF("user_id", "n_sessions")
    val q = streamed.writeStream
      .outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // last emitted count per user (one micro-batch here, but the state
    // API carries across batches by construction)
    val got = spark.table("sess_out").groupBy($"user_id")
      .agg(max($"n_sessions").as("n"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("RollingHash64 matches a JVM reference and is order-sensitive") {
    graft.functions.RollingHashFunctions.register(spark)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => acc * 31L + (b & 0xFF))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val got = docs.select($"doc_id", $"text",
        graft.functions.RollingHashFunctions.rollingHash($"text").as("h"))
      .as[(Long, String, Long)].collect()
    got.foreach { case (_, text, h) => assert(h == ref(text)) }
    // order sensitivity (unlike a bag-of-words hash)
    val pair = Seq(("ab c"), ("ba c")).toDF("t")
      .select(graft.functions.RollingHashFunctions.rollingHash($"t")).as[Long].collect()
    assert(pair(0) != pair(1))
  }
}
