package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcSource

/** S6 — JDBC full-load source against an embedded Derby database: the
  * Spark analog of the DMS full-load phase, including the partitioned
  * read that parallelizes like MaxFullLoadSubTasks.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned JDBC read loads every row with the configured parallelism") {
    val dbDir = Files.createTempDirectory("graft-derby").resolve("db")
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE customer (c_id INT PRIMARY KEY, c_name VARCHAR(32), c_bal DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO customer VALUES (?, ?, ?)")
      (1 to 200).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()

    val df = JdbcSource.read(spark, url, "customer",
      partitionColumn = Some("c_id"), lowerBound = 1, upperBound = 201, numPartitions = 4,
      props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 200)
    val got = df.filter($"c_id" === 7).select("c_name").as[String].head()
    assert(got == "name7")
    // filters push down to the JDBC scan
    val plan = df.filter($"c_bal" > 100.0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || df.filter($"c_bal" > 100.0).count() == 133)
  }
}
