package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraftTable
import graft.sql.GraftSql

/** Nested schema evolution: a CDC payload whose STRUCT gains a field (or
  * widens a leaf, or drifts inside an array element / map value) is
  * ordinary drift through upsert and MERGE — carried rows read typed
  * NULL for added nested fields, the manifest schema widens recursively,
  * and an incompatible nested clash still refuses loudly. The reference
  * admits nested types through its transformer surface (SURVEY §1.3);
  * Hudi/Delta call this schema-on-write auto-evolution. */
class NestedEvolveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-nested").toString

  private def mkTable(root: String) =
    new GraftTable(spark, root, Seq("id"), targetFileBytes = 16 * 1024)

  test("widen recurses: struct field add, nested leaf promote, array element, map value") {
    val a = StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(StructField("p", IntegerType))))),
      StructField("m", MapType(StringType, IntegerType))))
    val b = StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("x", LongType), StructField("z", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("p", LongType), StructField("q", StringType))))),
      StructField("m", MapType(StringType, LongType))))
    val w = GraftTable.widenSchemas(a, b)
    assert(w("s").dataType == StructType(Seq(
      StructField("x", LongType), StructField("y", StringType),
      StructField("z", StringType))))
    assert(w("arr").dataType == ArrayType(StructType(Seq(
      StructField("p", LongType), StructField("q", StringType)))))
    assert(w("m").dataType == MapType(StringType, LongType))
    // unwidenable nested clash refuses loudly with the outer column named
    val bad = StructType(Seq(StructField("s", StructType(Seq(
      StructField("x", StringType))))))
    val e = intercept[IllegalArgumentException](GraftTable.widenSchemas(a, bad))
    assert(e.getMessage.contains("cannot widen"), e.getMessage)
  }

  test("conformExpr adds nested null fields, keeps NULL structs null, widens leaves") {
    val df = Seq((1L, Some((10, "x")), Seq(5), Map("k" -> 7)), (2L, None, Seq(6), Map("j" -> 8)))
      .toDF("id", "s", "arr", "m")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("_1", LongType), StructField("_2", StringType),
        StructField("c", StringType)))),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType))))
    val out = GraftTable.castTo(df, target)
    assert(out.schema("s").dataType == target("s").dataType)
    assert(out.schema("arr").dataType.asInstanceOf[ArrayType].elementType == LongType)
    val rows = out.orderBy("id").collect()
    assert(rows(0).getStruct(1).toSeq == Seq(10L, "x", null))
    assert(rows(1).isNullAt(1), "a NULL struct must stay NULL, not become a struct of nulls")
    assert(rows(0).getSeq[Long](2) == Seq(5L))
    assert(rows(0).getMap[String, Long](3) == Map("k" -> 7L))
  }

  test("upsert with a drifted nested payload widens the table; carried rows null-fill") {
    val t = mkTable(tmp())
    t.bulkInsert(Seq((1L, (10, "a"), "001"), (2L, (20, "b"), "001"))
      .toDF("id", "payload", "trx_seq"))
    // batch payload: x widened to long, new field tag
    val batch = Seq((2L, (200L, "B", "hot"), "002"), (3L, (300L, "C", "new"), "002"))
      .toDF("id", "payload", "trx_seq")
    t.upsert(batch)
    val got = t.readUser()
      .select(col("id"), col("payload._1").as("x"), col("payload._2").as("y"),
        col("payload._3").as("tag"))
      .as[(Long, Long, String, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 10L, "a", None), (2L, 200L, "B", Some("hot")), (3L, 300L, "C", Some("new"))),
      s"got: ${got.toSeq}")
    // widened nested type is in the manifest schema from now on
    val pt = t.readUser().schema("payload").dataType.asInstanceOf[StructType]
    assert(pt.fieldNames.toSeq == Seq("_1", "_2", "_3") && pt("_1").dataType == LongType)
  }

  test("upsert with an incompatible nested clash refuses loudly") {
    val t = mkTable(tmp())
    t.bulkInsert(Seq((1L, (10, "a"), "001")).toDF("id", "payload", "trx_seq"))
    val bad = Seq((2L, ("nope", "b"), "002")).toDF("id", "payload", "trx_seq")
    val e = intercept[IllegalArgumentException](t.upsert(bad))
    assert(e.getMessage.contains("cannot widen"), e.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION carries drifted nested payloads end to end") {
    val t = mkTable(tmp())
    t.bulkInsert(Seq((1L, (10, "a"), "001"), (2L, (20, "b"), "001"))
      .toDF("id", "payload", "trx_seq"))
    GraftSql.register(spark, "nested_evolve", t)
    Seq((2L, (200L, "B", "hot")), (9L, (900L, "I", "ins")))
      .toDF("id", "payload").createOrReplaceTempView("nested_evolve_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.nested_evolve t
         USING nested_evolve_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val got = t.readUser()
      .select(col("id"), col("payload._1").as("x"), col("payload._3").as("tag"))
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, None), (2L, 200L, Some("hot")), (9L, 900L, Some("ins"))),
      s"got: ${got.toSeq}")
  }

  test("evolution conforms a REORDERED source struct by name (order-insensitive subsumption)") {
    val t = mkTable(tmp())
    t.bulkInsert(Seq((1L, (10, "a"), "001"), (2L, (20, "b"), "001"))
      .toDF("id", "payload", "trx_seq"))
    GraftSql.register(spark, "nested_reorder", t)
    // source payload lists the NEW field FIRST and reorders the rest —
    // a from_json CDC feed shape; conformance is by NAME, never position
    Seq((2L, ("hot", "B", 200L)), (9L, ("ins", "I", 900L)))
      .toDF("id", "p0")
      .select(col("id"), struct(
        col("p0._1").as("tag"), col("p0._2").as("_2"),
        col("p0._3").as("_1")).as("payload"))
      .createOrReplaceTempView("nested_reorder_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.nested_reorder t
         USING nested_reorder_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val got = t.readUser()
      .select(col("id"), col("payload._1").as("x"), col("payload._2").as("y"),
        col("payload.tag").as("tag"))
      .as[(Long, Long, String, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, "a", None), (2L, 200L, "B", Some("hot")),
      (9L, 900L, "I", Some("ins"))), s"got: ${got.toSeq}")
  }

  test("merge WITHOUT evolution refuses a wider nested source loudly") {
    val t = mkTable(tmp())
    t.bulkInsert(Seq((1L, (10, "a"), "001")).toDF("id", "payload", "trx_seq"))
    GraftSql.register(spark, "nested_noevolve", t)
    Seq((1L, (100L, "A", "extra"))).toDF("id", "payload")
      .createOrReplaceTempView("nested_noevolve_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graft.nested_noevolve t USING nested_noevolve_src s
         ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET payload = s.payload"""))
    assert(e.getMessage.contains("cannot fit") || e.getMessage.contains("widen"),
      e.getMessage)
  }
}
