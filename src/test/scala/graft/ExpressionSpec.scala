package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

class ExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("RangeBucket.bucketCol is bit-identical to the JVM binary search") {
    import graft.functions.RangeBucket
    // boundary set with multi-byte UTF-8: U+FB00 (3-byte) vs U+1D11E
    // (4-byte) sort OPPOSITE ways under UTF-16 code units vs UTF-8
    // bytes — the Column form must follow the byte order, like cmpKey
    val boundaries = Array("apple", "m", "zebra", "ﬀ", "𝄞")
      .sorted(RangeBucket.Utf8Ordering)
    assert(boundaries.takeRight(2).toSeq == Seq("ﬀ", "𝄞"),
      "UTF-8 byte order must place the 4-byte astral char last")
    val keys = Seq("", "a", "apple", "applf", "m", "n", "zebra", "zz",
      "ﬀ", "ﬀa", "𝄞", "𝄞x", "~", "é")
    val viaCol = keys.toDF("k")
      .select(col("k"), RangeBucket.bucketCol(col("k"), boundaries.toSeq).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      assert(viaCol(k) == RangeBucket.bucketOf(k, boundaries),
        s"bucket mismatch for ${k.codePoints().toArray.toSeq}")
      assert(viaCol(k) == graft.operators.GraftTable.rliRangeBucket(k, boundaries),
        s"rliRangeBucket drift for $k")
    }
    // null key -> null bucket, not a phantom last bucket
    val nb = Seq[(Integer, String)]((1, null)).toDF("i", "k")
      .select(RangeBucket.bucketCol(col("k"), boundaries.toSeq)).collect()
    assert(nb.head.isNullAt(0))
    // empty boundary array: everything lands in bucket 0
    assert(Seq("x").toDF("k")
      .select(RangeBucket.bucketCol(col("k"), Nil)).head().getInt(0) == 0)
  }

  test("FloatVectorDot matches the zip_with/aggregate composable form bit-for-bit") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("b")))
      .filter($"ia" < 20 && $"ib" < 20)
    val both = pairs.select(
      VectorFunctions.floatDot($"a", $"b").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
        .as("lambda"))
    assert(both.filter($"native" =!= $"lambda").count() == 0)
    // mismatched lengths: dot over the common prefix
    val short = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 5.0f))).toDF("a", "b")
    assert(short.select(VectorFunctions.floatDot($"a", $"b")).as[Double].head() == 11.0)
  }

  test("FloatVectorDot survives both codegen and interpreted evaluation") {
    VectorFunctions.register(spark)
    val df = Seq((Seq(1.5f, -2.0f), Seq(2.0f, 0.5f))).toDF("a", "b")
    val expected = 1.5 * 2.0 + -2.0 * 0.5
    assert(df.select(VectorFunctions.floatDot($"a", $"b")).as[Double].head() == expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(VectorFunctions.floatDot($"a", $"b")).as[Double].head() == expected)
    }
  }

  test("NfcNormalize composes canonically; codegen and interpreted agree") {
    import graft.functions.TextFunctions
    TextFunctions.register(spark)
    // inputs by explicit escape: decomposed cafe+COMBINING ACUTE,
    // precomposed caf\u00e9, and a double decomposition (A+RING ABOVE,
    // o+DIAERESIS) that must land on the precomposed 8-char form
    val df = Seq("cafe\u0301", "caf\u00e9", "A\u030angstro\u0308m", "plain", "")
      .toDF("s")
    def run(): Seq[(String, Int)] = df
      .select(TextFunctions.nfc($"s").as("n"))
      .select($"n", length($"n").as("l"))
      .as[(String, Int)].collect().toSeq
    val got = run()
    assert(got(0) == got(1) && got(0)._2 == 4,
      s"decomposed and precomposed forms must converge: $got")
    assert(got(2) == ("\u00c5ngstr\u00f6m", 8), s"double composition: ${got(2)}")
    assert(got(3) == ("plain", 5) && got(4) == ("", 0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(run() == got, "interpreted evaluation must match codegen")
    }
    // null in, null out
    assert(Seq[(Integer, String)]((1, null)).toDF("i", "s")
      .select(TextFunctions.nfc($"s")).head().isNullAt(0))
    // wrong arity fails with a real message, not a head-of-empty-list
    val arity = intercept[Exception](spark.sql("SELECT nfc_normalize()").collect())
    assert(arity.getMessage.contains("exactly 1 argument"), s"got: $arity")
  }

  test("StringLcp equals the composable prefix-filter form, chars not bytes") {
    import graft.functions.TextFunctions
    TextFunctions.registerLcp(spark)
    val rnd = new scala.util.Random(11)
    val alphabet = "abcXYZ éè𝄞ﬀ"
    val pairs = (1 to 200).map { _ =>
      val base = (1 to rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val x = base + (1 to rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val y = base + (1 to rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (x, y)
    } ++ Seq(("", ""), ("", "a"), ("é", "è"), ("éa", "éb"), ("𝄞x", "𝄞y"),
      ("abc", "abc"), ("abc", "abcd"))
    val df = pairs.toDF("a", "b")
    // the composable form needs an explicit empty-side guard: Spark's
    // sequence(1, 0) DESCENDS ([1, 0]), and substr(x, 1, 0) = "" equals
    // "" — so without the guard an empty side scores 1, a latent bug the
    // native expression does not have
    val both = df.select(
      TextFunctions.lcp($"a", $"b").as("native"),
      when(least(length($"a"), length($"b")) === 0, 0).otherwise(
        size(filter(sequence(lit(1), least(length($"a"), length($"b"))),
          k => $"a".substr(lit(1), k) === $"b".substr(lit(1), k)))).as("lambda"))
    assert(both.filter($"native" =!= $"lambda").count() == 0,
      "native LCP must equal the composable char-prefix form on every pair")
    // the mid-codepoint case the byte walk must NOT get wrong: é vs è
    // share a UTF-8 lead byte but no character
    assert(Seq(("é", "è")).toDF("a", "b")
      .select(TextFunctions.lcp($"a", $"b")).head().getInt(0) == 0)
    // interpreted path agrees
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(both.filter($"native" =!= $"lambda").count() == 0)
    }
    // null in, null out (Dedup wraps with coalesce(..., 0))
    assert(Seq(("a", null.asInstanceOf[String])).toDF("a", "b")
      .select(TextFunctions.lcp($"a", $"b")).head().isNullAt(0))
  }

  test("MinHashSig aggregate is bit-identical to 64 composable min(xxhash64(i, h)) columns") {
    graft.functions.MinHashFunctions.register(spark)
    val sh = graft.llm.Dedup.shingles(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50),
      "doc_id", "text")
    val hashed = sh.withColumn("_h", xxhash64($"s"))
    val native = hashed.groupBy($"doc_id")
      .agg(graft.functions.MinHashFunctions.minhashSig($"_h", 64).as("sig"))
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    val mins = (0 until 64).map(i => min(xxhash64(lit(i), $"_h")).as(s"h$i"))
    val composable = hashed.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
      .select($"doc_id", array((0 until 64).map(i => col(s"h$i")): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == composable)
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
