package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables

/** Relational operator coverage over the TPC-H-ish star schema: the full
  * declarative surface a user of the reference would gain by switching to
  * this engine (the reference itself has only map+reduce — SURVEY.md §2.1 —
  * so these exercise the Spark built-ins our API re-exposes).
  *
  * Scale notes (100 TB design stance):
  *   - dimension tables (region/nation/part/supplier/customer at small SF)
  *     join via `broadcast()` — no shuffle of the fact table;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *     aggregate partially before the exchange;
  *   - every aggregate is decimal-exact then rounded, so results are
  *     deterministic under any partitioning/merge order.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  private def dsum(c: Column): Column = round(sum(dec(c)), 2).cast("double")
  private val one = lit(1).cast(DecimalType(18, 6))
  private def revTerm(df: DataFrame): Column =
    dec(df("l_extendedprice")) * (one - dec(df("l_discount")))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"

  val sql: Map[String, String] = Map(
    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(round(sum($revSql), 2) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,
    "q7_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin,
    "q8_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "q9_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q10_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q11_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
        |       CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal,
        |       count(*) AS n
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "q12_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type,
        |       count(*) AS n,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY hour_ts, event_type
        |ORDER BY hour_ts, event_type""".stripMargin,
    "q13_events_json" ->
      """SELECT user_id,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q14_conditional_agg" ->
      s"""SELECT
         |  CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS promo_revenue,
         |  CAST(round(sum($revSql), 2) AS DOUBLE) AS total_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q15_union" ->
      """SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
        |UNION
        |SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "q16_having" ->
      """SELECT n_nationkey, CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey
        |HAVING count(*) > 3
        |ORDER BY n_nationkey""".stripMargin,
    "q17_avg" ->
      """SELECT l_returnflag,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q18_in_subquery" ->
      s"""SELECT CAST(round(sum($revSql), 2) AS DOUBLE) AS revenue, count(*) AS n
         |FROM lineitem
         |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')""".stripMargin,
    "q19_scalar_subquery" ->
      """SELECT count(*) AS n_above, CAST(min(o_orderkey) AS BIGINT) AS first_key
        |FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE) / count(*) FROM orders)""".stripMargin,
    "q20_lag_window" ->
      """SELECT user_id, CAST(sum(gap_s) AS BIGINT) AS total_gap_s, count(*) AS n_gaps FROM (
        |  SELECT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        |  FROM events) g
        |WHERE gap_s IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q21_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.sec, c.click_id AS asof_click_id,
        |       p.sec - c.sec AS gap_s
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.sec >= c.sec
        |ORDER BY event_id""".stripMargin,
    "q22_sql_interface" ->
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q23_variance" ->
      """SELECT l_returnflag,
        |  (CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*))
        |    - (CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*))
        |      * (CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / count(*)) AS var_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q24_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q25_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q31_date_functions" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(CAST(strftime(o_orderdate, '%w') AS BIGINT) + 1 AS BIGINT) AS dow,
        |       count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY yr, mo, dow
        |ORDER BY yr, mo, dow""".stripMargin,
    "q32_string_functions" ->
      """SELECT upper(substring(c_name, 1, 9)) AS prefix,
        |       CAST(min(length(c_name)) AS BIGINT) AS min_len,
        |       CAST(max(length(c_name)) AS BIGINT) AS max_len,
        |       count(*) AS n
        |FROM customer
        |WHERE c_name LIKE 'Customer%'
        |GROUP BY prefix
        |ORDER BY prefix""".stripMargin,
    "q30_outer_join" ->
      """SELECT c_mktsegment,
        |  count(o_orderkey) AS n_big_orders,
        |  count(*) AS n_rows,
        |  CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_unmatched
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 450000
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q29_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, sec,
        |    CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
        |         OR lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sessions AS (
        |  SELECT user_id, event_id, sec,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  CAST(max(cnt) AS BIGINT) AS max_session_events
        |FROM (
        |  SELECT user_id, session_id, count(*) AS cnt
        |  FROM sessions GROUP BY user_id, session_id) per_session
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q27_except" ->
      """SELECT o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') d
        |ORDER BY o_custkey""".stripMargin,
    "q41_intersect" ->
      """SELECT o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F') d
        |ORDER BY o_custkey""".stripMargin,
    "q28_pivot" ->
      """SELECT l_returnflag,
        |  CAST(round(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS qty_F,
        |  CAST(round(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS qty_O
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q26_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) r
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q33_exists" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q34_ntile" ->
      """SELECT o_orderkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_totalprice > 400000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q35_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin,
    "q37_unpivot" ->
      """SELECT measure,
        |       CAST(round(sum(CAST(val AS DECIMAL(18,6))), 2) AS DOUBLE) AS total,
        |       count(*) AS n
        |FROM (
        |  SELECT * FROM (
        |    SELECT l_orderkey, l_quantity AS quantity, l_extendedprice AS extendedprice, l_discount AS discount
        |    FROM lineitem) wide
        |  UNPIVOT (val FOR measure IN (quantity, extendedprice, discount))) u
        |GROUP BY measure
        |ORDER BY measure""".stripMargin,
    "q38_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type FROM events),
        |p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, sec AS csec, event_id AS click_id FROM e WHERE event_type = 'click')
        |SELECT p.event_id, count(*) AS n_nearby, CAST(min(abs(p.sec - c.csec)) AS BIGINT) AS min_gap
        |FROM p JOIN c ON p.user_id = c.user_id AND abs(p.sec - c.csec) <= 300
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,
    "q39_regex_extract" ->
      """SELECT CAST(CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) % 10 AS BIGINT) AS name_digit,
        |       count(*) AS n,
        |       CAST(min(c_custkey) AS BIGINT) AS first_key
        |FROM customer
        |WHERE regexp_matches(c_name, 'Customer#\d+')
        |GROUP BY name_digit
        |ORDER BY name_digit""".stripMargin,
    "q40_array_functions" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         list_sort(list_distinct(list_filter(string_split(regexp_replace(lower(text), '[[:punct:]]', ' ', 'g'), ' '), x -> x <> ''))) AS dk
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(dk) AS INT) AS n_distinct,
        |       array_to_string(dk[1:3], '-') AS first3,
        |       CAST(list_contains(dk, 'the') AS BOOLEAN) AS has_the
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    "q36_frame_window" ->
      """SELECT DISTINCT user_id,
        |       first_value(event_id) OVER w AS first_ev,
        |       last_value(event_id) OVER w AS last_ev,
        |       nth_value(event_id, 2) OVER w AS second_ev
        |FROM (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin
  )

  val plans: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_semi_join" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").where(col("l_quantity") > 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    "q5_region_revenue" -> { (s, dir) =>
      // dims broadcast; the only big shuffle is orders⋈lineitem
      val r = t(s, dir, "region").where(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders").where(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(revTerm(li)), 2).cast("double").as("revenue"))
        .orderBy("n_name")
    },
    "q7_distinct" -> { (s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    },
    "q8_window_rank" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },
    "q9_topk_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    },
    "q10_anti_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    "q11_rollup" -> { (s, dir) =>
      // ROLLUP as two-level re-aggregation instead of the native
      // rollup(): at scale this shuffles each input row once and
      // re-aggregates the (much smaller) per-group partials for the
      // higher levels, where rollup's Expand would shuffle every row
      // once per grouping level. Decimal partials stay exact until the
      // final round. (Also sidesteps Spark 4's ambiguous-attribute
      // misfire on rollup().agg() after a join.)
      val base = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("rkey"), col("n_name").as("nkey"), dec(col("s_acctbal")).as("bal"))
        .groupBy("rkey", "nkey")
        .agg(sum(col("bal")).as("bal"), count(lit(1)).as("n"))
      val lvl0 = base.select(col("rkey"), col("nkey"), col("bal"), col("n"))
      val lvl1 = base.groupBy("rkey")
        .agg(sum(col("bal")).as("bal"), sum(col("n")).as("n"))
        .select(col("rkey"), lit(null).cast("string").as("nkey"), col("bal"), col("n"))
      val lvl2 = base
        .agg(sum(col("bal")).as("bal"), sum(col("n")).as("n"))
        .select(lit(null).cast("string").as("rkey"), lit(null).cast("string").as("nkey"), col("bal"), col("n"))
      lvl0.unionAll(lvl1).unionAll(lvl2)
        .select(
          coalesce(col("rkey"), lit("ALL")).as("region_name"),
          coalesce(col("nkey"), lit("ALL")).as("nation_name"),
          round(col("bal"), 2).cast("double").as("total_bal"),
          col("n"))
        .orderBy("region_name", "nation_name")
    },
    "q12_events_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy("hour_ts", "event_type")
    },
    "q13_events_json" -> { (s, dir) =>
      t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    },
    "q14_conditional_agg" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          round(sum(when(p("p_type") === "PROMO", revTerm(li))
            .otherwise(lit(0).cast(DecimalType(18, 6)))), 2)
            .cast("double").as("promo_revenue"),
          round(sum(revTerm(li)), 2).cast("double").as("total_revenue"))
    },
    "q15_union" -> { (s, dir) =>
      val n = t(s, dir, "nation")
      val viaCust = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("n_name")
      val viaSupp = t(s, dir, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select("n_name")
      viaCust.union(viaSupp).distinct().orderBy("n_name")
    },
    "q16_having" -> { (s, dir) =>
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(dsum(col("s_acctbal")).as("total_bal"), count(lit(1)).as("cnt"))
        .where(col("cnt") > 3)
        .drop("cnt")
        .orderBy("n_nationkey")
    },
    "q17_avg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (round(sum(dec(col("l_quantity"))), 6).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    "q18_in_subquery" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").where(col("p_brand") === "Brand#2").select("p_partkey")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left_semi")
        .agg(round(sum(revTerm(li)), 2).cast("double").as("revenue"), count(lit(1)).as("n"))
    },
    "q19_scalar_subquery" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val avgPrice = o.agg(
        (round(sum(dec(col("o_totalprice"))), 6).cast("double") / count(lit(1))).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .where(col("o_totalprice") > lit(1.5) * col("avg_price"))
        .agg(count(lit(1)).as("n_above"), min(col("o_orderkey")).cast("long").as("first_key"))
    },
    "q20_lag_window" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
        .where(col("gap_s").isNotNull)
        .groupBy("user_id")
        .agg(sum(col("gap_s")).as("total_gap_s"), count(lit(1)).as("n_gaps"))
        .orderBy("user_id")
    },
    "q21_asof_join" -> { (s, dir) =>
      // for each purchase, the latest click of the same user at or
      // before the purchase second (graft.ops.AsOfJoin — the operator
      // Spark lacks, composed as one union + one running window)
      val ev = t(s, dir, "events").withColumn("sec", unix_timestamp(col("ts")))
      val p = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "sec")
      val c = ev.where(col("event_type") === "click")
        .groupBy("user_id", "sec")
        .agg(max(col("event_id")).as("click_id"))
        .withColumn("click_sec", col("sec"))
      graft.ops.AsOfJoin
        .asof(p, c, "user_id", "sec", "sec", Seq("click_id", "click_sec"))
        .select(
          col("event_id"), col("user_id"), col("sec"),
          col("asof_click_id"),
          (col("sec") - col("asof_click_sec")).as("gap_s"))
        .orderBy("event_id")
    },
    "q22_sql_interface" -> { (s, dir) =>
      // the SQL text interface over registered views — same surface the
      // oracle sees
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, count(*) AS n_customers
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name
          |ORDER BY n_name""".stripMargin)
    },
    "q23_variance" -> { (s, dir) =>
      // population variance via E[X²]−E[X]²: sums are exact decimals,
      // divisions/multiply are IEEE-identical in any engine (pow avoided
      // — libm pow is not bit-specified)
      val q = dec(col("l_quantity"))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (round(sum(q * q), 2).cast("double") / count(lit(1))).as("ex2"),
          (round(sum(q), 2).cast("double") / count(lit(1))).as("ex"),
          count(lit(1)).as("n"))
        .select(
          col("l_returnflag"),
          (col("ex2") - col("ex") * col("ex")).as("var_qty"),
          col("n"))
        .orderBy("l_returnflag")
    },
    "q24_cube" -> { (s, dir) =>
      // CUBE via re-aggregation of decimal partials (same scale rationale
      // as q11_rollup: shuffle each row once, not once per grouping set)
      val base = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf0"), col("l_linestatus").as("ls0"), dec(col("l_quantity")).as("q"))
        .groupBy("rf0", "ls0")
        .agg(sum(col("q")).as("q"), count(lit(1)).as("n"))
      val nullS = lit(null).cast("string")
      val lvls = Seq(
        base.select(col("rf0"), col("ls0"), col("q"), col("n")),
        base.groupBy("rf0").agg(sum(col("q")).as("q"), sum(col("n")).as("n"))
          .select(col("rf0"), nullS.as("ls0"), col("q"), col("n")),
        base.groupBy("ls0").agg(sum(col("q")).as("q"), sum(col("n")).as("n"))
          .select(nullS.as("rf0"), col("ls0"), col("q"), col("n")),
        base.agg(sum(col("q")).as("q"), sum(col("n")).as("n"))
          .select(nullS.as("rf0"), nullS.as("ls0"), col("q"), col("n")))
      lvls.reduce(_.unionAll(_))
        .select(
          coalesce(col("rf0"), lit("ALL")).as("rf"),
          coalesce(col("ls0"), lit("ALL")).as("ls"),
          round(col("q"), 2).cast("double").as("sum_qty"),
          col("n"))
        .orderBy("rf", "ls")
    },
    "q25_median" -> { (s, dir) =>
      // exact interpolated percentiles: Spark's percentile() and
      // DuckDB's quantile_cont share the (n-1)p linear-interpolation
      // definition over sorted exact input doubles
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"))
        .orderBy("l_returnflag")
    },
    "q31_date_functions" -> { (s, dir) =>
      // Spark dayofweek is 1=Sunday..7=Saturday; DuckDB strftime('%w')
      // is 0=Sunday..6 — the +1 aligns them
      t(s, dir, "orders")
        .where(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
            col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("yr", "mo", "dow")
    },
    "q32_string_functions" -> { (s, dir) =>
      t(s, dir, "customer")
        .where(col("c_name").like("Customer%"))
        .groupBy(upper(substring(col("c_name"), 1, 9)).as("prefix"))
        .agg(
          min(length(col("c_name"))).cast("long").as("min_len"),
          max(length(col("c_name"))).cast("long").as("max_len"),
          count(lit(1)).as("n"))
        .orderBy("prefix")
    },
    "q30_outer_join" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 450000, "left_outer")
        .groupBy("c_mktsegment")
        .agg(
          count(col("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"),
          count(when(col("o_orderkey").isNull, 1)).as("n_unmatched"))
        .orderBy("c_mktsegment")
    },
    "q33_exists" -> { (s, dir) =>
      // correlated EXISTS / NOT EXISTS as semi + anti joins: the two
      // scan-level filters prune before the shuffles
      val c = t(s, dir, "customer")
      val oF = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      val oBig = t(s, dir, "orders").where(col("o_totalprice") > 450000)
      c.join(oF, c("c_custkey") === oF("o_custkey"), "left_semi")
        .join(oBig, col("c_custkey") === oBig("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    "q34_ntile" -> { (s, dir) =>
      // distribution window functions; ties broken by unique order key
      // so ntile/percent_rank/cume_dist are deterministic
      val w = Window.partitionBy("o_orderstatus").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .where(col("o_totalprice") > 400000)
        .select(
          col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },
    "q35_grouping_sets" -> { (s, dir) =>
      // GROUPING SETS via one decimal partial aggregate re-aggregated
      // per set — same exact-sum trick as rollup/cube (q11/q24): each
      // input row crosses the shuffle once instead of once per set
      val partial = t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec(col("l_quantity"))).as("q"), count(lit(1)).as("cnt"))
      def reagg(keys: Seq[Column], rf: Column, ls: Column) = partial
        .groupBy(keys: _*)
        .agg(round(sum(col("q")), 2).cast("double").as("sum_qty"), sum(col("cnt")).as("n"))
        .select(rf.as("rf"), ls.as("ls"), col("sum_qty"), col("n"))
      reagg(Seq(col("l_returnflag")), col("l_returnflag"), lit("ALL"))
        .unionByName(reagg(Seq(col("l_linestatus")), lit("ALL"), col("l_linestatus")))
        .unionByName(reagg(Nil, lit("ALL"), lit("ALL")))
        .orderBy("rf", "ls")
    },
    "q37_unpivot" -> { (s, dir) =>
      // wide → long via the native unpivot operator, decimal-exact sums
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          dec(col("l_quantity")).as("quantity"),
          dec(col("l_extendedprice")).as("extendedprice"),
          dec(col("l_discount")).as("discount"))
        .unpivot(
          Array(col("l_orderkey")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "measure", "val")
        .groupBy("measure")
        .agg(round(sum(col("val")), 2).cast("double").as("total"), count(lit(1)).as("n"))
        .orderBy("measure")
    },
    "q38_range_join" -> { (s, dir) =>
      // bounded-range temporal join via ops.RangeJoin: binned equi-join
      // + exact |gap| check, not a quadratic non-equi join
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("sec"), col("event_type"))
      val p = e.where(col("event_type") === "purchase").select("event_id", "user_id", "sec")
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("sec").as("csec"), col("event_id").as("click_id"))
      graft.ops.RangeJoin.rangeJoin(p, c, "user_id", "sec", "csec", 300L, Seq("click_id"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_nearby"), min(col("range_gap")).as("min_gap"))
        .orderBy("event_id")
    },
    "q39_regex_extract" -> { (s, dir) =>
      // regex capture-group extraction + cast, identical group
      // semantics in both engines
      t(s, dir, "customer")
        .where(col("c_name").rlike("Customer#\\d+"))
        .groupBy((regexp_extract(col("c_name"), "Customer#(\\d+)", 1)
          .cast("long") % 10).as("name_digit"))
        .agg(count(lit(1)).as("n"), min(col("c_custkey")).cast("long").as("first_key"))
        .orderBy("name_digit")
    },
    "q40_array_functions" -> { (s, dir) =>
      // array surface: distinct, sort, slice, join, contains — over the
      // tokenize-once projection
      t(s, dir, "documents")
        .select(col("doc_id"),
          array_sort(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("dk"))
        .select(
          col("doc_id"),
          size(col("dk")).as("n_distinct"),
          array_join(slice(col("dk"), 1, 3), "-").as("first3"),
          array_contains(col("dk"), "the").as("has_the"))
        .orderBy("doc_id")
    },
    "q36_frame_window" -> { (s, dir) =>
      // frame-sensitive window functions over the full partition frame
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
        .select(
          col("user_id"),
          first(col("event_id")).over(w).as("first_ev"),
          last(col("event_id")).over(w).as("last_ev"),
          nth_value(col("event_id"), 2).over(w).as("second_ev"))
        .distinct()
        .orderBy("user_id")
    },
    "q29_sessionize" -> { (s, dir) =>
      // batch sessionization: gap-flag + running sum assigns session ids,
      // two aggregations summarize — the batch twin of
      // streaming.StreamOps.sessionize
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("prev", lag(col("sec"), 1).over(w))
        .withColumn("new_session",
          when(col("prev").isNull || col("sec") - col("prev") > 1800, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("cnt")).as("n_events"),
          max(col("cnt")).as("max_session_events"))
        .orderBy("user_id")
    },
    "q27_except" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.where(col("o_totalprice") > 450000).select("o_custkey").distinct()
        .except(o.where(col("o_orderstatus") === "F").select("o_custkey").distinct())
        .orderBy("o_custkey")
    },
    "q41_intersect" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      o.where(col("o_totalprice") > 400000).select("o_custkey").distinct()
        .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey").distinct())
        .orderBy("o_custkey")
    },
    "q28_pivot" -> { (s, dir) =>
      // pivot with explicit values (deterministic columns); exact decimal
      // per-cell sums like every other aggregate
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(dec(col("l_quantity"))), 2).cast("double"))
        .withColumnRenamed("F", "qty_F")
        .withColumnRenamed("O", "qty_O")
        .select(col("l_returnflag"),
          coalesce(col("qty_F"), lit(0.0)).as("qty_F"),
          coalesce(col("qty_O"), lit(0.0)).as("qty_O"))
        .orderBy("l_returnflag")
    },
    "q26_topk_per_key" -> { (s, dir) =>
      // the custom physical operator (TopKPerKeyPlan/Exec): bounded
      // per-key heaps partial+final around one exchange, instead of the
      // window's full per-key shuffle-and-sort
      graft.plans.TopKPerKey(
          t(s, dir, "orders"),
          Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(asc("o_custkey"), desc("o_totalprice"), asc("o_orderkey"))
    }
  )
}
