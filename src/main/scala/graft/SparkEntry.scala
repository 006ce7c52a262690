package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key has a DuckDB oracle twin in `oracleSql` unless the
  * op is not SQL-expressible (those are covered by ScalaTest specs).
  * Column aliases, rounding, and ORDER BY are kept identical on both
  * sides so the driver's hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05NationVolume(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> Relational.q01PricingSummary _,
    "q02_filter_project" -> Relational.q02FilterProject _,
    "q03_top_revenue" -> Relational.q03TopRevenue _,
    "q04_order_priority" -> Relational.q04OrderPriority _,
    "q05_nation_volume" -> Relational.q05NationVolume _,
    "q06_revenue_filter" -> Relational.q06RevenueFilter _,
    "q07_window_rank" -> Relational.q07WindowRank _,
    "q08_distinct_agg" -> Relational.q08DistinctAgg _,
    "q09_sort_limit" -> Relational.q09SortLimit _,
    "q10_semi_join" -> Relational.q10SemiJoin _,
    "q11_anti_join" -> Relational.q11AntiJoin _,
    "q12_union_all" -> Relational.q12UnionAll _,
    "q13_case_agg" -> Relational.q13CaseAgg _,
    "q14_date_parts" -> Relational.q14DateParts _,
    "q15_string_funcs" -> Relational.q15StringFuncs _,
    "q16_null_safe" -> Relational.q16NullSafe _,
    "q17_avg_join" -> Relational.q17AvgJoin _,
    "q18_group_having" -> Relational.q18GroupHaving _,
    "q19_rollup" -> Relational.q19Rollup _,
    "q20_pivot_events" -> Relational.q20PivotEvents _)

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01' AND l_discount >= 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q03_top_revenue" ->
      """SELECT o_orderkey, o_orderdate,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_nation_volume" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q06_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""",
    "q07_window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 2
         ORDER BY o_custkey, rk, o_orderkey""",
    "q08_distinct_agg" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q09_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q12_union_all" ->
      """SELECT * FROM (
           SELECT 'order' AS src, o_orderkey AS id,
                  round(o_totalprice, 2) AS amount
           FROM orders WHERE o_totalprice > 450000
           UNION ALL
           SELECT 'event' AS src, event_id AS id, round(value, 2) AS amount
           FROM events WHERE value > 190)
         ORDER BY src, id""",
    "q13_case_agg" ->
      """SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
         CAST(sum(CASE WHEN o_orderpriority LIKE '5%' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         round(avg(CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice END), 2) AS avg_urgent_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q14_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS o_quarter,
         count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_year, o_quarter ORDER BY o_year, o_quarter""",
    "q15_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         substring(p_type, 1, 5) AS type5, length(p_name) AS name_len,
         regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
         concat_ws('|', p_brand, p_type) AS brand_type
         FROM part ORDER BY p_partkey""",
    "q16_null_safe" ->
      """SELECT event_id,
         TRY_CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k,
         coalesce(nullif(value, 0.0), -1.0) AS safe_value
         FROM events ORDER BY event_id""",
    "q17_avg_join" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem l JOIN (
           SELECT l_partkey, avg(l_quantity) AS avg_qty
           FROM lineitem GROUP BY l_partkey) p
         ON l.l_partkey = p.l_partkey
         WHERE l.l_quantity < p.avg_qty * 0.5""",
    "q18_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey HAVING count(*) >= 12
         ORDER BY o_custkey""",
    "q19_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q20_pivot_events" ->
      """SELECT date_trunc('day', ts) AS day,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'error') AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup') AS signup,
         count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY day ORDER BY day""")
}
