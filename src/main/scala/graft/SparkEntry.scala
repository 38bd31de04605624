package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-oracle twin in `oracleSql`
  * operating on the same parquet tables; column names and row order are
  * aligned pairwise (aggregates use exact decimal sums rendered as
  * doubles — see [[Tables.dsum]] — so hashes match bit-for-bit).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core relational / gold layer (SURVEY §2.6)
    "q1_pricing_summary"   -> (TpchQueries.q1PricingSummary _),
    "q3_shipping_priority" -> (TpchQueries.q3ShippingPriority _),
    "q5_local_supplier"    -> (TpchQueries.q5LocalSupplier _),
    "p_filter_project"     -> (TpchQueries.pFilterProject _),
    "k_latest_order_per_customer" -> (TpchQueries.kLatestOrderPerCustomer _),
    "v_orphan_orders"      -> (TpchQueries.vOrphanOrders _),
    "v_table_ranges"       -> (TpchQueries.vTableRanges _),
    "j_customers_with_big_orders" -> (TpchQueries.jCustomersWithBigOrders _),
    // Event stream / silver layer shapes (SURVEY §2.5)
    "m_json_extract"       -> (EventQueries.mJsonExtract _),
    "g_daily_metrics"      -> (EventQueries.gDailyMetrics _),
    "g_hourly_activity"    -> (EventQueries.gHourlyActivity _),
    "k_latest_event_per_user" -> (EventQueries.kLatestEventPerUser _),
    "v_error_ratio"        -> (EventQueries.vErrorRatio _),
    "w_event_gaps"         -> (EventQueries.wEventGaps _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "p_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IN ('R','A') AND l_quantity >= 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "k_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "v_orphan_orders" ->
      """SELECT COUNT(*) AS orphan_count FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,
    "v_table_ranges" ->
      """SELECT * FROM (
        |  SELECT 'orders' AS table_name, CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |         CAST(MAX(o_orderkey) AS BIGINT) AS max_key, COUNT(*) AS row_count FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', CAST(MIN(l_orderkey) AS BIGINT), CAST(MAX(l_orderkey) AS BIGINT), COUNT(*) FROM lineitem
        |  UNION ALL
        |  SELECT 'customer', CAST(MIN(c_custkey) AS BIGINT), CAST(MAX(c_custkey) AS BIGINT), COUNT(*) FROM customer
        |  UNION ALL
        |  SELECT 'part', CAST(MIN(p_partkey) AS BIGINT), CAST(MAX(p_partkey) AS BIGINT), COUNT(*) FROM part) t
        |ORDER BY table_name""".stripMargin,
    "j_customers_with_big_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "m_json_extract" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events
        |WHERE event_type IN ('purchase','signup')
        |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "g_daily_metrics" ->
      """SELECT epoch_ns(ts) // 86400000000000 AS epoch_day,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(28,2))) AS DOUBLE) AS purchase_value,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(28,2))) AS DOUBLE) AS view_value,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
        |  COUNT(*) AS n_events
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_hourly_activity" ->
      """SELECT epoch_ns(ts) - (epoch_ns(ts) % 3600000000000) AS hour_bucket,
        |  event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "k_latest_event_per_user" ->
      """SELECT user_id, event_id, ts_us, event_type FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "v_error_ratio" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
        |  COUNT(*) AS total_count,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS error_ratio
        |FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w_event_gaps" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |  COALESCE(LAG(event_type) OVER w, 'none') AS prev_type,
        |  epoch_us(ts) - COALESCE(LAG(epoch_us(ts)) OVER w, epoch_us(ts)) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, epoch_us(ts), event_id""".stripMargin,
  )
}
