package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational analytics over the driver corpus — the query shapes
  * the reference's gold layer uses (equi joins, conditional aggregation,
  * DISTINCT pre-dedup, ORDER BY), expressed Spark-first.
  *
  * Scale notes (100 TB): only genuinely bounded dims (region=5,
  * nation=25 rows) carry explicit broadcast hints; fact-scale relations
  * (customer, orders, lineitem) are left to AQE, which broadcasts at
  * small SF and shuffle-hashes at large SF; aggregations are partial
  * (map-side combine) by construction of groupBy/agg; every query's
  * filters sit directly on the scanned columns so Catalyst pushes them
  * into the parquet reader.
  */
object TpchQueries {

  /** TPC-H Q1 shape: scan-heavy conditional aggregation on the largest
    * table. Mirrors gold G6 (conditional sums) on lineitem.
    * Reference twin: clickhouse/init/03-gold-views.sql:23-30. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 shape: selective fact-fact join + revenue top-k.
    * customer ⋈ orders ⋈ lineitem, join strategy left to AQE. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    // customer is fact-scale (grows with SF) — no forced broadcast; AQE
    // decides broadcast-vs-shuffle at runtime so the same plan survives
    // a 100× scale-up (VERDICT r1 performance finding).
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5 shape: star join through region→nation→customer→orders→
    * lineitem; bounded dims (region, nation) broadcast, the rest AQE. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = region(spark, dir)
    val n = nation(spark, dir)
    val c = customer(spark, dir)
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    // Broadcast only genuinely bounded dims (region=5, nation=25 rows);
    // customer is fact-scale → left to AQE (scale-safe).
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** TPC-H Q9 shape: revenue by supplier nation and part brand —
    * lineitem ⋈ part ⋈ supplier ⋈ nation, covering the remaining
    * dimension tables; nation broadcast, the rest AQE. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val p = part(spark, dir)
    val s = supplier(spark, dir)
    val n = nation(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("p_brand"))
  }

  /** TPC-H Q6 shape: pure scan + filter + single aggregate — the
    * throughput floor of the engine. Every predicate sits directly on a
    * scanned column, so all three push into the parquet reader and the
    * plan is one WholeStageCodegen span over the scan. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    * selective fact-fact join (returnflag + order-date window pushed to
    * the scans), then a top-k that runs as TakeOrderedAndProject (per
    * partition keeps 20 rows; the driver merges P·20), never a global
    * sort. (revenue DESC, c_custkey ASC) is a total order, so the k-cut
    * is deterministic under ties in both engines. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = lineitem(spark, dir).filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    * mixed equi + range condition (the corpus has no commit/receipt
    * dates, so "late" = a line shipped more than 90 days after the
    * order date). The semi join keeps the probe side deduplicated by
    * construction — no DISTINCT pass, no row explosion from multi-line
    * orders; both date filters push into the scans. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val l = lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q18 shape: large-volume orders — a HAVING subquery
    * (per-order quantity totals over the biggest table) feeding a
    * selective join back to orders and customer, then a deterministic
    * top-k. The aggregation is partial (map-side combine) and its
    * output is order-count-bounded; AQE owns the join strategies; the
    * top-k runs as TakeOrderedAndProject with the (o_totalprice DESC,
    * o_orderkey ASC) total order making the cut deterministic. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q17 shape: a CORRELATED SCALAR SUBQUERY per group
    * ("lineitems below 20% of their part's average quantity"),
    * decorrelated to an aggregate join — the rewrite Catalyst's
    * subquery decorrelation performs, written explicitly so the plan
    * is the one a 100-TB run needs: the per-part average is one
    * partial aggregation to a part-bounded relation, joined back on
    * the part key (AQE-owned — NOT force-broadcast: the brand slice of
    * part is data-proportional, the round-1/round-3 driver-OOM
    * lesson).
    *
    * The brand-filtered lineitem slice feeds BOTH the average and the
    * final filter, so it is persisted once (tracked cache contract)
    * instead of re-running the scan+join lineage twice. Cross-engine
    * determinism: the average is [[graft.Tables.davg]] (exact decimal
    * sum, ONE double division), 0.2·avg is one more exact-rounded
    * multiply, and the final sum is the dsum discipline — every double
    * bit-identical in both engines. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).filter(col("p_brand") === "Brand#12")
      .select(col("p_partkey"))
    val branded = graft.QueryCaches.persistTracked(
      lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .drop("p_partkey"))
    val avgs = branded.groupBy(col("l_partkey"))
      .agg(davg(col("l_quantity"), 2).as("avg_qty"))
    branded.join(avgs, Seq("l_partkey"))
      .filter(col("l_quantity") <
        lit(0.2).cast("double") * col("avg_qty"))
      .agg(
        (dsum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q11 shape: a HAVING filter against a GLOBAL-aggregate
    * scalar ("suppliers whose revenue exceeds 0.1% of total revenue";
    * the corpus has no partsupp, so supplier revenue stands in for
    * partsupp value — same plan shape). The global total is computed
    * once from the per-supplier aggregate (supplier-bounded, NOT a
    * second lineitem scan) and reaches every row as a broadcast
    * 1-row cross join — a broadcast SCALAR, no driver-side collect in
    * the plan. Group sums and the total are exact decimal; the 0.1%
    * threshold compare casts both sides to double (one exact-rounded
    * multiply), identical in DuckDB. */
  def q11SupplierShare(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the supplier-bounded aggregate feeds both the global
    // total and the filter — unpersisted, the lineitem scan+aggregate
    // lineage would run twice (tracked cache contract)
    val rev = graft.QueryCaches.persistTracked(
      lineitem(spark, dir)
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("value_dec")))
    val total = rev.agg(sum(col("value_dec")).as("total_dec"))
    rev.crossJoin(broadcast(total))
      .filter(col("value_dec").cast("double") >
        col("total_dec").cast("double") * lit(0.001).cast("double"))
      .join(supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey"), col("s_name"),
        col("value_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_suppkey").asc)
  }

  /** Filter + projection pushdown showcase (SURVEY P3–P5 `isin` pattern):
    * both predicates reach the parquet scan, only 4 columns are read. */
  def pFilterProject(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir)
      .filter(col("l_returnflag").isin("R", "A") &&
        col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** ReplacingMergeTree/FINAL semantics (SURVEY K2): latest row per key
    * via row_number window — last-write-wins dedup exactly as the
    * reference's `FROM <table> FINAL` reads.
    * Reference twin: 01-core-tables.sql:24-27 + cross-validate.sh:111. */
  def kLatestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** Referential-integrity anti-join (SURVEY V4): orders whose customer
    * is missing — LEFT JOIN … IS NULL expressed as a proper anti join. */
  def vOrphanOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val c = customer(spark, dir)
    // Plain shuffled anti-join: the build side (customer) is fact-scale,
    // so no forced broadcast — AQE may still choose one at small SF.
    o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_count"))
  }

  /** Per-table min/max/count consistency report (SURVEY V2), one row per
    * table via unionByName — mirrors validate.sh:107-118. */
  def vTableRanges(spark: SparkSession, dir: String): DataFrame = {
    def summary(name: String, df: DataFrame, key: String): DataFrame =
      df.agg(
        min(col(key)).cast("long").as("min_key"),
        max(col(key)).cast("long").as("max_key"),
        count(lit(1)).as("row_count"))
        .withColumn("table_name", lit(name))
        .select("table_name", "min_key", "max_key", "row_count")
    summary("orders", orders(spark, dir), "o_orderkey")
      .unionByName(summary("lineitem", lineitem(spark, dir), "l_orderkey"))
      .unionByName(summary("customer", customer(spark, dir), "c_custkey"))
      .unionByName(summary("part", part(spark, dir), "p_partkey"))
      .orderBy(col("table_name"))
  }

  /** BENFORD first-digit audit over order totals — the forensic
    * data-quality screen (fabricated or unit-mangled monetary columns
    * drift from the log-uniform first-digit law; a synthetic uniform
    * corpus like this one FAILS it loudly, which is exactly what the
    * report shows). Digit extraction: the cents-scaled double is
    * rounded EXPLICITLY — `floor(x*100 + 0.5)` spelled identically in
    * both engines — before the BIGINT cast, because a bare
    * double→BIGINT cast is the one divergent step (Spark truncates,
    * DuckDB rounds; ADVICE r10). `floor` on a double is IEEE-exact and
    * engine-identical, and from there the leading digit comes off the
    * integer's decimal string, which both engines render identically.
    * The
    * expected shares are log10(1+1/d) pinned as LITERALS (identical
    * text in the oracle — no cross-engine libm question), and the
    * observed share is one exact-count division.
    *
    * Scale shape: one narrow projection + a 9-cell aggregation with
    * map-side combine; the report is digit-bounded. */
  def vBenford(spark: SparkSession, dir: String): DataFrame = {
    val expected = typedLit(Seq(
      0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514))
    val digits = orders(spark, dir)
      .select(expr(
        "CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
          " AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    digits
      .withColumn("observed_share",
        col("n").cast("double") / sum(col("n")).over(total).cast("double"))
      .withColumn("expected_share", element_at(expected, col("digit")))
      .withColumn("deviation", col("observed_share") - col("expected_share"))
      .select(col("digit"), col("n"), col("observed_share"),
        col("expected_share"), col("deviation"))
      .orderBy(col("digit"))
  }

  /** Semi-join (EXISTS) — customers having at least one high-value
    * order; complements V4's anti-join. */
  def jCustomersWithBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir).filter(col("o_totalprice") > 100000.0)
    customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }
}
