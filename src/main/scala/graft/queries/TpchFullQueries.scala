package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryCaches
import graft.Tables._

/** The remaining TPC-H query shapes (Q2/Q7/Q8/Q12–Q16/Q19–Q22),
  * completing the 22-query analytic suite alongside [[TpchQueries]].
  *
  * The driver corpus is TPC-H-ish, not TPC-H: there is no partsupp
  * table and no comment/phone/shipmode/receiptdate columns, so each
  * query keeps its REFERENCE SHAPE (the plan structure the official
  * query exists to exercise) while substituting the available columns —
  * lineitem stands in for partsupp as the part↔supplier relation,
  * l_returnflag for l_shipmode, "shipped >N days after order" for the
  * commit/receipt lateness, and nation for the phone country code.
  *
  * Scale notes (100 TB): same discipline as [[TpchQueries]] — explicit
  * broadcast only for genuinely bounded dims (region=5, nation=25,
  * supplier's negative-balance slice, single-row scalar aggregates);
  * fact-fact joins left to AQE; every literal predicate sits on a
  * scanned column so it pushes into the parquet reader; decimal-sum
  * discipline ([[graft.Tables.dsum]]) keeps aggregates engine-exact.
  */
object TpchFullQueries {

  /** TPC-H Q2 shape: min-cost supplier per part — a correlated MIN
    * subquery decorrelated to an aggregate join (the partsupp role is
    * played by lineitem's (part, supplier, price) triples), with a
    * region-bounded supplier side. Ties on the min price keep every
    * achieving supplier, exactly like the official query; the ORDER BY
    * is a total key so the LIMIT cut is deterministic. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euSupp = supplier(spark, dir)
      .join(broadcast(nation(spark, dir)
          .join(broadcast(region(spark, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val p = part(spark, dir).filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val offers = lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(euSupp, col("l_suppkey") === col("s_suppkey"))
    val minCost = offers.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    offers
      .join(minCost, col("p_partkey") === col("mc_partkey") &&
        col("l_extendedprice") === col("min_price"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("min_price"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("p_partkey").asc,
        col("s_suppkey").asc)
      .limit(100)
  }

  /** TPC-H Q7 shape: volume shipping between a nation PAIR — the
    * role-playing dimension join (nation joined twice under different
    * roles: supplier's vs customer's) with the symmetric two-direction
    * filter, grouped by shipment year. Both nation legs broadcast
    * (25 rows); the fact spine is lineitem⋈orders⋈customer left to
    * AQE. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape: national market share — a RATIO OF CONDITIONAL
    * SUMS per order year: of the PROMO-part revenue flowing to EUROPE
    * customers, the share supplied from one nation. Both sums stay
    * DECIMAL through the aggregate; the one double division happens
    * after, so the ratio is bit-identical in both engines. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val euCust = customer(spark, dir)
      .join(broadcast(nation(spark, dir)
          .join(broadcast(region(spark, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = supplier(spark, dir)
      .join(broadcast(nation(spark, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(spark, dir)
      .join(part(spark, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(euCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dsum(when(col("supp_nation") === "NATION_5", rev).otherwise(0.0), 6)
          .as("nation_rev"),
        dsum(rev, 6).as("total_rev"))
      .select(col("o_year"),
        (col("nation_rev") / col("total_rev")).as("mkt_share"),
        col("total_rev"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q12 shape: late-shipment priority split — a fact-fact join
    * with a range condition, then TWO conditional counts per group
    * (high-priority vs low-priority orders among late lines).
    * l_returnflag stands in for l_shipmode; "late" is shipped >60 days
    * after the order date (the corpus has no commit/receipt dates). */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val highPri = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(spark, dir)
      .join(orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        // count-of-non-null, not SUM(CASE): integer SUM widens to
        // HUGEINT in the DuckDB oracle, COUNT is BIGINT in both engines
        count(when(highPri, lit(1))).as("high_line_count"),
        count(when(!highPri, lit(1))).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q13 shape: customer order-count DISTRIBUTION — the LEFT
    * OUTER join that must keep zero-order customers, then a second
    * aggregation over the first's result (orders-per-customer →
    * customers-per-count histogram). The outer join is what the shape
    * exists to test: an inner join would silently drop the c_count=0
    * bucket. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = customer(spark, dir)
      .join(orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 shape: promo revenue share — a single-row conditional
    * ratio over a part join in one month's shipping window. Same
    * decimal-then-divide discipline as [[q8MarketShare]]. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", rev).otherwise(0.0), 6)
          .as("promo_rev"),
        dsum(rev, 6).as("total_rev"),
        count(lit(1)).as("n_items"))
      .select(
        (lit(100.0) * col("promo_rev") / col("total_rev"))
          .as("promo_share_pct"),
        col("total_rev"), col("n_items"))
  }

  /** TPC-H Q15 shape: top supplier — a SCALAR MAX over a derived
    * aggregate view, joined back by equality on the aggregate itself.
    * The revenue stays DECIMAL end-to-end (sum AND max AND the equality
    * compare), so the max-equality join is exact in both engines; only
    * the output column casts to double. All max-achieving suppliers
    * survive, as in the official query. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val revDec = sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 6))).as("rev_dec")
    val rev = lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(revDec)
    val top = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.join(broadcast(top), col("rev_dec") === col("max_rev"))
      .join(supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 shape: supplier count per part attribute — COUNT
    * DISTINCT over a part join, minus an EXCLUSION set delivered as an
    * ANTI join (suppliers in deficit stand in for the "complaints"
    * comment filter). The NOT-IN of the official query is exactly this
    * anti join once null-safety is settled (s_suppkey is never null
    * here). The exclusion set grows with SF (it is a fixed FRACTION of
    * suppliers, not a fixed count), so it carries NO forced broadcast —
    * AQE broadcasts it while it is small and shuffles when it is not. */
  def q16PartsSupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val excluded = supplier(spark, dir).filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("x_suppkey"))
    val p = part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(excluded, col("l_suppkey") === col("x_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q19 shape: DISJUNCTIVE join predicate — three OR'd
    * brand×size×quantity branches. The part-side conjuncts
    * (brand/size) and lineitem-side conjuncts (quantity bounds) must
    * still push into their scans even under the OR; the join itself
    * stays a plain equi join on partkey with the residual disjunction
    * as a post-join filter. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val branch = (brand: String, sizeHi: Int, qLo: Double, qHi: Double) =>
      col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    lineitem(spark, dir)
      .join(part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(branch("Brand#12", 5, 1, 11) ||
        branch("Brand#23", 10, 10, 20) ||
        branch("Brand#15", 15, 20, 30))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q20 shape: part availability — a NESTED AGGREGATE inside a
    * semi-join chain: suppliers (region-bounded) who shipped more than
    * a threshold quantity of some name-matched part in 1996. The inner
    * aggregate runs over (part, supplier) grain BEFORE any supplier
    * join, so the fact scan aggregates once and the semi joins only
    * see its bounded output. */
  def q20PartAvailability(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = part(spark, dir)
      .filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val shipped = lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity"), 2).as("qty"))
      .filter(col("qty") > 40.0)
      .select(col("l_suppkey")).distinct()
    supplier(spark, dir)
      .join(broadcast(nation(spark, dir)
          .join(broadcast(region(spark, dir)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: the EXISTS + NOT-EXISTS pair over the same fact
    * with different correlations — suppliers who were the ONLY late
    * shipper in a multi-supplier finished order. Both subqueries
    * decorrelate into ONE per-order aggregate (distinct suppliers vs
    * distinct late suppliers), so the fact scans once per role instead
    * of per correlated probe; "late" is shipped >60 days after the
    * order date, as in [[q12LatePriority]]. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val fOrders = orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val lines = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    // ONE aggregation to the (order, supplier) grain serves both
    // consumers (r17, guide §1.2/§2.3): the previous shape ran the
    // lineitem⋈orders subtree TWICE (per-order countDistinct pass +
    // late-pair distinct pass), and the two countDistincts planned an
    // Expand that doubled the aggregate's input rows. n_supp =
    // count over the distinct grain; n_late = suppliers with any late
    // line; the late-pair relation is the same grain filtered — all
    // exactly the prior semantics, one lineitem scan, no Expand.
    val perOrderSupp = QueryCaches.persistTracked(lines
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("is_late")).as("late")))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey").as("po_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    perOrderSupp.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(perOrder, col("l_orderkey") === col("po_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(100)
  }

  /** TPC-H Q22 shape: global-scalar threshold + ANTI join — customers
    * richer than the average positive balance with NO RECENT ORDERS
    * (none since 1999 — the official query's "dormant for years"
    * predicate), grouped by nation (the corpus's stand-in for the
    * phone country code). The scalar average is a one-row broadcast;
    * the anti join carries the NOT EXISTS; the date filter pushes into
    * the orders scan BEFORE the anti join, shrinking its build side. */
  def q22SalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal"), 2).as("avg_bal"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy(col("n_name"))
  }
}
