package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gold layer — gold_view_intents_metrics (SURVEY.md §2.6 G1–G8;
  * reference: clickhouse/init/03-gold-views.sql:4-31).
  *
  * Inputs are the silver DataFrames plus the `defuse_assets` dimension
  * (blockchain, contract_address, decimals, defuse_asset_id, price,
  * price_updated_at_ns, symbol — 02-silver-tables.sql:12-22).
  *
  * Plan shape at scale: both joins are left equi joins. Only the assets
  * dimension is force-broadcast — it is genuinely bounded (one row per
  * listed token per refresh day). The token_diff referral side is
  * DERIVED FROM THE EVENT STREAM and grows with the data, so it carries
  * no hint: AQE picks broadcast when a filtered batch is small and a
  * shuffle join when it is not (a forced broadcast there is a
  * driver-OOM at 100×). The day column is derived BEFORE the join so
  * the date-equality "as-of by day" price join (G3) stays a plain hash
  * join on (day, asset_id).
  */
object GoldViews {

  private val NanosPerDay = 86400L * 1000000000L

  /** G1–G8. `broadcastDims=false` lets tests exercise the shuffle path
    * for the bounded assets dimension; the referral side is never
    * hinted (fact-scale — AQE owns the choice). */
  def intentsMetrics(
      nep245: DataFrame,
      tokenDiff: DataFrame,
      assets: DataFrame,
      broadcastDims: Boolean = true): DataFrame = {

    val d = tokenDiff.select(
      col("related_receipt_id"), col("referral"))
    val a0 = assets.select(
      expr(s"price_updated_at_ns DIV ${NanosPerDay}L").as("price_day"),
      col("defuse_asset_id"), col("decimals"), col("price"),
      col("symbol"), col("blockchain"))
    val a = if (broadcastDims) broadcast(a0) else a0

    val e = nep245.withColumn("day", expr(s"block_timestamp_ns DIV ${NanosPerDay}L"))

    // G2: equi left join on receipt; G3: as-of-by-day price join
    // expressed as equi join on the derived day (03-gold-views.sql:19-20).
    val joined = e
      .join(d, Seq("related_receipt_id"), "left")
      .join(a,
        e("day") === a("price_day") && e("token_id") === a("defuse_asset_id"),
        "left")
      // G5: derived measure (03:16)
      .withColumn("usd_value",
        (col("amount") / pow(lit(10.0), col("decimals"))) * col("price"))
      // G4 part 1: NOT(referral empty AND memo empty) — three-valued
      // logic identical to ClickHouse's (03:21)
      .filter(!(length(col("referral")) === 0 && length(col("memo")) === 0))

    // G1: DISTINCT pre-dedup on the projected tuple (03:15)
    val deduped = joined.select(
      col("block_timestamp_ns"), col("day"), col("block_hash"), col("event"),
      col("memo"), col("old_owner_id"), col("new_owner_id"), col("token_id"),
      col("usd_value"), col("symbol"), col("blockchain"), col("referral"))
      .distinct()

    deduped
      // G4 part 2 (03:29)
      .filter(col("symbol") =!= "" && col("blockchain") =!= "")
      // G6 conditional aggregation + G7 referral default (03:23-30)
      .groupBy(
        col("day"),
        col("symbol"),
        coalesce(col("referral"), lit("Others")).as("referral"),
        col("blockchain"))
      .agg(
        sum(when(col("event") === "mt_transfer", col("usd_value")))
          .as("transfer_volume"),
        sum(when(col("event") === "mt_mint", col("usd_value")))
          .as("deposits"),
        (sum(when(col("event") === "mt_burn", col("usd_value"))) * -1)
          .as("withdraws"),
        sum(when(col("event") === "mt_mint", col("usd_value"))
          .when(col("event") === "mt_burn", col("usd_value") * -1))
          .as("netflow"))
      // G8 (03:31)
      .orderBy(col("day"))
  }

  /** Per-batch rows of the incremental gold transfer rollup — the
    * aggregate-MV twin of the query-time [[intentsMetrics]] view.
    *
    * GRAIN IS THE REPLAY-ATOMIC UNIT: one row per (block, token), NOT
    * per (day, token). The batch runner's resume marker comes from the
    * transactions table, so a block carrying no transactions (e.g. one
    * holding only receipt outcomes) is legitimately RE-PROCESSED by the
    * next run inside a DIFFERENT batch composition — an additive
    * day-grain partial would double-count it (the summing sink's
    * redelivery guard assumes replay-stable batch boundaries, which
    * resume-overlap replays violate). At block grain a replay rewrites
    * byte-identical rows and the ordinary keyed FINAL absorbs them,
    * exactly like every other product table. Daily totals are then a
    * read-time rollup over O(blocks x tokens) pre-aggregated rows —
    * the fact-table scan is still amortized away, which is the point
    * of the MV. Amount aggregates into DECIMAL (order-independent
    * addition) and is cast to DOUBLE only at the reader's edge. */
  def blockTransferRollup(nep245: DataFrame): DataFrame = nep245
    .withColumn("epoch_day", expr(s"block_timestamp_ns DIV ${NanosPerDay}L"))
    .groupBy(col("block_height"), col("epoch_day"), col("token_id"))
    .agg(
      sum(col("amount").cast(org.apache.spark.sql.types.DecimalType(28, 6)))
        .as("amount_sum_dec"),
      count(lit(1)).as("n_transfers"))

  /** S4 — defuse_assets loader: the reference refreshes this dimension
    * daily from an HTTP JSON feed `{items: [...]}` (README.md:293-310).
    * Here: parse a pre-fetched JSON document (zero-egress container) —
    * the explode(items) → project pipeline is the same. */
  def loadAssetsFromJson(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val itemSchema = StructType(Seq(
      StructField("blockchain", StringType),
      StructField("contract_address", StringType),
      StructField("decimals", LongType),
      StructField("defuse_asset_id", StringType),
      StructField("price", DoubleType),
      StructField("price_updated_at_ns", LongType),
      StructField("symbol", StringType)))
    raw.select(explode(from_json(col("payload"),
      StructType(Seq(StructField("items", ArrayType(itemSchema)))))
      .getField("items")).as("item"))
      .select(col("item.*"))
  }
}
