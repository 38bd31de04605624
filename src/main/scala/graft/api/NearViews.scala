package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gold.GoldViews
import graft.model.AccountsConfig
import graft.silver.SilverTransforms

/** SQL surface: registers the reference's table/view NAMES
  * (clickhouse/init/01-core-tables.sql, 02-silver-tables.sql:410-541,
  * 03-gold-views.sql:4) as temp views, so a user of the reference can
  * point their existing `SELECT ... FROM silver_transfers` /
  * `gold_view_intents_metrics` queries at `spark.sql` unchanged.
  *
  * Views are lazy logical plans over the provided bronze relations —
  * Catalyst prunes/pushes through them like any DataFrame, so the SQL
  * surface costs nothing over the programmatic one. */
object NearViews {

  /** Register every silver/gold view over a bronze `events` relation
    * (plus the `defuse_assets` dimension). */
  def register(spark: SparkSession, events: DataFrame, assets: DataFrame,
      accounts: AccountsConfig = AccountsConfig()): Unit = {
    events.createOrReplaceTempView("events")
    assets.createOrReplaceTempView("defuse_assets")

    val nep = SilverTransforms.nep245Events(events)
    val tokenDiff = SilverTransforms.dip4TokenDiff(events, accounts)
    val transfer = SilverTransforms.dip4Transfer(events, accounts)
    val stagingTransfer = SilverTransforms.stagingDip4Transfer(events, accounts)

    nep.createOrReplaceTempView("silver_nep_245_events")
    tokenDiff.createOrReplaceTempView("silver_dip4_token_diff")
    SilverTransforms.dip4PublicKeys(events, accounts)
      .createOrReplaceTempView("silver_dip4_public_keys")
    SilverTransforms.dip4IntentsExecuted(events, accounts)
      .createOrReplaceTempView("silver_dip4_intents_executed")
    SilverTransforms.dip4FeeChanged(events, accounts)
      .createOrReplaceTempView("silver_dip4_fee_changed")
    transfer.createOrReplaceTempView("silver_dip4_transfer")
    stagingTransfer.createOrReplaceTempView("staging_silver_dip4_transfer")
    SilverTransforms.silverTransfers(nep, transfer, accounts)
      .createOrReplaceTempView("silver_transfers")
    SilverTransforms.stagingSilverTransfers(nep, stagingTransfer, accounts)
      .createOrReplaceTempView("staging_silver_transfers")
    GoldViews.intentsMetrics(nep, tokenDiff, assets)
      .createOrReplaceTempView("gold_view_intents_metrics")
  }
}
