package graft.fixtures

import graft.model._

/** Synthetic block generator for throughput measurement: every block
  * carries one accounts-of-interest transaction, two receipt-execution
  * outcomes (one continuing the previous block's receipt chain with an
  * nep245 EVENT_JSON log, one silent), so the full pipeline — extraction,
  * receipt→tx resolution across blocks, event emission, silver decode —
  * is exercised per block. Shapes mirror [[NearFixtures]]. */
object BlockGen {

  /** `rich = false` (default, the historical ingest-bench chain): each
    * block's event log is one nep245 mt_transfer — keep it that way so
    * `ingest_blocks_per_sec` stays comparable across rounds.
    *
    * `rich = true` (the full-cascade bench): every event-bearing block
    * also emits a dip4 token_diff, every 5th block the rest of the
    * prod dip4 surface (transfer, public_key_added, fee_changed,
    * intents_executed), and every 7th block routes its second outcome
    * through the STAGING contract with a staging transfer — so all
    * seven silver MV tables receive rows and the cascade bench
    * exercises every MV, not just M1. */
  def genBlocks(n: Int, baseHeight: Long = 1000L,
      rich: Boolean = false): Seq[Block] = {
    val t0 = NearFixtures.T0
    (0 until n).map { i =>
      val h = baseHeight + i
      val ts = t0 + i * 1000000000L
      def ej(standard: String, event: String, data: String): String =
        NearModel.EventJsonPrefix +
          s"""{"standard":"$standard","version":"1.0.0","event":"$event","data":$data}"""
      val nep245Log = ej("nep245", "mt_transfer",
        s"""[{"memo":"m$h","old_owner_id":"a$h.near","new_owner_id":"b$h.near","token_ids":["nep141:usdc.near"],"amounts":["$i"]}]""")
      val richLogs =
        if (!rich) Nil
        else {
          val tokenDiff = ej("dip4", "token_diff",
            s"""[{"account_id":"a$h.near","diff":{"nep141:usdc.near":${i + 1}},"intent_hash":"ih$h","referral":"partner.near"}]""")
          val fifth =
            if (i % 5 != 1) Nil
            else Seq(
              ej("dip4", "transfer",
                s"""[{"memo":"tip","account_id":"a$h.near","receiver_id":"b$h.near","intent_hash":"ih$h","tokens":{"nep141:usdc.near":"$i"}}]"""),
              ej("dip4", "public_key_added",
                s"""{"account_id":"a$h.near","public_key":"ed25519:K$h"}"""),
              ej("dip4", "fee_changed",
                s"""{"old_fee":"$i","new_fee":"${i + 1}"}"""),
              ej("dip4", "intents_executed",
                s"""[{"account_id":"a$h.near","intent_hash":"ih$h"}]"""))
          tokenDiff +: fifth
        }
      val chunk = Chunk(Seq(TxWithOutcome(
        TransactionView(s"tx$h", "alice.near", "intents.near", Seq(
          ActionView("FunctionCall", s"""{"method_name":"execute"}"""))),
        s"oc$h",
        OutcomeView("alice.near", Seq(s"r${h}a"), "SuccessReceiptId", Nil,
          "0", 1L))))
      // every 7th rich block executes its second outcome on the staging
      // contract and emits a staging dip4 transfer (M7's source)
      val staging = rich && i % 7 == 2
      val secondExec = if (staging) "staging-intents.near" else "intents.near"
      val secondLogs =
        if (staging)
          Seq(ej("dip4", "transfer",
            s"""[{"memo":"st","account_id":"a$h.near","receiver_id":"b$h.near","intent_hash":"sih$h","tokens":{"nep141:usdc.near":"$i"}}]"""))
        else Nil
      val outcomes =
        if (i == 0) Nil
        else Seq(
          OutcomeWithReceipt(
            ReceiptView(s"r${h - 1}a", "intents.near", "alice.near",
              "Action", Nil, None),
            s"o${h}a",
            OutcomeView("intents.near", Seq(s"r${h}b"), "SuccessValue",
              nep245Log +: richLogs, "0", 2L)),
          OutcomeWithReceipt(
            ReceiptView(s"r${h - 1}b", secondExec, "alice.near",
              "Action", Nil, None),
            s"o${h}b",
            OutcomeView(secondExec, Nil, "SuccessValue", secondLogs,
              "0", 1L)))
      Block(BlockHeader(h, ts, s"G$h"), Seq(Shard(Some(chunk), outcomes)))
    }
  }
}
