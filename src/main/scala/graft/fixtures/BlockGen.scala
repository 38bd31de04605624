package graft.fixtures

import graft.model._

/** Synthetic block generator for throughput measurement: every block
  * carries one accounts-of-interest transaction, two receipt-execution
  * outcomes (one continuing the previous block's receipt chain with an
  * nep245 EVENT_JSON log, one silent), so the full pipeline — extraction,
  * receipt→tx resolution across blocks, event emission, silver decode —
  * is exercised per block. Shapes mirror [[NearFixtures]]. */
object BlockGen {

  def genBlocks(n: Int, baseHeight: Long = 1000L): Seq[Block] = {
    val t0 = NearFixtures.T0
    (0 until n).map { i =>
      val h = baseHeight + i
      val ts = t0 + i * 1000000000L
      val payload =
        s"""{"standard":"nep245","version":"1.0.0","event":"mt_transfer","data":[{"memo":"m$h","old_owner_id":"a$h.near","new_owner_id":"b$h.near","token_ids":["nep141:usdc.near"],"amounts":["$i"]}]}"""
      val chunk = Chunk(Seq(TxWithOutcome(
        TransactionView(s"tx$h", "alice.near", "intents.near", Seq(
          ActionView("FunctionCall", s"""{"method_name":"execute"}"""))),
        s"oc$h",
        OutcomeView("alice.near", Seq(s"r${h}a"), "SuccessReceiptId", Nil,
          "0", 1L))))
      val outcomes =
        if (i == 0) Nil
        else Seq(
          OutcomeWithReceipt(
            ReceiptView(s"r${h - 1}a", "intents.near", "alice.near",
              "Action", Nil, None),
            s"o${h}a",
            OutcomeView("intents.near", Seq(s"r${h}b"), "SuccessValue",
              Seq(NearModel.EventJsonPrefix + payload), "0", 2L)),
          OutcomeWithReceipt(
            ReceiptView(s"r${h - 1}b", "intents.near", "alice.near",
              "Action", Nil, None),
            s"o${h}b",
            OutcomeView("intents.near", Nil, "SuccessValue", Nil, "0", 1L)))
      Block(BlockHeader(h, ts, s"G$h"), Seq(Shard(Some(chunk), outcomes)))
    }
  }
}
