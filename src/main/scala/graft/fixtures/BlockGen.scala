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

  /** DEEP-CHAIN corpus for at-volume resolver/cascade correctness
    * (VERDICT r10 #4): every origin k starts a transaction whose
    * receipt chain hops `3 + (k % 3)` times (depth up to 5 — deeper
    * than any golden fixture), with a PER-CHAIN cross-block hop gap of
    * `{1, 5, 50, 51}[k % 4]` blocks — 50 sits EXACTLY on the resolver
    * TTL (`hop − entry <= 50` holds, reference config.rs:27-29 /
    * receipts_and_outcomes.rs:42-120), 51 is one past it, so every
    * fourth chain must die at its first hop and its events must
    * surface unresolved. Everything is CLOSED-FORM in (k, h0):
    * receipt d of origin k is `r{h0}x{d}`, its entry height
    * `h0 + d·gap`, the chain's one nep245 event rides the final hop —
    * so a DuckDB oracle can regenerate the ground truth from
    * `range()` with no recursion and the Spark side still has to run
    * the real multi-hop resolution to match it.
    *
    * With the defaults (400 origins, spacing 10) the corpus spans
    * ~4,250 blocks, chains interleave (a block can carry hops of many
    * origins), and ~1,400 receipts resolve across gaps of 1/5/50.
    */
  def genDeepBlocks(nOrigins: Int = 400, spacing: Int = 10,
      baseHeight: Long = 1000L): Seq[Block] = {
    val t0 = NearFixtures.T0
    val gaps = Array(1L, 5L, 50L, 51L)
    val txsAt = scala.collection.mutable.Map
      .empty[Long, Vector[TxWithOutcome]].withDefaultValue(Vector.empty)
    val outsAt = scala.collection.mutable.Map
      .empty[Long, Vector[OutcomeWithReceipt]].withDefaultValue(Vector.empty)
    var maxH = baseHeight
    for (k <- 0 until nOrigins) {
      val h0 = baseHeight + k.toLong * spacing
      val g = gaps(k % 4)
      val dMax = 3 + (k % 3)
      def rid(d: Int) = s"r${h0}x$d"
      txsAt(h0) = txsAt(h0) :+ TxWithOutcome(
        TransactionView(s"tx$h0", "alice.near", "intents.near",
          Seq(ActionView("FunctionCall", """{"method_name":"execute"}"""))),
        s"oc$h0",
        OutcomeView("alice.near", Seq(rid(0)), "SuccessReceiptId", Nil,
          "0", 1L))
      for (d <- 1 to dMax) {
        val hd = h0 + d * g
        maxH = math.max(maxH, hd)
        val logs =
          if (d < dMax) Nil
          else Seq(NearModel.EventJsonPrefix +
            s"""{"standard":"nep245","version":"1.0.0","event":"mt_transfer","data":""" +
            s"""[{"memo":"m$h0","old_owner_id":"a$h0.near","new_owner_id":"b$h0.near","token_ids":["nep141:usdc.near"],"amounts":["$k"]}]}""")
        outsAt(hd) = outsAt(hd) :+ OutcomeWithReceipt(
          ReceiptView(rid(d - 1), "intents.near",
            if (d == 1) "alice.near" else "intents.near", "Action", Nil, None),
          s"o${h0}x$d",
          OutcomeView("intents.near", Seq(rid(d)), "SuccessValue", logs,
            "0", 2L))
      }
    }
    (baseHeight to maxH).map { h =>
      val chunk =
        if (txsAt(h).isEmpty) None else Some(Chunk(txsAt(h)))
      // deterministic within-block order: chains sort by origin height
      // embedded in the receipt id (same length-then-lex trick the
      // oracle replays is unnecessary — queries never expose positional
      // columns from this corpus)
      Block(BlockHeader(h, t0 + (h - baseHeight) * 1000000000L, s"G$h"),
        Seq(Shard(chunk, outsAt(h).sortBy(_.receipt.receipt_id))))
    }
  }

  /** HOT-KEY corpus for the gold receipt join (VERDICT r11 #4 / r12 #3):
    * SURVEY §7.2 flags the join as naturally skewed toward
    * `intents.near`, but every other corpus is uniform, so hot-key
    * behavior was asserted, never evidenced. Here ONE receipt carries
    * `hotLogs · hotPerLog` nep245 events (default 1600 — 80% of the
    * corpus) AND the corpus's only dip4 token_diff rows (3 referrals),
    * so the gold `related_receipt_id` left join fans the hot key out
    * 3× while `nCold` single-event receipts populate the tail.
    *
    * Everything is CLOSED-FORM so the DuckDB oracle regenerates the
    * gold result from `range()` while Spark runs the REAL pipeline
    * (extraction → resolution → silver → gold):
    *  - cold origin k: tx at `baseHeight + 2k`, its receipt's outcome
    *    one block later with one mt_transfer of amount
    *    `15625·(10000+k)`, memo `m{k}`, owners `a{k}`/`b{k}`;
    *  - hot receipt `hr0` (tx at `baseHeight + 2·nCold`): event j
    *    (log j/hotPerLog, item j%hotPerLog) moves `15625·(j+1)` with
    *    memo `hm{j}`, plus one token_diff log with referrals
    *    alpha/beta/gamma.
    *
    * AMOUNTS ARE DYADIC BY DESIGN: usd = amount/10⁶·price with
    * amount = 15625·n makes every usd value n/64 — exactly
    * representable, and all group sums stay < 2⁵³/64 — so the gold
    * SUM(double) is EXACT and therefore aggregation-order-independent
    * across partitionings AND engines (a float-noise corpus would make
    * the hot group's 4800-addend sum order-sensitive and the hash
    * compare meaningless). */
  def genSkewBlocks(nCold: Int = 400, hotLogs: Int = 40,
      hotPerLog: Int = 40, baseHeight: Long = 2000L): Seq[Block] = {
    val t0 = NearFixtures.T0
    def ej(standard: String, event: String, data: String): String =
      NearModel.EventJsonPrefix +
        s"""{"standard":"$standard","version":"1.0.0","event":"$event","data":$data}"""
    def item(memo: String, oo: String, no: String, amount: Long): String =
      s"""{"memo":"$memo","old_owner_id":"$oo.near","new_owner_id":"$no.near","token_ids":["nep141:usdc.near"],"amounts":["$amount"]}"""
    def tx(hash: String, rid: String) = TxWithOutcome(
      TransactionView(hash, "alice.near", "intents.near",
        Seq(ActionView("FunctionCall", """{"method_name":"execute"}"""))),
      s"oc_$hash",
      OutcomeView("alice.near", Seq(rid), "SuccessReceiptId", Nil, "0", 1L))
    def receiptOutcome(rid: String, logs: Seq[String]) = OutcomeWithReceipt(
      ReceiptView(rid, "intents.near", "alice.near", "Action", Nil, None),
      s"o_$rid",
      OutcomeView("intents.near", Nil, "SuccessValue", logs, "0", 2L))
    val txsAt = scala.collection.mutable.Map
      .empty[Long, Vector[TxWithOutcome]].withDefaultValue(Vector.empty)
    val outsAt = scala.collection.mutable.Map
      .empty[Long, Vector[OutcomeWithReceipt]].withDefaultValue(Vector.empty)
    for (k <- 0 until nCold) {
      val h0 = baseHeight + 2L * k
      txsAt(h0) = txsAt(h0) :+ tx(s"ctx$k", s"cr$k")
      outsAt(h0 + 1) = outsAt(h0 + 1) :+ receiptOutcome(s"cr$k",
        Seq(ej("nep245", "mt_transfer",
          s"[${item(s"m$k", s"a$k", s"b$k", 15625L * (10000L + k))}]")))
    }
    val hH = baseHeight + 2L * nCold
    txsAt(hH) = txsAt(hH) :+ tx("htx", "hr0")
    val hotNep = (0 until hotLogs).map { li =>
      ej("nep245", "mt_transfer",
        (0 until hotPerLog).map { di =>
          val j = li * hotPerLog + di
          item(s"hm$j", "ha", "hb", 15625L * (j + 1L))
        }.mkString("[", ",", "]"))
    }
    val hotDiff = ej("dip4", "token_diff",
      Seq("alpha", "beta", "gamma").zipWithIndex.map { case (r, i) =>
        s"""{"account_id":"ha.near","diff":{"nep141:usdc.near":${i + 1}},"intent_hash":"ih$i","referral":"$r"}"""
      }.mkString("[", ",", "]"))
    outsAt(hH + 1) = outsAt(hH + 1) :+
      receiptOutcome("hr0", hotNep :+ hotDiff)
    (baseHeight to (hH + 1)).map { h =>
      val chunk = if (txsAt(h).isEmpty) None else Some(Chunk(txsAt(h)))
      Block(BlockHeader(h, t0 + (h - baseHeight) * 1000000000L, s"G$h"),
        Seq(Shard(chunk, outsAt(h))))
    }
  }
}
