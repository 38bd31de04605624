package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the corpus schema-drift contract that broke round 7: the driver
  * regenerated events.parquet with `ts` as timestamp[us] where earlier
  * corpora carried TIMESTAMP(NANOS), and every event query died at
  * analysis ("ts DIV <const>" on a TIMESTAMP_NTZ). [[Tables.events]]
  * now guarantees `ts` is Long epoch-nanos REGARDLESS of the physical
  * parquet type; these tests fail loudly if either representation stops
  * normalizing, instead of 13 queries failing downstream.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("events.ts is exposed as Long nanos whatever the parquet type") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType === LongType)
    // nanos of a µs-precision corpus are exact multiples of 1000; a
    // NANOS corpus keeps the contract trivially (raw long passthrough)
    val bad = e.filter(col("ts") % 1000L =!= 0L &&
      lit(rawTsIsTimestamp)).count()
    assert(bad === 0L)
  }

  test("normalized nanos agree with the raw column's instants") {
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("ts").as("raw_ts"))
    val rawNanos = raw.schema("raw_ts").dataType match {
      case LongType => raw.withColumn("expected_ns", col("raw_ts"))
      case _ => raw.withColumn("expected_ns",
        unix_micros(col("raw_ts").cast(TimestampType)) * lit(1000L))
    }
    val joined = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"))
      .join(rawNanos, "event_id")
    assert(joined.filter(col("ts") =!= col("expected_ns")).count() === 0L)
    // instants are in a sane epoch range (year ~1995..2035), i.e. the
    // µs→ns scaling did not double-apply or under-apply
    val Array(mn, mx) = joined.agg(min(col("ts")), max(col("ts")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(mn > 700000000000000000L && mx < 2100000000000000000L)
  }

  private def rawTsIsTimestamp: Boolean =
    spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType != LongType

  test("TPC-H date columns are timestamps (drift canary)") {
    // the orders/lineitem analog of the events.ts drift: if a future
    // corpus drop ships o_orderdate / l_shipdate as TIMESTAMP(NANOS),
    // the nanosAsLong flag would surface them as Long and all 22
    // TPC-H shapes would fail analysis at once. Fail HERE, by name,
    // instead — the fix belongs in the loaders (the events() pattern),
    // not scattered across queries.
    Seq(
      ("orders", "o_orderdate"),
      ("lineitem", "l_shipdate")).foreach { case (t, c) =>
      val dt = Tables.table(spark, dir, t).schema(c).dataType
      assert(dt.isInstanceOf[TimestampType] ||
          dt.isInstanceOf[TimestampNTZType],
        s"$t.$c drifted to $dt — normalize it in Tables.$t() like " +
          "Tables.events() normalizes ts")
    }
  }
}
