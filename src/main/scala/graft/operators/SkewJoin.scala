package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi join by key salting (SURVEY §7.2: the receipt
  * join is naturally skewed toward intents.near).
  *
  * The large side derives a DETERMINISTIC salt by hashing a unique
  * column (never `rand()` — reruns must produce identical partitioning
  * and results); the small side is replicated `saltFactor` times, and
  * the join key becomes (keys…, salt), splitting each hot key's rows
  * across `saltFactor` shuffle partitions.
  *
  * When to use: AQE's skew-join handles sort-merge skew at runtime; an
  * explicit salt is for the cases AQE cannot rewrite — aggregation-style
  * hot keys feeding a join, deterministic plan requirements, or
  * broadcast-ineligible build sides. Cost: small side ×saltFactor.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      largeUniqueCol: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full-outer would multiply unmatched small-side rows by
    // saltFactor (one survivor per replica) — only join types where the
    // replicated side never surfaces unmatched are allowed
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types only, got $joinType")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(largeUniqueCol)), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(expr(s"sequence(0L, ${saltFactor - 1}L)")))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
