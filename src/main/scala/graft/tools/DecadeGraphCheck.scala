package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade-up evidence for the pair-graph consumer family
  * (round 16): the six queries whose DuckDB oracles are
  * quadratic-or-worse at sf0.1 (`d_dup_groups` `d_cc_stars`
  * `d_stream_dup_groups` `d_cluster_rep` `d_walk_counts`
  * `d_ngram_pairs`) all derive from a verified near-dup pair relation
  * — so the sf0.1 cross-check runs Spark-side, the [[ScaleRecall]]
  * methodology extended to the whole family:
  *
  *  1. EXACT pairs by grid-partitioned self-join (every doc pair
  *     meets exactly once; no LSH, no banding) for BOTH shingle
  *     specs: `token_shingle_hashes(text, 3)` (the verified-pairs MV)
  *     and `char_gram_hashes(text, 16)` (`d_ngram_pairs`).
  *  2. EXACT graph consumers computed in the DRIVER from the
  *     collected exact pair set (bounded: the near-dup fraction, 256
  *     pairs at sf0.1): union-find components with min-label ids,
  *     1/2/3-step walk counts by adjacency iteration, keeper
  *     selection by (n_chars desc, doc_id asc) with group sizes.
  *  3. The DECLARED queries run as-is at sf0.1; outputs (all bounded
  *     by the grouped-doc count) collect and compare as row sets.
  *
  * Prints one JSON line per check; exits non-zero on any mismatch. */
object DecadeGraphCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = 0.8
    val gridP = 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.tune(spark)
    var failures = 0

    def exactPairs(shingleExpr: String): Set[(Long, Long)] = {
      val sets = graft.Tables.documents(spark, dir)
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), expr(shingleExpr).as("gs"))
        .filter(size(col("gs")) > 0)
        .persist()
      val e = sets.withColumn("g", pmod(col("doc_id"), lit(gridP)).cast("int"))
      val a = e.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
        col("g").as("cell_a"),
        explode(expr(s"sequence(0, ${gridP - 1})")).as("cell_b"))
      val b = e.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
        col("g").as("cell_b"),
        explode(expr(s"sequence(0, ${gridP - 1})")).as("cell_a"))
      val out = a.join(b, Seq("cell_a", "cell_b"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("inter",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("double"))
        .withColumn("j", col("inter") /
          (size(col("gs_a")) + size(col("gs_b")) - col("inter")))
        .filter(col("j") >= threshold)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      sets.unpersist()
      out
    }

    def check(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failures += 1
      println(s"""{"check":"$name","sf":"$dir","ok":$ok,$detail}""")
    }

    // ---- exact reference structures from the token-shingle pair set
    val pTok = exactPairs("token_shingle_hashes(text, 3)")
    val verts = pTok.flatMap(p => Seq(p._1, p._2))
    // union-find → min-label components
    val parent = scala.collection.mutable.Map(verts.map(v => v -> v).toSeq: _*)
    def find(v: Long): Long = {
      var r = v; while (parent(r) != r) r = parent(r)
      var c = v
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pTok.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groupOf = verts.map(v => v -> find(v)).toMap
    // adjacency + walk counts c1/c2/c3 (c1 = degree; c_{k+1} = A·c_k)
    val adj = verts.map(v => v -> pTok.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    val c1 = verts.map(v => v -> adj(v).size.toLong).toMap
    def stepW(c: Map[Long, Long]): Map[Long, Long] =
      verts.map(v => v -> adj(v).toSeq.map(c).sum).toMap
    val c2 = stepW(c1)
    val c3 = stepW(c2)
    // keeper per group by (n_chars desc, doc_id asc) + group sizes
    val nChars = graft.Tables.documents(spark, dir)
      .filter(col("doc_id").isin(verts.toSeq: _*))
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byGroup = verts.groupBy(groupOf)
    val repOf = byGroup.map { case (g, vs) =>
      g -> vs.toSeq.sortBy(v => (-nChars(v), v)).head
    }

    // ---- declared queries at sf0.1, compared as row sets
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    check("d_ngram_pairs_vs_exact_grid", {
      val got = graft.llm.Dedup.dNgramPairs(spark, dir)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = exactPairs("char_gram_hashes(text, 16)")
      got == want
    }, s""""pairs":${pTok.size}""")

    val wantGroups: Set[Seq[Any]] =
      verts.map(v => Seq[Any](v, groupOf(v))).toSet
    check("d_dup_groups_vs_unionfind",
      rows(graft.llm.Dedup.dDupGroups(spark, dir)) == wantGroups,
      s""""docs":${verts.size},"groups":${byGroup.size}""")
    check("d_cc_stars_vs_unionfind",
      rows(graft.llm.Dedup.dCcStars(spark, dir)) == wantGroups,
      s""""docs":${verts.size}""")
    check("d_stream_dup_groups_vs_unionfind",
      rows(graft.SparkEntry.queries("d_stream_dup_groups")(spark, dir))
        == wantGroups,
      s""""docs":${verts.size}""")
    check("d_walk_counts_vs_adjacency", {
      val want: Set[Seq[Any]] =
        verts.map(v => Seq[Any](v, c1(v), c2(v), c3(v))).toSet
      rows(graft.llm.Dedup.dWalkCounts(spark, dir)) == want
    }, s""""docs":${verts.size}""")
    check("d_cluster_rep_vs_driver_keeper", {
      val want: Set[Seq[Any]] = verts.map { v =>
        val g = groupOf(v)
        Seq[Any](v, g, repOf(g), byGroup(g).size.toLong)
      }.toSet
      rows(graft.llm.Dedup.dClusterRep(spark, dir)) == want
    }, s""""groups":${byGroup.size}""")

    println(s"""{"summary":"decade_graph_check","sf":"$dir","failures":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
