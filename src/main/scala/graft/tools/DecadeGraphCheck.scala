package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade-up evidence for the pair-graph consumer family
  * (round 16): the six queries whose DuckDB oracles are
  * quadratic-or-worse above the sf0.01 gate (`d_dup_groups`
  * `d_cc_stars` `d_stream_dup_groups` `d_cluster_rep` `d_walk_counts`
  * `d_ngram_pairs`) all derive from a verified near-dup pair relation
  * — so the scale cross-check runs Spark-side, the [[ScaleRecall]]
  * methodology extended to the whole family:
  *
  *  1. EXACT pairs by grid-partitioned self-join (every doc pair
  *     meets exactly once; no LSH, no banding) for BOTH shingle
  *     specs: `token_shingle_hashes(text, 3)` (the verified-pairs MV)
  *     and `char_gram_hashes(text, 16)` (`d_ngram_pairs`).
  *  2. EXACT graph consumers computed in the DRIVER from the
  *     collected exact pair set (bounded: the near-dup fraction of
  *     doc pairs): union-find components with min-label ids,
  *     1/2/3-step walk counts by adjacency iteration, keeper
  *     selection by (n_chars desc, doc_id asc) with group sizes.
  *  3. The DECLARED queries run as-is at the target SF; outputs (all
  *     bounded by the grouped-doc count) collect and compare as row
  *     sets.
  *
  * Prints one JSON line per check; exits non-zero on any mismatch.
  *
  * Round 17 (VERDICT r16 #2): also writes a machine-readable verdict
  * file keyed by QUERY name so the board wrapper
  * (`tools/merge_board.py`) can fold these exact-Spark-reference
  * verdicts into the CORRECTNESS artifact itself.
  *
  * Usage: `DecadeGraphCheck [verdictOut.json|-] [query ...]`
  * (no query args = all six; SF via SPARK_GRAFT_SF_DIR).
  */
object DecadeGraphCheck {
  val coveredQueries: Set[String] = Set(
    "d_ngram_pairs", "d_dup_groups", "d_cc_stars",
    "d_stream_dup_groups", "d_walk_counts", "d_cluster_rep")

  def main(args: Array[String]): Unit = {
    val verdictOut = args.headOption.filter(_ != "-")
    val wanted: Set[String] =
      if (args.drop(1).isEmpty) coveredQueries
      else args.drop(1).toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = 0.8
    val gridP = sys.env.getOrElse("SPARK_GRAFT_GRID_P", "16").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.tune(spark)
    var failures = 0
    val verdicts = scala.collection.mutable.LinkedHashMap
      .empty[String, (Boolean, String)]

    /** EXACT pairs by grid-partitioned all-pairs self-join — every doc
      * pair meets exactly once. O(n²/gridP) per partition: the right
      * reference at sf0.1 (5k docs), intractable at sf1 (50k). */
    def exactPairsGrid(shingleExpr: String): Set[(Long, Long)] = {
      val sets = graft.Tables.documents(spark, dir)
        .repartition(cpus.toInt, col("doc_id"))
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

    /** EXACT pairs by inverted-index join (round 17, for the sf1
      * board): explode distinct shingles → self-join on the shingle
      * hash → per-pair common-shingle count → the SAME Jaccard formula
      * as the grid join (|distinct A ∩ distinct B| over raw sizes —
      * `array_intersect` dedups, `size(gs)` does not, and the formula
      * must match bit-for-bit). Provably equivalent for any threshold
      * > 0: a pair with J ≥ 0.8 shares at least one shingle, so it
      * appears in the join; a pair sharing none has J = 0. Cost is
      * Σ postings² per shingle — linear-ish on real corpora instead of
      * n². The `exact_inverted_vs_grid` check below pins the
      * equivalence empirically where both are tractable. */
    def exactPairsInverted(shingleExpr: String): Set[(Long, Long)] = {
      val sets = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), expr(shingleExpr).as("gs"))
        .filter(size(col("gs")) > 0)
        .select(col("doc_id"), size(col("gs")).as("sz"),
          explode(array_distinct(col("gs"))).as("h"))
        .repartition(cpus.toInt, col("h"))
        .persist()
      val out = sets.as("a")
        .join(sets.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
        .agg(count(lit(1)).cast("double").as("inter"))
        .withColumn("j", col("inter") /
          (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("j") >= threshold)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      sets.unpersist()
      out
    }

    val exactMode = sys.env.getOrElse("SPARK_GRAFT_EXACT_MODE", "grid")
    def exactPairs(shingleExpr: String): Set[(Long, Long)] =
      if (exactMode == "inverted") exactPairsInverted(shingleExpr)
      else exactPairsGrid(shingleExpr)

    def check(query: String, name: String)(body: => (Boolean, String)): Unit =
      if (wanted(query)) {
        val (ok, detail) =
          try body
          catch { case e: Throwable =>
            (false, s""""error":"${e.toString.take(200).replace("\"", "'")}"""")
          }
        if (!ok) failures += 1
        verdicts(query) = (ok, name)
        println(s"""{"check":"$name","sf":"$dir","ok":$ok,$detail}""")
      }

    // ---- exact reference structures from the token-shingle pair set
    // (lazy: only built when a selected check needs them — at big SFs
    // the exact grid join is the dominant cost and the wrapper may ask
    // for the char-gram family only)
    lazy val pTok = exactPairs("token_shingle_hashes(text, 3)")
    lazy val verts = pTok.flatMap(p => Seq(p._1, p._2))
    // union-find → min-label components
    lazy val groupOf: Map[Long, Long] = {
      val parent =
        scala.collection.mutable.Map(verts.map(v => v -> v).toSeq: _*)
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
      verts.map(v => v -> find(v)).toMap
    }
    // adjacency + walk counts c1/c2/c3 (c1 = degree; c_{k+1} = A·c_k)
    lazy val adj: Map[Long, Seq[Long]] = {
      val m = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Buffer[Long]]
      pTok.foreach { case (a, b) =>
        m.getOrElseUpdate(a, scala.collection.mutable.Buffer.empty) += b
        m.getOrElseUpdate(b, scala.collection.mutable.Buffer.empty) += a
      }
      m.view.mapValues(_.toSeq).toMap
    }
    lazy val c1 = verts.map(v => v -> adj(v).size.toLong).toMap
    def stepW(c: Map[Long, Long]): Map[Long, Long] =
      verts.map(v => v -> adj(v).map(c).sum).toMap
    lazy val c2 = stepW(c1)
    lazy val c3 = stepW(c2)
    // keeper per group by (n_chars desc, doc_id asc) + group sizes.
    // Join against a vert DataFrame, not isin(...): at sf1 the vert
    // set is ~50k ids and an isin literal of that size is its own
    // scale bug.
    lazy val nChars = {
      import spark.implicits._
      val vdf = verts.toSeq.toDF("doc_id")
      graft.Tables.documents(spark, dir)
        .join(broadcast(vdf), "doc_id")
        .select(col("doc_id"), col("n_chars"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    lazy val byGroup = verts.groupBy(groupOf)
    lazy val repOf = byGroup.map { case (g, vs) =>
      g -> vs.toSeq.sortBy(v => (-nChars(v), v)).head
    }

    // ---- the two exact strategies must agree where both are
    // tractable (run with SPARK_GRAFT_EXACT_XCHECK=1 at sf0.1; the
    // sf1 board then trusts the inverted mode on this evidence)
    if (sys.env.get("SPARK_GRAFT_EXACT_XCHECK").contains("1")) {
      Seq("token_shingle_hashes(text, 3)" -> "token3",
          "char_gram_hashes(text, 16)" -> "char16").foreach {
        case (spec, tag) =>
          val g = exactPairsGrid(spec)
          val i = exactPairsInverted(spec)
          val ok = g == i
          if (!ok) failures += 1
          println(s"""{"check":"exact_inverted_vs_grid_$tag",""" +
            s""""sf":"$dir","ok":$ok,"grid_pairs":${g.size},""" +
            s""""inverted_pairs":${i.size}}""")
      }
    }

    // ---- declared queries at the target SF, compared as row sets
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    check("d_ngram_pairs", "d_ngram_pairs_vs_exact_grid") {
      val got = graft.llm.Dedup.dNgramPairs(spark, dir)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the CHAR-gram exact set — this check's own relation (ADVICE
      // r16: the old detail printed the token-shingle count)
      val want = exactPairs("char_gram_hashes(text, 16)")
      (got == want, s""""pairs_exact":${want.size},"pairs_got":${got.size}""")
    }

    lazy val wantGroups: Set[Seq[Any]] =
      verts.map(v => Seq[Any](v, groupOf(v))).toSet
    check("d_dup_groups", "d_dup_groups_vs_unionfind") {
      (rows(graft.llm.Dedup.dDupGroups(spark, dir)) == wantGroups,
        s""""docs":${verts.size},"groups":${byGroup.size}""")
    }
    check("d_cc_stars", "d_cc_stars_vs_unionfind") {
      (rows(graft.llm.Dedup.dCcStars(spark, dir)) == wantGroups,
        s""""docs":${verts.size}""")
    }
    check("d_stream_dup_groups", "d_stream_dup_groups_vs_unionfind") {
      (rows(graft.SparkEntry.queries("d_stream_dup_groups")(spark, dir))
        == wantGroups,
        s""""docs":${verts.size}""")
    }
    check("d_walk_counts", "d_walk_counts_vs_adjacency") {
      val want: Set[Seq[Any]] =
        verts.map(v => Seq[Any](v, c1(v), c2(v), c3(v))).toSet
      (rows(graft.llm.Dedup.dWalkCounts(spark, dir)) == want,
        s""""docs":${verts.size}""")
    }
    check("d_cluster_rep", "d_cluster_rep_vs_driver_keeper") {
      val want: Set[Seq[Any]] = verts.map { v =>
        val g = groupOf(v)
        Seq[Any](v, g, repOf(g), byGroup(g).size.toLong)
      }.toSet
      (rows(graft.llm.Dedup.dClusterRep(spark, dir)) == want,
        s""""groups":${byGroup.size}""")
    }

    println(s"""{"summary":"decade_graph_check","sf":"$dir","failures":$failures}""")
    verdictOut.foreach { p =>
      val body = verdicts.map { case (q, (ok, name)) =>
        s""""$q": {"ok": $ok, "check": "$name", "sf": "$dir"}"""
      }.mkString("{", ", ", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), body): Unit
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
