package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (round 16): identify WHICH exact-top-k pair the
  * IVFADC index misses at the 200k sweep's sweet spot, and attribute
  * it — is the neighbor's cell unreached by the query's probe set
  * (the Voronoi tail multi-assignment targets), or probe-reachable
  * but lost in ADC ranking (an nCand story, not an assignment one)? */
object TailDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10p")
    val k = sys.env.getOrElse("SPARK_GRAFT_ANN_K", "10").toInt
    val nCells = sys.env.getOrElse("SPARK_GRAFT_CELLS", "448").toInt
    val nprobe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "4").toInt
    val nCand = sys.env.getOrElse("SPARK_GRAFT_NCAND", "128").toInt
    val eps = sys.env.getOrElse("SPARK_GRAFT_EPS", "0.05").toDouble
    val nQueries = 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.tune(spark)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(graft.llm.Similarity.sCosineTopk(spark, dir, k, nQueries))
    val got = pairs(graft.llm.Similarity.sAnnIvfPq(spark, dir, k, nQueries,
      nCells = nCells, nprobe = nprobe, nCand = nCand, assignEps = eps))
    val missed = exact -- got
    println(s"missed pairs: $missed")
    if (missed.isEmpty) { spark.stop(); return }

    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = graft.llm.Similarity.kmeansCentroids(e, nCells, 2)
    val ids = missed.flatMap(p => Seq(p._1, p._2)).toSeq
    val embs = e.filter(col("vec_id").isin(ids: _*))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def scores(v: Array[Double]): Seq[(Int, Double)] =
      cents.indices.map(c => c -> dot(v, cents(c)) / nrm(cents(c)))
        .sortBy(t => (-t._2, t._1))
    missed.foreach { case (q, v) =>
      val sv = scores(embs(v))
      val sq = scores(embs(q))
      val margin = (sv(0)._2 - sv(1)._2) / nrm(embs(v))
      val vCells = if (margin < eps) Seq(sv(0)._1, sv(1)._1) else Seq(sv(0)._1)
      val probes = sq.take(nprobe).map(_._1)
      val reachable = vCells.exists(probes.contains)
      println(s"query=$q neighbor=$v cos=${dot(embs(q), embs(v)) /
        (nrm(embs(q)) * nrm(embs(v)))}")
      println(s"  neighbor cells=$vCells (top2 margin=$margin, eps=$eps)")
      println(s"  query probes=$probes -> probe-REACHABLE=$reachable " +
        s"(if true, the miss is ADC RANKING i.e. nCand, not assignment)")
    }
    spark.stop()
  }
}
