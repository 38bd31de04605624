package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, Similarity, TextAnalysis}
import graft.queries.EventQueries

/** Round-12 operators vs independent plain-Scala models over the
  * sf0.001 driver corpus: star-contraction connected components, RFM
  * segmentation, k-NN classification eval, Simpson concentration, and
  * the streaming tombstone twin. */
class Round12Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // ---------------- star-contraction CC ------------------------------

  /** Plain-Scala union-find — the independent component model. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("star contraction matches union-find on random graphs and " +
      "agrees with pointer-doubling min-label propagation") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = (1 to 80).map { _ =>
        (rnd.nextInt(n).toLong * 13L + 5L, rnd.nextInt(n).toLong * 13L + 5L)
      }.filter(e => e._1 != e._2)
      val df = edges.toDF("doc_a", "doc_b")
      val stars = Dedup.starComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = unionFind(edges)
      assert(stars === expected, s"trial $trial")
      val labels = Dedup.minLabelComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars === labels, s"trial $trial vs min-label")
    }
  }

  test("star contraction: worst-case chain, disjoint components, " +
      "empty edge relation") {
    import spark.implicits._
    // the 100-link chain that forces multiple contraction rounds
    val chain = (0 until 100).map(i => (i * 7L + 3L, (i + 1) * 7L + 3L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.starComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 101)
    assert(labels.values.toSet === Set(3L))

    val two = Seq((10L, 20L), (20L, 30L), (100L, 200L)).toDF("doc_a", "doc_b")
    val l2 = Dedup.starComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      100L -> 100L, 200L -> 100L))

    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.starComponents(none).collect().isEmpty)
  }

  // ---------------- RFM segmentation ---------------------------------

  test("RFM segment census matches a local quartile model") {
    val evs = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts DIV 1000L").as("ts_us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // per-user aggregates with DECIMAL(28,2)-equivalent money handling
    val byUser = evs.groupBy(_._1).map { case (u, rows) =>
      val lastUs = rows.map(_._2).max
      val monetary = rows.map(r =>
          BigDecimal(r._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum
      (u, lastUs, rows.size.toLong, monetary)
    }.toSeq
    val maxUs = byUser.map(_._2).max
    val users = byUser.map { case (u, lastUs, f, m) =>
      (u, (maxUs - lastUs) / 86400000000L, f, m)
    }
    // nearest-rank quartile boundary: the ceil(p*n)-th smallest value
    def bounds[T](vs: Seq[T])(implicit o: Ordering[T]): Seq[T] = {
      val sorted = vs.sorted
      Seq(0.25, 0.5, 0.75).map(p =>
        sorted(math.ceil(p * sorted.size).toInt - 1))
    }
    def score[T](bs: Seq[T], v: T)(implicit o: Ordering[T]): Long =
      1L + bs.count(b => o.lt(b, v))
    val rb = bounds(users.map(_._2))
    val fb = bounds(users.map(_._3))
    val mb = bounds(users.map(_._4))
    val expected = users
      .map { case (_, r, f, m) =>
        ((score(rb, r), score(fb, f), score(mb, m)), m)
      }
      .groupBy(_._1)
      .map { case (k, xs) =>
        (k._1, k._2, k._3, xs.size.toLong, xs.map(_._2).sum.toDouble)
      }.toSeq.sorted
    val got = EventQueries.wRfm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // every score is a quartile index and all users are accounted for
    assert(got.map(_._4).sum === users.size)
    assert(got.flatMap(t => Seq(t._1, t._2, t._3)).forall(s =>
      s >= 1 && s <= 4))
  }

  // ---------------- k-NN classification eval -------------------------

  test("k-NN eval matches a local majority-vote model") {
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "CAST(embedding AS array<double>)")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norm = vecs.map { case (id, l, v) =>
      (id, l, v, math.sqrt(dot(v, v)))
    }
    val preds = norm.filter(_._1 < 64).map { case (pid, tl, pv, pn) =>
      val nn = norm.filter(_._1 != pid)
        .map { case (id, l, v, n) => (dot(pv, v) / (pn * n), id, l) }
        .sortBy { case (c, id, _) => (-c, id) }
        .take(5)
      val vote = nn.groupBy(_._3).map { case (l, xs) => (l, xs.size) }
        .toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      (tl, vote)
    }
    val expected = preds.groupBy(_._1).map { case (l, xs) =>
      val correct = xs.count(p => p._2 == p._1).toLong
      (l, xs.length.toLong, correct,
        correct.toDouble / xs.length.toDouble)
    }.toSeq.sorted
    val got = Similarity.sKnnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === 64L)
  }

  // ---------------- Simpson concentration ----------------------------

  test("Simpson concentration matches a local unigram model") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val counts = toks.groupBy(identity).values.map(_.size.toLong)
      val n = toks.size.toLong
      val rep = counts.map(c => c * (c - 1)).sum
      val simpson =
        if (n > 1) Some(rep.toDouble / (n * (n - 1)).toDouble) else None
      (id, n, counts.size.toLong, rep, simpson)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.tSimpsonDiversity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got === expected)
    // the index is a probability
    assert(got.flatMap(_._5).forall(s => s >= 0.0 && s <= 1.0))
  }

  // ---------------- ANN recall report ---------------------------------

  test("ANN recall report equals the set intersection of the index and " +
      "brute-force outputs") {
    val ann = Similarity.sAnnKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = Similarity.sCosineTopk(spark, dir, k = 3, nQueries = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expected = brute.groupBy(_._1).map { case (q, ns) =>
      val hit = ns.count(ann.contains).toLong
      (q, 3L, hit, hit.toDouble / 3.0)
    }.toSeq.sorted
    val got = Similarity.sAnnRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // the report is non-degenerate: the index does find neighbors
    assert(got.map(_._3).sum > 0)
  }

  // ---------------- streaming RFM twin --------------------------------

  test("streaming RFM twin (PK-FINAL purchase log, mid-stream restart " +
      "+ compaction) equals the batch segmentation") {
    val streamed = graft.streaming.StreamingEventLog
      .wStreamRfm(spark, dir)
      .collect().map(_.toString).toSeq
    val batch = EventQueries.wRfm(spark, dir)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  // ---------------- streaming tombstone twin -------------------------

  test("streaming tombstone twin (checkpointed mid-stream restart + " +
      "compaction) equals the batch sink scenario") {
    val streamed = graft.streaming.StreamingEventLog
      .kStreamTombstone(spark, dir)
      .collect().map(_.toString).toSeq
    val batch = EventQueries.kTombstoneDelete(spark, dir)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
