package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Sessionize, WindowedActivity}
import graft.streaming.Sessionize.Ev

class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("batch sessionization splits on gaps and matches a hand fold") {
    import spark.implicits._
    val evs = Seq(
      Ev(1L, 0L, 1L), Ev(1L, 50L, 2L), Ev(1L, 80L, 3L), // session A (gaps 50,30)
      Ev(1L, 200L, 4L),                                 // session B (gap 120)
      Ev(2L, 10L, 5L)).toDS()                           // session C
    val out = Sessionize.sessionsBatch(evs, gapUs = 60L)
      .collect().sortBy(s => (s.user_id, s.session_start_us))
    assert(out.map(s => (s.user_id, s.session_start_us, s.session_end_us,
      s.n_events)).toSeq ===
      Seq((1L, 0L, 80L, 3L), (1L, 200L, 200L, 1L), (2L, 10L, 10L, 1L)))
  }

  test("as-of join equals the brute-force inequality join") {
    // the union-tag formulation must agree with the O(n*m) definition:
    // latest purchase with ts <= event ts, per user
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts DIV 1000").as("ts_us"))
    val p = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("pid"))
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"), col("pid"))
    val brute = e.join(p,
        col("user_id") === col("p_user") && col("p_ts") <= col("ts_us"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("pid"), col("p_ts")).as("expected"))
    val out = graft.queries.EventQueries.wAsofJoin(spark, dir)
      .join(brute, "event_id")
    assert(out.count() === e.count())
    assert(out.filter(
      !(col("last_purchase_event_id") <=> col("expected"))).count() === 0)
  }

  test("rollup levels are consistent: details sum to subtotals and total") {
    val r = graft.queries.EventQueries.gRollupMetrics(spark, dir).collect()
    val lvls = r.map(_.getLong(0)).toSet
    assert(lvls === Set(0L, 1L, 3L))
    val detailN = r.filter(_.getLong(0) == 0L).map(_.getLong(3)).sum
    val subN = r.filter(_.getLong(0) == 1L).map(_.getLong(3)).sum
    val totalN = r.filter(_.getLong(0) == 3L).map(_.getLong(3)).sum
    assert(detailN === totalN)
    assert(subN === totalN)
    assert(totalN === Tables.events(spark, dir).count())
  }

  test("split assignment is a stable pure function with sane fractions") {
    val a = graft.llm.TextAnalysis.tSplitAssign(spark, dir).collect()
    val b = graft.llm.TextAnalysis.tSplitAssign(spark, dir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    val frac = a.count(_.getString(2) == "train").toDouble / a.length
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
  }

  test("peak concurrency equals a brute-force interval model over the " +
    "sessionize output") {
    val sessions = queries.EventQueries.wSessionize(spark, dir)
      .select("session_start_us", "session_end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // model: concurrency at each transition point t = #sessions with
    // s <= t <= e (end-inclusive); peak per day = max over the day's
    // transition points (the query's documented semantics)
    val points = (sessions.map(_._1) ++ sessions.map(_._2 + 1)).distinct.sorted
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    val nPts = scala.collection.mutable.Map.empty[Long, Long]
    points.foreach { t =>
      val c = sessions.count { case (s, e) => s <= t && t <= e }.toLong
      val day = t / 86400000000L
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), c)
      nPts(day) = nPts.getOrElse(day, 0L) + 1
    }
    val got = queries.EventQueries.wPeakConcurrency(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.QueryCaches.releaseAll() // the sweep points' tracked persist
    assert(got.keySet === peaks.keySet)
    got.foreach { case (day, (peak, n)) =>
      assert(peak === peaks(day), s"day $day peak")
      assert(n === nPts(day), s"day $day points")
    }
    // genuine concurrency exists (peak > 1 somewhere)
    assert(got.values.exists(_._1 > 1))
  }

  test("interval coverage equals a driver-side merged-interval model") {
    val sessions = queries.EventQueries.wSessionize(spark, dir)
      .select("session_start_us", "session_end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1)) // half-open [s, e+1)
      .sortBy(_._1)
    // independent model: merge overlapping intervals on the driver,
    // then slice each merged interval across its day range
    val merged = sessions.foldLeft(List.empty[(Long, Long)]) {
      case ((ms, me) :: rest, (s, e)) if s <= me =>
        (ms, math.max(me, e)) :: rest
      case (acc, iv) => iv :: acc
    }.reverse
    val dayUs = 86400000000L
    val busy = scala.collection.mutable.Map.empty[Long, Long]
    merged.foreach { case (s, e) =>
      ((s / dayUs) to ((e - 1) / dayUs)).foreach { day =>
        val c = math.min(e, (day + 1) * dayUs) - math.max(s, day * dayUs)
        busy(day) = busy.getOrElse(day, 0L) + c
      }
    }
    val got = queries.EventQueries.wIntervalCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.QueryCaches.releaseAll() // the sweep points' tracked persist
    assert(got.keySet === busy.keySet)
    got.foreach { case (day, us) =>
      assert(us === busy(day), s"day $day busy_us")
      assert(us <= dayUs, s"day $day exceeds the day length")
    }
    // sessions genuinely overlap across users somewhere: the union is
    // strictly smaller than the sum of per-session lengths
    assert(busy.values.sum < sessions.map(iv => iv._2 - iv._1).sum)
  }

  test("gap fill densifies each type's hour range and forward-fills " +
    "exactly the last observed value") {
    val rows = queries.EventQueries.wGapFill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val byType = rows.groupBy(_._1)
    byType.foreach { case (et, rs) =>
      val hours = rs.map(_._2).sorted
      // dense: every hour between first and last present exactly once
      assert(hours.toSeq === (hours.min to hours.max).toSeq, s"$et grid")
      val sorted = rs.sortBy(_._2)
      assert(!sorted.head._4, s"$et first hour must be observed")
      // forward fill: a filled hour's value equals the previous hour's
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, hr, v, filled)) =>
          if (filled) assert(v === prev, s"$et hour $hr fill")
        case _ => ()
      }
    }
    // gaps genuinely exist in the corpus (something was filled), and
    // observed rows match the filtered hourly cells exactly
    assert(rows.exists(_._4))
    assert(rows.count(!_._4) ===
      Tables.events(spark, dir)
        .filter(col("value") >= 90.0)
        .select(org.apache.spark.sql.functions.expr(
          s"ts DIV ${3600L * 1000000000L}L").as("h"), col("event_type"))
        .distinct().count().toInt)
  }

  test("anomaly days equal an exact integer replay of the 2-sigma test") {
    val daily = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.expr(
        s"ts DIV ${86400L * 1000000000L}L").as("day"), col("event_type"))
      .count().collect()
      .map(r => ((r.getString(1), r.getLong(0)), r.getLong(2))).toMap
    val byType = daily.groupBy(_._1._1)
    val expect = byType.flatMap { case (et, cells) =>
      val n = cells.size.toLong
      val s1 = cells.values.sum
      val s2 = cells.values.map(c => c * c).sum
      cells.collect {
        case ((_, day), c) if {
          val dev = n * c - s1
          dev * dev > 4L * (n * s2 - s1 * s1)
        } => (et, day, c, n, s1.toDouble / n, n * c - s1 > 0)
      }
    }.toSet
    val got = queries.EventQueries.wAnomalyZscore(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
    // both tails can trigger; at minimum the flagged days genuinely
    // deviate: no flagged day equals its type's mean
    got.foreach { case (_, _, c, n, mean, _) =>
      assert(c.toDouble != mean)
      assert(n > 0)
    }
  }

  test("SCD2 history equals a per-user sequential fold and tiles time") {
    val evs = Tables.events(spark, dir)
      .select(col("user_id"),
        org.apache.spark.sql.functions.expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val got = queries.EventQueries.kScd2History(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        r.getBoolean(5)))
      .groupBy(_._1)
    assert(got.keySet === evs.keySet)
    evs.foreach { case (uid, rows) =>
      // fold the ordered event sequence into (state, from, n) runs
      val ordered = rows.sortBy(e => (e._2, e._3))
      val runs = ordered.foldLeft(List.empty[(String, Long, Long)]) {
        case ((st, from, n) :: rest, (_, ts, _, et)) if st == et =>
          (st, from, n + 1) :: rest
        case (acc, (_, ts, _, et)) => (et, ts, 1L) :: acc
      }.reverse
      val expect = runs.zipWithIndex.map { case ((st, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (uid, st, from, to, n, to.isEmpty)
      }
      val mine = got(uid).sortBy(_._3).toList
      assert(mine === expect, s"user $uid")
      // intervals tile: each run's end is the next run's start, exactly
      // one open (current) run per user
      assert(mine.count(_._6) === 1)
    }
  }

  test("mixture plan: bottleneck domain caps the mix, rates stay in " +
    "(0, 1], and plans respect the weights") {
    val rows = graft.llm.TextAnalysis.tMixturePlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq ===
      Seq("domain_0", "domain_1", "domain_2", "domain_3"))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    val feasible = rows.map(r => r._2.toDouble / r._3).min
    rows.foreach { case (d, avail, w, plan, rate) =>
      assert(plan === math.floor(w * feasible).toLong, s"$d plan")
      assert(plan <= avail, s"$d overdraws its domain")
      assert(rate > 0.0 && rate <= 1.0, s"$d rate $rate")
    }
    // the bottleneck domain is taken (nearly) whole: its plan is within
    // one floor-rounding of its availability
    val bottleneck = rows.minBy(r => r._2.toDouble / r._3)
    assert(bottleneck._2 - bottleneck._4 <= 1L)
  }

  test("retention cohorts: day-0 cells are cohort sizes that bound every " +
    "later offset and sum to the user universe") {
    val r = queries.EventQueries.gRetentionCohorts(spark, dir).collect()
    val day0 = r.filter(_.getLong(1) == 0L)
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    // a cohort's first active day IS an active day -> day-0 row exists
    assert(r.map(_.getLong(0)).toSet.forall(day0.contains))
    // no offset cell can exceed its cohort's size, offsets are >= 0
    r.foreach { x =>
      assert(x.getLong(1) >= 0L)
      assert(x.getLong(2) <= day0(x.getLong(0)))
    }
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(day0.values.sum === users)
  }

  test("funnel stages are monotone and equal a per-user sequential fold") {
    val f = queries.EventQueries.gFunnelSteps(spark, dir).collect()
    assert(f.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val ns = f.map(_.getLong(2)).toSeq
    assert(ns.sliding(2).forall(p => p.head >= p.last))
    // independent model: per user, each stage's anchor is the earliest
    // event of that type strictly after the previous stage's anchor
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val stages = Seq("signup", "view", "click", "purchase")
    val counts = Array.fill(4)(0L)
    evs.groupBy(_._1).values.foreach { es =>
      var prev = Long.MinValue
      var ok = true
      stages.zipWithIndex.foreach { case (st, i) =>
        if (ok) {
          val cand = es.filter(e => e._2 == st && (i == 0 || e._3 > prev))
          if (cand.nonEmpty) { prev = cand.map(_._3).min; counts(i) += 1 }
          else ok = false
        }
      }
    }
    assert(ns === counts.toSeq)
  }

  test("windowed funnel levels equal brute-force chain search per user " +
    "and the histogram reconciles") {
    val w = 86400L * 1000000000L
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val levels = evs.groupBy(_._1).map { case (_, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      val cs = es.filter(_._2 == "click").map(_._3)
      val ps = es.filter(_._2 == "purchase").map(_._3)
      val l3 = ps.exists(p => cs.exists(c => c < p &&
        vs.exists(v => v < c && p - v <= w)))
      val l2 = cs.exists(c => vs.exists(v => v < c && c - v <= w))
      if (l3) 3L else if (l2) 2L else if (vs.nonEmpty) 1L else 0L
    }.toSeq
    val hist = (0L to 3L).map(l => (l, levels.count(_ == l).toLong))
    val reach = (0L to 3L).map(l => levels.count(_ >= l).toLong)
    val got = queries.EventQueries.wFunnelSteps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got.map(x => (x._1, x._2)) === hist)
    assert(got.map(_._3) === reach)
    // conversions recompute from reach; level 0 has none
    assert(got.head._4 === None)
    (1 to 3).foreach { l =>
      val exp =
        if (reach(l - 1) > 0) Some(reach(l).toDouble / reach(l - 1).toDouble)
        else None
      assert(got(l)._4 === exp)
    }
    // non-degenerate: full conversions exist and at least two distinct
    // levels are populated (sf0.001 concentrates users at 0 and 3)
    assert(reach(3) > 0 && hist.map(_._2).count(_ > 0) >= 2)
  }

  test("tombstone deletes: replayed delete wave is invisible, tombstones " +
    "survive compaction, resurrection restores exactly the mod-21 keys") {
    val r = queries.EventQueries.kTombstoneDelete(spark, dir).collect()(0)
    val ids = Tables.events(spark, dir).select("event_id", "value")
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val alive = ids.filter { case (id, _) => id % 21 == 0 || id % 7 != 0 }
    assert(r.getLong(0) === alive.length.toLong)
    // the scenario is non-degenerate: some keys stay deleted, some are
    // deleted then resurrected
    assert(ids.exists { case (id, _) => id % 7 == 0 && id % 21 != 0 })
    assert(ids.exists { case (id, _) => id % 21 == 0 })
    val sumExp = alive.map { case (_, v) =>
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(r.getDouble(2) - sumExp) < 1e-6)
  }

  test("sequence match equals brute-force EXISTS over (view,click,purchase) " +
    "triples") {
    val w = 86400L * 1000000000L
    val got = queries.EventQueries.gSequenceMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = evs.groupBy(_._1).toSeq.collect {
      case (u, es) if es.exists(_._2 == "purchase") =>
        val vs = es.filter(_._2 == "view").map(_._3)
        val cs = es.filter(_._2 == "click").map(_._3)
        val ps = es.filter(_._2 == "purchase").map(_._3)
        val matched = ps.filter(p =>
          cs.exists(c => c < p && vs.exists(v => v < c && v >= p - w)))
        (u, ps.length.toLong, matched.length.toLong,
          if (matched.isEmpty) None else Some(matched.min))
    }.sortBy(_._1)
    assert(got === expect)
    // the corpus exercises both branches: some matched, some not
    assert(expect.exists(_._3 > 0) && expect.exists(t => t._3 < t._2))
  }

  test("triangle counts equal a plain-Scala enumeration of the " +
    "repeat-co-occurrence graph") {
    // sf0.01: the sf0.001 graph is legitimately triangle-free (4 rows
    // appear first at the gate scale), so model-check there instead
    val d01 = "/root/testdata/sf0.01"
    val got = queries.EventQueries.gUserTriangles(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    QueryCaches.releaseAll()
    val evs = Tables.events(spark, d01)
      .select(col("event_type"), expr("ts div 600000000000L").as("b"),
        col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val co = scala.collection.mutable.Map.empty[(Long, Long), Int]
    evs.groupBy(e => (e._1, e._2)).values.foreach { g =>
      val us = g.map(_._3).sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        co((us(i), us(j))) = co.getOrElse((us(i), us(j)), 0) + 1
    }
    // NB: collect-to-tuple ON A MAP would rebuild a Map and dedup by
    // first element — go through an iterator to keep every edge
    val edges = co.iterator.collect { case (p, n) if n >= 2 => p }.toSet
    val nodes = edges.flatMap(p => Set(p._1, p._2)).toSeq.sorted
    val cnt = scala.collection.mutable.Map.empty[Long, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach(u =>
      cnt(u) = cnt.getOrElse(u, 0L) + 1L)
    assert(got === cnt.toMap)
    assert(got.nonEmpty)
    // the clustering coefficient derives from the same counts: deg from
    // the edge list, wedges = deg(deg-1)/2, one double division
    val degM = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (u, v) =>
      degM(u) = degM.getOrElse(u, 0L) + 1L
      degM(v) = degM.getOrElse(v, 0L) + 1L
    }
    val cc = queries.EventQueries.gClusteringCoeff(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    QueryCaches.releaseAll()
    assert(cc.map(_._1).toSeq === cnt.keys.toSeq.sorted)
    cc.foreach { case (u, deg, t, w, c) =>
      assert(deg === degM(u), s"user $u deg")
      assert(t === cnt(u), s"user $u triangles")
      assert(w === deg * (deg - 1) / 2, s"user $u wedges")
      assert(c === t.toDouble / w.toDouble, s"user $u coefficient")
      assert(c > 0.0 && c <= 1.0, s"user $u coefficient range")
    }
  }

  test("PageRank equals a plain-Scala 3-iteration integer power method " +
    "over the co-occurrence graph") {
    val d01 = "/root/testdata/sf0.01"
    val got = queries.EventQueries.gPageRank(spark, d01).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    QueryCaches.releaseAll()
    // rebuild the same edges locally (the triangle test's recipe)
    val evs = Tables.events(spark, d01)
      .select(col("event_type"), expr("ts div 600000000000L").as("b"),
        col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val co = scala.collection.mutable.Map.empty[(Long, Long), Int]
    evs.groupBy(e => (e._1, e._2)).values.foreach { g =>
      val us = g.map(_._3).sorted
      for (i <- us.indices; j <- (i + 1) until us.length)
        co((us(i), us(j))) = co.getOrElse((us(i), us(j)), 0) + 1
    }
    val edges = co.iterator.collect { case (p, n) if n >= 2 => p }.toSeq
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
    edges.foreach { case (u, v) =>
      adj(u) = v :: adj.getOrElse(u, Nil)
      adj(v) = u :: adj.getOrElse(v, Nil)
    }
    var pr = adj.keys.map(n => (n, 1000000000L)).toMap
    (1 to 3).foreach { _ =>
      pr = adj.keys.map { n =>
        val inflow = adj(n).map(u =>
          (17L * pr(u)) / (20L * adj(u).size)).sum
        (n, 150000000L + inflow)
      }.toMap
    }
    val expect = adj.keys.map(n =>
      (n, (adj(n).size.toLong, pr(n)))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
    // rank genuinely differentiates (not all nodes equal)
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("last-touch attribution equals a brute-force per-purchase scan " +
    "and populates both channel and direct buckets") {
    val look = 7L * 86400L * 1000000000L
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val byUser = evs.groupBy(_._1)
    val attributed = evs.filter(_._3 == "purchase").map { p =>
      val touches = byUser(p._1).filter(t =>
        t._3 != "purchase" && t._4 < p._4 && t._4 >= p._4 - look)
      val ch = if (touches.isEmpty) "direct"
        else touches.maxBy(t => (t._4, t._2))._3
      (ch, p._5)
    }
    val expect = attributed.groupBy(_._1).map { case (ch, ps) =>
      val dec = ps.map(p => BigDecimal(p._2).setScale(
        2, BigDecimal.RoundingMode.HALF_UP)).sum
      (ch, ps.length.toLong, dec.toDouble)
    }.toSeq.sortBy(_._1)
    val got = queries.EventQueries.gAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect)
    assert(got.exists(_._1 == "direct") && got.length > 1)
  }

  test("event transitions equal a per-user sequential fold and " +
    "row-normalize exactly") {
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
    evs.groupBy(_._1).values.foreach { es =>
      es.sortBy(e => (e._4, e._2)).sliding(2).foreach {
        case Array(a, b) =>
          cnt((a._3, b._3)) = cnt.getOrElse((a._3, b._3), 0L) + 1L
        case _ => ()
      }
    }
    val fromTotal = cnt.toSeq.groupBy(_._1._1)
      .map { case (f, es) => (f, es.map(_._2).sum) }
    val expect = cnt.toSeq.map { case ((f, t), n) =>
      (f, t, n, fromTotal(f), n.toDouble / fromTotal(f).toDouble)
    }.sortBy(x => (x._1, x._2))
    val got = queries.EventQueries.gEventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expect)
    // each from-row's step counts sum to its total (P row-normalizes)
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._3).sum === g.head._4)
    }
  }

  test("DAU/WAU equal brute-force trailing-window distinct counts") {
    val facts = Tables.events(spark, dir)
      .select(col("user_id"),
        org.apache.spark.sql.functions.expr(
          s"ts DIV ${86400L * 1000000000L}L").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    QueryCaches.releaseAll()
    val lo = facts.map(_._2).min
    val hi = facts.map(_._2).max
    val expect = (lo to hi).map { day =>
      val dau = facts.filter(_._2 == day).map(_._1).distinct.length.toLong
      val wau = facts.filter(f => f._2 >= day - 6 && f._2 <= day)
        .map(_._1).distinct.length.toLong
      (day, dau, wau)
    }
    val got = queries.EventQueries.wActiveUsers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    QueryCaches.releaseAll()
    assert(got === expect)
    // the trailing window genuinely exceeds the daily count somewhere
    assert(got.exists(t => t._3 > t._2))
    got.foreach(t => assert(t._3 >= t._2))
  }

  test("cohort LTV cells equal a plain fold and cumulate to cohort totals") {
    val evs = Tables.events(spark, dir)
      .select("user_id", "event_type", "value",
        "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3) / (86400L * 1000000000L)))
    val cohort = evs.groupBy(_._1).map { case (u, es) =>
      (u, es.map(_._4).min)
    }
    val cells = evs.filter(_._2 == "purchase")
      .map(e => ((cohort(e._1), e._4 - cohort(e._1)), e._3))
      .groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(v => BigDecimal(v._2).setScale(
          2, BigDecimal.RoundingMode.HALF_UP)).sum)
      }
    val expect = cells.toSeq.sortBy(_._1).groupBy(_._1._1).toSeq
      .flatMap { case (_, cs) =>
        cs.sortBy(_._1._2).scanLeft(
          ((0L, 0L), BigDecimal(0), BigDecimal(0))) {
          case ((_, _, cum), (k, rev)) => (k, rev, cum + rev)
        }.tail
      }
      .map { case ((cd, off), rev, cum) =>
        (cd, off, rev.toDouble, cum.toDouble)
      }
      .sortBy(t => (t._1, t._2))
    val got = queries.EventQueries.wCohortLtv(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    QueryCaches.releaseAll()
    assert(got === expect)
    // LTV genuinely accumulates: some cohort has cum > first-cell rev
    assert(got.groupBy(_._1).values.exists(_.length > 1))
  }

  test("KS drift statistic equals a plain-Scala two-sample model") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def grp(id: Long): String = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("0123456789abcdef".indexOf(h(0)) * 16 +
        "0123456789abcdef".indexOf(h(1)) < 230) "train" else "holdout"
    }
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          split(trim(col("text")), "\\s+")).cast("long").as("len"))
      .collect().map(r => (grp(r.getLong(0)), r.getLong(1)))
    val n1 = lens.count(_._1 == "train").toLong
    val n2 = lens.count(_._1 == "holdout").toLong
    val best = lens.map(_._2).distinct.sorted.map { v =>
      val c1 = lens.count(l => l._1 == "train" && l._2 <= v).toLong
      val c2 = lens.count(l => l._1 == "holdout" && l._2 <= v).toLong
      (v, c1, c2, (c1 * n2 - c2 * n1).abs)
    }.minBy(t => (-t._4, t._1))
    val got = graft.llm.TextAnalysis.tKsDrift(spark, dir).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)) ===
      ((best._1, best._2, best._3, best._4)))
    assert(r.getLong(3) === n1 && r.getLong(4) === n2)
    assert(r.getDouble(6) === best._4.toDouble / (n1 * n2).toDouble)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
  }

  test("approx distinct sketch lands within its declared error bound") {
    val r = graft.queries.EventQueries.vApproxDistinct(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getBoolean(1), s"sketch outside 5% bound: ${r(0)}")
    assert(r(0).getLong(0) > 0)
  }

  test("batch sessionization over the corpus: session event counts sum " +
    "to the event count per user") {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_id"))
      .as[Ev]
    val sessions = Sessionize.sessionsBatch(evs, gapUs = 3600L * 1000000L)
    val perUserSessions = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUserEvents = evs.groupByKey(_.user_id).count().collect().toMap
    assert(perUserSessions === perUserEvents)
  }

  test("window-based batch sessionization twin equals the stateFn batch " +
    "path over the corpus (r17: the spill-safe alternative must not drift)") {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_id"))
      .as[Ev]
    // the gap the declared queries use (30 min)
    val got = Sessionize.sessionsBatchWindow(evs, gapUs = 30L * 60L * 1000000L)
      .collect().map(s =>
        (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
      .sorted.toSeq
    val want = Sessionize.sessionsBatch(evs, gapUs = 30L * 60L * 1000000L)
      .collect().map(s =>
        (s.user_id, s.session_start_us, s.session_end_us, s.n_events))
      .sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming sessionization emits closed sessions through " +
    "flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val query = Sessionize.sessionsStream(source.toDS(), gapUs = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      // NOTE: no processAllAvailable here — once a processing-time
      // timeout is armed the stateful query is never "idle" and that
      // call spins. Poll the sink for the expected closed session;
      // whether the events coalesce into one micro-batch or two, the
      // gap split closes session A identically.
      source.addData(Ev(1L, 0L, 1L), Ev(1L, 50L, 2L))
      source.addData(Ev(1L, 200L, 3L)) // gap 150 > 60 closes session A
      val expected = Sessionize.Session(1L, 0L, 50L, 2L)
      val deadline = System.nanoTime() + 90000000000L
      def closed() = spark.table("sessions_out").as[Sessionize.Session]
        .collect().toSeq
      while (!closed().contains(expected) && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(closed().contains(expected))
    } finally query.stop()
  }

  test("watermarked hourly window equals the integer-bucket batch twin") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val windowed = WindowedActivity.hourlyCounts(ev)
      .select(unix_micros(col("hour_start")).as("us"), col("event_type"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val bucketed = graft.queries.EventQueries.gHourlyActivity(spark, dir)
      .select(expr("hour_bucket DIV 1000").as("us"), col("event_type"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(windowed === bucketed)
  }

  test("watermarked hourly window runs as a real stream (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class E(ts: Long, event_type: String)
    val source = MemoryStream[(Long, String)]
    val query = WindowedActivity.hourlyCounts(
      source.toDF().toDF("ts", "event_type"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_out").start()
    try {
      val h = 3600L * 1000000000L
      source.addData((1L, "a"), (h + 1L, "a"), (h + 2L, "b"))
      query.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select(unix_micros(col("hour_start")), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set((0L, "a", 1L), (3600000000L, "a", 1L),
        (3600000000L, "b", 1L)))
    } finally query.stop()
  }
}
