package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{CoOccurrenceMv, EventQueries}

/** Round-13 pins: the maintained co-occurrence edge MV — streamed
  * (incremental facts + summing pair counts, mid-stream restart,
  * compaction) must equal the batch snapshot edge-for-edge, and the
  * shared from-edges analytics must agree over either build. */
class Round13Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed edge MV == batch snapshot, and the shared from-edges " +
      "BFS/triangle bodies agree over either build") {
    graft.Tables.tune(spark)
    val streamed = graft.streaming.StreamingGraph
      .streamedEdges(spark, dir, nChunks = 5).localCheckpoint()
    val batch = CoOccurrenceMv.edgesFromCounts(
      CoOccurrenceMv.pairCounts(
        CoOccurrenceMv.occupancy(graft.Tables.events(spark, dir))))
      .localCheckpoint()
    val s = edgeSet(streamed)
    val b = edgeSet(batch)
    assert(s.nonEmpty, "edge relation empty at sf0.001 — corpus drifted?")
    assert(s === b)
    // identical analytics through the SAME from-edges bodies
    val sBfs = EventQueries.bfsFromEdges(streamed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bBfs = EventQueries.bfsFromEdges(batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sBfs === bBfs)
    val sTri = EventQueries.triangleCountsFromEdges(streamed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bTri = EventQueries.triangleCountsFromEdges(batch)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sTri === bTri)
    QueryCaches.releaseAll()
  }

  test("MV memoization: second consumer reads the same snapshot; " +
      "refresh() forces a rebuild") {
    graft.Tables.tune(spark)
    CoOccurrenceMv.refresh()
    val first = edgeSet(CoOccurrenceMv.edges(spark, dir))
    val second = edgeSet(CoOccurrenceMv.edges(spark, dir))
    assert(first === second)
    CoOccurrenceMv.refresh()
    val rebuilt = edgeSet(CoOccurrenceMv.edges(spark, dir))
    assert(first === rebuilt)
    QueryCaches.releaseAll()
  }
}
