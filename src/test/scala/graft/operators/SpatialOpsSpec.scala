package graft.operators

import graft.SparkTestBase

/** Cross-checks the grid-bucketed spatial queries against a driver-side
  * brute-force recomputation of the same geometry. */
class SpatialOpsSpec extends SparkTestBase {

  private def pts(sf: String): Map[Long, (Long, Long)] =
    graft.Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).map { k =>
        k -> ((k * (k + 12345) % 1600001 * 7919 + 13) % 1600001 - 800000,
          (k * (k + 54321) % 3600001 * 104729 + 97) % 3600001 - 1800000)
      }.toMap

  test("spatial_grid_nn equals brute-force NN restricted to the 3x3 cells") {
    val coords = pts(sf0001)
    def cell(p: (Long, Long)): (Long, Long) =
      ((p._1 + 800000) / 40000, (p._2 + 1800000) / 40000)
    val rows = graft.SparkEntry.queries("spatial_grid_nn")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nid, dist2) =>
      val (py, px) = cell(coords(id))
      val cands = coords.filter { case (k, p) =>
        k != id && math.abs(cell(p)._1 - py) <= 1 &&
          math.abs(cell(p)._2 - px) <= 1
      }.map { case (k, p) =>
        val d = (p._1 - coords(id)._1) * (p._1 - coords(id)._1) +
          (p._2 - coords(id)._2) * (p._2 - coords(id)._2)
        (d, k)
      }.toSeq.sorted
      assert(cands.head == ((dist2, nid)), s"NN of $id")
    }
    // every probe id with a 3x3 neighbor is reported exactly once
    val expected = coords.keys.filter(_ < 200).count { id =>
      val (py, px) = cell(coords(id))
      coords.exists { case (k, p) =>
        k != id && math.abs(cell(p)._1 - py) <= 1 &&
          math.abs(cell(p)._2 - px) <= 1
      }
    }
    assert(rows.length == expected)
  }

  test("spatial_haversine_nn matches an unrounded haversine within 2e-2 km") {
    val coords = pts(sf0001)
    val rows = graft.SparkEntry.queries("spatial_haversine_nn")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nid, km) =>
      val (la1, lo1) = coords(id); val (la2, lo2) = coords(nid)
      def rad(e4: Long) = e4 * 1.7453292519943295e-6
      val a = math.pow(math.sin((rad(la2) - rad(la1)) / 2), 2) +
        math.cos(rad(la1)) * math.cos(rad(la2)) *
          math.pow(math.sin((rad(lo2) - rad(lo1)) / 2), 2)
      val ref = 2 * 6371.0 * math.asin(math.sqrt(a))
      assert(math.abs(km - ref) < 2e-2, s"haversine($id,$nid): $km vs $ref")
    }
  }

  test("spatial_radius_count equals a brute-force circle count") {
    val coords = pts(sf0001)
    val rows = graft.SparkEntry.queries("spatial_radius_count")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toMap
    assert(rows.keySet == (0L until 5L).toSet)
    (0L until 5L).foreach { n =>
      val plat = (n * 393241 + 700) % 1600001 - 800000
      val plon = (n * 786433 + 7000) % 3600001 - 1800000
      val cnt = coords.values.count { case (la, lo) =>
        (la - plat) * (la - plat) + (lo - plon) * (lo - plon) <= 22500000000L
      }
      assert(rows(n) == cnt, s"probe $n")
    }
  }

  test("dbscan: accounting closes and labels match a driver replay") {
    val out = graft.SparkEntry.queries("spatial_dbscan")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Tables.customer(spark, sf0001).count()
    // every point is exactly one of: clustered (core/border) or noise
    assert(out.map(_._3).sum == n, s"points lost: ${out.map(_._3).sum} vs $n")
    val noise = out.filter(_._1 == -1L)
    assert(noise.length == 1 && noise.head._2 == 0)
    out.filter(_._1 != -1L).foreach { case (c, nCore, nPts) =>
      assert(nCore >= 1 && nCore <= nPts, s"cluster $c: $nCore/$nPts")
    }
    // independent driver-side DBSCAN replay (exact integer arithmetic)
    val pts = graft.Tables.customer(spark, sf0001)
      .selectExpr("c_custkey",
        "CAST(((c_custkey * (c_custkey + 12345)) % 1600001 * 7919 + 13) % 1600001 - 800000 AS BIGINT)",
        "CAST(((c_custkey * (c_custkey + 54321)) % 3600001 * 104729 + 97) % 3600001 - 1800000 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val eps2 = 40000L * 40000L
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val d = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      a._1 != b._1 && d <= eps2
    }
    val core = pts.filter(p => pts.count(q => near(p, q)) + 1 >= 3)
      .map(_._1).toSet
    val coreArr = pts.filter(p => core(p._1))
    // min-id closure over core-core edges
    var label = coreArr.map(p => p._1 -> p._1).toMap
    var changed = true
    while (changed) {
      changed = false
      for (p <- coreArr; q <- coreArr if near(p, q)) {
        val m = math.min(label(p._1), label(q._1))
        if (label(p._1) != m) { label += p._1 -> m; changed = true }
      }
    }
    val refClusters = label.groupBy(_._2).map { case (c, m) => c -> m.size }
    val gotCore = out.filter(_._1 != -1L).map(r => r._1 -> r._2).toMap
    assert(gotCore == refClusters,
      s"core clusters differ: $gotCore vs $refClusters")
  }
}
