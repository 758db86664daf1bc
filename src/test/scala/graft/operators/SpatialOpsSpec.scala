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
}
