package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the fixed-point PageRank recurrence on hand-computed graphs (the
  * DuckDB oracle replays the same integer math; this spec proves the
  * math itself is the PageRank everyone expects) and sanity-checks the
  * trade-graph query end to end. */
class GraphSpec extends SparkTestBase {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
  }

  test("3-cycle is the uniform fixed point, exactly") {
    // symmetric cycle: every node keeps rank floor(1e12/3) at every step
    val r = Graph.pagerankOnEdges(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 333333333333L, 2L -> 333333333333L,
      3L -> 333333333333L))
  }

  test("bidirectional star concentrates rank on the hub, bit-exactly") {
    // hub 1 (deg 2), leaves 2,3 (deg 1): after one iteration
    //   base       = (15 * 1e12) div (100 * 3)       = 50_000_000_000
    //   r1(hub)    = base + (85 * (2 * r0)) div 100  = 616_666_666_666
    //   r1(leaf)   = base + (85 * (r0 div 2)) div 100 = 191_666_666_666
    val g = edges(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L)
    val r1 = Graph.pagerankOnEdges(g, 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == Map(1L -> 616666666666L, 2L -> 191666666666L,
      3L -> 191666666666L))
    val r3 = Graph.pagerankOnEdges(g, 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3(1L) > r3(2L) && r3(2L) == r3(3L))
  }

  test("BFS min-hop on a path graph takes the shortest route") {
    import spark.implicits._
    // path 1—2—3—4—5 (bidirectional) plus shortcut 1—4: node 4 is 1 hop
    // via the shortcut even though the path route needs 3; node 5 is 2.
    val g = edges(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 3L -> 4L,
      4L -> 3L, 4L -> 5L, 5L -> 4L, 1L -> 4L, 4L -> 1L)
      .select("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.reachabilityOnEdges(g, seeds, maxHops = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("trade-graph pagerank conserves mass and orders deterministically") {
    val ranks = Graph.pagerank(spark, sf0001, iters = 3)
    val total = ranks.agg(sum("r")).collect()(0).getLong(0)
    // integer floors only ever LOSE sub-unit mass (≤ ~3 units/node/iter)
    assert(total <= 1000000000000L)
    assert(total > 990000000000L)
    val top = graft.SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .collect()
    assert(top.length == 10)
    val rs = top.map(_.getLong(1))
    assert(rs.zip(rs.tail).forall { case (a, b) => a >= b })
    // reruns are bit-identical (pure integer arithmetic)
    val again = graft.SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .collect()
    assert(top.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("HITS: the authority everyone links outranks the niche one") {
    import spark.implicits._
    // customers 1,2,3 all buy from supplier 10; only 1 buys from 20.
    // Supplier 10 must be the top authority; customer 1 (links to both
    // authorities) the top hub.
    val e = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L, 1L -> 20L)
      .toDF("cust", "supp")
    val r = Graph.hitsOnEdges(e, rounds = 2).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val auth = r.filter(_._1 == "auth").sortBy(-_._3)
    val hubs = r.filter(_._1 == "hub").sortBy(-_._3)
    assert(auth.head._2 == 10L && auth.head._3 > auth.last._3)
    assert(hubs.head._2 == 1L && hubs.head._3 > hubs.last._3)
    // L1 normalization: each side's full score mass ≈ SCALE (integer
    // floors only lose sub-unit mass; this tiny graph has ≤ 4 nodes)
    assert(math.abs(auth.map(_._3).sum - 1000000L) <= 4)
  }

  test("trade-graph HITS is deterministic and returns both top-10 sides") {
    val a = graft.SparkEntry.queries("graph_hits")(spark, sf0001).collect()
    val b = graft.SparkEntry.queries("graph_hits")(spark, sf0001).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(a.count(_.getString(0) == "auth") == 10)
    assert(a.count(_.getString(0) == "hub") == 10)
  }

  test("label propagation: disjoint components get their min-id labels") {
    import spark.implicits._
    // triangle {1,2,3} + edge {5,6}: both converge within one round
    val e = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 5L -> 6L).toDF("sa", "sb")
    val r = Graph.labelPropagationOnEdges(e, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("label propagation: synchronous rounds move min labels one hop each") {
    import spark.implicits._
    // path 1—2—…—7: after r rounds node k holds max(1, k - r), the
    // synchronous-LPA signature (an asynchronous/racy implementation
    // would converge faster and nondeterministically)
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 7L).toDF("sa", "sb")
    val r = Graph.labelPropagationOnEdges(e, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 3L, 7L -> 4L))
  }

  test("trade-graph community query labels every thresholded-graph node") {
    val r = graft.SparkEntry.queries("graph_label_propagation")(spark, sf0001)
      .collect()
    assert(r.nonEmpty)
    // labels are node ids that only ever decrease (min propagation):
    // every label ≤ its node and is itself a node of the graph
    val nodes = r.map(_.getLong(0)).toSet
    assert(r.forall(x => x.getLong(1) <= x.getLong(0)))
    assert(r.forall(x => nodes.contains(x.getLong(1))))
  }

  test("k-core peeling removes leaves first, keeps the dense core") {
    import spark.implicits._
    // triangle {1,2,3} each also joined to 4 (core of the wheel-ish
    // graph is {1,2,3,4}: all degree >= 3) plus pendant chain 4-5-6:
    // 6 peels round 1 (deg 1 < 3), 5 peels round 2 only via cascade?
    // deg(5)=2 < 3 so round 1; then 4 still has deg 3 (1,2,3) and
    // survives. 6's only neighbor peels with it in round 1.
    val e = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 1L -> 4L, 2L -> 4L,
      3L -> 4L, 4L -> 5L, 5L -> 6L).toDF("sa", "sb")
    val r = Graph.kcorePeelOnEdges(e, k = 3, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 1, 6L -> 1))
  }

  test("k-core cascade: losing a peeled neighbor can peel you next round") {
    import spark.implicits._
    // 4-clique {1,2,3,4}; node 5 hangs off 2,3,4 (deg 3) but 6,7 give
    // nothing: path 5-6, 6-7. Round 1 removes 6,7 (deg<3). 5 keeps
    // 2,3,4 => survives. Now remove edge 5-4 variant: instead node 5
    // linked to 2,3,6 only => round 1 peels 6,7; round 2 peels 5
    // (deg 2). The cascade is the k-core signature.
    val e = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 5L -> 2L, 5L -> 3L, 5L -> 6L, 6L -> 7L).toDF("sa", "sb")
    val r = Graph.kcorePeelOnEdges(e, k = 3, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0,
      5L -> 2, 6L -> 1, 7L -> 1))
  }

  test("trade-graph k-core query covers every thresholded-graph node once") {
    val r = graft.SparkEntry.queries("graph_kcore")(spark, sf0001)
      .collect().map(x => x.getLong(0) -> x.getInt(1))
    assert(r.nonEmpty && r.map(_._1).distinct.length == r.length)
    assert(r.forall { case (_, rr) => rr >= 0 && rr <= 3 })
  }

  test("personalized pagerank localizes mass around the seed") {
    import spark.implicits._
    // path 1-2-3-4-5 (undirected, deg attached): seed 1; after 3 iters
    // only nodes within 3 hops carry mass, and the seed dominates
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val deg = edges.groupBy("src").count().withColumnRenamed("count", "deg")
    val e = edges.join(deg, "src")
    val r = Graph.pprOnEdges(e, seed = 1L, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(5L) == 0L, "4 hops away must carry no mass after 3 iters")
    // replay the exact integer recurrence
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val scale = 1000000000000L
    var ref = adj.keys.map(n => n -> (if (n == 1L) scale else 0L)).toMap
    (1 to 3).foreach { _ =>
      val in = adj.keys.map { n =>
        n -> adj.filter(_._2.contains(n)).keys
          .map(src => ref(src) / adj(src).size).sum
      }.toMap
      ref = adj.keys.map(n =>
        n -> ((if (n == 1L) 15L * scale / 100 else 0L) + 85L * in(n) / 100))
        .toMap
    }
    assert(r == ref, s"$r vs $ref")
  }

  test("trade-graph PPR query returns a top-10 containing the seed") {
    val r = graft.SparkEntry.queries("graph_ppr")(spark, sf0001)
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(r.nonEmpty && r.length <= 10)
    assert(r.map(_._2).toSeq == r.map(_._2).sortBy(-_).toSeq)
    assert(r.map(_._1).contains(2L), "seed node 2 must rank in its own PPR")
  }

  test("q_graph_assortativity matches a float Pearson recomputation") {
    val row = graft.SparkEntry.queries("q_graph_assortativity")(spark, sf0001)
      .collect().head
    val (m, r) = (row.getLong(0), row.getDouble(1))
    import org.apache.spark.sql.functions._
    val pairs = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = pairs.flatMap { case (c, s2) => Seq((c, s2), (s2, c)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xy = edges.map { case (a, b) => (deg(a).toDouble, deg(b).toDouble) }
    assert(m == xy.length)
    val n = xy.length
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sx2 = xy.map(p => p._1 * p._1).sum
    val sy2 = xy.map(p => p._2 * p._2).sum
    val ref = (n * sxy - sx * sy) /
      math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    assert(math.abs(r - ref) < 1e-3, s"$r vs $ref")
  }

  test("graph_degree_powerlaw matches a float OLS on the degree histogram") {
    val row = graft.SparkEntry.queries("graph_degree_powerlaw")(
      spark, sf0001).collect().head
    val (m, alpha, intercept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    // rebuild the degree histogram independently from the fact tables
    val degs = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, sf0001).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .select(explode(array(struct(col("c").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("c").as("dst")))).as("e"))
      .groupBy("e.src").count()
      .groupBy("count").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m == degs.length)
    val pts = degs.map { case (d, c) => (math.log(d), math.log(c)) }
    val k = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(alpha - -slope) < 1e-3, s"$alpha vs ${-slope}")
    assert(math.abs(intercept - (sy - slope * sx) / k) < 1e-3)
  }

  test("modularity: mass accounting closes and Q matches a float replay") {
    val rows = graft.SparkEntry.queries("graph_modularity")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq.sorted == rows.map(_._1).toSeq)
    val t = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, sf0001)
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().count() * 2
    // degree mass sums to the directed edge total; intra ≤ degree mass
    assert(rows.map(_._3).sum == t)
    rows.foreach { case (_, lc, dc, _) => assert(lc <= dc) }
    // the e6-scaled integer Q matches a double replay to rounding error
    val q = rows.map(_._4).sum.toDouble / 1e6
    val qRef = rows.map { case (_, lc, dc, _) =>
      lc.toDouble / t - math.pow(dc.toDouble / t, 2) }.sum
    assert(math.abs(q - qRef) < 1e-5, s"$q vs $qRef")
    assert(q > -1.0 && q < 1.0)
  }

  test("resource-allocation index bounds and ordering hold") {
    val rows = graft.SparkEntry.queries("graph_resource_alloc")(
      spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    // sa < sb canonical pair order; ra_e6 non-increasing down the list
    rows.foreach { case (sa, sb, _, _) => assert(sa < sb) }
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sortBy(-_))
    // every common neighbor contributes w = halfUp-e6(1/cdeg) with
    // cdeg ∈ [1, 64]  ⇒  15625 ≤ w ≤ 1e6, so the pair score is bounded
    // by common × those extremes — the invariant that pins the weight
    // attach to the SAME capped edge set as the pair join
    rows.foreach { case (_, _, common, ra) =>
      assert(ra >= common * 15625L && ra <= common * 1000000L,
        s"ra_e6 $ra outside [${common * 15625L}, ${common * 1000000L}]")
    }
  }
}
