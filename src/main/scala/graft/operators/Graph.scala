package graft.operators

import graft.{CacheRegistry, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics as join-shaped dataflow — PageRank over the
  * customer↔supplier trade graph derived from orders⋈lineitem. No
  * reference counterpart (north-star capability, like `Dedup
  * .connectedComponents`'s label propagation).
  *
  * Scale design (100 TB):
  *  - the graph derivation is ONE orderkey shuffle join + a distinct —
  *    the only passes over the fact tables; everything after runs on the
  *    edge/node frames (≤ |customers|+|suppliers| nodes);
  *  - each PageRank step is one src-keyed shuffle join (ranks ⋈ edges)
  *    plus one dst-keyed map-side-combined aggregation — the canonical
  *    distributed PageRank shape; nothing ever lands on the driver, and
  *    the iteration count is fixed, so plan depth is constant;
  *  - edges (with out-degree attached) are computed once, persisted, and
  *    reused by every iteration instead of re-deriving from the facts.
  *
  * Cross-engine determinism: ranks are BIGINT fixed-point (scale 1e12)
  * and every step uses only integer multiply / integer `div` — damping
  * d = 0.85 is the exact rational 85/100, the base term is
  * `(15 * SCALE) div (100 * N)` — so three iterations are bit-identical
  * in any engine (float PageRank differs in the last ulps by merge
  * order, breaking the oracle hash).
  */
object Graph {

  private val Scale = 1000000000000L // 1e12 fixed-point

  /** Directed edge list: customer 2c ↔ supplier 2s+1 (both directions,
    * so no node is dangling), node ids disjoint by parity.
    *
    * Cross-query SHARED (CacheRegistry.sharedFrame): pagerank, BFS
    * reachability, PPR, and assortativity all consume this exact frame —
    * without the memo each of the four benched graph queries re-scans
    * orders⋈lineitem and re-derives degrees (the 100 TB rule is "derive
    * the graph ONCE", the same reasoning as commonNeighborPairs). */
  private def edgesWithDeg(s: SparkSession, d: String): DataFrame =
    CacheRegistry.sharedFrameMaterialized(
      s"graph:ewd:${graft.CacheRegistry.sessionToken(s)}:$d") {
      val pairs = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      // r15 (guide §2.4 — share one exchange): pin the cached frame's
      // partitioning to hashpartitioning(src, shuffle.partitions). The
      // iterative consumers (pagerank, ppr, reachability) all join this
      // frame on src every iteration; without the pin, AQE coalesces the
      // build's last exchange to a handful of partitions, the cached
      // partitioning no longer satisfies the joins' required
      // distribution, and EVERY iteration re-exchanges the full edge
      // frame. The explicit count comes from spark.sql.shuffle.partitions
      // (cpus locally, cluster-sized in production) — scale-adaptive via
      // conf, not a constant.
      val n = s.sessionState.conf.numShufflePartitions
      // r15 opt 2: localCheckpoint AFTER the pin — the checkpointed
      // LogicalRDD exposes hashpartitioning(src, n) STATICALLY, where
      // the AQE-wrapped cached plan hid it until materialization and
      // every iterative consumer planned a defensive re-exchange of the
      // full edge frame per iteration (plan evidence: Exchange above
      // InMemoryTableScan in graph_pagerank_after.txt).
      edges.join(deg, "src").repartition(n, col("src")).localCheckpoint()
    }

  /** Fixed-point PageRank, `iters` exactly-unrolled iterations, over any
    * directed edge frame `(src, dst, deg)` in which every node occurs as
    * a src (no dangling nodes — the trade graph guarantees it by being
    * bidirectional; a caller with dangling nodes must add self-loops). */
  def pagerankOnEdges(rawEdges: DataFrame, iters: Int): DataFrame = {
    val edges = CacheRegistry.ensurePersisted(rawEdges)
    val nodes = CacheRegistry.register(
      edges.select("src").distinct().withColumnRenamed("src", "node")
        .persist(StorageLevel.MEMORY_AND_DISK))
    // N rides as a broadcast 1-row frame — never a driver-side scalar
    val n = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), expr(s"$Scale div n").as("r"))
    for (_ <- 1 to iters) {
      // shuffle-hash hints: rank/contrib frames are narrow (node, long)
      // rows — hash join skips the two per-iteration sorts SMJ would pay
      // (×2 joins ×N iterations); hash-partitioned node ids have no skew
      val contrib = edges.join(ranks.hint("shuffle_hash"),
          edges("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("share"))
        .groupBy("dst").agg(sum("share").as("in_mass"))
      ranks = nodes.join(contrib.hint("shuffle_hash"),
          nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(n))
        .select(col("node"),
          expr(s"(15 * $Scale) div (100 * n) + " +
            "(85 * coalesce(in_mass, 0L)) div 100").as("r"))
    }
    ranks
  }

  /** PageRank over the customer↔supplier trade graph. */
  def pagerank(s: SparkSession, d: String, iters: Int): DataFrame =
    pagerankOnEdges(edgesWithDeg(s, d), iters)

  /** The DuckDB oracle unrolls the identical integer recurrence; `//` is
    * DuckDB's integer division (both floor on the positive operands used
    * here). SUM(BIGINT) returns HUGEINT, so every sum is cast back. */
  private def oracleSqlFor(iters: Int): String = {
    val base =
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
        |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY src),
        |r0 AS MATERIALIZED (SELECT node, 1000000000000 // n AS r FROM nodes, nn)""".stripMargin
    val iterations = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(SUM(r.r // d.deg) AS BIGINT) AS in_mass
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS MATERIALIZED (
         |  SELECT nodes.node,
         |    (15 * 1000000000000) // (100 * nn.n)
         |      + (85 * COALESCE(s$i.in_mass, 0)) // 100 AS r
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN s$i ON nodes.node = s$i.node)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iterations
       |SELECT node, r AS rank_fp FROM r$iters
       |ORDER BY rank_fp DESC, node LIMIT 10""".stripMargin
  }

  /** Multi-hop BFS reachability (min-hop) from a seed set, `maxHops`
    * exactly-unrolled frontier expansions. Each hop is one src-keyed
    * shuffle join of the FRONTIER (only the newly-reached nodes, never
    * the full reached set) against the edge frame plus one min-hop
    * aggregation — the standard distributed BFS; nothing on the driver,
    * constant plan depth. */
  def reachabilityOnEdges(rawEdges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    val edges = CacheRegistry.ensurePersisted(rawEdges)
    var reached = seeds.select(col("node"), lit(0L).as("hop"))
    var frontier = reached
    for (i <- 1 to maxHops) {
      val next = frontier.join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"), lit(i.toLong).as("hop"))
      reached = reached.unionAll(next)
        .groupBy("node").agg(min("hop").as("hop"))
      // the new frontier = nodes FIRST reached at hop i
      frontier = reached.filter(col("hop") === i)
    }
    reached
  }

  /** BFS over the trade graph from every 20th supplier. */
  def reachability(s: SparkSession, d: String, maxHops: Int): DataFrame =
    reachabilityOnEdges(
      edgesWithDeg(s, d).select("src", "dst"),
      Tables.supplier(s, d).filter(col("s_suppkey") % 20 === 3)
        .select((col("s_suppkey") * 2 + 1).as("node")),
      maxHops)

  /** Supplier-pair similarity by customer overlap (common-neighbor /
    * Jaccard on the bipartite trade graph) — the link-prediction
    * primitive. Pairs are generated per CUSTOMER (never all supplier
    * pairs), and hub customers above `maxDeg` are excluded — the same
    * deterministic skew cap as the LSH bucket caps: a customer linked to
    * everyone contributes deg² pair rows and no discriminative signal.
    * Per-supplier degrees are a supplier-cardinality frame, broadcast
    * back for the Jaccard denominator. */
  /** Cross-query shared bipartite trade edge list (cust, supp), distinct
    * — the single orders⋈lineitem pass every similarity/centrality query
    * derives from. Persisted once per (session, dir). */
  def tradeBipartite(s: SparkSession, d: String): DataFrame =
    CacheRegistry.sharedFrame(
      s"graph:bipartite:${graft.CacheRegistry.sessionToken(s)}:$d") {
      // r15 (guide §2.4): every consumer of this frame is cust-keyed
      // (cdeg groupBys, the deg-cap join, the per-customer pair
      // self-joins) — pin the cached partitioning to
      // hashpartitioning(cust, shuffle.partitions) so those consumers'
      // required distribution is satisfied straight from the cache
      // instead of re-exchanging the frame per query. Count from conf —
      // scale-adaptive, not a local constant.
      Tables.orders(s, d).select("o_orderkey", "o_custkey")
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
        .repartition(s.sessionState.conf.numShufflePartitions, col("cust"))
    }

  def commonNeighborPairs(s: SparkSession, d: String,
      maxDeg: Int): DataFrame =
    // Cross-query shared: graph_common_neighbors and graph_triangles
    // both consume this exact frame — the 100 TB rule is "derive the
    // similarity graph ONCE"; without the memo each query re-scans
    // orders⋈lineitem and redoes the deg-capped self-join. The key pins
    // session identity (a frame is only valid in its own session), data
    // dir, and the cap.
    CacheRegistry.sharedFrame(
      s"graph:cnp:${graft.CacheRegistry.sessionToken(s)}:$d:$maxDeg") {
      val edges = tradeBipartite(s, d)
      val suppDeg = edges.groupBy("supp").agg(count(lit(1)).as("sdeg"))
      // r15 (guide §2.4, the q_itemset_pairs recipe): per-customer pair
      // generation as ONE cust-keyed aggregate (exchange-free on the
      // cust-pinned cache) + an IN-TASK explode of C(basket, 2) pairs,
      // instead of a self-join that exchanged both sides and pushed the
      // deg²-sized join output through the shuffle machinery. The
      // deg-cap filter rides the aggregated basket size (size(set) =
      // the old cdeg — both count DISTINCT (cust, supp) rows). Pair
      // multiset is identical: (sa < sb) appears once per shared
      // customer either way, so `common` is unchanged.
      val common = edges.groupBy("cust")
        .agg(collect_set(col("supp")).as("ss"))
        .filter(size(col("ss")) <= maxDeg)
        .select(explode(col("ss")).as("sa"), col("ss"))
        .select(col("sa"),
          explode(filter(col("ss"), x => x > col("sa"))).as("sb"))
        .groupBy("sa", "sb")
        .agg(count(lit(1)).as("common"))
      common
        .join(broadcast(suppDeg.select(col("supp").as("sa"),
          col("sdeg").as("da"))), "sa")
        .join(broadcast(suppDeg.select(col("supp").as("sb"),
          col("sdeg").as("db"))), "sb")
        .select(col("sa"), col("sb"), col("common"),
          round(col("common").cast("double") /
            (col("da") + col("db") - col("common")), 4).as("jaccard"))
    }

  /** Personalized PageRank from a single seed node, `iters` unrolled
    * iterations: r_i = restart·[node=seed] + (1−α)·Σ incoming shares,
    * fixed-point integers exactly like [[pagerankOnEdges]] (restart mass
    * goes ONLY to the seed — the "similarity to this node" centrality
    * used for related-item retrieval). Same per-iteration shape: one
    * src-keyed shuffle-hash join + one map-side-combined dst aggregate;
    * constant plan depth. */
  def pprOnEdges(rawEdges: DataFrame, seed: Long, iters: Int): DataFrame = {
    val edges = CacheRegistry.ensurePersisted(rawEdges)
    val nodes = CacheRegistry.register(
      edges.select("src").distinct().withColumnRenamed("src", "node")
        .persist(StorageLevel.MEMORY_AND_DISK))
    var ranks = nodes
      .select(col("node"),
        when(col("node") === seed, lit(Scale)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks.hint("shuffle_hash"),
          edges("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("share"))
        .groupBy("dst").agg(sum("share").as("in_mass"))
      ranks = nodes.join(contrib.hint("shuffle_hash"),
          nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (when(col("node") === seed, lit(15L * Scale / 100))
            .otherwise(lit(0L)) +
            expr("(85 * coalesce(in_mass, 0L)) div 100")).as("r"))
    }
    ranks
  }

  private def pprOracleSql(seedExpr: String, iters: Int): String = {
    val base =
      s"""WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
        |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY src),
        |r0 AS MATERIALIZED (SELECT node,
        |         CASE WHEN node = $seedExpr
        |           THEN 1000000000000 ELSE 0 END AS r
        |       FROM nodes)""".stripMargin
    val iterations = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST(SUM(r.r // d.deg) AS BIGINT) AS in_mass
         |  FROM edges e
         |  JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst),
         |r$i AS MATERIALIZED (
         |  SELECT nodes.node,
         |    CASE WHEN nodes.node = $seedExpr
         |      THEN ${15L * Scale / 100} ELSE 0 END
         |      + (85 * COALESCE(s$i.in_mass, 0)) // 100 AS r
         |  FROM nodes
         |  LEFT JOIN s$i ON nodes.node = s$i.node)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$iterations
       |SELECT node, r AS rank_fp FROM r$iters
       |WHERE r > 0 ORDER BY rank_fp DESC, node LIMIT 10""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql("graph_pagerank", oracleSqlFor(3)) { (s, d) =>
      pagerank(s, d, iters = 3)
        .select(col("node"), col("r").as("rank_fp"))
        .orderBy(desc("rank_fp"), col("node")).limit(10)
    },

    // Degree assortativity of the trade graph: Pearson correlation of
    // endpoint degrees over the directed edge list — "do hubs connect
    // to hubs?", the one-number structure diagnostic run before
    // choosing partition/skew strategy. All five sums are EXACT
    // decimals over integer degrees, and the numerator/denominator
    // differences (m·Σxy − Σx·Σy …) are computed in decimal BEFORE the
    // double cast — doing them in double would catastrophically cancel
    // at 100 TB edge counts.
    QueryDef.sql(
      "q_graph_assortativity",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY src),
        |ed AS MATERIALIZED (
        |  SELECT d1.deg AS dx, d2.deg AS dy
        |  FROM edges e
        |  JOIN deg d1 ON e.src = d1.src
        |  JOIN deg d2 ON e.dst = d2.src),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    SUM(CAST(dx AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(dy AS DECIMAL(38,0))) AS sy,
        |    SUM(CAST(dx * dy AS DECIMAL(38,0))) AS sxy,
        |    SUM(CAST(dx * dx AS DECIMAL(38,0))) AS sx2,
        |    SUM(CAST(dy * dy AS DECIMAL(38,0))) AS sy2
        |  FROM ed)
        |SELECT m,
        |  round(CAST(m * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(m * sx2 - sx * sx AS DOUBLE)
        |      * CAST(m * sy2 - sy * sy AS DOUBLE)), 4) AS assortativity
        |FROM agg""".stripMargin) { (s, d) =>
      val e = edgesWithDeg(s, d)
      val dd = e.select(col("src").as("d2node"), col("deg").as("dy"))
        .distinct()
      val ed = e.select(col("dst"), col("deg").as("dx"))
        .join(dd, col("dst") === col("d2node"))
      val agg = ed.agg(
        count(lit(1)).cast("bigint").as("m"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        sum(col("dy").cast("decimal(38,0)")).as("sy"),
        sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
        sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sx2"),
        sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("sy2"))
      agg.select(col("m"),
        round((col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("m") * col("sx2") - col("sx") * col("sx"))
              .cast("double")
            * (col("m") * col("sy2") - col("sy") * col("sy"))
              .cast("double")), 4).as("assortativity"))
    },

    // Personalized PageRank seeded at customer 1 (node 2): the
    // "retrieval neighborhood" ranking. WHERE r > 0 keeps the output
    // independent of graph regions the 3-hop mass never reaches.
    QueryDef.sql("graph_ppr", pprOracleSql(seedExpr = "2", iters = 3)) {
      (s, d) =>
        pprOnEdges(edgesWithDeg(s, d), seed = 2L, iters = 3)
          .filter(col("r") > 0)
          .select(col("node"), col("r").as("rank_fp"))
          .orderBy(desc("rank_fp"), col("node")).limit(10)
    },

    // Min-hop BFS vs a DuckDB RECURSIVE CTE: the recursive UNION
    // (set-dedup per step, rows = (node, hop) pairs) replays the same
    // expansion; min-hop per node then makes both sides order-free.
    QueryDef.sql(
      "graph_reachability",
      """WITH RECURSIVE pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |seeds AS MATERIALIZED (SELECT s_suppkey * 2 + 1 AS node FROM supplier
        |          WHERE s_suppkey % 20 = 3),
        |reach(node, hop) AS (
        |  SELECT node, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, r.hop + 1 FROM reach r
        |  JOIN edges e ON r.node = e.src WHERE r.hop < 3),
        |mh AS (SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
        |       FROM reach GROUP BY node)
        |SELECT hop, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  min(node) AS first_node, max(node) AS last_node
        |FROM mh GROUP BY hop ORDER BY hop""".stripMargin) { (s, d) =>
      reachability(s, d, maxHops = 3)
        .groupBy("hop")
        .agg(count(lit(1)).as("n_nodes"), min("node").as("first_node"),
          max("node").as("last_node"))
        .orderBy("hop")
    },

    // Top-20 supplier pairs by customer-overlap Jaccard. The DuckDB
    // oracle replays the cap, the per-customer pair join, and the exact
    // integer Jaccard inputs.
    QueryDef.sql(
      "graph_common_neighbors",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
        |sdeg AS MATERIALIZED (SELECT supp, COUNT(*) AS sdeg FROM pairs GROUP BY supp),
        |small AS MATERIALIZED (
        |  SELECT p.cust, p.supp FROM pairs p
        |  JOIN cdeg USING (cust) WHERE cdeg <= 64),
        |common AS MATERIALIZED (
        |  SELECT a.supp AS sa, b.supp AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS common
        |  FROM small a JOIN small b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp)
        |SELECT sa, sb, common,
        |  round(CAST(common AS DOUBLE)
        |    / (da.sdeg + db.sdeg - common), 4) AS jaccard
        |FROM common
        |JOIN sdeg da ON common.sa = da.supp
        |JOIN sdeg db ON common.sb = db.supp
        |ORDER BY jaccard DESC, sa, sb LIMIT 20""".stripMargin) { (s, d) =>
      commonNeighborPairs(s, d, maxDeg = 64)
        .orderBy(desc("jaccard"), col("sa"), col("sb")).limit(20)
    },

    // Resource-allocation link prediction (Zhou/Lü/Zhang's RA index):
    // score(sa,sb) = Σ_{z ∈ common neighbors} 1/deg(z) — common
    // neighbors weighted by how DISCRIMINATIVE each shared customer is
    // (a 2-supplier customer says more than a 60-supplier one). Each
    // 1/deg term is half-up rounded to an exact e6 BIGINT once per
    // customer, so pair scores are integer sums — order-free and
    // engine-identical. SCALE: rides the SAME deg-capped per-customer
    // pair join as graph_common_neighbors (pairs per customer ≤ cap²,
    // never all supplier pairs); the weight attach is a projection on
    // the already-joined cdeg.
    QueryDef.sql(
      "graph_resource_alloc",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
        |small AS MATERIALIZED (
        |  SELECT p.cust, p.supp,
        |    CAST((2 * 1000000 + cdeg) // (2 * cdeg) AS BIGINT) AS w
        |  FROM pairs p JOIN cdeg USING (cust) WHERE cdeg <= 64),
        |ra AS (
        |  SELECT a.supp AS sa, b.supp AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS common,
        |    CAST(SUM(a.w) AS BIGINT) AS ra_e6
        |  FROM small a JOIN small b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp)
        |SELECT sa, sb, common, ra_e6 FROM ra
        |ORDER BY ra_e6 DESC, sa, sb LIMIT 20""".stripMargin) { (s, d) =>
      // r15 (guide §2.4, the commonNeighborPairs recipe): one cust-keyed
      // aggregate (exchange-free on the cust-pinned tradeBipartite
      // cache) + in-task pair explode replaces the two-sided self-join.
      // The RA weight depends only on the customer's degree, so it is
      // computed once per basket (size(set) = the old cdeg) and summed
      // per pair — identical integer sums, order-free.
      tradeBipartite(s, d).groupBy("cust")
        .agg(collect_set(col("supp")).as("ss"))
        .filter(size(col("ss")) <= 64)
        .withColumn("w",
          expr("(2 * 1000000 + size(ss)) div (2 * cast(size(ss) as bigint))"))
        .select(explode(col("ss")).as("sa"), col("ss"), col("w"))
        .select(col("sa"),
          explode(filter(col("ss"), x => x > col("sa"))).as("sb"), col("w"))
        .groupBy("sa", "sb")
        .agg(count(lit(1)).cast("bigint").as("common"),
          sum(col("w")).cast("bigint").as("ra_e6"))
        .orderBy(desc("ra_e6"), col("sa"), col("sb")).limit(20)
    },

    // Triangle count on the thresholded similarity graph — the
    // clustering-structure measure (community density) over the SAME
    // capped common-neighbor edges. Ordered edges (sa < sb) make each
    // triangle count exactly once via the two-join wedge-close pattern;
    // the edge frame is similarity-thresholded and therefore sparse, so
    // the joins are edge-keyed shuffles of a pruned graph, never the
    // raw bipartite fan-out.
    QueryDef.sql(
      "graph_triangles",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
        |sdeg AS MATERIALIZED (SELECT supp, COUNT(*) AS sdeg FROM pairs GROUP BY supp),
        |small AS MATERIALIZED (
        |  SELECT p.cust, p.supp FROM pairs p
        |  JOIN cdeg USING (cust) WHERE cdeg <= 64),
        |common AS MATERIALIZED (
        |  SELECT a.supp AS sa, b.supp AS sb, COUNT(*) AS common
        |  FROM small a JOIN small b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp),
        |e AS MATERIALIZED (
        |  SELECT sa, sb FROM common
        |  JOIN sdeg da ON common.sa = da.supp
        |  JOIN sdeg db ON common.sb = db.supp
        |  WHERE round(CAST(common AS DOUBLE)
        |    / (da.sdeg + db.sdeg - common), 4) >= 0.22)
        |SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST((SELECT COUNT(*) FROM e ab
        |    JOIN e bc ON ab.sb = bc.sa
        |    JOIN e ac ON ac.sa = ab.sa AND ac.sb = bc.sb) AS BIGINT)
        |    AS n_triangles""".stripMargin) { (s, d) =>
      val e = CacheRegistry.register(
        commonNeighborPairs(s, d, maxDeg = 64)
          .filter(col("jaccard") >= 0.22).select("sa", "sb")
          .persist(StorageLevel.MEMORY_AND_DISK))
      val tri = e.as("ab")
        .join(e.as("bc"), col("ab.sb") === col("bc.sa"))
        .join(e.as("ac"),
          col("ac.sa") === col("ab.sa") && col("ac.sb") === col("bc.sb"))
        .agg(count(lit(1)).as("n_triangles"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    },

    // Local clustering coefficient per node (r15): lcc(v) = 2·tri(v) /
    // (deg(v)·(deg(v)−1)) on the SAME thresholded similarity graph as
    // graph_triangles — the node-level community-density readout (which
    // suppliers sit inside tight cliques vs bridge between them). Each
    // triangle from the ordered wedge-close join contributes its three
    // vertices to a per-node count; degrees come from the symmetrized
    // edge list. SCALE: identical capped machinery as graph_triangles;
    // the per-vertex explode is 3 rows per triangle (triangle-bounded,
    // never degree-squared), and both count aggregates are
    // map-side-combined node-keyed shuffles.
    QueryDef.sql(
      "graph_clustering_coeff",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
        |sdeg AS MATERIALIZED (SELECT supp, COUNT(*) AS sdeg FROM pairs GROUP BY supp),
        |small AS MATERIALIZED (
        |  SELECT p.cust, p.supp FROM pairs p
        |  JOIN cdeg USING (cust) WHERE cdeg <= 64),
        |common AS MATERIALIZED (
        |  SELECT a.supp AS sa, b.supp AS sb, COUNT(*) AS common
        |  FROM small a JOIN small b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp),
        |e AS MATERIALIZED (
        |  SELECT sa, sb FROM common
        |  JOIN sdeg da ON common.sa = da.supp
        |  JOIN sdeg db ON common.sb = db.supp
        |  WHERE round(CAST(common AS DOUBLE)
        |    / (da.sdeg + db.sdeg - common), 4) >= 0.22),
        |tr AS MATERIALIZED (
        |  SELECT ab.sa AS a, ab.sb AS b, bc.sb AS c
        |  FROM e ab JOIN e bc ON ab.sb = bc.sa
        |  JOIN e ac ON ac.sa = ab.sa AND ac.sb = bc.sb),
        |tcnt AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS node FROM tr
        |    UNION ALL SELECT b AS node FROM tr
        |    UNION ALL SELECT c AS node FROM tr) GROUP BY node),
        |u AS (SELECT sa AS node FROM e UNION ALL SELECT sb AS node FROM e),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM u GROUP BY node)
        |SELECT d.node AS node, d.deg, COALESCE(t.tri, 0) AS tri,
        |  round(CAST(2 * COALESCE(t.tri, 0) AS DOUBLE)
        |    / (d.deg * (d.deg - 1)), 4) AS lcc
        |FROM deg d LEFT JOIN tcnt t ON d.node = t.node
        |WHERE d.deg >= 2
        |ORDER BY lcc DESC, d.node LIMIT 20""".stripMargin) { (s, d) =>
      val e = CacheRegistry.register(
        commonNeighborPairs(s, d, maxDeg = 64)
          .filter(col("jaccard") >= 0.22).select("sa", "sb")
          .persist(StorageLevel.MEMORY_AND_DISK))
      val tr = e.as("ab")
        .join(e.as("bc"), col("ab.sb") === col("bc.sa"))
        .join(e.as("ac"),
          col("ac.sa") === col("ab.sa") && col("ac.sb") === col("bc.sb"))
        .select(col("ab.sa").as("a"), col("ab.sb").as("b"),
          col("bc.sb").as("c"))
      val tcnt = tr.select(col("a").as("node"))
        .unionAll(tr.select(col("b").as("node")))
        .unionAll(tr.select(col("c").as("node")))
        .groupBy("node").agg(count(lit(1)).cast("bigint").as("tri"))
      val deg = e.select(col("sa").as("node"))
        .unionAll(e.select(col("sb").as("node")))
        .groupBy("node").agg(count(lit(1)).cast("bigint").as("deg"))
      deg.join(tcnt, Seq("node"), "left")
        .withColumn("tri", coalesce(col("tri"), lit(0L)))
        .filter(col("deg") >= 2)
        .select(col("node"), col("deg"), col("tri"),
          round((col("tri") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)), 4).as("lcc"))
        .orderBy(desc("lcc"), col("node")).limit(20)
    },

    // Community detection by synchronous min-label propagation, 3
    // exactly-unrolled rounds over the SAME thresholded similarity graph
    // (shared frame — no third orders⋈lineitem scan). Each round is one
    // dst-keyed shuffle join of the current labels against the symmetric
    // edge frame plus a min aggregate — the connectedComponents shape
    // with a fixed round count so the oracle can unroll it; labels are
    // node ids (exact integers), so rounds are bit-identical in any
    // engine regardless of join or merge order.
    QueryDef.sql(
      "graph_label_propagation",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
        |sdeg AS MATERIALIZED (SELECT supp, COUNT(*) AS sdeg FROM pairs GROUP BY supp),
        |small AS MATERIALIZED (
        |  SELECT p.cust, p.supp FROM pairs p
        |  JOIN cdeg USING (cust) WHERE cdeg <= 64),
        |common AS MATERIALIZED (
        |  SELECT a.supp AS sa, b.supp AS sb, COUNT(*) AS common
        |  FROM small a JOIN small b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp),
        |e AS MATERIALIZED (
        |  SELECT sa, sb FROM common
        |  JOIN sdeg da ON common.sa = da.supp
        |  JOIN sdeg db ON common.sb = db.supp
        |  WHERE round(CAST(common AS DOUBLE)
        |    / (da.sdeg + db.sdeg - common), 4) >= 0.22),
        |sym AS MATERIALIZED (SELECT sa AS src, sb AS dst FROM e
        |        UNION ALL SELECT sb, sa FROM e),
        |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM sym),
        |l1 AS MATERIALIZED (
        |  SELECT p.node, least(p.lbl, MIN(q.lbl)) AS lbl
        |  FROM l0 p JOIN sym s ON s.src = p.node
        |  JOIN l0 q ON s.dst = q.node GROUP BY p.node, p.lbl),
        |l2 AS MATERIALIZED (
        |  SELECT p.node, least(p.lbl, MIN(q.lbl)) AS lbl
        |  FROM l1 p JOIN sym s ON s.src = p.node
        |  JOIN l1 q ON s.dst = q.node GROUP BY p.node, p.lbl),
        |l3 AS MATERIALIZED (
        |  SELECT p.node, least(p.lbl, MIN(q.lbl)) AS lbl
        |  FROM l2 p JOIN sym s ON s.src = p.node
        |  JOIN l2 q ON s.dst = q.node GROUP BY p.node, p.lbl)
        |SELECT node, lbl AS community FROM l3
        |ORDER BY node""".stripMargin) { (s, d) =>
      labelPropagationOnEdges(
        commonNeighborPairs(s, d, maxDeg = 64)
          .filter(col("jaccard") >= 0.22).select("sa", "sb"),
        rounds = 3)
        .select(col("node"), col("lbl").as("community")).orderBy("node")
    },

    // HITS hubs & authorities on the bipartite trade graph (customers =
    // hubs, suppliers = authorities — the graph IS the HITS setting), 2
    // exactly-unrolled rounds. Fixed-point integers like pagerank: each
    // half-round is one edge-keyed shuffle join + a map-side-combined
    // sum; the L1 normalizer is a broadcast 1-row frame and the rescale
    // is integer `div` — bit-identical in any engine (SCALE=1e6 keeps
    // score×SCALE < 2^63 for authority degrees up to ~9e6). Output =
    // top-10 of each side.
    QueryDef.sql(
      "graph_hits",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s2
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |a0 AS MATERIALIZED (SELECT DISTINCT s2 AS node, 1000000 AS a FROM pairs),
        |h1r AS MATERIALIZED (SELECT p.c AS node, CAST(SUM(a0.a) AS BIGINT) AS h
        |        FROM pairs p JOIN a0 ON p.s2 = a0.node GROUP BY p.c),
        |h1t AS MATERIALIZED (SELECT CAST(SUM(h) AS BIGINT) AS t FROM h1r),
        |h1 AS MATERIALIZED (SELECT node, (h * 1000000) // t AS h FROM h1r, h1t),
        |a1r AS MATERIALIZED (SELECT p.s2 AS node, CAST(SUM(h1.h) AS BIGINT) AS a
        |        FROM pairs p JOIN h1 ON p.c = h1.node GROUP BY p.s2),
        |a1t AS MATERIALIZED (SELECT CAST(SUM(a) AS BIGINT) AS t FROM a1r),
        |a1 AS MATERIALIZED (SELECT node, (a * 1000000) // t AS a FROM a1r, a1t),
        |h2r AS MATERIALIZED (SELECT p.c AS node, CAST(SUM(a1.a) AS BIGINT) AS h
        |        FROM pairs p JOIN a1 ON p.s2 = a1.node GROUP BY p.c),
        |h2t AS MATERIALIZED (SELECT CAST(SUM(h) AS BIGINT) AS t FROM h2r),
        |h2 AS MATERIALIZED (SELECT node, (h * 1000000) // t AS h FROM h2r, h2t),
        |a2r AS MATERIALIZED (SELECT p.s2 AS node, CAST(SUM(h2.h) AS BIGINT) AS a
        |        FROM pairs p JOIN h2 ON p.c = h2.node GROUP BY p.s2),
        |a2t AS MATERIALIZED (SELECT CAST(SUM(a) AS BIGINT) AS t FROM a2r),
        |a2 AS MATERIALIZED (SELECT node, (a * 1000000) // t AS a FROM a2r, a2t)
        |SELECT kind, node, score FROM (
        |  SELECT 'auth' AS kind, node, a AS score,
        |    row_number() OVER (ORDER BY a DESC, node) AS rk FROM a2
        |  UNION ALL
        |  SELECT 'hub' AS kind, node, h AS score,
        |    row_number() OVER (ORDER BY h DESC, node) AS rk FROM h2)
        |WHERE rk <= 10 ORDER BY kind, score DESC, node""".stripMargin) {
      (s, d) => hits(s, d, rounds = 2)
    },

    // 3-core peeling (3 exactly-unrolled rounds) over the SAME
    // thresholded similarity graph — the dense-subgraph extractor
    // (k-core is the standard "keep the structurally supported part"
    // filter before community/embedding work). Each round is one
    // degree aggregation over survivor-restricted edges (two semi-join
    // shapes + a map-side-combined count) — node-cardinality frames
    // only, never the raw bipartite fan-out; a fixed round count keeps
    // plan depth constant and lets the oracle unroll the recursion.
    // Nodes whose neighbors all got peeled leave no degree row — the
    // LEFT JOIN + coalesce(deg,0) keeps their removal exact. Integer
    // degrees ⇒ bit-identical rounds in any engine.
    QueryDef.sql(
      "graph_kcore",
      s"""WITH $simEdgeSql,
        |sym AS MATERIALIZED (SELECT sa AS src, sb AS dst FROM e
        |        UNION ALL SELECT sb, sa FROM e),
        |n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym),
        |deg1 AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |         FROM sym GROUP BY src),
        |r1 AS MATERIALIZED (SELECT n0.node FROM n0 LEFT JOIN deg1 USING (node)
        |       WHERE coalesce(deg, 0) < 3),
        |s1 AS MATERIALIZED (SELECT n0.node FROM n0 LEFT JOIN deg1 USING (node)
        |       WHERE coalesce(deg, 0) >= 3),
        |deg2 AS MATERIALIZED (SELECT s.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |         FROM sym s JOIN s1 a ON s.src = a.node
        |         JOIN s1 b ON s.dst = b.node GROUP BY s.src),
        |r2 AS MATERIALIZED (SELECT s1.node FROM s1 LEFT JOIN deg2 USING (node)
        |       WHERE coalesce(deg, 0) < 3),
        |s2 AS MATERIALIZED (SELECT s1.node FROM s1 LEFT JOIN deg2 USING (node)
        |       WHERE coalesce(deg, 0) >= 3),
        |deg3 AS MATERIALIZED (SELECT s.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |         FROM sym s JOIN s2 a ON s.src = a.node
        |         JOIN s2 b ON s.dst = b.node GROUP BY s.src),
        |r3 AS MATERIALIZED (SELECT s2.node FROM s2 LEFT JOIN deg3 USING (node)
        |       WHERE coalesce(deg, 0) < 3),
        |s3 AS MATERIALIZED (SELECT s2.node FROM s2 LEFT JOIN deg3 USING (node)
        |       WHERE coalesce(deg, 0) >= 3)
        |SELECT node, removed_round FROM (
        |  SELECT node, 1 AS removed_round FROM r1
        |  UNION ALL SELECT node, 2 FROM r2
        |  UNION ALL SELECT node, 3 FROM r3
        |  UNION ALL SELECT node, 0 FROM s3)
        |ORDER BY node""".stripMargin) { (s, d) =>
      kcorePeelOnEdges(
        commonNeighborPairs(s, d, maxDeg = 64)
          .filter(col("jaccard") >= 0.22).select("sa", "sb"),
        k = 3, rounds = 3)
        .orderBy("node")
    },

    // ------------------------------------------------------------------
    // Degree-distribution power-law fit: OLS of ln(count) on ln(degree)
    // over the degree HISTOGRAM — the "is this graph scale-free, and
    // how heavy is the hub tail?" diagnostic that decides whether the
    // per-key joins above need hub caps/salting before they're run at
    // 100 TB. SCALE SHAPE: degrees already exist on the shared edge
    // frame; the histogram is one distinct + one count aggregate, and
    // the regression runs on the DISTINCT-DEGREE frame (≤ max-degree
    // rows — tiny forever). DETERMINISM: each ln() is rounded 6dp
    // before the exact decimal sums (libm ulp), closed-form slope/
    // intercept as one double expression rounded 4; alpha = −slope.
    QueryDef.sql(
      "graph_degree_powerlaw",
      s"""WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM edges GROUP BY src),
        |hist AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS cnt
        |         FROM deg GROUP BY deg),
        |pts AS (
        |  SELECT round(ln(CAST(deg AS DOUBLE)), 6) AS lx,
        |    round(ln(CAST(cnt AS DOUBLE)), 6) AS ly
        |  FROM hist),
        |agg AS (${LogLogFit.aggSql("pts")})
        |SELECT m AS n_degrees,
        |  round(-(${LogLogFit.slopeSql}), 4) + 0 AS alpha,
        |  round((sy - (${LogLogFit.slopeSql}) * sx) / m, 4) + 0
        |    AS intercept
        |FROM agg""".stripMargin) { (s, d) =>
      val hist = edgesWithDeg(s, d)
        .select("src", "deg").distinct()
        .groupBy("deg").agg(count(lit(1)).as("cnt"))
      val pts = hist.select(
        round(log(col("deg").cast("double")), 6).as("lx"),
        round(log(col("cnt").cast("double")), 6).as("ly"))
      val agg = LogLogFit.fit(pts)
      agg.select(col("m").as("n_degrees"),
        (round(-LogLogFit.slope, 4) + 0).as("alpha"),
        (round((col("sy") - LogLogFit.slope * col("sx")) / col("m"), 4)
          + 0).as("intercept"))
    },

    // ------------------------------------------------------------------
    // Modularity of a community assignment (community = node mod 7 — a
    // deterministic stand-in for a partitioner's output): per community
    // Q_c = L_c/T − (D_c/T)², with T = total DIRECTED edge count (= 2m
    // on the doubled edge list), L_c = intra-community directed edges,
    // D_c = community degree mass. The quality score every graph-
    // partitioning / community job reports. DETERMINISM: both terms are
    // exact rationals over integers; each is independently half-up
    // e6-scaled (nonnegative, so Spark `div` truncation == DuckDB `//`
    // floor) and the contribution is their exact integer difference —
    // no float division anywhere. SCALE: two aggregates over the shared
    // edge frame (one filtered to intra edges), both map-side combined;
    // the 7-row community frame crosses a 1-row broadcast total.
    // Overflow bound: 2·D_c²·10⁶ must fit BIGINT — holds to T ≈ 2·10⁶
    // directed edges and fails loudly (ANSI) beyond, the engine-wide
    // convention for scaled-integer determinism.
    QueryDef.sql(
      "graph_modularity",
      """WITH pairs AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |edges AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs
        |          UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM edges),
        |bycomm AS (
        |  SELECT src % 7 AS community,
        |    CAST(COUNT(*) AS BIGINT) AS d_c,
        |    CAST(SUM(CASE WHEN src % 7 = dst % 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS l_c
        |  FROM edges GROUP BY 1)
        |SELECT community, l_c, d_c,
        |  CAST((2 * l_c * 1000000 + t.t) // (2 * t.t)
        |    - (2 * d_c * d_c * 1000000 + t.t * t.t) // (2 * t.t * t.t)
        |    AS BIGINT) AS q_e6
        |FROM bycomm, t ORDER BY community""".stripMargin) { (s, d) =>
      val edges = edgesWithDeg(s, d).select("src", "dst")
      val t = edges.agg(count(lit(1)).cast("bigint").as("t"))
      val bycomm = edges
        .groupBy((col("src") % 7).as("community"))
        .agg(count(lit(1)).cast("bigint").as("d_c"),
          sum(when(col("src") % 7 === col("dst") % 7, 1L).otherwise(0L))
            .cast("bigint").as("l_c"))
      bycomm.crossJoin(broadcast(t))
        .select(col("community"), col("l_c"), col("d_c"),
          (expr("(2 * l_c * 1000000 + t) div (2 * t)")
            - expr("(2 * d_c * d_c * 1000000 + t * t) div (2 * t * t)"))
            .cast("bigint").as("q_e6"))
        .orderBy("community")
    }
  )

  /** The thresholded supplier-similarity edge CTE shared by the oracle
    * texts (triangles / label propagation build the same `e` inline). */
  private val simEdgeSql =
    """pairs AS MATERIALIZED (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |cdeg AS MATERIALIZED (SELECT cust, COUNT(*) AS cdeg FROM pairs GROUP BY cust),
      |sdeg AS MATERIALIZED (SELECT supp, COUNT(*) AS sdeg FROM pairs GROUP BY supp),
      |small AS MATERIALIZED (
      |  SELECT p.cust, p.supp FROM pairs p
      |  JOIN cdeg USING (cust) WHERE cdeg <= 64),
      |common AS MATERIALIZED (
      |  SELECT a.supp AS sa, b.supp AS sb, COUNT(*) AS common
      |  FROM small a JOIN small b
      |    ON a.cust = b.cust AND a.supp < b.supp
      |  GROUP BY a.supp, b.supp),
      |e AS MATERIALIZED (
      |  SELECT sa, sb FROM common
      |  JOIN sdeg da ON common.sa = da.supp
      |  JOIN sdeg db ON common.sb = db.supp
      |  WHERE round(CAST(common AS DOUBLE)
      |    / (da.sdeg + db.sdeg - common), 4) >= 0.22)""".stripMargin

  /** `rounds` exactly-unrolled peeling rounds of k-core over an
    * undirected edge list (sa, sb). Returns (node, removed_round) with
    * 0 = survived every round. Each round restricts the symmetric edge
    * frame to current survivors (two node-keyed semi-join shapes),
    * recounts degrees map-side, and peels nodes under `k` — including
    * nodes that lost ALL neighbors (left join + coalesce 0). */
  def kcorePeelOnEdges(rawEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // LINEAGE TRUNCATION, not just caching: each round's frames are
    // multi-consumer (deg uses surv twice; peeled feeds the union AND
    // the next surv), so the logical plan nests multiplicatively per
    // round — and the upstream edge derivation (orders⋈lineitem,
    // deg-capped self-join) rides along in every copy. `persist` caches
    // runtime data but Catalyst still re-analyzes the full tree per
    // action (measured: 17 s driver time on an EMPTY edge set at
    // sf0.1). `localCheckpoint` (eager) cuts the plan to a LogicalRDD
    // leaf; each round is then one tiny job over node-cardinality
    // frames and the final plan is constant-size.
    val sym = rawEdges.select(explode(array(
        struct(col("sa").as("src"), col("sb").as("dst")),
        struct(col("sb").as("src"), col("sa").as("dst")))).as("ed"))
      .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
      .localCheckpoint()
    var surv = sym.select(col("src").as("node")).distinct().localCheckpoint()
    var removed: DataFrame = null
    for (i <- 1 to rounds) {
      val deg = sym
        .join(surv.hint("shuffle_hash"), sym("src") === surv("node"))
        .drop("node")
        .join(surv.select(col("node").as("dn")).hint("shuffle_hash"),
          col("dst") === col("dn"))
        .groupBy("src").agg(count(lit(1)).as("deg"))
      val peeled = surv.join(deg, surv("node") === deg("src"), "left")
        .filter(coalesce(col("deg"), lit(0L)) < k)
        .select(col("node"), lit(i).as("removed_round"))
        .localCheckpoint()
      removed =
        if (removed == null) peeled else removed.unionByName(peeled)
      surv = surv.join(peeled.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
    }
    surv.withColumn("removed_round", lit(0)).unionByName(removed)
  }

  private val HitsScale = 1000000L

  /** 2×`rounds` half-steps of HITS over the bipartite (cust, supp) edge
    * frame; returns the top-10 hubs and authorities as
    * (kind, node, score). See the graph_hits QueryDef for the scale
    * design. */
  def hits(s: SparkSession, d: String, rounds: Int): DataFrame =
    hitsOnEdges(tradeBipartite(s, d), rounds)

  /** HITS over any bipartite (cust, supp) edge frame. */
  def hitsOnEdges(edges: DataFrame, rounds: Int): DataFrame = {
    // lineage truncation per half-round: hRaw/aRaw each feed BOTH the
    // L1-normalizer aggregate and the rescale join, so without a
    // checkpoint the logical plan (with the orders⋈lineitem edge
    // derivation inside) nests ~2× per half-round and Catalyst
    // re-analysis dominates (measured 12.9 s at sf0.1 → ~3 s). The
    // score frames are node-cardinality — checkpointing them is cheap.
    var auth = edges.select(col("supp").as("node")).distinct()
      .withColumn("a", lit(HitsScale))
      .localCheckpoint()
    var hubs: DataFrame = null
    for (_ <- 1 to rounds) {
      val hRaw = edges.join(auth.hint("shuffle_hash"),
          edges("supp") === auth("node"))
        .groupBy(col("cust")).agg(sum("a").as("h"))
        .localCheckpoint()
      val hTot = hRaw.agg(sum("h").as("t"))
      hubs = hRaw.crossJoin(broadcast(hTot))
        .select(col("cust").as("node"),
          expr(s"(h * $HitsScale) div t").as("h"))
      val aRaw = edges.join(hubs.hint("shuffle_hash"),
          edges("cust") === hubs("node"))
        .groupBy(col("supp")).agg(sum("h").as("a"))
        .localCheckpoint()
      val aTot = aRaw.agg(sum("a").as("t"))
      auth = aRaw.crossJoin(broadcast(aTot))
        .select(col("supp").as("node"),
          expr(s"(a * $HitsScale) div t").as("a"))
    }
    val topAuth = auth.orderBy(desc("a"), col("node")).limit(10)
      .select(lit("auth").as("kind"), col("node"), col("a").as("score"))
    val topHubs = hubs.orderBy(desc("h"), col("node")).limit(10)
      .select(lit("hub").as("kind"), col("node"), col("h").as("score"))
    topAuth.unionByName(topHubs).orderBy(col("kind"), desc("score"),
      col("node"))
  }

  /** Synchronous min-label propagation over an undirected edge list
    * (sa, sb), `rounds` exactly-unrolled rounds. Returns (node, lbl).
    * Deterministic for any join order (labels are exact integers, min is
    * associative/commutative); each round is one dst-keyed shuffle join
    * plus a map-side-combined min aggregate. */
  def labelPropagationOnEdges(rawEdges: DataFrame, rounds: Int): DataFrame = {
    // both edge directions from ONE pass (explode, not union-of-selects
    // — a union would re-execute the upstream pipeline per branch)
    val sym = CacheRegistry.register(
      rawEdges.select(explode(array(
          struct(col("sa").as("src"), col("sb").as("dst")),
          struct(col("sb").as("src"), col("sa").as("dst")))).as("ed"))
        .select(col("ed.src").as("src"), col("ed.dst").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      val neigh = sym.join(labels.hint("shuffle_hash"),
          sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min("lbl").as("nl"))
      labels = labels.join(neigh.hint("shuffle_hash"),
          labels("node") === neigh("src"))
        .select(col("node"), least(col("lbl"), col("nl")).as("lbl"))
    }
    labels
  }
}
