package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Planner-side statistics and dependency audits — the queries a data
  * platform runs BEFORE committing to a physical plan or a schema
  * contract at 100 TB: predicting a join's output cardinality and skew
  * from per-key histograms (without executing the join), and checking
  * which functional dependencies actually hold in the data.
  */
object PlannerStats {

  def defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Join-size estimation from per-key histograms: for the self-join
    // lineitem ⋈ lineitem ON l_partkey, the exact output cardinality is
    // Σ_k c(k)² — computable from ONE aggregate over the key histogram,
    // never by running the join. This is the salting/skew-join decision
    // input: skew_ratio = the heaviest key's share of the join output
    // × number of keys (1.0 = perfectly uniform). SCALE: the histogram
    // is a map-side-combined count; Σc² overflows BIGINT at corpus
    // scale, so it is carried in two exact BIGINT lanes (base 10⁹:
    // per-key hi=c² div 10⁹ / lo=c² mod 10⁹, one carry at the end —
    // exact for c ≤ 3·10⁹ per key and Σc² < 9.2·10²⁷, and both engines
    // fail loudly past that instead of silently wrapping). Raw
    // DECIMAL(38,0) output is hash-unstable across readers, hence the
    // split. The top key rides a TakeOrdered(1); the summary is 1 row.
    QueryDef.sql(
      "q_join_size_estimate",
      s"""WITH c AS (
        |  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |top AS (SELECT k, c FROM c ORDER BY c DESC, k LIMIT 1),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(SUM((c * c) // 1000000000) AS BIGINT) AS shi,
        |    CAST(SUM((c * c) % 1000000000) AS BIGINT) AS slo
        |  FROM c)
        |SELECT n_keys, n_rows,
        |  CAST(shi + slo // 1000000000 AS BIGINT) AS join_rows_hi,
        |  CAST(slo % 1000000000 AS BIGINT) AS join_rows_lo,
        |  t.k AS top_key, t.c AS top_key_rows,
        |  CAST(CAST(floor(CAST(t.c AS DOUBLE) * CAST(t.c AS DOUBLE)
        |    * CAST(n_keys AS DOUBLE)
        |    / (CAST(shi AS DOUBLE) * 1e9 + CAST(slo AS DOUBLE))
        |    * 10000 + 0.5) AS BIGINT) AS DOUBLE) / 10000 AS skew_ratio
        |FROM agg, top t""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d).groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val cP = graft.CacheRegistry.ensurePersisted(c)
      val top = cP.orderBy(desc("c"), col("k")).limit(1)
        .select(col("k").as("top_key"), col("c").as("top_key_rows"))
      val agg = cP.agg(
        count(lit(1)).cast("bigint").as("n_keys"),
        sum(col("c")).cast("bigint").as("n_rows"),
        sum(expr("(c * c) div 1000000000")).cast("bigint").as("shi"),
        sum(expr("(c * c) % 1000000000")).cast("bigint").as("slo"))
      // The skew RATIO leaves the lane domain through DOUBLE: the
      // earlier hi-lane-only form was mathematically wrong in mixed
      // distributions (every key with c² < 10⁹ contributed 0 to the
      // denominator `shi` while its full mass sat in slo, overstating
      // the ratio by orders of magnitude — r11 ADVICE). Here both lanes
      // recombine as shi·10⁹ + slo in double space: int64→double casts
      // are exactly-rounded IEEE conversions in both engines, ·/+// are
      // IEEE-deterministic, so the quotient is bit-identical across
      // engines with ~1e-16 relative error (vs. the old form's up-to-
      // orders-of-magnitude). Rounding is floor(x·10⁴ + 0.5) — half-up
      // at 4dp without either engine's round(double, n) (which differ by
      // an ulp on ties). Loud-failure bound: the lane c² multiply raises
      // (not wraps) past c > 3.03·10⁹ in BOTH engines — DuckDB natively,
      // Spark because Spark 4 runs ANSI mode by DEFAULT
      // (spark.sql.ansi.enabled=true; verified: 4e9L*4e9L throws
      // ARITHMETIC_OVERFLOW on this build) and no session in this repo
      // disables it. The skew numerator itself multiplies in DOUBLE
      // (exact int64→double conversion, IEEE product) in both engines,
      // so it is overflow-free independent of any ANSI setting.
      agg.crossJoin(broadcast(top))
        .select(col("n_keys"), col("n_rows"),
          expr("CAST(shi + slo div 1000000000 AS BIGINT)")
            .as("join_rows_hi"),
          expr("CAST(slo % 1000000000 AS BIGINT)").as("join_rows_lo"),
          col("top_key"), col("top_key_rows"),
          expr("CAST(CAST(floor(" +
              "CAST(top_key_rows AS DOUBLE) * " +
              "CAST(top_key_rows AS DOUBLE) * " +
              "CAST(n_keys AS DOUBLE) / " +
              "(CAST(shi AS DOUBLE) * 1e9 + CAST(slo AS DOUBLE)) * " +
              "10000 + 0.5) AS BIGINT) AS DOUBLE) / 10000")
            .as("skew_ratio"))
    },

    // ------------------------------------------------------------------
    // Functional-dependency audit: does X actually determine Y? For
    // each candidate FD, count the X-groups where Y is not unique —
    // the schema-contract check (a "key" that silently stopped being a
    // key is how duplicate training examples sneak into a corpus).
    // Mixes known-good (primary keys) and known-violated candidates so
    // both paths are exercised. SCALE: each candidate is one two-stage
    // (X, Y)-distinct + X-group aggregate; the result is 4 rows.
    QueryDef.sql(
      "q_fd_audit", {
        def fd(table: String, x: String, y: String) =
          s"""SELECT tbl, lhs, rhs, n_groups, n_violating,
             |  ${TextAnalysis.halfUp4Sql("n_violating", "n_groups")}
             |    AS violation_rate
             |FROM (
             |  SELECT '$table' AS tbl, '$x' AS lhs, '$y' AS rhs,
             |    CAST(COUNT(*) AS BIGINT) AS n_groups,
             |    CAST(SUM(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_violating
             |  FROM (SELECT $x, CAST(COUNT(DISTINCT $y) AS BIGINT) AS dy
             |        FROM $table GROUP BY $x))""".stripMargin
        Seq(
          fd("orders", "o_orderkey", "o_orderdate"),
          fd("orders", "o_custkey", "o_orderpriority"),
          fd("lineitem", "l_orderkey", "l_returnflag"),
          fd("lineitem", "l_partkey", "l_suppkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, lhs, rhs")
      }) { (s, d) =>
      def fd(df: org.apache.spark.sql.DataFrame, table: String,
          x: String, y: String) =
        df.groupBy(col(x)).agg(countDistinct(col(y)).as("dy"))
          .agg(count(lit(1)).cast("bigint").as("n_groups"),
            sum(when(col("dy") > 1, 1L).otherwise(0L)).cast("bigint")
              .as("n_violating"))
          .select(lit(table).as("tbl"), lit(x).as("lhs"), lit(y).as("rhs"),
            col("n_groups"), col("n_violating"),
            TextAnalysis.halfUp4("n_violating", "n_groups")
              .as("violation_rate"))
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      fd(o, "orders", "o_orderkey", "o_orderdate")
        .unionByName(fd(o, "orders", "o_custkey", "o_orderpriority"))
        .unionByName(fd(l, "lineitem", "l_orderkey", "l_returnflag"))
        .unionByName(fd(l, "lineitem", "l_partkey", "l_suppkey"))
        .orderBy("tbl", "lhs", "rhs")
    },

    // ------------------------------------------------------------------
    // Zone-map (min/max data-skipping) effectiveness audit: shard the
    // fact table into synthetic files (orderkey div 1000 ≈ ingest-order
    // file boundaries), build per-shard min/max zone maps on the ship
    // date, and measure what a 1995 date-range predicate could prune —
    // plus the false-positive shards (zone map overlaps the range but no
    // row matches) that decide whether finer-grained stats pay for
    // themselves. The layout-vs-skipping feedback loop every 100 TB
    // table lives by. SCALE: ONE map-side-combined aggregate over the
    // fact table builds the zone maps (shards × 4 numbers); the summary
    // reduces the shard frame to one row.
    QueryDef.sql(
      "q_zonemap_prune", {
        val lo = "TIMESTAMP '1995-01-01 00:00:00'"
        val hi = "TIMESTAMP '1995-12-31 23:59:59'"
        s"""WITH z AS (
          |  SELECT l_orderkey // 1000 AS shard,
          |    MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx,
          |    CAST(COUNT(*) AS BIGINT) AS n_rows,
          |    CAST(SUM(CASE WHEN l_shipdate >= $lo AND l_shipdate <= $hi
          |      THEN 1 ELSE 0 END) AS BIGINT) AS n_match
          |  FROM lineitem GROUP BY 1)
          |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
          |  CAST(SUM(CASE WHEN mx < $lo OR mn > $hi THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_pruned,
          |  CAST(SUM(CASE WHEN NOT (mx < $lo OR mn > $hi) THEN 1 ELSE 0
          |    END) AS BIGINT) AS n_candidates,
          |  CAST(SUM(CASE WHEN NOT (mx < $lo OR mn > $hi) AND n_match = 0
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
          |  CAST(SUM(CASE WHEN NOT (mx < $lo OR mn > $hi) THEN n_rows
          |    ELSE 0 END) AS BIGINT) AS rows_scanned,
          |  CAST(SUM(n_match) AS BIGINT) AS rows_matching,
          |  ${TextAnalysis.halfUp4Sql(
             s"SUM(CASE WHEN mx < $lo OR mn > $hi THEN 1 ELSE 0 END)",
             "COUNT(*)")} AS prune_rate
          |FROM z""".stripMargin
      }) { (s, d) =>
      val lo = lit("1995-01-01 00:00:00").cast("timestamp")
      val hi = lit("1995-12-31 23:59:59").cast("timestamp")
      val z = Tables.lineitem(s, d)
        .groupBy(expr("l_orderkey div 1000").as("shard"))
        .agg(min("l_shipdate").as("mn"), max("l_shipdate").as("mx"),
          count(lit(1)).cast("bigint").as("n_rows"),
          sum(when(col("l_shipdate") >= lo && col("l_shipdate") <= hi, 1L)
            .otherwise(0L)).cast("bigint").as("n_match"))
      val pruned = col("mx") < lo || col("mn") > hi
      z.agg(count(lit(1)).cast("bigint").as("n_shards"),
        sum(when(pruned, 1L).otherwise(0L)).cast("bigint").as("n_pruned"),
        sum(when(!pruned, 1L).otherwise(0L)).cast("bigint")
          .as("n_candidates"),
        sum(when(!pruned && col("n_match") === 0, 1L).otherwise(0L))
          .cast("bigint").as("n_false_positive"),
        sum(when(!pruned, col("n_rows")).otherwise(0L)).cast("bigint")
          .as("rows_scanned"),
        sum("n_match").cast("bigint").as("rows_matching"),
        TextAnalysis.halfUp4(
          "SUM(CASE WHEN mx < TIMESTAMP '1995-01-01 00:00:00' " +
            "OR mn > TIMESTAMP '1995-12-31 23:59:59' THEN 1 ELSE 0 END)",
          "COUNT(*)").as("prune_rate"))
    },

    // ------------------------------------------------------------------
    // Equi-depth histogram (the planner's selectivity backbone): 8
    // buckets of equal row count over l_extendedprice, boundaries from a
    // GLOBAL rank — computed with the range-repartition GlobalRank
    // recipe, never a single-partition sort. Bucket stats (bounds in
    // exact cents, row count, NDV) are what a cost model consumes.
    // SCALE: rank via range repartition + broadcast offsets; the bucket
    // aggregate is one map-side-combined pass; output is 8 rows.
    QueryDef.sql(
      "q_equidepth_histogram",
      """WITH r AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS cents,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) - 1 AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM lineitem)
        |SELECT CAST(rk * 8 // n AS BIGINT) AS bucket,
        |  CAST(MIN(cents) AS BIGINT) AS lo_cents,
        |  CAST(MAX(cents) AS BIGINT) AS hi_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT cents) AS BIGINT) AS n_distinct
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast("decimal(18,2)")
            .multiply(lit(100)).cast("bigint").as("cents"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = GlobalRank.withRank(base,
        Seq(col("cents"), col("l_orderkey"), col("l_linenumber")))
      val n = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .groupBy(expr("rk * 8 div n").cast("bigint").as("bucket"))
        .agg(min("cents").cast("bigint").as("lo_cents"),
          max("cents").cast("bigint").as("hi_cents"),
          count(lit(1)).cast("bigint").as("n_rows"),
          countDistinct("cents").cast("bigint").as("n_distinct"))
        .orderBy("bucket")
    },

    // ------------------------------------------------------------------
    // Sampling-based statistics extrapolation: estimate full-table count
    // and revenue from a deterministic ~3.9 % hash sample (md5 prefix <
    // '0a' ⇔ 10/256), the block-sample path a planner takes when exact
    // stats are stale. The exact pass runs NEXT TO the estimate so the
    // gate certifies estimator accuracy (ratios in exact integer halfUp4
    // — estimate·256/10 vs truth cross-multiplied, no float division).
    // SCALE: the sample predicate is a codegen'd projection; both
    // aggregates are single map-side-combined passes; output is 1 row.
    QueryDef.sql(
      "q_sample_extrapolation",
      """WITH l AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS cents,
        |    CAST(substring(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
        |      CAST(l_linenumber AS VARCHAR)), 1, 2) < '0a' AS INTEGER)
        |      AS in_sample
        |  FROM lineitem),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |    CAST(SUM(cents) AS BIGINT) AS sum_exact_cents,
        |    CAST(SUM(in_sample) AS BIGINT) AS n_sample,
        |    CAST(SUM(CASE WHEN in_sample = 1 THEN cents ELSE 0 END)
        |      AS BIGINT) AS sum_sample_cents
        |  FROM l)
        |SELECT n_sample, n_exact,
        |  CAST(n_sample * 256 // 10 AS BIGINT) AS n_est,
        |  CAST(sum_sample_cents * 256 // 10 AS BIGINT) AS sum_est_cents,
        |  CAST(sum_exact_cents AS BIGINT) AS sum_exact_cents,
        |  CAST((2 * n_sample * 128 * 10000 + n_exact * 5)
        |    // (2 * n_exact * 5) AS DOUBLE) / 10000 AS n_ratio,
        |  CAST((2 * sum_sample_cents * 128 * 10000 + sum_exact_cents * 5)
        |    // (2 * sum_exact_cents * 5) AS DOUBLE) / 10000 AS sum_ratio
        |FROM a""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d).select(
        col("l_extendedprice").cast("decimal(18,2)").multiply(lit(100))
          .cast("bigint").as("cents"),
        (substring(md5(concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))), 1, 2) < "0a")
          .cast("int").as("in_sample"))
      l.agg(count(lit(1)).cast("bigint").as("n_exact"),
          sum("cents").cast("bigint").as("sum_exact_cents"),
          sum("in_sample").cast("bigint").as("n_sample"),
          sum(when(col("in_sample") === 1, col("cents")).otherwise(0L))
            .cast("bigint").as("sum_sample_cents"))
        .select(col("n_sample"), col("n_exact"),
          expr("CAST(n_sample * 256 div 10 AS BIGINT)").as("n_est"),
          expr("CAST(sum_sample_cents * 256 div 10 AS BIGINT)")
            .as("sum_est_cents"),
          col("sum_exact_cents"),
          TextAnalysis.halfUp4("n_sample * 128", "n_exact * 5")
            .as("n_ratio"),
          TextAnalysis.halfUp4("sum_sample_cents * 128",
            "sum_exact_cents * 5").as("sum_ratio"))
    })
}
