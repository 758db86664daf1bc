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
    // is a map-side-combined count; c² is taken in DECIMAL (c can reach
    // 10⁹ per key at corpus scale — c² overflows BIGINT); the top key
    // rides a TakeOrdered(1), the summary is one row.
    QueryDef.sql(
      "q_join_size_estimate",
      s"""WITH c AS (
        |  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |top AS (SELECT k, c FROM c ORDER BY c DESC, k LIMIT 1),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    SUM(CAST(c AS DECIMAL(38,0)) * c) AS join_rows,
        |    SUM(CAST(c AS DECIMAL(38,0))) AS n_rows
        |  FROM c)
        |SELECT n_keys, CAST(n_rows AS BIGINT) AS n_rows,
        |  join_rows,
        |  t.k AS top_key, t.c AS top_key_rows,
        |  ${TextAnalysis.halfUp4Sql("t.c * t.c * n_keys",
             "CAST(join_rows AS BIGINT)")} AS skew_ratio
        |FROM agg, top t""".stripMargin) { (s, d) =>
      val c = Tables.lineitem(s, d).groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val cP = graft.CacheRegistry.ensurePersisted(c)
      val top = cP.orderBy(desc("c"), col("k")).limit(1)
        .select(col("k").as("top_key"), col("c").as("top_key_rows"))
      val agg = cP.agg(
        count(lit(1)).cast("bigint").as("n_keys"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("join_rows"),
        sum(col("c").cast("decimal(38,0)")).as("n_rows"))
      // join_rows STAYS decimal on output: the sum of c^2 overflows
      // BIGINT at the corpus scale the header designs for, and the two
      // engines disagree on the overflowing cast (silent NULL vs error).
      // The skew ratio works in the BIGINT domain via halfUp4 (fails
      // loudly and identically if a pathological key ever pushes
      // 2*c^2*n_keys*10^4 past it).
      agg.crossJoin(broadcast(top))
        .select(col("n_keys"), col("n_rows").cast("bigint").as("n_rows"),
          col("join_rows"),
          col("top_key"), col("top_key_rows"),
          TextAnalysis.halfUp4("top_key_rows * top_key_rows * n_keys",
            "CAST(join_rows AS BIGINT)").as("skew_ratio"))
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
    })
}
