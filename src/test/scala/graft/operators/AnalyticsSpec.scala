package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Cross-checks the closed-form statistical queries (OLS trend, Welch
  * t-test, decayed LTV) against Spark's own float implementations of the
  * same statistics — the integer/decimal determinism refactor must not
  * change the math, only make it engine-portable. */
class AnalyticsSpec extends SparkTestBase {

  test("q_regression_trend matches regr_slope/regr_intercept") {
    val ours = graft.SparkEntry.queries("q_regression_trend")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // float reference: Spark's built-in OLS aggregates over the same
    // monthly frame
    val monthly = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        ((year(col("o_orderdate")) - 1995) * 12
          + month(col("o_orderdate")) - 1).as("x"))
      .agg(sum(col("o_totalprice")).as("y"))
    val ref = monthly.groupBy("nk")
      .agg(regr_slope(col("y"), col("x")).as("slope"),
        regr_intercept(col("y"), col("x")).as("icept"))
      .join(Tables.nation(spark, sf0001),
        col("nk") === col("n_nationkey"))
      .select("n_name", "slope", "icept")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == ref.keySet && ours.nonEmpty)
    ours.foreach { case (nation, (slope, icept)) =>
      val (rs, ri) = ref(nation)
      assert(math.abs(slope - rs) <= math.max(1e-3, math.abs(rs) * 1e-6),
        s"$nation slope $slope vs $rs")
      assert(math.abs(icept - ri) <= math.max(1e-3, math.abs(ri) * 1e-6),
        s"$nation intercept $icept vs $ri")
    }
  }

  test("q_ab_welch_ttest matches avg/var_samp-derived t and df") {
    val ours = graft.SparkEntry.queries("q_ab_welch_ttest")(spark, sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    val e = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("dow", dayofweek(col("ts")) - 1)
    def stats(t: String) = e.filter(col("event_type") === t)
      .groupBy("dow").agg(count(lit(1)).as("n"), avg("value").as("m"),
        var_samp(col("value")).as("v"))
    val ref = stats("click").as("a")
      .join(stats("purchase").as("b"), "dow")
      .collect().map { r =>
        val (na, ma, va) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
        val (nb, mb, vb) = (r.getLong(4), r.getDouble(5), r.getDouble(6))
        val se2 = va / na + vb / nb
        val t = (ma - mb) / math.sqrt(se2)
        val df = se2 * se2 /
          (va / na * (va / na) / (na - 1) + vb / nb * (vb / nb) / (nb - 1))
        r.getInt(0) -> (na, nb, t, df)
      }.toMap
    assert(ours.keySet == ref.keySet && ours.size == 7)
    ours.foreach { case (dow, (na, nb, t, df)) =>
      val (rna, rnb, rt, rdf) = ref(dow)
      assert(na == rna && nb == rnb)
      // value is cast to DECIMAL(18,2) in the query (cent-exact inputs);
      // the float reference uses raw doubles — allow the cast slack
      assert(math.abs(t - rt) < 1e-2, s"dow $dow t $t vs $rt")
      assert(math.abs(df - rdf) / rdf < 1e-2, s"dow $dow df $df vs $rdf")
    }
  }

  test("q_decay_ltv matches the float half-life weighting") {
    val ours = graft.SparkEntry.queries("q_decay_ltv")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
    val anchor = ev.agg(to_date(max("ts")).as("dmax"))
    val ref = ev.crossJoin(broadcast(anchor))
      .withColumn("wk",
        floor(datediff(col("dmax"), to_date(col("ts"))) / 7).cast("int"))
      .filter(col("wk") <= 20)
      .groupBy("user_id")
      .agg(sum(col("value") * pow(lit(0.5), col("wk"))).as("ltv"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == ref.keySet && ours.nonEmpty)
    ours.foreach { case (u, v) =>
      assert(math.abs(v - ref(u)) < 1e-2, s"user $u ltv $v vs ${ref(u)}")
    }
    // decayed LTV can never exceed the plain sum
    val plain = ev.groupBy("user_id")
      .agg(sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ours.foreach { case (u, v) => assert(v <= plain(u) + 1e-6) }
  }
}
