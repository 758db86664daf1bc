package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
// theta/kll sketch functions come from functions._ (Spark 4 DataSketches)

class SketchRollupSpec extends SparkTestBase {

  test("HLL union is associative: rollup of per-group sketches == one global sketch") {
    val li = Tables.lineitem(spark, sf0001)
    val viaRollup = li.groupBy("l_returnflag", "l_linestatus")
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
      .groupBy("l_returnflag").agg(hll_union_agg(col("sk")).as("sk"))
      .groupBy().agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk")).as("est"))
      .head().getLong(0)
    val direct = li
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("l_partkey"), lit(14))).as("est"))
      .head().getLong(0)
    assert(viaRollup === direct,
      "two-level sketch merge must give the same estimate as one pass")
  }

  test("gate query certifies the estimate within 5% of exact at every grain") {
    val out = graft.SparkEntry.queries("q_hll_rollup")(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Int]("err_ok") == 1),
      out.map(r => s"${r.get(0)}:${r.get(1)}").mkString(", "))
    assert(out.map(_.getString(0)).contains("ALL"))
  }

  test("theta set algebra is consistent: inter + only_a + only_b == union") {
    val li = Tables.lineitem(spark, sf0001)
    val row = li.agg(
      theta_sketch_agg(
        when(col("l_returnflag") === "A", col("l_partkey")), 14).as("a"),
      theta_sketch_agg(
        when(col("l_returnflag") === "R", col("l_partkey")), 14).as("b"))
      .select(
        theta_sketch_estimate(theta_intersection(col("a"), col("b"))).as("i"),
        theta_sketch_estimate(theta_difference(col("a"), col("b"))).as("oa"),
        theta_sketch_estimate(theta_difference(col("b"), col("a"))).as("ob"),
        theta_sketch_estimate(theta_union(col("a"), col("b"))).as("u"))
      .head()
    val (i, oa, ob, u) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // at lgK=14 these small sets are stored exactly — identity is exact
    assert(i + oa + ob === u, s"i=$i oa=$oa ob=$ob u=$u")
    val gate = graft.SparkEntry.queries("q_theta_setops")(spark, sf0001).head()
    assert(gate.getAs[Int]("err_ok") === 1)
  }

  test("approx_top_k merge parity: combined partials == one-pass sketch") {
    val li = Tables.lineitem(spark, sf0001)
    def ranked(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .select(explode(expr("approx_top_k_estimate(sk, 16384)")).as("e"))
      .select(col("e.item").cast("long"), col("e.count"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .sortBy { case (item, n) => (-n, item) }
    val viaRollup = ranked(
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(expr("approx_top_k_accumulate(l_partkey, 16384)").as("sk"))
        .groupBy().agg(expr("approx_top_k_combine(sk, 16384)").as("sk")))
    val direct = ranked(
      li.agg(expr("approx_top_k_accumulate(l_partkey, 16384)").as("sk")))
    // tracked >= distinct parts at sf0.001 -> both paths hold EXACT
    // counts for every item, so the full ranked lists agree
    assert(viaRollup == direct)
    // and the counts really are exact
    val exact = li.groupBy("l_partkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaRollup.forall { case (item, n) => exact(item) == n })
  }

  test("KLL merge: per-group partials merged == one-pass sketch quantile") {
    val li = Tables.lineitem(spark, sf0001)
    val merged = li.groupBy("l_returnflag", "l_linestatus")
      .agg(kll_sketch_agg_double(col("l_extendedprice"), 800).as("sk"))
      .groupBy().agg(kll_merge_agg_double(col("sk")).as("sk"))
      .select(kll_sketch_get_quantile_double(col("sk"), lit(0.5)))
      .head().getDouble(0)
    val onePass = li
      .agg(kll_sketch_agg_double(col("l_extendedprice"), 800).as("sk"))
      .select(kll_sketch_get_quantile_double(col("sk"), lit(0.5)))
      .head().getDouble(0)
    // both sketches retain every value at this SF (n < k capacity) — but
    // merge order differs; the retained-item quantile must still agree
    // within the sketch's rank-error envelope
    assert(math.abs(merged - onePass) / onePass < 0.02,
      s"merged=$merged onePass=$onePass")
    val gate = graft.SparkEntry.queries("q_kll_rollup")(spark, sf0001).collect()
    assert(gate.nonEmpty && gate.forall(_.getAs[Int]("err_ok") == 1))
  }
}
