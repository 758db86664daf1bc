package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

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
}
