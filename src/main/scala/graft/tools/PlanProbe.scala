package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Scratch: print the formatted plan + timing for one named query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_sql_revenue_topk")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sf)
    df.explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0)
  }
}
