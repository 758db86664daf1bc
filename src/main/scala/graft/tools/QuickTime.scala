package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query timer: `runMain graft.tools.QuickTime <name>
  * [sfDir] [runs]` — noop-sink executes one gate query N times and
  * prints per-run seconds (same session config as Bench). */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"QUICKTIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.CacheRegistry.releaseAll()
    }
    graft.CacheRegistry.releaseShared()
    spark.stop()
    sys.exit(0)
  }
}
