package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop multi-query timer: noop-sink executes each named gate query
  * `runs` times in ONE JVM under the bench session config and prints
  * per-run seconds (run 1 doubles as warmup — judge steady state from
  * runs 2+). Usage:
  *   runMain graft.tools.BatchTime <q1,q2,...> [runs]
  */
object BatchTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.operators.BucketedJoin.stageBucketed(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.operators.StreamingOps.stagedEventsDir(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.operators.ConnectorQueries.stage(spark, sfDir)
    catch { case _: Throwable => () }
    for (name <- names) {
      // match Bench's timed plan: raw operator variant when one exists
      val fn = graft.Bench.rawBench(name)
        .getOrElse(graft.SparkEntry.queries(name))
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.CacheRegistry.releaseAll()
        dt
      }
      println(f"BATCHTIME $name ${ts.map(t => f"$t%.2f").mkString(" ")} " +
        f"(min ${ts.drop(1).min}%.2f)")
    }
    graft.CacheRegistry.releaseShared()
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0)
  }
}
