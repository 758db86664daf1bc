package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Runs EVERY registered query (headline or not) at the given SF with a
  * noop sink — the scale-regression smoke for operators that the bench
  * subset doesn't time (clusters, contamination, ngram jaccard, ...).
  * Prints per-query seconds and a FAILED list; exits nonzero on any
  * failure. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allDefs.foreach { q =>
      val t0 = System.nanoTime()
      try {
        q.build(spark, sf).write.format("noop").mode("overwrite").save()
        println(f"SMOKE ${q.name}%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      } catch {
        case e: Throwable =>
          failed += q.name
          println(s"SMOKE ${q.name} FAILED: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      } finally graft.CacheRegistry.releaseAll()
    }
    println(if (failed.isEmpty) "SMOKE ALL OK"
      else s"SMOKE FAILED: ${failed.mkString(", ")}")
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(if (failed.isEmpty) 0 else 1)
  }
}
