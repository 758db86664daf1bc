package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Bench, Tables}
import graft.operators.Dedup

/** Scratch profiling main for the minhash pipeline (not part of the
  * library surface; used to attribute bench time to stages). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables.documents(spark, sf)
    // warm input cache
    docs.count()

    time("full pipeline (cold)") {
      Dedup.minhashPairs(docs, "doc_id", "text").count()
    }
    time("full pipeline (warm)") {
      Dedup.minhashPairs(docs, "doc_id", "text").count()
    }
    time("noop write + orderBy (bench shape)") {
      Dedup.minhashPairs(docs, "doc_id", "text").orderBy("doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    time("noop write, no orderBy") {
      Dedup.minhashPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    val par = spark.sparkContext.defaultParallelism
    val withSig = docs.repartition(par)
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", Dedup.minhashSignature(spark, col("sh"), 64))
    time("shingle+sig only") { withSig.count() }
    time("shingle only") {
      docs.repartition(par)
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
        .count()
    }
    val persisted = withSig.persist()
    time("persist sig") { persisted.count() }
    // same fused band kernel as the production pipeline
    val bandsDf = persisted
      .select(col("doc_id"), posexplode(graft.functions.GraftFunctions
        .lshBands(col("sig"), 16, 4)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bh")
    time("bands + window guard") {
      bandsDf.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band", "bh")))
        .filter(col("bucket_n") <= 1000).count()
    }
    graft.operators.ConnectorQueries.stopAll()
    spark.stop()
    sys.exit(0)
  }
}
