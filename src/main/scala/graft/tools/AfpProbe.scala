package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop stage bisect for mm_audio_fingerprint: times the decode→
  * symbol, hash, candidate-join, and verify stages separately so slow
  * rounds are attributed, not guessed (the PhashProbe convention).
  * Run: `runMain graft.tools.AfpProbe [sfDir]`. */
object AfpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"AFP $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    for (i <- 1 to 2) {
      println(s"--- pass $i")
      val fr = graft.operators.Multimodal.audioFingerprintFrames(spark, sfDir)
      // cumulative by construction (later frames reuse persisted earlier
      // ones), so per-stage cost = delta between lines
      t("pk")(fr("pk").count())
      t("ch")(fr("ch").count())
      t("pairs")(fr("pairs").count())
      t("best")(fr("best").count())
      t("fin")(fr("fin").count())
      t("out") {
        fr("out").write.format("noop").mode("overwrite").save(); 0L
      }
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
    sys.exit(0)
  }
}
