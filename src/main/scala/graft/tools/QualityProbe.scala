package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Dev probe: prints the RAW recall values behind the thresholded
  * `recall_ok` columns of sim_topk_ann / sim_topk_ivf / dedup_simhash /
  * dedup_embedding_cosine, per SF — the floors pinned in the query defs
  * must sit safely below these. Run:
  * `sbt "runMain graft.tools.QualityProbe"`. */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"== $sf")
      val emb = Tables.embeddings(spark, sf)
      val qs = emb.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(emb, qs, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recalls(approx: Set[(Long, Long)]): (Double, Double) = {
        val perQ = brute.groupBy(_._1).map { case (q, b) =>
          b.count(approx.contains).toDouble / b.size }
        (perQ.min, perQ.sum / perQ.size)
      }
      val ann = Similarity.annTopK(emb, qs, 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.ivfTopK(emb, qs, 5, numCells = 32, nprobe = 8)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (annMin, annMean) = recalls(ann)
      val (ivfMin, ivfMean) = recalls(ivf)
      println(f"ann  recall@5 min/mean = $annMin%.3f / $annMean%.3f")
      println(f"ivf  recall@5 min/mean = $ivfMin%.3f / $ivfMean%.3f")

      graft.functions.GraftFunctions.register(spark)
      val cosFound = Similarity.cosinePairs(emb, 0.3)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sample = broadcast(emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")))
      val cosTruth = emb
        .select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
        .join(sample, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(graft.functions.GraftFunctions.cosine(
            col("emb_a"), col("emb_b")), 4).as("cos"))
        .filter(col("cos") >= 0.3)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"cosine-pair sample recall = ${cosTruth.count(cosFound.contains).toDouble / cosTruth.size}%.3f (n_true=${cosTruth.size})")

      val docs = Tables.documents(spark, sf)
      val shFound = Dedup.simhashPairs(docs, "doc_id", "text", 3)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val shTruth = Dedup.minhashPairs(docs, "doc_id", "text", 0.8)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"simhash recall = ${shTruth.count(shFound.contains).toDouble / shTruth.size}%.3f (n_true=${shTruth.size})")
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
    sys.exit(0)
  }
}
