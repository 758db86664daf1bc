package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the spatial_dbscan closure pipeline: times and sizes
  * each intermediate frame (pairs, core, cedges, contraction rounds). */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // replicate the dbscan plumbing (keep in sync with SpatialOps)
    val eps2 = 40000L * 40000L
    val cell = "concat(cast((lat_e4 + %s * 40000) div 40000 as string), ':', " +
      "cast((lon_e4 + %s * 40000) div 40000 as string))"
    val pts = graft.operators.SpatialOps.pointsPublic(spark, sfDir)
    val cand = pts.select(col("id").as("nid"), col("lat_e4").as("nlat"),
      col("lon_e4").as("nlon"),
      expr(graft.operators.SpatialOps.cellSqlPublic("lat_e4", "lon_e4"))
        .as("ncell"))
    val pairs = graft.CacheRegistry.ensurePersisted(pts
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("pcell", expr(graft.operators.SpatialOps
        .cellSqlPublic("lat_e4", "lon_e4", "dy", "dx")))
      .join(cand, col("pcell") === col("ncell") && col("id") =!= col("nid"))
      .withColumn("dist2", expr(
        "(lat_e4 - nlat) * (lat_e4 - nlat) + (lon_e4 - nlon) * (lon_e4 - nlon)"))
      .filter(col("dist2") <= eps2)
      .select("id", "nid"))
    timed("pairs.count")(println("  pairs=" + pairs.count()))
    val core = graft.CacheRegistry.ensurePersisted(
      pairs.groupBy("id").agg(count(lit(1)).as("n"))
        .filter(col("n") + 1 >= 3).select("id"))
    timed("core.count")(println("  core=" + core.count()))
    val cedges = graft.CacheRegistry.ensurePersisted(pairs
      .join(core, Seq("id"), "left_semi")
      .join(core.withColumnRenamed("id", "nid"), Seq("nid"), "left_semi"))
    timed("cedges.count")(println("  cedges=" + cedges.count()))
    val (rep1, e1raw) = graft.operators.Dedup.starContract(cedges, "id", "nid")
    timed("rep1.count")(println("  rep1=" + rep1.count() +
      " distinct reps=" + rep1.select("rep").distinct().count()))
    val e1 = graft.CacheRegistry.ensurePersisted(e1raw)
    timed("e1.count")(println("  e1=" + e1.count() +
      " e1 distinct=" + e1.distinct().count()))
    val (rep2, e2raw) = graft.operators.Dedup.starContract(e1, "id", "nid")
    val e2 = graft.CacheRegistry.ensurePersisted(e2raw)
    timed("e2.count")(println("  e2=" + e2.count() +
      " e2 distinct=" + e2.distinct().count()))
    val cc = timed("closure.auto")(
      graft.operators.Dedup.connectedComponentsAuto(cedges, "id", "nid"))
    timed("cc.count")(println("  cc=" + cc.count() +
      " clusters=" + cc.select("cluster_id").distinct().count()))
    graft.CacheRegistry.releaseAll()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("spatial_dbscan")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"PROBE full spatial_dbscan ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    graft.CacheRegistry.releaseAll()
    graft.CacheRegistry.releaseShared()
    spark.stop()
    sys.exit(0)
  }
}
