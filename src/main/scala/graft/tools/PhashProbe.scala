package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage bisect for mm_phash_dedup (not part of any gate):
  * replicates the query's frames and times each leg's materialization
  * so a regression points at a stage instead of the whole query. */
object PhashProbe {
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASHPROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docsW = time("docsW") {
      val f = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), substring(col("text"), 1, 256).as("w"))
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("kind"),
          col("w"))
        .select(col("doc_id"), col("kind"),
          when(col("kind") === 1, expr(
            "transform(sequence(1, 256), i -> (ascii(substring(w, i, 1)) div 4) * 4)"))
            .otherwise(expr(
              "transform(sequence(1, 256), i -> ascii(substring(w, i, 1)))"))
            .as("pv"))
        .persist()
      f.count(); f
    }
    def pxSql(i: String): String =
      s"CASE WHEN kind = 1 THEN (ascii(substring(w, ($i) + 1, 1)) div 4) * 4" +
        s" ELSE ascii(substring(w, ($i) + 1, 1)) END"
    val dctK: Seq[(Int, Int, Long)] =
      for { u <- 0 until 8; r <- 0 until 16 }
        yield (u, r,
          math.round(1000.0 * math.cos(math.Pi * (2 * r + 1) * u / 32.0)))
    val kByU = dctK.groupBy(_._1)
      .map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3).toArray }
    val rCols = (0 until 8).map { u =>
      expr((0 until 16).map { r =>
        s"(${kByU(u)(r)}) * CAST(pv[16 * $r + c] AS BIGINT)"
      }.mkString(" + ")).as(s"r_$u")
    }
    val rstage = time("rstage_full") {
      val f = docsW
        .select(col("doc_id") +: col("kind") +: col("pv") +:
          explode(sequence(lit(0), lit(15))).as("c") +: Seq.empty: _*)
        .select(Seq(col("doc_id"), col("kind"), col("c")) ++ rCols: _*)
        .persist()
      println("  rsum=" + f.agg(sum("r_0"), sum("r_7")).collect()(0)); f
    }
    val dAggs = for (u <- 0 until 8; v <- 0 until 8) yield
      sum(col(s"r_$u") *
        element_at(lit(kByU(v)), col("c").cast("int") + 1))
        .cast("bigint").as(s"d_${u}_$v")
    def packBits(range: Range, base: Int) = range.map { idx =>
      when(col(s"d_${idx / 8}_${idx % 8}") > 0, 1L << (idx - base))
        .otherwise(0L)
    }.reduce(_ + _)
    val fp = time("fp") {
      val f = rstage.groupBy("doc_id", "kind")
        .agg(dAggs.head, dAggs.tail: _*)
        .select(col("doc_id"), col("kind"),
          packBits(0 until 32, 0).cast("bigint").as("fp_lo"),
          packBits(32 until 64, 32).cast("bigint").as("fp_hi"))
        .persist()
      f.count(); f
    }
    val ch = fp
      .select((col("doc_id") * 2 + col("kind")).as("mid"),
        col("fp_lo"), col("fp_hi"),
        explode(sequence(lit(0), lit(5))).as("ci"))
      .withColumn("cv", expr(
        """CASE ci WHEN 0 THEN fp_lo & 2047
          |        WHEN 1 THEN shiftright(fp_lo, 11) & 2047
          |        WHEN 2 THEN shiftright(fp_lo, 22) & 1023
          |        WHEN 3 THEN fp_hi & 2047
          |        WHEN 4 THEN shiftright(fp_hi, 11) & 2047
          |        ELSE shiftright(fp_hi, 22) & 1023 END""".stripMargin))
    val bucketok = ch.groupBy("ci", "cv")
      .agg(count(lit(1)).as("bs")).filter(col("bs") <= 64)
      .select("ci", "cv")
    val hp = time("hp") {
      val f = ch.join(bucketok, Seq("ci", "cv"))
        .select(col("ci"), col("cv"), col("mid").as("ma"),
          col("fp_lo").as("lo_a"), col("fp_hi").as("hi_a"))
        .join(ch.select(col("ci"), col("cv"), col("mid").as("mb"),
          col("fp_lo").as("lo_b"), col("fp_hi").as("hi_b")),
          Seq("ci", "cv"))
        .filter(col("ma") < col("mb"))
        .select("ma", "mb", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct()
        .filter(bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) <= 5)
        .select("ma", "mb").persist()
      println("  pairs=" + f.count()); f
    }
    val pat = docsW
      .select(col("doc_id"), col("kind"),
        explode(sequence(lit(0), lit(3))).as("pi"), col("pv"))
      .select(col("doc_id"), col("kind"),
        md5(expr("array_join(transform(slice(pv, pi * 64 + 1, 64), x -> CAST(x AS STRING)), '-')")).as("ph"))
    val shp = pat.groupBy("doc_id", "ph")
      .agg(max(when(col("kind") === 0, 1).otherwise(0)).as("h0"),
        max(when(col("kind") === 1, 1).otherwise(0)).as("h1"))
      .filter(col("h0") === 1 && col("h1") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("shared_patches"))
    time("shp_count")(println("  rows=" + shp.count()))
    spark.stop()
    sys.exit(0)
  }
}
