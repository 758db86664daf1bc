package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Parity pin for the fused integer-DCT pHash kernel [[PhashDct]]
  * (graft_phash_dct): the kernel's (doc_id, kind, fp_lo, fp_hi) output
  * must equal the spelled-out row-pass-explode + 64-column-aggregate
  * formulation it replaced (the formulation the DuckDB oracle still
  * carries). The spelled-out stack is reproduced here verbatim as the
  * in-Spark ground truth. */
class PhashKernelSpec extends SparkTestBase {

  /** The mm_phash_dedup pixel frame: one 256-entry codepoint array per
    * (doc, kind), kind 1 requantized, zero-padded past the text end. */
  private def pixelFrame(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"), substring(col("text"), 1, 256).as("w"))
    .select(col("doc_id"),
      explode(array(lit(0), lit(1))).as("kind"), col("w"))
    .select(col("doc_id"), col("kind"),
      when(col("kind") === 1, expr(
        "transform(sequence(1, 256)," +
          " i -> (ascii(substring(w, i, 1)) div 4) * 4)"))
        .otherwise(expr(
          "transform(sequence(1, 256), i -> ascii(substring(w, i, 1)))"))
        .as("pv"))

  /** The pre-r15.2 spelled-out formulation: 16 row-pass rows per media
    * through a 64-column map-side-combined aggregate, then sign-bit
    * packing. */
  private def spelledOut(docs: org.apache.spark.sql.DataFrame) = {
    def k(u: Int)(r: Int): Long = PhashDct.K(u * 16 + r)
    val rCols = (0 until 8).map { u =>
      expr((0 until 16).map { r =>
        s"(${k(u)(r)}) * CAST(pv[16 * $r + c] AS BIGINT)"
      }.mkString(" + ")).as(s"r_$u")
    }
    val rstage = pixelFrame(docs)
      .select(col("doc_id") +: col("kind") +: col("pv") +:
        explode(sequence(lit(0), lit(15))).as("c") +: Seq.empty: _*)
      .select(Seq(col("doc_id"), col("kind"), col("c")) ++ rCols: _*)
    val kvArr = (0 until 8).map(v => (0 until 16).map(k(v)).toArray)
    val dAggs = for (u <- 0 until 8; v <- 0 until 8) yield
      sum(col(s"r_$u") *
        element_at(lit(kvArr(v)), col("c").cast("int") + 1))
        .cast("bigint").as(s"d_${u}_$v")
    def packBits(range: Range, base: Int) = range.map { idx =>
      when(col(s"d_${idx / 8}_${idx % 8}") > 0, 1L << (idx - base))
        .otherwise(0L)
    }.reduce(_ + _)
    rstage.groupBy("doc_id", "kind")
      .agg(dAggs.head, dAggs.tail: _*)
      .select(col("doc_id"), col("kind"),
        packBits(0 until 32, 0).cast("bigint").as("fp_lo"),
        packBits(32 until 64, 32).cast("bigint").as("fp_hi"))
  }

  private def fused(docs: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    pixelFrame(docs)
      .select(col("doc_id"), col("kind"),
        GraftFunctions.phashDct(col("pv")).as("f"))
      .select(col("doc_id"), col("kind"),
        col("f.fp_lo").as("fp_lo"), col("f.fp_hi").as("fp_hi"))
  }

  test("fused DCT kernel == spelled-out aggregate formulation") {
    val docs = Tables.documents(spark, sf0001)
    val a = fused(docs)
    val b = spelledOut(docs)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("kernel edge cases: constant, zero, max-codepoint pixels") {
    GraftFunctions.register(spark)
    val rows = Seq(
      Array.fill(256)(0),            // all-silence: every D = 0, no bits
      Array.fill(256)(97),           // constant: only DC mass, D(0,0) > 0
      Array.fill(256)(0x10FFFF),     // max codepoint: BIGINT headroom
      Array.tabulate(256)(i => if ((i / 16 + i % 16) % 2 == 0) 200 else 0))
      .zipWithIndex.map { case (pv, i) =>
        org.apache.spark.sql.Row(i.toLong, pv.toSeq)
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType))))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
      .select(col("doc_id"), GraftFunctions.phashDct(col("pv")).as("f"))
      .select(col("doc_id"), col("f.fp_lo"), col("f.fp_hi"))
      .orderBy("doc_id").collect()
    // all-zero pixels: no positive coefficient anywhere
    assert(df(0).getLong(1) == 0L && df(0).getLong(2) == 0L)
    // constant pixels: DC term (u=0, v=0 → bit 0) positive, AC terms
    // sum symmetric coefficients to ~0 (never positive for a constant)
    assert((df(1).getLong(1) & 1L) == 1L)
    // max codepoints: same bit pattern as any positive constant
    assert(df(2).getLong(1) == df(1).getLong(1) &&
      df(2).getLong(2) == df(1).getLong(2))
  }
}
