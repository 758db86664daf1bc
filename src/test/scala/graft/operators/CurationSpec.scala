package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** The composed curation pipeline must be consistent with its component
  * operators and monotone across stages. */
class CurationSpec extends SparkTestBase {

  test("q_curation_pipeline: monotone stages, splits partition the dedup set") {
    val rows = graft.SparkEntry.queries("q_curation_pipeline")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val raw = rows("0_raw"); val qf = rows("1_quality")
    val dd = rows("2_dedup")
    assert(raw._1 == Tables.documents(spark, sf0001).count())
    assert(qf._1 <= raw._1 && dd._1 <= qf._1)
    assert(qf._2 <= raw._2 && dd._2 <= qf._2)
    val splits = rows.filter(_._1.startsWith("3_")).values
    assert(splits.map(_._1).sum == dd._1, "splits must partition the corpus")
    assert(splits.map(_._2).sum == dd._2)
    // dedup stage really removed the duplicate texts that pass quality
    val qfDocs = Tables.documents(spark, sf0001)
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") >= 0.5)
    assert(dd._1 == qfDocs.select("text").distinct().count())
  }

  test("q_dataset_card matches direct corpus statistics") {
    val r = graft.SparkEntry.queries("q_dataset_card")(spark, sf0001)
      .collect().head
    val docs = Tables.documents(spark, sf0001)
    assert(r.getLong(0) == docs.count())
    assert(r.getLong(1) == docs.select("text").distinct().count())
    assert(r.getLong(4) == docs.select("source").distinct().count())
    assert(r.getLong(5) == docs.select("lang").distinct().count())
    assert(r.getLong(2) > r.getLong(0), "tokens exceed docs")
    assert(r.getLong(3) > r.getLong(2), "chars exceed tokens")
  }

  test("k-anonymity: risk is monotone in k and accounts every row") {
    val rows = graft.SparkEntry.queries("q_k_anonymity")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    assert(rows.map(_._1).toSeq == Seq(2L, 5L, 10L))
    // group/row totals identical across threshold rows
    assert(rows.map(x => (x._2, x._3)).distinct.size == 1)
    val nRows = rows.head._3
    assert(nRows == graft.Tables.customer(spark, sf0001).count())
    // raising k can only put MORE groups/rows at risk
    assert(rows.map(_._6).toSeq == rows.map(_._6).toSeq.sorted)
    assert(rows.map(_._7).toSeq == rows.map(_._7).toSeq.sorted)
    rows.foreach { case (_, ng, nr, minG, minL, gb, rar, rate) =>
      assert(gb <= ng && rar <= nr && minL >= 1 && minG >= 1)
      assert(math.abs(rate - rar.toDouble / nr) < 1e-3)
    }
  }
}
