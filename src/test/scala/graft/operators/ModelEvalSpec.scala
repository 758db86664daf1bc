package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Cross-checks the classifier-evaluation queries against float
  * recomputations from the raw (label, score) pairs. */
class ModelEvalSpec extends SparkTestBase {

  private lazy val pairs: Seq[(Long, Double)] =
    Tables.documents(spark, sf0001)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        TextAnalysis.qualityScore(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("q_roc_auc equals the midrank AUC recomputation") {
    val row = graft.SparkEntry.queries("q_roc_auc")(spark, sf0001)
      .collect().head
    val (n1, n2, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(n1 == pairs.count(_._1 == 1L) && n2 == pairs.count(_._1 == 0L))
    val sorted = pairs.map(_._2).sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
    val r1 = pairs.filter(_._1 == 1L).map(p => midrank(p._2)).sum
    val refAuc = (r1 - n1 * (n1 + 1) / 2.0) / (n1.toDouble * n2)
    assert(math.abs(auc - refAuc) < 1e-5, s"$auc vs $refAuc")
    assert(auc > 0 && auc < 1)
  }

  test("q_decile_lift: balanced deciles, lift consistent with base rate") {
    val rows = graft.SparkEntry.queries("q_decile_lift")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val n = pairs.length
    assert(rows.map(_._2).sum == n)
    // equal-rank buckets differ by at most 1 doc
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    val base = pairs.count(_._1 == 1L).toDouble / n
    rows.foreach { case (d, _, _, rate, lift) =>
      assert(math.abs(lift - rate / base) < 1e-3, s"decile $d")
    }
  }

  test("q_calibration_bins: bins partition the corpus, rates in range") {
    val rows = graft.SparkEntry.queries("q_calibration_bins")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.map(_._2).sum == pairs.length)
    rows.foreach { case (bin, _, meanScore, rate) =>
      assert(bin >= 0 && bin <= 9)
      assert(rate >= 0 && rate <= 1)
      // mean score falls inside (or at the edge of) its bin
      assert(meanScore >= bin / 10.0 - 1e-9 &&
        meanScore <= math.min((bin + 1) / 10.0, 1.0) + 1e-9,
        s"bin $bin mean $meanScore")
    }
  }

  test("q_ece matches a direct recomputation from the bin table") {
    val bins = graft.SparkEntry.queries("q_calibration_bins")(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
    val row = graft.SparkEntry.queries("q_ece")(spark, sf0001)
      .collect().head
    val (nBins, nDocs, ece, maxGap) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(nBins == bins.length && nDocs == bins.map(_._1).sum)
    val refEce = bins.map { case (n, m, r) => n * math.abs(m - r) }.sum / nDocs
    val refMax = bins.map { case (_, m, r) => math.abs(m - r) }.max
    assert(math.abs(ece - refEce) < 1e-3, s"$ece vs $refEce")
    assert(math.abs(maxGap - refMax) < 1e-3)
  }

  test("q_pr_auc matches the sklearn-style step-interpolated AP") {
    val row = graft.SparkEntry.queries("q_pr_auc")(spark, sf0001)
      .collect().head
    val (nPos, nNeg, ap) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(nPos == pairs.count(_._1 == 1L) && nNeg == pairs.count(_._1 == 0L))
    // AP = sum over descending distinct thresholds of dTP * precision
    val byScore = pairs.groupBy(_._2).view
      .mapValues(g => (g.size.toLong, g.count(_._1 == 1L).toLong))
      .toSeq.sortBy(-_._1)
    var (tp, rk, sum) = (0L, 0L, 0.0)
    byScore.foreach { case (_, (c, cy)) =>
      tp += cy; rk += c
      sum += cy.toDouble * tp / rk
    }
    val refAp = sum / nPos
    assert(math.abs(ap - refAp) < 1e-4, s"$ap vs $refAp")
    assert(ap > 0 && ap <= 1)
  }

  test("q_spearman_corr matches a rank-then-Pearson recomputation") {
    val row = graft.SparkEntry.queries("q_spearman_corr")(spark, sf0001)
      .collect().head
    val (n, rho) = (row.getLong(0), row.getDouble(1))
    val xy = graft.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("double"),
        TextAnalysis.qualityScore(col("text")))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(n == xy.length)
    def midranks(vs: Seq[Double]): Map[Double, Double] =
      vs.sorted.zipWithIndex.groupBy(_._1).view
        .mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
    val rx = midranks(xy.map(_._1)); val ry = midranks(xy.map(_._2))
    val rs = xy.map { case (x, y) => (rx(x), ry(y)) }
    val m = rs.length.toDouble
    val (su, sv) = (rs.map(_._1).sum, rs.map(_._2).sum)
    val suv = rs.map(p => p._1 * p._2).sum
    val suu = rs.map(p => p._1 * p._1).sum
    val svv = rs.map(p => p._2 * p._2).sum
    val ref = (suv - su * sv / m) /
      math.sqrt((suu - su * su / m) * (svv - sv * sv / m))
    assert(math.abs(rho - ref) < 1e-3, s"$rho vs $ref")
  }
}
