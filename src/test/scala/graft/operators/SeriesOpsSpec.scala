package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Cross-checks the decimal-exact time-series queries against plain
  * double-precision recomputations of the same statistics — the
  * determinism plumbing (decimal sums, per-term rounding) must not
  * change the math beyond rounding noise. */
class SeriesOpsSpec extends SparkTestBase {

  private lazy val daily: Seq[(java.sql.Date, Double)] =
    Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum("value").as("x"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0), r.getDouble(1))).toSeq

  test("q_acf_daily matches a float ACF recomputation") {
    val ours = graft.SparkEntry.queries("q_acf_daily")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val xs = daily.map(_._2)
    val n = xs.length
    val mean = xs.sum / n
    val denom = xs.map(v => (v - mean) * (v - mean)).sum
    val byDay = daily.map { case (d, v) => d.toLocalDate -> v }.toMap
    (1L to 7L).foreach { k =>
      val pairs = daily.flatMap { case (d, v) =>
        byDay.get(d.toLocalDate.minusDays(k)).map(prev => (v, prev))
      }
      val num = pairs.map { case (a, b) => (a - mean) * (b - mean) }.sum
      val ref = num / denom
      assert(math.abs(ours(k) - ref) < 1e-3, s"lag $k: ${ours(k)} vs $ref")
    }
  }

  test("q_ewma_forecast matches a float truncated-EWMA recomputation") {
    val ours = graft.SparkEntry.queries("q_ewma_forecast")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ws = SeriesOps.ewmaWeights.map(_.doubleValue())
    val xs = daily.map(_._2)
    assert(ours.nonEmpty && ours.size == xs.length - (SeriesOps.ewmaLags - 1))
    daily.zipWithIndex.drop(SeriesOps.ewmaLags - 1).foreach { case ((d, _), t) =>
      val ref = ws.zipWithIndex.map { case (w, j) => w * xs(t - j) }.sum
      val got = ours(d.toLocalDate.toString)
      assert(math.abs(got - ref) < 1e-3, s"$d: $got vs $ref")
    }
  }

  test("q_seasonal_dow matches a float decomposition recomputation") {
    val rows = graft.SparkEntry.queries("q_seasonal_dow")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (0 until 7))
    val xs = daily.map(_._2)
    val resid = daily.indices.drop(3).dropRight(3).map { t =>
      val ma = (t - 3 to t + 3).map(xs).sum / 7
      val dow = ((daily(t)._1.toLocalDate.toEpochDay % 7) + 7) % 7
      (dow.toInt, xs(t) - ma)
    }
    val ref = resid.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum / v.size)).toMap
    rows.foreach { case (dow, n, idx) =>
      val (rn, ridx) = ref(dow)
      assert(n == rn, s"dow $dow count $n vs $rn")
      assert(math.abs(idx - ridx) < 1e-2, s"dow $dow: $idx vs $ridx")
    }
  }

  test("q_stl_decompose: additive identity holds; seasonal centered; " +
      "full windows only") {
    val rows = graft.SparkEntry.queries("q_stl_decompose")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    // x = trend + seasonal + residual exactly before the output rounds;
    // after rounding (x to 2dp, the parts to 4dp) the identity holds to
    // the rounding budget
    rows.foreach { r =>
      val x = r.getAs[Double]("x")
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(x - recon) <= 0.006, s"identity broke: $x vs $recon")
    }
    // the centered-MA trim: exactly 6 fewer rows than the daily frame
    assert(rows.length == daily.length - 6)
    // the seven seasonal components were centered: per-dow values sum ~0
    val perDow = rows.map(r =>
      ((r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay % 7 + 7) % 7,
        r.getAs[Double]("seasonal"))).groupBy(_._1)
      .map { case (_, v) => v.head._2 }
    assert(math.abs(perDow.sum) < 0.01,
      s"seasonal components not centered: ${perDow.sum}")
  }

  test("q_chi_square_dow matches a float chi-square recomputation") {
    val row = graft.SparkEntry.queries("q_chi_square_dow")(spark, sf0001)
      .collect().head
    val (n, dof, chi2) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val cells = Tables.events(spark, sf0001)
      .groupBy(col("event_type"),
        (datediff(to_date(col("ts")), to_date(lit("1970-01-01"))) % 7)
          .as("dow"))
      .agg(count(lit(1)).as("o"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val types = cells.keys.map(_._1).toSeq.distinct
    val dows = cells.keys.map(_._2).toSeq.distinct
    val total = cells.values.sum
    assert(n == total)
    assert(dof == (types.size - 1).toLong * (dows.size - 1))
    val rt = types.map(t => t -> cells.collect {
      case ((tt, _), o) if tt == t => o }.sum).toMap
    val ct = dows.map(w => w -> cells.collect {
      case ((_, ww), o) if ww == w => o }.sum).toMap
    val ref = (for (t <- types; w <- dows) yield {
      val o = cells.getOrElse((t, w), 0L).toDouble
      val e = rt(t).toDouble * ct(w) / total
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(chi2 - ref) < 1e-2, s"$chi2 vs $ref")
  }

  test("q_mann_whitney matches a float rank-sum recomputation") {
    val row = graft.SparkEntry.queries("q_mann_whitney")(spark, sf0001)
      .collect().head
    val (n1, n2, u1, z) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    val vals = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(n1 == vals.count(_._1 == "click"))
    assert(n2 == vals.count(_._1 == "purchase"))
    // midranks via sorting the combined sample
    val sorted = vals.sortBy(_._2)
    val midrank = sorted.map(_._2).zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
    val r1 = vals.filter(_._1 == "click").map(v => midrank(v._2)).sum
    val refU = r1 - n1 * (n1 + 1) / 2.0
    assert(math.abs(u1 - refU) < 0.51, s"$u1 vs $refU")
    val mu = n1.toDouble * n2 / 2
    // tie-corrected variance, recomputed from the tie counts like the
    // query: var = n1*n2/12 * ((n+1) - sum(t^3 - t)/(n*(n-1)))
    val n = n1 + n2
    val tsum = vals.groupBy(_._2).values
      .map(g => { val t = g.size.toDouble; t * t * t - t }).sum
    val sigma = math.sqrt(n1.toDouble * n2 / 12 *
      ((n + 1).toDouble - tsum / (n.toDouble * (n - 1))))
    assert(math.abs(z - (refU - mu) / sigma) < 1e-3)
    // the correction must actually bite on this tie-heavy fixture
    val sigmaNoTie = math.sqrt(n1.toDouble * n2 * (n + 1) / 12)
    assert(sigma < sigmaNoTie)
  }

  test("text_dsir_weights upweights the target (English) cohort") {
    val w = graft.SparkEntry.queries("text_dsir_weights")(spark, sf0001)
      .join(Tables.documents(spark, sf0001).select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_logw") / col("n_tokens")).as("mw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(w(true) > w(false),
      s"en per-token logw ${w(true)} should exceed non-en ${w(false)}")
  }

  test("text_kl_divergence is non-negative and covers every source") {
    val rows = graft.SparkEntry.queries("text_kl_divergence")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val nSources = Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    // KL ≥ 0 up to the 9dp per-cell rounding slack
    rows.foreach { case (src, kl) => assert(kl >= -1e-4, s"$src kl=$kl") }
  }

  test("q_bootstrap_ci brackets the point estimate with ordered bounds") {
    val row = graft.SparkEntry.queries("q_bootstrap_ci")(spark, sf0001)
      .collect().head
    val (b, n, pt, lo, hi) = (row.getInt(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(b == SeriesOps.bootstrapB)
    val ref = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), avg("value")).collect().head
    assert(n == ref.getLong(0))
    assert(math.abs(pt - ref.getDouble(1)) < 1e-2)
    // CI must bracket the point estimate and be ordered; with B=40
    // Poisson replicas on thousands of rows, the bracket is tight
    assert(lo < hi && lo <= pt && pt <= hi, s"$lo $pt $hi")
    assert((hi - lo) / pt < 0.5, s"CI implausibly wide: $lo..$hi vs $pt")
  }

  test("poisson bootstrap weights have mean ~1 and match the CDF cutoffs") {
    assert(SeriesOps.poissonCutsHex.length == 6)
    // cutoffs are the Poisson(1) CDF scaled to 16 bits
    val cdf = SeriesOps.poissonCutsHex.map(h => Integer.parseInt(h, 16) / 65536.0)
    val expect = Seq(0.3679, 0.7358, 0.9197, 0.9810, 0.9963, 0.9994)
    cdf.zip(expect).foreach { case (c, e) =>
      assert(math.abs(c - e) < 1e-4, s"$c vs $e") }
  }

  test("q_ks_test matches a float ECDF recomputation") {
    val row = graft.SparkEntry.queries("q_ks_test")(spark, sf0001)
      .collect().head
    val (n1, n2, dStat, p) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    val vals = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "purchase").map(_._2).sorted
    assert(n1 == a.length && n2 == b.length)
    val support = (a ++ b).distinct.sorted
    val refD = support.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length
        - b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(dStat - refD) < 1e-4, s"$dStat vs $refD")
    assert(p >= 0 && p <= 1)
    val ne = n1.toDouble * n2 / (n1 + n2)
    val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * refD
    val refP = math.min(1.0, math.max(0.0, 2.0 * (1 to 5).map(j =>
      math.pow(-1, j - 1) * math.exp(-2.0 * j * j * lam * lam)).sum))
    assert(math.abs(p - refP) < 1e-3, s"$p vs $refP")
  }

  test("q_quantile_normalize: mid-CDF percentiles, monotone in value") {
    val rows = graft.SparkEntry.queries("q_quantile_normalize")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 50)
    assert(rows.forall { case (_, _, p) => p > 0 && p <= 1 })
    val byV = rows.sortBy(_._2)
    assert(byV.map(_._3).toSeq == byV.map(_._3).sorted.toSeq)
    // spot-check one percentile against the full sample
    val all = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select("value").collect().map(_.getDouble(0))
    val (_, v0, p0) = rows.head
    // v0 was rounded to 2dp for display; compare against raw values that
    // round to it
    val below = all.count(x => x < v0 - 0.005)
    val atMost = all.count(x => x <= v0 + 0.005)
    val lo = below.toDouble / all.length
    val hi = atMost.toDouble / all.length
    assert(p0 >= lo - 1e-6 && p0 <= hi + 1e-6, s"$p0 not in [$lo,$hi]")
  }

  test("q_dp_noisy_counts: noise is Laplace-shaped and reproducible") {
    val a = graft.SparkEntry.queries("q_dp_noisy_counts")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val b = graft.SparkEntry.queries("q_dp_noisy_counts")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(a.toSeq == b.toSeq, "deterministic release must be stable")
    val real = Tables.events(spark, sf0001)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { case (t, noisy) =>
      val diff = noisy - real(t)
      // Laplace(b=1) at 16-bit resolution: |noise| < ln(65536) ≈ 11.1
      assert(math.abs(diff) < 12, s"$t: implausible noise $diff")
    }
  }

  /** Local daily-total series (epochDay, total) for robust-stat replays. */
  private def dailySeries: Seq[(Long, Double)] =
    Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1).toSeq

  test("q_theil_sen matches the local median-of-pairwise-slopes") {
    val row = graft.SparkEntry.queries("q_theil_sen")(spark, sf0001)
      .collect().head
    val (m, sen) = (row.getLong(0), row.getDouble(1))
    val pts = dailySeries
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield BigDecimal((pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).sorted
    assert(m == slopes.length)
    // lower-median variant: the ((m+1) div 2)-th order statistic
    val med = slopes((m.toInt - 1) / 2)
    assert(math.abs(sen - med) < 2e-6, s"$sen vs $med")
  }

  test("q_mad_anomaly: med/MAD match the local replay, top-5 by |z|") {
    val rows = graft.SparkEntry.queries("q_mad_anomaly")(spark, sf0001)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 5)
    val xs = dailySeries.map(_._2).sorted
    val k = xs.length
    val med = (xs((k - 1) / 2) + xs(k / 2)) / 2
    val ads = xs.map(x => math.abs(x - med)).sorted
    val mad = (ads((k - 1) / 2) + ads(k / 2)) / 2
    assert(math.abs(rows.head._1 - med) < 0.01, s"med ${rows.head._1} vs $med")
    assert(math.abs(rows.head._2 - mad) < 0.01, s"mad ${rows.head._2} vs $mad")
    // the 5 reported days carry the largest |z| of the whole series
    val zs = dailySeries.map(p => math.abs(0.6745 * (p._2 - med) / mad))
      .sorted.reverse
    val reported = rows.map(r => math.abs(r._3)).sorted.reverse
    reported.zip(zs.take(5)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-3, s"$got vs $want") }
  }

  test("freshness audit: the freshest stream reads zero staleness") {
    val rows = graft.SparkEntry.queries("q_freshness_audit")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._2).sum ==
      graft.Tables.events(spark, sf0001).count())
    // exactly the globally-freshest stream(s) read zero staleness
    assert(rows.map(_._3).min == 0L)
    rows.foreach { case (t, n, st, n24, share) =>
      assert(st >= 0, s"$t staleness negative")
      assert(n24 <= n && share >= 0 && share <= 1)
      assert(math.abs(share - n24.toDouble / n) < 1e-3)
    }
  }
}
