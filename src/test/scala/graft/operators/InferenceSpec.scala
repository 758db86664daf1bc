package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Invariant checks for the statistical-inference suite (the DuckDB
  * hash gate is the primary correctness check; these pin the structural
  * properties a hash can't articulate). */
class InferenceSpec extends SparkTestBase {

  private def run(name: String): Array[Row] =
    Inference.defs.find(_.name == name).get.build(spark, sf0001).collect()

  test("q_anova_f: single row, F >= 0, eta_sq in [0,1]") {
    val rows = run("q_anova_f")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_total") > 0)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
  }

  test("q_fdr_bh: step-up property — rejections form a rank prefix") {
    val rows = run("q_fdr_bh").sortBy(_.getAs[Int]("rnk"))
    assert(rows.nonEmpty)
    // ranks are 1..m with no gaps
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to rows.length))
    // p-values are non-decreasing in rank
    val ps = rows.map(_.getAs[Double]("p_value"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    // BH rejects a prefix of the ranking, never a gap
    val rej = rows.map(_.getAs[Int]("rejected"))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b })
  }

  test("q_did_lift: four arms partition the purchase events") {
    val r = run("q_did_lift").head
    val armSum = Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .map(r.getAs[Long]).sum
    val purchases = graft.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(armSum == purchases)
  }

  test("q_did_event_study: weeks partition the purchases; pooled pre " +
      "effect is zero; 2x2 consistency with q_did_lift") {
    import org.apache.spark.sql.functions.col
    val rows = run("q_did_event_study").sortBy(_.getAs[Int]("rel_week"))
    val purchases = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
      == purchases)
    // relative weeks are contiguous and span the cutover
    val wks = rows.map(_.getAs[Int]("rel_week")).toSeq
    assert(wks == (wks.min to wks.max) && wks.min < 0 && wks.max >= 0)
    // reconstruct pre_gap from the emitted (4dp-rounded) means and
    // check every effect is that week's gap minus it — the differencing
    // identity the estimator is built on (tolerance = rounding only)
    val pre = rows.filter(_.getAs[Int]("rel_week") < 0)
    assert(pre.nonEmpty)
    val preGap =
      pre.map(r => r.getAs[Double]("mean_t") * r.getAs[Long]("n_t")).sum /
        pre.map(_.getAs[Long]("n_t")).sum -
      pre.map(r => r.getAs[Double]("mean_c") * r.getAs[Long]("n_c")).sum /
        pre.map(_.getAs[Long]("n_c")).sum
    rows.foreach { r =>
      val gap = r.getAs[Double]("mean_t") - r.getAs[Double]("mean_c")
      assert(math.abs(r.getAs[Double]("effect") - (gap - preGap)) < 5e-3,
        s"week ${r.getAs[Int]("rel_week")} effect != gap - pre_gap")
    }
    // and therefore the n_t-weighted pre effects straddle zero
    val effPre = pre.map(_.getAs[Double]("effect"))
    assert(effPre.min <= 5e-3 && effPre.max >= -5e-3,
      s"pre effects one-sided: ${effPre.toSeq}")
  }

  test("q_conformal_interval: calibration coverage is >= the 90% target") {
    val r = run("q_conformal_interval").head
    assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_calib") > 0)
    // count(r <= q_hat) >= rank(q_hat) = ceil(0.9 (n+1)) >= 0.9 n
    assert(r.getAs[Double]("coverage") >= 0.89)
    assert(r.getAs[Double]("q90_resid") >= 0.0)
  }

  test("q_kendall_tau: tau_b bounded, pair counts consistent") {
    val r = run("q_kendall_tau").head
    val n = r.getAs[Long]("n_months")
    val pairs = n * (n - 1) / 2
    assert(r.getAs[Long]("n_concordant") + r.getAs[Long]("n_discordant")
      <= pairs)
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("q_cuped: correlation-derived variance ratio stays in [0,1]") {
    val r = run("q_cuped").head
    assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    val vr = r.getAs[Double]("var_ratio") // 1 - rho^2
    assert(vr >= 0.0 && vr <= 1.0)
  }

  test("q_cem_att: only two-armed strata survive; weights total n_t") {
    val rows = run("q_cem_att")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    }
    val mt = rows.head.getAs[Long]("m_t")
    assert(rows.map(_.getAs[Long]("n_t")).sum == mt)
    assert(rows.head.getAs[Long]("n_bins") == rows.length)
  }

  test("q_ipw_ate: overlap strata only; Hájek weights collapse to m; " +
      "ESS bounded by m") {
    val rows = run("q_ipw_ate")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // positivity trim: both arms present ⇒ propensity strictly inside (0,1)
      val e = r.getAs[Double]("propensity")
      assert(e > 0.0 && e < 1.0)
      assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    }
    val m = rows.head.getAs[Long]("m")
    // the stratified-propensity identity: Σ_bins (n_t + n_c) = m exactly
    assert(rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c")).sum
      == m)
    // Kish ESS can never exceed the weight total (equality iff uniform
    // weights), and must be positive
    val essT = rows.head.getAs[Double]("ess_t")
    val essC = rows.head.getAs[Double]("ess_c")
    assert(essT > 0.0 && essT <= m + 1e-6)
    assert(essC > 0.0 && essC <= m + 1e-6)
  }

  test("q_tukey_hsd: all 10 arm pairs, symmetric q, flag consistent") {
    val rows = run("q_tukey_hsd")
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[String]("arm_a") < r.getAs[String]("arm_b"))
      val q = r.getAs[Double]("q_stat")
      assert(q >= 0.0)
      assert(r.getAs[Int]("significant") == (if (q > 3.858) 1 else 0))
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
    // every arm appears in exactly 4 pairs
    val arms = rows.flatMap(r => Seq(r.getAs[String]("arm_a"),
      r.getAs[String]("arm_b")))
    assert(arms.groupBy(identity).values.forall(_.length == 4))
  }

  test("q_msprt: anytime-valid p is non-increasing; reject consistent") {
    val rows = run("q_msprt").sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Double]("p_always"))
    ps.foreach(p => assert(p > 0.0 && p <= 1.0))
    // the running-min construction makes p_t monotone non-increasing —
    // the property that MAKES it anytime-valid
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-9 })
    rows.foreach { r =>
      assert(r.getAs[Int]("reject") ==
        (if (r.getAs[Double]("p_always") <= 0.05) 1 else 0))
      assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    }
    // cumulative counts are non-decreasing
    val nt = rows.map(_.getAs[Long]("n_t"))
    assert(nt.zip(nt.tail).forall { case (a, b) => b >= a })
  }

  test("q_power_mde: positive detectable effect and sample size") {
    val r = run("q_power_mde").head
    assert(r.getAs[Double]("mde_abs") > 0.0)
    assert(r.getAs[Double]("mde_rel") > 0.0)
    assert(r.getAs[Long]("n_req_per_arm") > 0L)
  }

  test("q_qte: nine deciles, monotone quantile curves") {
    val rows = run("q_qte").sortBy(_.getAs[Long]("q"))
    assert(rows.map(_.getAs[Long]("q")).toSeq == (1L to 9L))
    val vt = rows.map(_.getAs[Double]("v_treat"))
    val vc = rows.map(_.getAs[Double]("v_ctrl"))
    assert(vt.zip(vt.tail).forall { case (a, b) => a <= b })
    assert(vc.zip(vc.tail).forall { case (a, b) => a <= b })
  }

  test("q_qini: ten deciles, curve anchored to total uplift at k=10") {
    val rows = run("q_qini").sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (0L to 9L))
    // cumulative counts are non-decreasing
    val cnt = rows.map(_.getAs[Long]("cn_t"))
    assert(cnt.zip(cnt.tail).forall { case (a, b) => a <= b })
    // at the last decile the random diagonal meets the curve exactly
    assert(math.abs(rows.last.getAs[Double]("qini_excess")) <= 0.01)
  }

  test("q_srm_check: balanced deterministic split never alarms") {
    val r = run("q_srm_check").head
    assert(r.getAs[Long]("n_t") > 0 && r.getAs[Long]("n_c") > 0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    val p = r.getAs[Double]("p_value")
    assert(p >= 0.0 && p <= 1.0)
    // even/odd user_id split is near-50/50 on the generator
    assert(r.getAs[Int]("srm_flag") == 0)
  }

  test("text_jsd: symmetric divergence bounded by ln 2") {
    val rows = TextAnalysis.defs.find(_.name == "text_jsd").get
      .build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9)
    }
  }

  test("q_fuzzy_linkage: ordered pairs within edit-distance budget") {
    val rows = run("q_fuzzy_linkage")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
      assert(r.getAs[Int]("edit_dist") <= 2)
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
  }

  test("q_gst_obrien_fleming: textbook boundaries, cumulative looks, " +
      "crossing flag consistent") {
    val rows = run("q_gst_obrien_fleming").sortBy(_.getAs[Int]("look"))
    assert(rows.nonEmpty && rows.length <= 5)
    // the K=5 two-sided alpha=0.05 O'Brien-Fleming z-boundaries,
    // 2.040·sqrt(5/k) rounded 4dp
    val expected = Map(1 -> 4.5616, 2 -> 3.2255, 3 -> 2.6336,
      4 -> 2.2808, 5 -> 2.04)
    rows.foreach { r =>
      val k = r.getAs[Int]("look")
      assert(math.abs(r.getAs[Double]("boundary") - expected(k)) < 1e-9)
      val crossed = r.getAs[Int]("crossed")
      assert(crossed ==
        (if (math.abs(r.getAs[Double]("z")) >= r.getAs[Double]("boundary"))
          1 else 0))
    }
    // sample sizes are cumulative: strictly non-decreasing across looks
    val ns = rows.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b >= a })
  }
}
