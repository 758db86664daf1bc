package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Cross-checks the closed-form statistical queries (OLS trend, Welch
  * t-test, decayed LTV) against Spark's own float implementations of the
  * same statistics — the integer/decimal determinism refactor must not
  * change the math, only make it engine-portable. */
class AnalyticsSpec extends SparkTestBase {

  test("q_regression_trend matches regr_slope/regr_intercept") {
    val ours = graft.SparkEntry.queries("q_regression_trend")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // float reference: Spark's built-in OLS aggregates over the same
    // monthly frame
    val monthly = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        ((year(col("o_orderdate")) - 1995) * 12
          + month(col("o_orderdate")) - 1).as("x"))
      .agg(sum(col("o_totalprice")).as("y"))
    val ref = monthly.groupBy("nk")
      .agg(regr_slope(col("y"), col("x")).as("slope"),
        regr_intercept(col("y"), col("x")).as("icept"))
      .join(Tables.nation(spark, sf0001),
        col("nk") === col("n_nationkey"))
      .select("n_name", "slope", "icept")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(ours.keySet == ref.keySet && ours.nonEmpty)
    ours.foreach { case (nation, (slope, icept)) =>
      val (rs, ri) = ref(nation)
      assert(math.abs(slope - rs) <= math.max(1e-3, math.abs(rs) * 1e-6),
        s"$nation slope $slope vs $rs")
      assert(math.abs(icept - ri) <= math.max(1e-3, math.abs(ri) * 1e-6),
        s"$nation intercept $icept vs $ri")
    }
  }

  test("q_ab_welch_ttest matches avg/var_samp-derived t and df") {
    val ours = graft.SparkEntry.queries("q_ab_welch_ttest")(spark, sf0001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    val e = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("dow", dayofweek(col("ts")) - 1)
    def stats(t: String) = e.filter(col("event_type") === t)
      .groupBy("dow").agg(count(lit(1)).as("n"), avg("value").as("m"),
        var_samp(col("value")).as("v"))
    val ref = stats("click").as("a")
      .join(stats("purchase").as("b"), "dow")
      .collect().map { r =>
        val (na, ma, va) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
        val (nb, mb, vb) = (r.getLong(4), r.getDouble(5), r.getDouble(6))
        val se2 = va / na + vb / nb
        val t = (ma - mb) / math.sqrt(se2)
        val df = se2 * se2 /
          (va / na * (va / na) / (na - 1) + vb / nb * (vb / nb) / (nb - 1))
        r.getInt(0) -> (na, nb, t, df)
      }.toMap
    assert(ours.keySet == ref.keySet && ours.size == 7)
    ours.foreach { case (dow, (na, nb, t, df)) =>
      val (rna, rnb, rt, rdf) = ref(dow)
      assert(na == rna && nb == rnb)
      // value is cast to DECIMAL(18,2) in the query (cent-exact inputs);
      // the float reference uses raw doubles — allow the cast slack
      assert(math.abs(t - rt) < 1e-2, s"dow $dow t $t vs $rt")
      assert(math.abs(df - rdf) / rdf < 1e-2, s"dow $dow df $df vs $rdf")
    }
  }

  test("q_attribution credits the nearest prior touch within 24h") {
    val rows = graft.SparkEntry.queries("q_attribution")(spark, sf0001)
      .collect()
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getString(3)))
    val byId = ev.map(e => e._1 -> e).toMap
    assert(rows.length == ev.count(_._4 == "purchase"))
    var attributed = 0
    rows.foreach { r =>
      val p = byId(r.getLong(0))
      if (!r.isNullAt(2)) {
        attributed += 1
        val t = byId(r.getLong(2))
        assert(t._2 == p._2, "touch belongs to the same user")
        assert(Set("click", "view")(t._4))
        assert(t._3 <= p._3 && p._3 - t._3 <= 86400000L)
        // it is the LATEST eligible touch (ms granularity check; exact
        // µs ordering is the oracle's job)
        val later = ev.filter(e => e._2 == p._2 && Set("click", "view")(e._4)
          && e._3 > t._3 && e._3 < p._3)
        assert(later.isEmpty || later.forall(_._3 == t._3))
      }
    }
    assert(attributed > 0, "corpus should attribute most purchases")
  }

  test("text_ngram_novelty: first doc scores 1.0, later near-dups score low") {
    val r = graft.SparkEntry.queries("text_ngram_novelty")(spark, sf0001)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    val firstId = r.keys.min
    assert(r(firstId)._3 == 1.0, "the earliest doc is all-novel")
    r.values.foreach { case (n, k, f) =>
      assert(k >= 0 && k <= n && f >= 0.0 && f <= 1.0)
    }
    // global conservation: every distinct gram is novel exactly once
    assert(r.values.map(_._2).sum ==
      Tables.documents(spark, sf0001)
        .select(explode(Dedup.shingleHashes(col("text"), 3)).as("g"))
        .distinct().count())
    // the LATER doc of a Jaccard-j near-dup pair re-treads at least the
    // shared grams: novelty ≤ 1 - containment ≤ 1 - j
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sf0001),
        "doc_id", "text", threshold = 0.8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, b, j) =>
      assert(r(b)._3 <= 1.0 - j + 1e-3,
        s"doc $b shares j=$j with an earlier doc but scored ${r(b)._3}")
    }
  }

  test("dedup_containment covers the LSH pair set with bounds ≥ jaccard") {
    val pairs = graft.SparkEntry.queries("dedup_containment")(spark, sf0001)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getDouble(3),
        x.getLong(4)))
    val lsh = Dedup.minhashPairs(Tables.documents(spark, sf0001),
        "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      lsh.map(p => (p._1, p._2)).toSet)
    val jmap = lsh.map(p => (p._1, p._2) -> p._3).toMap
    pairs.foreach { case (a, b, cab, cba, sub) =>
      val j = jmap((a, b))
      // containment ≥ jaccard always (same numerator, ≤ denominator)
      assert(cab >= j - 1e-4 && cba >= j - 1e-4)
      assert(sub == a || sub == b)
      assert(if (cab >= cba) sub == a else sub == b)
    }
  }

  test("q_decay_ltv matches the float half-life weighting") {
    val ours = graft.SparkEntry.queries("q_decay_ltv")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
    val anchor = ev.agg(to_date(max("ts")).as("dmax"))
    val ref = ev.crossJoin(broadcast(anchor))
      .withColumn("wk",
        floor(datediff(col("dmax"), to_date(col("ts"))) / 7).cast("int"))
      .filter(col("wk") <= 20)
      .groupBy("user_id")
      .agg(sum(col("value") * pow(lit(0.5), col("wk"))).as("ltv"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == ref.keySet && ours.nonEmpty)
    ours.foreach { case (u, v) =>
      assert(math.abs(v - ref(u)) < 1e-2, s"user $u ltv $v vs ${ref(u)}")
    }
    // decayed LTV can never exceed the plain sum
    val plain = ev.groupBy("user_id")
      .agg(sum("value").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ours.foreach { case (u, v) => assert(v <= plain(u) + 1e-6) }
  }

  test("q_gini_concentration matches a float Gini recomputation") {
    val row = graft.SparkEntry.queries("q_gini_concentration")(spark, sf0001)
      .collect().head
    val (n, gini, top1) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val ms = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, m) => (m, id) }.map(_._2)
    assert(n == ms.length)
    val sm = ms.sum
    val swm = ms.zipWithIndex.map { case (m, i) => (i + 1) * m }.sum
    val refG = 2 * swm / (n * sm) - (n + 1.0) / n
    assert(math.abs(gini - refG) < 1e-3, s"$gini vs $refG")
    val k = math.ceil(n * 0.01).toInt
    val refTop = ms.takeRight(k).sum / sm
    assert(math.abs(top1 - refTop) < 1e-3, s"$top1 vs $refTop")
    assert(gini > 0 && gini < 1 && top1 > 0.01 * 0.5)
  }

  test("q_skew_profile: shares and skew factors match direct counts") {
    val rows = graft.SparkEntry.queries("q_skew_profile")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.length == 10)
    val counts = Tables.lineitem(spark, sf0001)
      .groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val top = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
    assert(rows.map(r => (r._1, r._2)).toSeq == top)
    rows.foreach { case (_, n, share, skew) =>
      assert(math.abs(share - n.toDouble / total) < 1e-5)
      assert(math.abs(skew - n.toDouble / (total.toDouble / counts.size)) < 0.01)
    }
  }

  test("q_survival_km matches a float Kaplan-Meier recomputation") {
    val rows = graft.SparkEntry.queries("q_survival_km")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val cust = Tables.orders(spark, sf0001).groupBy("o_custkey")
      .agg(to_date(min("o_orderdate")).as("f"),
        to_date(max("o_orderdate")).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val dmax = cust.map(_._2).max
    val durEv = cust.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l) / 7,
        java.time.temporal.ChronoUnit.DAYS.between(l, dmax) > 56) }
    var s = 1.0
    val ref = durEv.map(_._1).distinct.sorted.map { w =>
      val nRisk = durEv.count(_._1 >= w)
      val d = durEv.count(x => x._1 == w && x._2)
      if (d > 0 && d < nRisk) s *= 1.0 - d.toDouble / nRisk
      w -> (nRisk.toLong, d.toLong, s)
    }.toMap
    rows.foreach { case (w, nRisk, d, surv) =>
      val (rn, rd, rs) = ref(w)
      assert(nRisk == rn && d == rd, s"week $w counts")
      assert(math.abs(surv - rs) < 1e-3, s"week $w: $surv vs $rs")
    }
  }

  test("q_lorenz_deciles: monotone shares consistent with the gini query") {
    val rows = graft.SparkEntry.queries("q_lorenz_deciles")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0L to 9L))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.01)
    assert(math.abs(rows.last._4 - 1.0) < 1e-6)
    // deciles are ordered ascending by spend, so shares are monotone
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    val cum = rows.map(_._4)
    assert(cum.toSeq == cum.sorted.toSeq)
  }

  test("q_weighted_percentile matches a local weighted-order-statistic") {
    val rows = graft.SparkEntry.queries("q_weighted_percentile")(
      spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val data = graft.Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    data.groupBy(_._1).foreach { case (g, xs) =>
      // distinct-value cumulative weights, smallest v with cw >= q*W
      val byV = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      def wp(q: Double): Double = {
        var cw = 0.0
        byV.find { case (_, w) => cw += w; cw >= q * tot - 1e-9 }.get._1
      }
      val (p50, p90, p99) = rows(g)
      assert(math.abs(p50 - wp(0.50)) < 0.01, s"$g wp50")
      assert(math.abs(p90 - wp(0.90)) < 0.01, s"$g wp90")
      assert(math.abs(p99 - wp(0.99)) < 0.01, s"$g wp99")
      // weighted median is pulled by weight, not just rank: sanity that
      // the percentiles are ordered
      assert(p50 <= p90 && p90 <= p99)
    }
  }
}
