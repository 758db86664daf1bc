package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class SimilaritySpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val queries = emb.filter(col("vec_id") < 10)

  test("brute-force cosine matches an independent driver-side computation") {
    val spark2 = spark
    val vecs = emb.filter(col("vec_id") < 50)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val sparkSims = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") < 50),
        emb.filter(col("vec_id") === 0), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // selection ranks on the 4-decimal-rounded sim (id tiebreak) —
    // mirror that here or raw-ulp order flips the boundary pick
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val local = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(vecs(0L), v)) }
      .sortBy { case (id, s) => (-r4(s), id) }.take(3)
    assert(sparkSims.map(_._1).toSeq == local.map(_._1))
    sparkSims.zip(local).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s1 - s2) < 1e-3)
    }
  }

  test("ANN recall@5 is useful and the candidate set is pruned") {
    val k = 5
    val brute = Similarity.bruteForceTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    // near-isotropic gaussian embeddings are LSH's hardest case; the
    // spec pins the machinery works and the tradeoff is real
    assert(recall >= 0.25, s"ANN recall@5 $recall below floor")
    assert(ann.size == brute.size) // still returns full top-k per query
  }

  test("filtered ANN: eligibility counts and best_sim match a label-scoped " +
      "driver replay") {
    val rows = graft.SparkEntry.queries("sim_filtered_ann")(spark, sf0001)
      .collect()
    assert(rows.length == 10)
    val all = emb.select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(d / math.sqrt(na) / math.sqrt(nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { r =>
      val (qid, qlabel, nElig, bestSim, recallOk) = (r.getLong(0),
        r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4))
      val (_, qEmb, lbl) = all.find(_._1 == qid).get
      assert(lbl == qlabel)
      val eligible = all.filter(x => x._3 == qlabel && x._1 != qid)
      assert(nElig == eligible.length.toLong, s"query $qid eligibility")
      // best_sim is the max over the label-scoped candidates ONLY —
      // a global best would leak across the predicate boundary
      assert(bestSim == eligible.map(x => cos(qEmb, x._2)).max,
        s"query $qid best_sim")
      assert(recallOk == 1)
    }
  }

  test("ANN results are a subset of correct cosine ranking within candidates") {
    val ann = Similarity.annTopK(emb, emb.filter(col("vec_id") === 3), 5)
      .orderBy("rk").collect()
    // ranks are 1..5 with strictly non-increasing similarity
    assert(ann.map(_.getInt(3)).toSeq == (1 to 5))
    val sims = ann.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("PQ/ADC: 8-byte codes recover useful L2 neighbors") {
    val k = 5
    // exact L2 ground truth (PQ approximates squared L2, not cosine) —
    // same rounded-distance + id tiebreak as the operator
    val pairs = emb.as("a").crossJoin(
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
          col("embedding").as("qv")))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(aggregate(zip_with(col("embedding"), col("qv"),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, x) => acc + x), 4).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2"), col("vec_id"))
    val truth = pairs
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqAdcTopK(emb, k, numQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(truth).size.toDouble / truth.size
    // 16-entry codebooks over isotropic gaussians: heavy compression
    // (64 floats → 8 codes) on the hardest corpus; floor pins the
    // machinery ranks genuinely better than chance (random ≈ 0.01)
    assert(recall >= 0.1, s"PQ/ADC recall@5 $recall below floor")
    assert(pq.size == truth.size)
  }

  test("IVF ANN: probes prune the corpus; recall@5 is useful") {
    val k = 5
    val brute = Similarity.bruteForceTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k, numCells = 32, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    // isotropic gaussians again — nprobe/numCells = 1/4 of the corpus
    // scanned; recall floor reflects that honest tradeoff
    assert(recall >= 0.2, s"IVF recall@5 $recall below floor")
    assert(ivf.size == brute.size)
  }

  test("native codegen kernels match the higher-order-function formulation") {
    graft.functions.GraftFunctions.register(spark)
    val diff = emb.limit(200).as("a")
      .crossJoin(emb.limit(20).select(col("embedding").as("e2"),
        col("vec_id").as("v2")).as("b"))
      .select(
        abs(graft.functions.GraftFunctions.cosine(col("embedding"), col("e2")) -
          Similarity.cosine(col("embedding"), col("e2"))).as("dc"),
        abs(graft.functions.GraftFunctions.dot(col("embedding"), col("e2")) -
          Similarity.dot(col("embedding"), col("e2"))).as("dd"))
      .agg(max("dc"), max("dd")).collect()(0)
    assert(diff.getDouble(0) < 1e-9, s"cosine kernel drift ${diff.getDouble(0)}")
    assert(diff.getDouble(1) < 1e-9, s"dot kernel drift ${diff.getDouble(1)}")
    // the sq8 kernel is BIT-identical to its HOF formulation (integer
    // sums + one identically-associated double division)
    val sq8diff = emb.limit(200).as("a")
      .crossJoin(emb.limit(20).select(col("embedding").as("e2"),
        col("vec_id").as("v2")).as("b"))
      .select(abs(
        graft.functions.GraftFunctions.sq8Cosine(col("embedding"), col("e2"))
          - Similarity.sq8CosineHof(col("embedding"), col("e2"))).as("dq"))
      .agg(max("dq")).collect()(0).getDouble(0)
    assert(sq8diff == 0.0, s"sq8 kernel drift $sq8diff")
  }

  test("native LSH-key kernel matches the HOF signature formulation exactly") {
    graft.functions.GraftFunctions.register(spark)
    // native: array of packed longs, position = table; HOF: array of
    // (t, sig) structs — compare per (t, sig) multiset per vector
    val native = emb.select(col("vec_id"),
        posexplode(graft.functions.GraftFunctions.lshKeys(
          col("embedding"), 16, 6, 64, 42L)))
      .select(col("vec_id"), col("pos").as("t"), col("col").as("sig"))
    val hof = emb.select(col("vec_id"),
        explode(Similarity.lshTableKeysHof(col("embedding"), 16, 6)).as("bk"))
      .select(col("vec_id"), col("bk.t").as("t"), col("bk.sig").as("sig"))
    assert(native.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(native).count() == 0)
  }

  test("cosine near-dup pairs: every pair clears the threshold; recall is real") {
    val threshold = 0.3
    val pairs = Similarity.cosinePairs(emb, threshold)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._2 >= threshold))
    graft.functions.GraftFunctions.register(spark)
    val brute = emb.as("a").crossJoin(
        emb.select(col("vec_id").as("v2"), col("embedding").as("e2")).as("b"))
      .filter(col("vec_id") < col("v2"))
      .withColumn("c", graft.functions.GraftFunctions.cosine(col("embedding"), col("e2")))
      .filter(col("c") >= threshold)
      .count()
    val recall = pairs.length.toDouble / brute
    assert(recall >= 0.2, s"cosine-pair recall $recall")
  }

  test("k-means: total assignment, valid clusters, Lloyd objective decreases") {
    val k = 8
    val one = Similarity.kmeansAssign(emb, k = k, iters = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val two = Similarity.kmeansAssign(emb, k = k, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val n = emb.count()
    // every vector assigned exactly once, to a real cluster
    assert(two.length == n && two.map(_._1).distinct.length == n)
    assert(two.forall { case (_, c, _) => c >= 0 && c < k })
    // recomputing centroids (mean step) + reassigning can only lower the
    // within-cluster SSE — Lloyd's monotonicity, up to 4dp rounding
    val sse1 = one.map(_._3).sum
    val sse2 = two.map(_._3).sum
    assert(sse2 <= sse1 + 0.1, s"objective rose: $sse1 -> $sse2")
    // the seeded-gaussian corpus is near-isotropic, but assignments must
    // still use every centroid (empty clusters would signal a broken
    // argmin or a degenerate init)
    assert(two.map(_._2).distinct.length == k)
  }

  test("semantic dedup: total assignment; every drop is justified by a twin") {
    graft.functions.GraftFunctions.register(spark)
    val out = Similarity.semanticDedup(emb, k = 8, iters = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length == emb.count())
    assert(out.map(_._1).distinct.length == out.length)
    val dropped = out.filter(_._3 == 0)
    assert(dropped.nonEmpty, "threshold 0.3 should drop some near-duplicates")
    // verify a sample of drops driver-side: a smaller-id same-cluster
    // vector with rounded cosine >= threshold must exist. NOTE: the twin
    // may itself be dropped (chains: 1~2, 2~3, 1≁3 drops both 2 and 3) —
    // that is the SemDeDup semantics, not a bug; what IS guaranteed is
    // that the min-id vector of every cluster is kept (asserted below).
    val clusterOf = out.map(t => t._1 -> t._2).toMap
    out.groupBy(_._2).foreach { case (cl, members) =>
      val minId = members.map(_._1).min
      assert(members.find(_._1 == minId).get._3 == 1,
        s"cluster $cl: min-id vec $minId must be kept")
    }
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
    }
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    dropped.take(10).foreach { case (id, cl, _) =>
      val hasTwin = clusterOf.exists { case (other, ocl) =>
        other < id && ocl == cl && r4(cos(vecs(other), vecs(id))) >= 0.3
      }
      assert(hasTwin, s"vec $id dropped without a smaller-id twin")
    }
  }

  test("random projection of a one-hot vector reads out the sign matrix") {
    // projecting e_i yields exactly rpSign(j, i) in output dim j — any
    // off-by-one in element indexing or sign seeding fails this
    val spark2 = spark
    import spark2.implicits._
    val oneHots = (0 until 64).map(i =>
      (i.toLong, Array.tabulate(64)(k => if (k == i) 1.0f else 0.0f)))
    val df = oneHots.toDF("vec_id", "embedding")
    val out = (0 until 8).map(j => Similarity.projectionCol(j, 64).as(s"p$j"))
    val rows = df.select(col("vec_id") +: out: _*)
      .collect().map(r => r.getLong(0) -> (0 until 8).map(j => r.getDouble(j + 1)))
      .toMap
    for (i <- 0 until 64; j <- 0 until 8)
      assert(rows(i.toLong)(j) == Similarity.rpSign(j, i).toDouble,
        s"sign mismatch at in=$i out=$j")
  }

  test("random projection roughly preserves scaled norms (JL property)") {
    // E[|Px|²] = k·|x|² for ±1 projections; with k=8 the per-vector
    // estimate is noisy, so assert the CORPUS-level ratio is within 25%
    val projected = emb.select(
      Similarity.norm(col("embedding")).as("n"),
      (0 until 8).map(j => Similarity.projectionCol(j, 64))
        .map(c => c * c).reduce(_ + _).as("pn2"))
    val agg = projected.agg(
      sum(col("pn2")).as("sum_p"), sum(col("n") * col("n")).as("sum_n"))
      .collect()(0)
    val ratio = agg.getDouble(0) / (8.0 * agg.getDouble(1))
    assert(ratio > 0.75 && ratio < 1.25, s"JL norm ratio $ratio")
  }

  test("norms computed the decimal-exact way match double math") {
    val row = emb.filter(col("vec_id") === 0)
      .select(Similarity.norm(col("embedding")).as("n")).collect()(0)
    val v = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)
    val expected = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(row.getDouble(0) - expected) < 1e-6)
  }

  test("centroid drift: identical cohorts read 1.0, opposed cohorts -1.0") {
    import spark.implicits._
    // two labels × two halves; label 0's halves identical (drift cos 1),
    // label 1's second half is the exact negation (cos -1)
    def vec(seed: Int) = (1 to 64).map(i => (seed * i % 7 - 3).toFloat)
    val rows = Seq(
      (0L, vec(1), 0), (1L, vec(1), 0),           // label 0: same both halves
      (2L, vec(2), 1), (3L, vec(2).map(-_), 1))   // label 1: negated half
      .map { case (id, v, l) => (id, v, l) }
    val df = rows.toDF("vec_id", "embedding", "label")
    val r = Similarity.centroidDrift(df, col("vec_id") % 2)
      .collect().map(x => x.getInt(0) -> x.getDouble(3)).toMap
    assert(r(0) == 1.0, s"identical halves must read 1.0: ${r(0)}")
    assert(r(1) == -1.0, s"negated halves must read -1.0: ${r(1)}")
    // corpus query: bounded cosines, one row per label present in both
    val corpus = graft.SparkEntry.queries("sim_centroid_drift")(spark, sf0001)
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach(x =>
      assert(math.abs(x.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("sim_mmr_diversify replays the greedy selection exactly") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sf0001)
    val ours = graft.SparkEntry.queries("sim_mmr_diversify")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(ours.map(_._1).toSeq == (1 to 5))
    assert(ours.map(_._2).distinct.length == 5)
    // replay greedy from the same rounded inputs
    val cand = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0L), 20)
      .select(col("neighbor_id"), col("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    graft.functions.GraftFunctions.register(spark)
    val ids = cand.map(_._1).toSet
    val ce = emb.filter(col("vec_id").isin(ids.toSeq: _*))
      .select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val pairs = ce.join(
        ce.select(col("ia").as("ib"), col("ea").as("eb")),
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        round(graft.functions.GraftFunctions.cosine(col("ea"), col("eb")), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val rel = cand.toMap
    var sel = Vector(cand.maxBy { case (id, r) => (r, -id) }._1)
    (2 to 5).foreach { _ =>
      val next = cand.filterNot(c => sel.contains(c._1)).map { case (id, r) =>
        val ms = sel.map(sid => pairs((id, sid))).max
        id -> BigDecimal(0.7 * r - 0.3 * ms)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.maxBy { case (id, sc) => (sc, -id) }
      sel = sel :+ next._1
    }
    assert(ours.map(_._2).toVector == sel,
      s"${ours.map(_._2).toVector} vs $sel")
    assert(math.abs(ours.head._3 - rel(sel.head)) < 1e-9)
  }

  test("sim_cosine_histogram: bins partition all sample pairs") {
    val rows = graft.SparkEntry.queries("sim_cosine_histogram")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._2).sum == 100L * 99 / 2)
    rows.foreach { case (bin, n, sumSim) =>
      assert(bin >= -10 && bin <= 9)
      // every pair in bin b has sim in [b/10, (b+1)/10): the sum must
      // stay inside those bounds times n
      assert(sumSim >= bin / 10.0 * n - 1e-6)
      assert(sumSim <= (bin + 1) / 10.0 * n + 1e-6)
    }
  }

  test("sim_embedding_pipeline: clusters partition the corpus, sums positive") {
    val rows = graft.SparkEntry.queries("sim_embedding_pipeline")(
      spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = graft.Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (c, n, d2, nm) =>
      assert(c >= 0 && c < 8 && n > 0 && d2 >= 0 && nm > 0)
    }
    // cluster stats agree with the shared assignment frame
    val km = Similarity.corpusKmeans(spark, sf0001)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (c, n, _, _) => assert(km(c) == n) }
  }

  test("sim_kcenter_coreset replays greedy farthest-point exactly") {
    val rows = graft.SparkEntry.queries("sim_kcenter_coreset")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to 6))
    assert(rows.map(_._2).distinct.length == 6, "centers must be distinct")
    assert(rows.head == ((1, 0L, 0.0)))
    // local greedy replay with the same 4dp rounding + id tiebreaks
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(a.zip(b).map(p => p._1 * p._2).sum / (na * nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var sel = Vector(0L)
    rows.drop(1).foreach { case (_, got, gotDist) =>
      val cands = embs.keys.filterNot(sel.contains).toSeq.sorted
      val best = cands.map { id =>
        val dmin = sel.map(sid => BigDecimal(1.0 - cos(embs(id), embs(sid)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).min
        (id, dmin)
      }.maxBy { case (id, dm) => (dm, -id) }
      assert(got == best._1, s"center $got vs ${best._1}")
      assert(math.abs(gotDist - best._2) < 2e-4, s"$gotDist vs ${best._2}")
      sel :+= got
    }
    // farthest-point radii are non-increasing
    val ds = rows.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("sim_pca_power replays the rounded power iteration exactly") {
    val rows = graft.SparkEntry.queries("sim_pca_power")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(rows.map(_._1).toSeq == (1 to 64))
    // unit vector (up to the 6dp component rounding)
    val norm = math.sqrt(rows.map(p => p._2 * p._2).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"norm $norm")
    // exact local replay with the same rounding schedule
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val embs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(x => x.getLong(0) -> x.getSeq[Float](1).map(_.toDouble).toArray)
    var v = Array.fill(64)(0.125)
    for (_ <- 1 to 3) {
      val dots = embs.map { case (_, e) =>
        (e, r(e.indices.map(d => BigDecimal(r(e(d) * v(d), 8))).sum
          .toDouble, 6))
      }
      val w = (0 until 64).map(d =>
        dots.map { case (e, dot) => BigDecimal(r(e(d) * dot, 8)) }.sum
          .toDouble).toArray
      val nrm = math.sqrt(w.map(x => BigDecimal(r(x * x, 8))).sum.toDouble)
      v = w.map(x => r(x / nrm, 6))
    }
    rows.foreach { case (dim, loading) =>
      assert(math.abs(loading - v(dim - 1)) < 1e-6,
        s"dim $dim: $loading vs ${v(dim - 1)}") }
  }

  test("ivf_pq: probing every cell reproduces the pure PQ/ADC ranking") {
    // nprobe = numCells(8) ⇒ the coarse quantizer prunes nothing, so the
    // composition must degenerate to exactly pqAdcTopK — certifying the
    // probe/candidate plumbing changes WHICH vectors are scored, never
    // HOW they are scored
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val pq = rows(Similarity.pqAdcTopK(emb, k = 5, numQueries = 10))
    val ivf = rows(Similarity.ivfPqTopK(emb, k = 5, numQueries = 10,
      nprobe = 8))
    assert(ivf == pq, s"ivf_pq(nprobe=all) != pq_adc: " +
      s"${(ivf -- pq).take(3)} / ${(pq -- ivf).take(3)}")
  }

  test("sq8: quantized ranking tracks exact cosine; recall@5 >= 0.8") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val qs = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = Similarity.sq8TopK(emb, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // per-query recall against the exact top-5
    val recall = sq8.count(x => brute.contains((x._1, x._2))).toDouble /
      brute.size
    assert(recall >= 0.8, s"sq8 recall@5 = $recall")
    // quantized cosine stays within int8 quantization error of exact
    graft.functions.GraftFunctions.register(spark)
    val exact = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("b"), col("embedding").as("eb")),
        col("a") =!= col("b"))
      .select(col("b"), col("a"),
        round(graft.functions.GraftFunctions.cosine(col("ea"), col("eb")),
          4).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    sq8.foreach { case (q, n, s) =>
      assert(math.abs(s - exact((q, n))) < 0.02,
        s"quantization error too large for ($q,$n): $s vs ${exact((q, n))}")
    }
  }

  test("binary quantize: hamming candidates recover exact top-5; " +
      "wider pool never hurts") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val qs = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(pool: Int): Double = {
      val bq = Similarity.binaryQuantTopK(emb, qs, k = 5, pool = pool)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      bq.count(brute.contains).toDouble / brute.size
    }
    val r20 = recallAt(20)
    assert(r20 >= 0.3, s"binary-quant recall@5 (pool 20) = $r20")
    // an exact rerank over a candidate SUPERSET cannot lose true hits
    assert(recallAt(100) >= r20)
    // rerank sims are the exact cosines (not hamming approximations):
    // every emitted sim matches bruteForceTopK's value for that pair
    graft.functions.GraftFunctions.register(spark)
    val exact = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(qs.select(col("vec_id").as("b"), col("embedding").as("eb")),
        col("a") =!= col("b"))
      .select(col("b"), col("a"),
        round(graft.functions.GraftFunctions.cosine(col("ea"), col("eb")),
          4).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    Similarity.binaryQuantTopK(emb, qs, k = 5, pool = 20)
      .collect().foreach { r =>
        assert(r.getDouble(2) == exact((r.getLong(0), r.getLong(1))))
      }
  }

  test("ivf recall sweep: 4 probe levels, monotone, certs hold") {
    val rows = graft.SparkEntry.queries("sim_ivf_recall_sweep")(
      spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8))
    assert(rows.forall(_.getInt(2) == 1), "mono_ok violated")
    assert(rows.forall(_.getInt(3) == 1), "floor_ok violated")
    assert(rows.forall(_.getLong(1) == 10L))
  }
}
