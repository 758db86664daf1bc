package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused float-vector kernels as native Catalyst expressions.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,(x,y)=>x*y),0d,(s,v)=>s+v)`) materializes an
  * intermediate array per row and walks it twice; these expressions emit
  * a single fused loop in whole-stage codegen — the "custom Expression
  * beats UDF beats everything" tier for the similarity-search hot path.
  *
  * Registered under `graft_dot` / `graft_cosine` via
  * [[GraftFunctions.register]] (or `spark.sql.extensions=graft.functions.GraftExtensions`).
  * Null elements inside vectors are treated as 0.0f; a null vector yields
  * null (NullIntolerant).
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(FloatType, true) ||
        left.dataType == ArrayType(FloatType, false)) {
      if (right.dataType == ArrayType(FloatType, true) ||
          right.dataType == ArrayType(FloatType, false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got ${right.dataType.sql}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got ${left.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** cosine(a,b) = dot(a,b) / (||a|| * ||b||) in one fused loop. Returns
  * null for a null vector; 0.0 when either norm is zero. */
case class CosineSimilarityFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(FloatType, true) ||
        left.dataType == ArrayType(FloatType, false)) {
      if (right.dataType == ArrayType(FloatType, true) ||
          right.dataType == ArrayType(FloatType, false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> inputs, got ${right.dataType.sql}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got ${left.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityFloat =
    copy(left = newLeft, right = newRight)
}

/** Fused int8 scalar-quantized cosine: quantize BOTH float vectors with
  * the symmetric max-abs codebook (q = floor(x/maxabs·127 + 0.5), the
  * q_quantize_embeddings recipe) and compute the cosine of the quantized
  * integer vectors in one kernel — dot and norms are exact 64-bit
  * integer sums, with a single correctly-rounded double division at the
  * end. Bit-identical to the higher-order-function formulation in
  * [[graft.operators.Similarity.sq8TopK]] (parity-tested): the same
  * `(double)dot / (sqrt(na)·sqrt(nb))` association, null elements read
  * as 0 like [[CosineSimilarityFloat]]. Ragged inputs fail loudly
  * (equal lengths required) — the HOF parity reference norms over full
  * arrays and NULLs the dot on mismatch, so min-length semantics here
  * would diverge precisely where the parity test is blind. At 100 TB
  * the corpus side is
  * pre-quantized once and stored at 1 byte/dim; this kernel is the
  * score loop that path runs.
  */
case class Sq8CosineFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_cosine"
  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == ArrayType(FloatType, true) ||
        left.dataType == ArrayType(FloatType, false)) &&
        (right.dataType == ArrayType(FloatType, true) ||
        right.dataType == ArrayType(FloatType, false)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    def maxAbs(v: ArrayData): Double = {
      var m = 0.0; var i = 0
      while (i < v.numElements()) {
        val xv = if (v.isNullAt(i)) 0.0 else math.abs(v.getFloat(i).toDouble)
        if (xv > m) m = xv
        i += 1
      }
      m
    }
    // Equal lengths enforced loudly (the ANSI convention elsewhere in
    // this engine): the HOF parity formulation computes norms over FULL
    // arrays and NULLs the zip_with dot on mismatch, so a silent
    // min-length kernel would diverge from its parity reference exactly
    // on the inputs the parity test can't see.
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"graft_sq8_cosine requires equal-length arrays " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val ma = maxAbs(x); val mb = maxAbs(y)
    val n = x.numElements()
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      val qa = if (ma == 0.0) 0L else math.floor(xv / ma * 127.0 + 0.5).toLong
      val qb = if (mb == 0.0) 0L else math.floor(yv / mb * 127.0 + 0.5).toLong
      dot += qa * qb; na += qa * qa; nb += qb * qb
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ma = ctx.freshName("ma")
      val mb = ctx.freshName("mb")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException(
         |    "graft_sq8_cosine requires equal-length arrays (" +
         |      $a.numElements() + " vs " + $b.numElements() + ")");
         |double $ma = 0.0; double $mb = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 :
         |    java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($xv > $ma) $ma = $xv;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  double $yv = $b.isNullAt($i) ? 0.0 :
         |    java.lang.Math.abs((double) $b.getFloat($i));
         |  if ($yv > $mb) $mb = $yv;
         |}
         |int $n = $a.numElements();
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
         |  double $yv = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
         |  long $qa = $ma == 0.0 ? 0L :
         |    (long) java.lang.Math.floor($xv / $ma * 127.0 + 0.5);
         |  long $qb = $mb == 0.0 ? 0L :
         |    (long) java.lang.Math.floor($yv / $mb * 127.0 + 0.5);
         |  $dot += $qa * $qb; $na += $qa * $qa; $nb += $qb * $qb;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? 0.0 :
         |  (double) $dot /
         |    (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8CosineFloat =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  /** Validated scalar parameter of a registered function: must be a
    * foldable literal of the stated arity position — otherwise fail with
    * a clear analysis-time message, not a deep Catalyst internal error
    * (a user can call these from SQL with arbitrary expressions). */
  private[functions] def litNumArgPublic(fn: String, exprs: Seq[Expression],
      i: Int, what: String): Number = litNumArg(fn, exprs, i, what)

  private def litNumArg(fn: String, exprs: Seq[Expression], i: Int,
      what: String): Number = {
    if (exprs.length <= i)
      throw new IllegalArgumentException(
        s"$fn: missing argument ${i + 1} ($what)")
    val e = exprs(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} ($what) must be a literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} ($what) must be numeric, got $other")
    }
  }

  /** Idempotently register graft_dot / graft_cosine in the session's
    * function registry so `expr("graft_cosine(a,b)")` resolves. */
  def register(spark: SparkSession): Unit =
    if (registered.add(graft.CacheRegistry.sessionToken(spark))) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_dot",
        exprs => DotProductFloat(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_cosine",
        exprs => CosineSimilarityFloat(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_sq8_cosine",
        exprs => Sq8CosineFloat(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_minhash",
        exprs => MinHashSignature(exprs(0),
          litNumArg("graft_minhash", exprs, 1, "numHashes").intValue), "built-in")
      reg.createOrReplaceTempFunction("graft_simhash",
        exprs => SimHash64(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_byte_entropy",
        exprs => ByteEntropyStats(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_char_ngrams",
        exprs => CharNgramHashes(exprs(0),
          litNumArg("graft_char_ngrams", exprs, 1, "n").intValue), "built-in")
      reg.createOrReplaceTempFunction("graft_cdc_chunks",
        exprs => CdcChunkHashes(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_afp_syms",
        exprs => AfpFrameSymbols(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("graft_phash_dct",
        exprs => PhashDct(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("graft_lsh_bands",
        exprs => LshBandHashes(exprs(0),
          litNumArg("graft_lsh_bands", exprs, 1, "numBands").intValue,
          litNumArg("graft_lsh_bands", exprs, 2, "rowsPerBand").intValue),
        "built-in")
      reg.createOrReplaceTempFunction("graft_plane_dots",
        exprs => HyperplaneDots(exprs(0), Hyperplanes.generate(
          litNumArg("graft_plane_dots", exprs, 1, "numPlanes").intValue,
          litNumArg("graft_plane_dots", exprs, 2, "dim").intValue,
          litNumArg("graft_plane_dots", exprs, 3, "seed").longValue)), "built-in")
      reg.createOrReplaceTempFunction("graft_lsh_keys",
        exprs => {
          val numTables = litNumArg("graft_lsh_keys", exprs, 1, "numTables").intValue
          val bits = litNumArg("graft_lsh_keys", exprs, 2, "bitsPerTable").intValue
          PackedLshKeys(exprs(0), Hyperplanes.generate(
            numTables * bits,
            litNumArg("graft_lsh_keys", exprs, 3, "dim").intValue,
            litNumArg("graft_lsh_keys", exprs, 4, "seed").longValue), bits)
        }, "built-in")
      reg.createOrReplaceTempFunction("graft_hilbert",
        exprs => HilbertIndex2D(exprs(0), exprs(1),
          litNumArg("graft_hilbert", exprs, 2, "bits").intValue), "built-in")
      reg.createOrReplaceTempFunction("graft_bloom_contains",
        exprs => {
          if (exprs.length != 2 || !exprs(0).foldable ||
              exprs(0).dataType != BinaryType)
            throw new IllegalArgumentException(
              "graft_bloom_contains: arguments are (bloomBytes: binary " +
                "literal, key: bigint)")
          BloomMightContainLong(exprs(1),
            exprs(0).eval().asInstanceOf[Array[Byte]])
        }, "built-in")
    }

  /** Column-level API (safe on any session once register() ran). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  def sq8Cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_sq8_cosine", a, b)
  def cdcChunks(t: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cdc_chunks", t)
  /** array<struct<f:int,sym:bigint>> — fused audio-fingerprint frame
    * symbols of a 336-codepoint window (see [[AfpFrameSymbols]]). */
  def afpSyms(w: Column, kind: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_afp_syms", w, kind)
  /** struct<fp_lo:bigint,fp_hi:bigint> — fused integer 2D-DCT pHash of
    * a 256-entry pixel array (see [[PhashDct]]). */
  def phashDct(pv: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_phash_dct", pv)
  def minhash(shingleHashes: Column, numHashes: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_minhash",
      shingleHashes, org.apache.spark.sql.functions.lit(numHashes))
  def simhash64(tokenHashes: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_simhash", tokenHashes)
  /** struct(entropy: double, n_distinct: int) — byte-level Shannon stats. */
  def byteEntropy(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_byte_entropy", text)
  /** Distinct lowercased character-n-gram hashes (31-bit universe). */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_char_ngrams",
      text, lit(n))
  }
  /** Band hashes of a minhash signature (numBands entries). */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_lsh_bands",
      sig, lit(numBands), lit(rowsPerBand))
  }
  /** All v·plane dots for `numPlanes` seeded gaussian planes. */
  def planeDots(v: Column, numPlanes: Int, dim: Int, seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_plane_dots",
      v, lit(numPlanes), lit(dim), lit(seed))
  }
  /** Packed multi-table LSH signature longs (numTables entries). */
  def lshKeys(v: Column, numTables: Int, bitsPerTable: Int, dim: Int,
      seed: Long): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_lsh_keys",
      v, lit(numTables), lit(bitsPerTable), lit(dim), lit(seed))
  }
  /** Hilbert-curve index of grid cell (x, y), each in [0, 2^bits). */
  def hilbert(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_hilbert",
      x, y, lit(bits))
  }
  /** Bloom-filter membership probe over a serialized filter (bigint key). */
  def bloomContains(bloomBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.functions.lit
    org.apache.spark.sql.functions.call_function("graft_bloom_contains",
      lit(bloomBytes), key)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installs the
  * vector kernels at session build time (the config-file route; code can
  * also call GraftFunctions.register). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
      exprs => DotProductFloat(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityFloat].getName, "graft_cosine"),
      exprs => CosineSimilarityFloat(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      exprs => MinHashSignature(exprs(0),
        GraftFunctions.litNumArgPublic("graft_minhash", exprs, 1, "numHashes")
          .intValue)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      exprs => SimHash64(exprs(0))))
    ext.injectFunction((FunctionIdentifier("graft_plane_dots"),
      new ExpressionInfo(classOf[HyperplaneDots].getName, "graft_plane_dots"),
      exprs => HyperplaneDots(exprs(0), Hyperplanes.generate(
        GraftFunctions.litNumArgPublic("graft_plane_dots", exprs, 1, "numPlanes").intValue,
        GraftFunctions.litNumArgPublic("graft_plane_dots", exprs, 2, "dim").intValue,
        GraftFunctions.litNumArgPublic("graft_plane_dots", exprs, 3, "seed").longValue))))
    ext.injectFunction((FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[CharNgramHashes].getName, "graft_char_ngrams"),
      exprs => CharNgramHashes(exprs(0),
        GraftFunctions.litNumArgPublic("graft_char_ngrams", exprs, 1, "n")
          .intValue)))
    ext.injectFunction((FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBandHashes].getName, "graft_lsh_bands"),
      exprs => LshBandHashes(exprs(0),
        GraftFunctions.litNumArgPublic("graft_lsh_bands", exprs, 1, "numBands").intValue,
        GraftFunctions.litNumArgPublic("graft_lsh_bands", exprs, 2, "rowsPerBand").intValue)))
    ext.injectFunction((FunctionIdentifier("graft_lsh_keys"),
      new ExpressionInfo(classOf[PackedLshKeys].getName, "graft_lsh_keys"),
      exprs => {
        val numTables = GraftFunctions.litNumArgPublic("graft_lsh_keys", exprs, 1, "numTables").intValue
        val bits = GraftFunctions.litNumArgPublic("graft_lsh_keys", exprs, 2, "bitsPerTable").intValue
        PackedLshKeys(exprs(0), Hyperplanes.generate(
          numTables * bits,
          GraftFunctions.litNumArgPublic("graft_lsh_keys", exprs, 3, "dim").intValue,
          GraftFunctions.litNumArgPublic("graft_lsh_keys", exprs, 4, "seed").longValue), bits)
      }))
  }
}
