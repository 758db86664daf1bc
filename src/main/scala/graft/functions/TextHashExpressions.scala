package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused text-hash kernels for the dedup pipeline.
  *
  * The higher-order-function formulations (64 separate
  * `array_min(transform(...))` passes for MinHash, 64 `filter`+`size`
  * passes for SimHash) are correct but generate enormous codegen units —
  * multi-second janino compiles that dominate small benchmarks and real
  * clusters' first-query latency, plus 64 array materializations per row.
  * Each kernel here is one tight loop, compiled in milliseconds, with
  * identical output values to the HOF versions (asserted by
  * DedupSpec's parity tests).
  */

/** MinHash signature: for hash i, min over shingles h of
  * (a_i*h + b_i) mod p with p = 2^31-19 (31-bit universe keeps a*h+b
  * < 2^63: no overflow under ANSI). Returns array<bigint> of length
  * `numHashes`; null input or empty shingle set → null. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  private val P31 = 2147483629L

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => (1000003L * (i + 1) + 12345L) % P31)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => (777767777L * (i + 1) + 7L) % P31)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    var nonNull = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        nonNull += 1
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = (as(i) * h + bs(i)) % P31
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (nonNull == 0) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val nonNull = ctx.freshName("nonNull")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $nonNull = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    $nonNull++;
         |    long $h = $c.getLong($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $v = ($aRef[$i] * $h + $bRef[$i]) % ${P31}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |if ($nonNull == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct character-n-gram hashes of the lowercased input, 31-bit
  * universe, one pass. The HOF formulation
  * (`transform(sequence(...), i => xxhash64(substr(lower(text), i, n)))`)
  * re-evaluates `lower(text)` and copies a substring PER n-gram —
  * Catalyst does not CSE computed values inside lambda bodies, so it is
  * O(len²) in char operations; this kernel lowercases once and rolls a
  * polynomial hash over the chars. First-occurrence order, like
  * array_distinct. Interpreted eval (CodegenFallback): the set logic
  * doesn't fit an expression template, and the op is one projection. */
case class CharNgramHashes(child: Expression, n: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val P31 = 2147483629L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    // codepoints, not UTF-16 units: n-gram boundaries must not split
    // surrogate pairs (Spark's substr — the HOF reference — is
    // codepoint-indexed too)
    val cps = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toLowerCase.toString.codePoints().toArray
    val count = cps.length - n + 1
    if (count < 1) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < count) {
      var h = 0L
      var j = 0
      while (j < n) {
        h = (h * 1000003L + cps(i + j)) % P31
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** LSH band hashes: splits a minhash signature into `numBands`
  * contiguous groups of `rowsPerBand` values and hashes each group with
  * a 64-bit polynomial fold. Any deterministic group hash yields the
  * same final near-dup pairs (equal sub-signatures collide identically;
  * spurious collisions are eliminated by the exact-Jaccard verify), so
  * this replaces the xxhash64(array_join(transform(slice(...)))) HOF
  * stack — 16 string-building passes per row — with one loop. */
case class LshBandHashes(child: Expression, numBands: Int, rowsPerBand: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 1125899906842597L
      var j = 0
      while (j < rowsPerBand) {
        val idx = b * rowsPerBand + j
        val v = if (idx < sig.numElements() && !sig.isNullAt(idx))
          sig.getLong(idx) else -1L
        h = h * 1000003L ^ v
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $h = 1125899906842597L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    int $idx = $b * $rowsPerBand + $j;
         |    long $v = ($idx < $c.numElements() && !$c.isNullAt($idx))
         |      ? $c.getLong($idx) : -1L;
         |    $h = $h * 1000003L ^ $v;
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandHashes =
    copy(child = newChild)
}

/** 64-bit SimHash over an array of token hashes: bit j of the result is
  * set iff at least half the tokens have bit j set (ones*2 >= n over
  * non-null tokens — identical to the filter/size HOF formulation).
  * Null input → null; empty input → 0 with all "majority" bits set by
  * the >= convention is avoided by returning 0 explicitly. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var total = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        total += 1
        val h = arr.getLong(j)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1
          i += 1
        }
      }
      j += 1
    }
    if (total == 0) 0L
    else {
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (counts(i) * 2 >= total) fp |= (1L << i)
        i += 1
      }
      fp
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val total = ctx.freshName("total")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[64];
         |int $total = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$c.isNullAt($j)) {
         |    $total++;
         |    long $h = $c.getLong($j);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $counts[$i]++;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |if ($total > 0) {
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($counts[$i] * 2 >= $total) $fp |= (1L << $i);
         |  }
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Byte-level Shannon-entropy stats of a string, one pass:
  * struct(entropy: double  — H = -Σ p_b·log2(p_b) over byte frequencies,
  *        n_distinct: int  — distinct byte values).
  *
  * The quality-filter primitive for low-entropy junk (repeated
  * boilerplate, padding, binary spill) at corpus scale: a single
  * codegen'd projection per document — the naive formulation (explode
  * one row per character then groupBy doc) shuffles |corpus chars| rows,
  * ~3 orders of magnitude more than documents. On ASCII corpora byte
  * entropy equals character entropy; for multi-byte UTF-8 it remains a
  * monotone junk signal (documented, not codepoint-exact).
  *
  * Determinism (the text_zipf_slope convention): each per-byte term
  * -p·log2(p) is rounded to 9dp and accumulated as exact integer
  * nano-units, so the sum is order-free and bit-identical to the DuckDB
  * oracle's `SUM(CAST(round(term, 9) AS DECIMAL(18,9)))`; the final
  * nano→double division is IEEE-correctly-rounded in both engines.
  * Empty string → null (oracle side emits no row for it either). */
case class ByteEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_byte_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .getBytes
    val n = bytes.length
    if (n == 0) return null
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var hNanos = 0L
    var distinct = 0
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) {
        distinct += 1
        val p = c.toDouble / n
        hNanos += Math.round(-p * (Math.log(p) / Math.log(2.0)) * 1e9)
      }
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hNanos / 1e9, distinct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val distinct = ctx.freshName("distinct")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $counts = new int[256];
         |  for (int $i = 0; $i < $n; $i++) $counts[$bytes[$i] & 0xff]++;
         |  long $h = 0L;
         |  int $distinct = 0;
         |  for (int $b = 0; $b < 256; $b++) {
         |    int $cnt = $counts[$b];
         |    if ($cnt > 0) {
         |      $distinct++;
         |      double $p = (double) $cnt / $n;
         |      $h += Math.round(-$p * (Math.log($p) / Math.log(2.0)) * 1e9);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |    .GenericInternalRow(new Object[]{$h / 1e9, $distinct});
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteEntropyStats =
    copy(child = newChild)
}

/** Content-defined-chunking chunk digests (the mm_cdc_dedup kernel):
  * boundary after codepoint i (1-based, i ≥ 8) wherever the 31-ary
  * polynomial hash of the trailing 8 clamped codepoints
  * h(i) = Σ_{j=0..7} min(cp_{i−j}, 255)·31^j ≡ 0 (mod 32); chunks are
  * the substrings between consecutive boundaries (plus the string's
  * ends), each digested as lowercase-hex md5 of its UTF-8 bytes —
  * byte-for-byte the HOF formulation
  * `md5(substring(t, bp[k]+1, bp[k+1]−bp[k]))` over
  * `filter(transform(sequence(8, len), ...))`, which runs 8 substring
  * probes per position (O(8·len) interpreted HOF calls per row); this
  * is one loop per row, emitted as a codegen'd static call (no per-row
  * InternalRow boxing — the CodegenFallback wrapper it replaced boxed
  * every input row; r14 verdict nit). Parity with the HOF stack is
  * pinned by the DuckDB gate (the oracle keeps the spelled-out
  * formulation) and the TextMultimodalSpec HOF-parity test. Non-empty
  * strings shorter than 8 codepoints yield the single whole-string
  * chunk; the EMPTY string yields an empty array (no chunk), matching
  * the HOF stack where `range(8, len+1)` is empty and the final
  * zero-length slice produces no substring. */
case class CdcChunkHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunkHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CdcChunkHashes.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}

object CdcChunkHashes {
  /** One-loop boundary scan + per-chunk md5, shared by interpreted eval
    * and the generated code (static forwarder). */
  def compute(u: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = u.toString
    // codepoints, not UTF-16 units: the HOF reference (substring/ascii)
    // is codepoint-indexed
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // boundary positions (1-based codepoint indices), ends included
    val bp = scala.collection.mutable.ArrayBuffer(0)
    var i = 8
    while (i <= n) {
      var h = 0L
      var j = 0
      var pow = 1L
      while (j < 8) {
        h += math.min(cps(i - 1 - j), 255).toLong * pow
        pow *= 31L
        j += 1
      }
      if (h % 32 == 0) bp += i
      i += 1
    }
    bp += n
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](bp.length - 1)
    var written = 0
    var k = 0
    while (k < bp.length - 1) {
      val from = bp(k)
      val to = bp(k + 1)
      if (to > from) {
        // slice codepoints [from, to) and digest their UTF-8 bytes —
        // identical to md5(substring(t, from+1, to-from))
        val sb = new java.lang.StringBuilder()
        var c = from
        while (c < to) { sb.appendCodePoint(cps(c)); c += 1 }
        md.reset()
        val dig = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(b * 2) = "0123456789abcdef".charAt((dig(b) >> 4) & 0xf)
          hex(b * 2 + 1) = "0123456789abcdef".charAt(dig(b) & 0xf)
          b += 1
        }
        out(written) =
          org.apache.spark.unsafe.types.UTF8String.fromString(
            new String(hex))
        written += 1
      }
      k += 1
    }
    new GenericArrayData(out.take(written))
  }
}
