package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused audio-fingerprint frame-symbol kernel (mm_audio_fingerprint /
  * mm_afp_prebuilt decode stage).
  *
  * The spelled-out formulation — a 320-element HOF sample decode followed
  * by a projection of 14 sixteen-term linear combinations (7-bin integer
  * DFT) and a filter whose `sort_array(struct(...))` re-inlined all 14
  * DFT expressions a second time — exceeded the JVM's 64 KB generated-
  * method limit: janino failed with "Code grows beyond 64 KB", Spark
  * disabled whole-stage codegen for the stage, and the heaviest bench
  * family's decode ran INTERPRETED with the DFT computed twice per row
  * (round-14 verdict, What's wrong #1). This expression fuses decode +
  * DFT + top-3-band ranking + digit-length packing into ONE loop per
  * (doc, kind) — 20 frames per call instead of 20 rows × 14 interpreted
  * expressions — emitted via a tiny static call that keeps the whole
  * stage comfortably inside codegen.
  *
  * Semantics (byte-for-byte the HOF/linear-combination formulation, and
  * the DuckDB oracle keeps the spelled-out SQL so the correctness gate
  * pins kernel parity on every run; AudioKernelSpec additionally pins
  * parity against the in-Spark HOF formulation):
  *  - input `w` = first 336 codepoints of the document text; `kind` 0 =
  *    original samples `min(cp_i,255) - 64`, kind 1 = 16-sample-shifted
  *    requantized `(min(cp_{i+16},255) div 4)*4 - 64`; positions past
  *    `length(w)` are silence (0).
  *  - per frame f ∈ [0,20): cr_b = Σ_{j<16} C(b,j)·s_{16f+j},
  *    ci_b = Σ S(b,j)·s_{16f+j} with the e3-scaled integer tables
  *    C(b,j) = round(1000·cos(2π(b+1)j/16)), S likewise (ONE definition,
  *    rendered into the oracle SQL by Multimodal.afBandsValuesSql).
  *  - band energies e_b = cr_b² + ci_b² (exact in BIGINT: |s| ≤ 191,
  *    |coef| ≤ 1000 ⇒ |cr| ≤ 3.06e6, e ≤ 1.9e13 ≪ 2^63); rank e desc,
  *    b asc; frames with top energy 0 are dropped (all-silence frames).
  *  - sym = (((b0·7 + b1)·7 + b2)·16 + digits(e0))·16 + digits(e1),
  *    digits = decimal-string length — max 87807 < 87809, the landmark
  *    hash's injectivity bound.
  *
  * Returns array<struct<f:int, sym:bigint>> of the surviving frames in
  * frame order (possibly empty); null input → null.
  */
case class AfpFrameSymbols(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("f", IntegerType, nullable = false),
      StructField("sym", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_afp_syms"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(w: Any, kind: Any): Any =
    AfpFrameSymbols.compute(w.asInstanceOf[UTF8String],
      kind.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, kind) => {
      s"${ev.value} = graft.functions.AfpFrameSymbols.compute($w, $kind);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AfpFrameSymbols =
    copy(left = newLeft, right = newRight)
}

object AfpFrameSymbols {
  final val Frames = 20
  final val FrameLen = 16
  final val Bands = 7

  /** e3-scaled integer DFT coefficient tables, flattened b*16+j. The
    * SINGLE definition — Multimodal renders the oracle SQL VALUES from
    * these, so the two engines can never drift on the spectra. */
  val C: Array[Long] = Array.tabulate(Bands * FrameLen) { i =>
    val b = i / FrameLen; val j = i % FrameLen
    math.round(1000.0 * math.cos(2 * math.Pi * (b + 1) * j / FrameLen))
  }
  val S: Array[Long] = Array.tabulate(Bands * FrameLen) { i =>
    val b = i / FrameLen; val j = i % FrameLen
    math.round(1000.0 * math.sin(2 * math.Pi * (b + 1) * j / FrameLen))
  }

  /** One pass over the (≤336-codepoint) window: decode, 7-bin DFT,
    * top-3 ranking, symbol packing for all 20 frames. Called from both
    * interpreted eval and the generated code (static forwarder). */
  def compute(w: UTF8String, kind: Int): ArrayData = {
    val cps = w.toString.codePoints().toArray
    val n = cps.length
    val out = new Array[AnyRef](Frames)
    var written = 0
    val cr = new Array[Long](Bands)
    val ci = new Array[Long](Bands)
    var f = 0
    while (f < Frames) {
      java.util.Arrays.fill(cr, 0L)
      java.util.Arrays.fill(ci, 0L)
      var j = 0
      while (j < FrameLen) {
        // 1-based text position p = 16f + j + 1; silence (0) past the end
        val p = FrameLen * f + j + 1
        val smp: Long =
          if (kind == 0) {
            if (p <= n) math.min(cps(p - 1), 255).toLong - 64L else 0L
          } else {
            if (p + 16 <= n) (math.min(cps(p + 15), 255).toLong / 4L) * 4L - 64L
            else 0L
          }
        if (smp != 0L) {
          val base = j
          var b = 0
          while (b < Bands) {
            cr(b) += C(b * FrameLen + base) * smp
            ci(b) += S(b * FrameLen + base) * smp
            b += 1
          }
        }
        j += 1
      }
      // top-3 bands, e desc then b asc (strict > keeps earlier = smaller
      // b on energy ties, identical to sort (e desc, b asc))
      var e0 = -1L; var e1 = -1L; var e2 = -1L
      var b0 = 0; var b1 = 0; var b2 = 0
      var b = 0
      while (b < Bands) {
        val e = cr(b) * cr(b) + ci(b) * ci(b)
        if (e > e0) {
          e2 = e1; b2 = b1; e1 = e0; b1 = b0; e0 = e; b0 = b
        } else if (e > e1) {
          e2 = e1; b2 = b1; e1 = e; b1 = b
        } else if (e > e2) {
          e2 = e; b2 = b
        }
        b += 1
      }
      if (e0 > 0L) {
        val sym = (((b0.toLong * 7L + b1) * 7L + b2) * 16L +
          java.lang.Long.toString(e0).length) * 16L +
          java.lang.Long.toString(e1).length
        out(written) = new GenericInternalRow(
          Array[Any](f, sym))
        written += 1
      }
      f += 1
    }
    new GenericArrayData(
      if (written == Frames) out else java.util.Arrays.copyOf(out, written))
  }
}
