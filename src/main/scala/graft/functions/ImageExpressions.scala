package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused integer 2D-DCT perceptual-hash kernel (mm_phash_dedup).
  *
  * The spelled-out formulation exploded 16 row-pass rows per media and
  * pushed them through a 64-column map-side-combined aggregate (the
  * column pass) — one exchange of a 16×-fanned frame plus 64 aggregate
  * buffers per group, per media, per run. The DCT is a fixed 16×16→8×8
  * integer transform of ONE row's pixel array, so this expression fuses
  * the row pass, column pass and sign-bit packing into a single loop
  * per (doc, kind) row: scoring becomes map-only.
  *
  * Semantics (bit-for-bit the two-stage aggregate formulation, which
  * the DuckDB oracle keeps spelled out — the correctness gate pins
  * kernel parity on every run; PhashKernelSpec additionally pins parity
  * against the in-Spark aggregate formulation):
  *  - input `pv` = the 256-entry pixel array (codepoints, requantized
  *    upstream for kind 1; zero-padded past the text end);
  *  - row pass R(u,c) = Σ_{r<16} K(u,r)·pv[16r+c], column pass
  *    D(u,v) = Σ_{c<16} R(u,c)·K(v,c), with the e3-scaled integer
  *    DCT-II table K(u,r) = round(1000·cos(π(2r+1)u/32)) — ONE
  *    definition here; Multimodal renders the oracle VALUES from it.
  *    Exact in BIGINT: |pv| ≤ 0x10FFFF, |K| ≤ 1000 ⇒ |R| ≤ 1.8e10,
  *    |D| ≤ 2.8e14 ≪ 2^63.
  *  - bit(u·8+v) = D(u,v) > 0; bits 0..31 → fp_lo, 32..63 → fp_hi.
  *
  * Returns struct<fp_lo:bigint, fp_hi:bigint>; null input → null.
  */
case class PhashDct(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fp_lo", LongType, nullable = false),
    StructField("fp_hi", LongType, nullable = false)))
  override def prettyName: String = "graft_phash_dct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> or array<bigint>, got ${t.sql}")
  }

  private def isLong: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(pv: Any): Any =
    PhashDct.compute(pv.asInstanceOf[ArrayData], isLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, pv => {
      s"${ev.value} = graft.functions.PhashDct.compute($pv, $isLong);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): PhashDct = copy(child = newChild)
}

object PhashDct {
  final val Side = 16
  final val Out = 8

  /** e3-scaled 8×16 DCT-II coefficient table, flattened u·16+r — the
    * SINGLE definition (Multimodal renders the oracle SQL VALUES from
    * it, so the engines can never drift on the transform). */
  val K: Array[Long] = Array.tabulate(Out * Side) { i =>
    val u = i / Side; val r = i % Side
    math.round(1000.0 * math.cos(math.Pi * (2 * r + 1) * u / 32.0))
  }

  /** One pass over the 256-entry pixel array: row DCT, column DCT,
    * sign-bit packing. Called from both interpreted eval and the
    * generated code (static forwarder). */
  def compute(pv: ArrayData, isLong: Boolean): InternalRow = {
    val p = new Array[Long](Side * Side)
    var i = 0
    while (i < Side * Side) {
      p(i) = if (isLong) pv.getLong(i) else pv.getInt(i).toLong
      i += 1
    }
    // R(u,c) = Σ_r K(u,r)·p[16r+c]
    val rp = new Array[Long](Out * Side)
    var u = 0
    while (u < Out) {
      var c = 0
      while (c < Side) {
        var acc = 0L
        var r = 0
        while (r < Side) { acc += K(u * Side + r) * p(Side * r + c); r += 1 }
        rp(u * Side + c) = acc
        c += 1
      }
      u += 1
    }
    // D(u,v) = Σ_c R(u,c)·K(v,c); bit = D > 0
    var lo = 0L
    var hi = 0L
    u = 0
    while (u < Out) {
      var v = 0
      while (v < Out) {
        var acc = 0L
        var c = 0
        while (c < Side) { acc += rp(u * Side + c) * K(v * Side + c); c += 1 }
        if (acc > 0L) {
          val idx = u * Out + v
          if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
        }
        v += 1
      }
      u += 1
    }
    new GenericInternalRow(Array[Any](lo, hi))
  }
}
