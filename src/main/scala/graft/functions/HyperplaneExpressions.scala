package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused hyperplane-projection kernels for LSH/IVF similarity search.
  *
  * The HOF formulation computes each of the N plane dots as a separate
  * `aggregate(zip_with(v, lit(plane), ...))` expression — N×dim literal
  * elements in the plan, N intermediate arrays per row, and a codegen
  * unit that takes seconds to compile at N=96. These kernels do the
  * whole matrix-vector product in one nested loop over a single
  * broadcast-referenced `double[][]`; output values are bit-identical
  * (same element order, same double accumulation — SimilaritySpec
  * asserts parity against the HOF path).
  */
object Hyperplanes {
  /** Deterministic seeded gaussian planes — the shared generator for the
    * operator layer and the kernels (same stream ⇒ same planes). */
  def generate(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}

/** All dot products v·planes(p) for a constant plane matrix, as one
  * fused loop. Returns array<double> of length planes.length. Null
  * vector → null; null elements are treated as 0 (embeddings carry no
  * nulls; documented divergence from the HOF path, which nulls the
  * whole dot). */
case class HyperplaneDots(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_plane_dots"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) acc += v.getFloat(j).toDouble * plane(j)
        j += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      s"""
         |double[] $out = new double[$planesRef.length];
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($c.numElements(), $plane.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$c.isNullAt($j)) $acc += (double) $c.getFloat($j) * $plane[$j];
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneDots =
    copy(child = newChild)
}

/** Multi-table LSH keys: packs sign bits of the plane dots into
  * `planes.length / bitsPerTable` longs (bit j of table t is set iff
  * v·planes(t*bitsPerTable+j) > 0 — strict, matching the HOF
  * `when(dot > 0, ...)`). Returns array<bigint>. */
case class PackedLshKeys(child: Expression, planes: Array[Array[Double]],
    bitsPerTable: Int) extends UnaryExpression {

  private val numTables = planes.length / bitsPerTable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var j = 0
      while (j < bitsPerTable) {
        val plane = planes(t * bitsPerTable + j)
        val n = math.min(v.numElements(), plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) acc += v.getFloat(i).toDouble * plane(i)
          i += 1
        }
        if (acc > 0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      val plane = ctx.freshName("plane")
      s"""
         |long[] $out = new long[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bitsPerTable; $j++) {
         |    double[] $plane = $planesRef[$t * $bitsPerTable + $j];
         |    int $n = java.lang.Math.min($c.numElements(), $plane.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$c.isNullAt($i)) $acc += (double) $c.getFloat($i) * $plane[$i];
         |    }
         |    if ($acc > 0) $sig |= (1L << $j);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PackedLshKeys =
    copy(child = newChild)
}
