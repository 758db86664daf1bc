package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe for runtime join reduction.
  *
  * `graft_bloom_contains(key)` returns true iff `key` MIGHT be in the
  * filter (no false negatives, tunable false-positive rate). Used by
  * [[graft.operators.BloomJoin]] to drop fact-side rows at the SCAN,
  * before they reach a join exchange — the explicit, always-on form of
  * Spark's stats-gated `InjectRuntimeFilter`.
  *
  * The filter travels as its serialized bytes (a plan-embedded constant,
  * shipped to executors once with the task binary like any codegen
  * reference) and is deserialized lazily once per executor JVM; the
  * per-row probe is a handful of xxhash64 bit tests, inside whole-stage
  * codegen.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Called from generated code. */
  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint (cast the key), got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
