package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Guard against corpus-wide single-partition windows (round-9 verdict
  * ask): a `Window.orderBy` with NO partitionBy moves its entire input to
  * one task — acceptable only above a BOUNDED frame (post-aggregation,
  * top-k pool, limit). `text_pack_offsets` shipped one over the raw
  * corpus in round 9; this spec makes the next one fail a test instead
  * of only the 100 TB deployment.
  */
class WindowGuardSpec extends SparkTestBase {

  /** A plan is bounded if every path to a leaf passes through an
    * aggregation, a limit/top-k, or a local (literal) relation — joins,
    * unions, projections of bounded inputs stay bounded. Cached frames
    * recurse into the cached physical plan. `LogicalRDD` leaves
    * (localCheckpoint) and file scans are unbounded.
    */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec          => true
    case _: TakeOrderedAndProjectExec  => true
    case _: GlobalLimitExec            => true
    case _: LocalLimitExec             => true
    case _: CollectLimitExec           => true
    case _: LocalTableScanExec         => true
    // a broadcast side is bounded by construction (driver-collected,
    // capped by the broadcast threshold)
    case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => true
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      bounded(r.child)
    case r: RangeExec                  => r.range.numElements <= 100000
    case a: AdaptiveSparkPlanExec      => bounded(a.executedPlan)
    case i: InMemoryTableScanExec      => bounded(i.relation.cachedPlan)
    case other if other.children.nonEmpty => other.children.forall(bounded)
    case _                             => false
  }

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other                    => other
  }

  test("no unpartitioned window executes over an unbounded input") {
    // connector_* excluded: they run through the embedded sharing server
    // (exercised by their own suites) and their fixtures are row-capped.
    val offenders = for {
      q <- SparkEntry.allDefs
      if !q.name.startsWith("connector_") && !q.name.startsWith("stream_")
      plan = unwrap(q.build(spark, sf0001).queryExecution.executedPlan)
      _ = CacheRegistry.releaseAll()
      w <- plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      if !bounded(w.child)
    } yield q.name
    assert(offenders.isEmpty,
      s"global windows over unbounded inputs: ${offenders.distinct.mkString(", ")}")
  }
}
