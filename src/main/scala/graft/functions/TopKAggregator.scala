package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) entry of a top-k state. */
case class TopKEntry(score: Double, id: Long)
/** Bounded top-k aggregation state (≤ k entries, kept ordered). */
case class TopKBuf(entries: Seq[TopKEntry])

/** Bounded top-k aggregation: per group, the k largest (score, id) pairs
  * without sorting the group.
  *
  * The window-function formulation (`row_number() over (partition by g
  * order by score desc) <= k`) shuffles and SORTS every row of every
  * group; this `Aggregator` keeps a k-element bound per partition and
  * merges bounds pairwise, so the shuffle carries at most k entries per
  * group per partition (classic distributive top-k — the same reason
  * Spark plans ORDER BY LIMIT as TakeOrderedAndProject). At 100 TB the
  * difference is a full sort of the fact table vs a map-side-combined
  * agg whose state is k entries.
  *
  * Ties break toward the smaller id (deterministic across partitionings
  * and engines). Buffer is a small sorted Vector — k is small by
  * contract; swap for a binary heap if k grows past a few hundred.
  */
class TopKAggregator(k: Int)
  extends Aggregator[TopKEntry, TopKBuf, TopKBuf] {

  /** Descending score, ascending id on ties. */
  private def lt(a: TopKEntry, b: TopKEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(buf: TopKBuf, row: TopKEntry): TopKBuf = insert(buf, row)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    b.entries.foldLeft(a)(insert)

  private def insert(buf: TopKBuf, row: TopKEntry): TopKBuf =
    if (buf.entries.size >= k && lt(buf.entries.last, row)) buf
    else TopKBuf((buf.entries :+ row).sortWith(lt).take(k))

  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAggregator {
  /** Column form: struct with ordered top-k `entries` per group. */
  def topK(score: Column, id: Column, k: Int): Column = {
    val agg = org.apache.spark.sql.functions.udaf(new TopKAggregator(k))
    agg(score, id)
  }
}
