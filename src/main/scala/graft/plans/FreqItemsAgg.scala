package graft.plans

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Bounded heavy-hitters aggregator (Misra–Gries, public algorithm;
  * mergeable form per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Keeps at most `k` counters. Guarantee: every item with true frequency
  * > n/(k+1) survives, and each kept counter undercounts by at most
  * n/(k+1). The summary is MERGEABLE — map-side partial aggregation
  * reduces every partition to k counters before the shuffle, so finding
  * the top talkers over 100 TB of events exchanges O(partitions × k)
  * rows. The exact groupBy-count alternative shuffles every distinct
  * key; this is the sketch path for "terms aggregation" dashboards over
  * high-cardinality fields.
  */
class FreqItemsAgg(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], item: Long): Map[Long, Long] = {
    if (b.contains(item)) b.updated(item, b(item) + 1L)
    else if (b.size < k) b.updated(item, 1L)
    else {
      // decrement-all step: drop zeros, charging one count to every
      // counter (including the arriving item, which is discarded)
      b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }
  }

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
    val sum = (b1.keySet ++ b2.keySet).iterator
      .map(key => key -> (b1.getOrElse(key, 0L) + b2.getOrElse(key, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything, keep > 0 —
      // at most k survive and the error bound telescopes across merges
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[Long, Long]): Seq[(Long, Long)] =
    b.toSeq.sortBy { case (item, cnt) => (-cnt, item) }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object FreqItemsAgg {
  /** Column-level UDAF: freq_items(itemCol) → array<struct<item,count>>,
    * sorted by estimated count DESC with item tiebreak.
    */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new FreqItemsAgg(k), ExpressionEncoder[Long]())
}
