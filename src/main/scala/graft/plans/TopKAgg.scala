package graft.plans

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions}

/** Bounded top-k aggregator: keeps the k best (score DESC, id ASC)
  * pairs seen so far.
  *
  * Scale rationale (SURVEY §2 E6): ranking neighbors with a window
  * function sorts EVERY scored pair inside each query's partition; this
  * aggregator is a mergeable bounded buffer, so map-side partial
  * aggregation reduces each partition to k rows before the shuffle —
  * at 100 TB the exchange carries O(queries × k) rows instead of
  * O(queries × corpus).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
    best(b :+ ((a._2, a._1)))
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(b1 ++ b2)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** String-keyed TopKAgg twin: top-k (score DESC, term ASC) for queries
  * that rank a string key (tokens, terms). Same bounded-buffer merge
  * discipline — map-side partials reduce each partition to k rows, so a
  * vocabulary-sized rank (10⁸⁺ tokens at web scale) never single-
  * partition-sorts. Scala String ordering is per-char UTF-16 compare,
  * which on the ASCII tokens used here matches SQL VARCHAR ordering.
  */
class TopKStrAgg(k: Int)
    extends Aggregator[(String, Double), Seq[(Double, String)], Seq[(Double, String)]] {

  private def best(xs: Seq[(Double, String)]): Seq[(Double, String)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def zero: Seq[(Double, String)] = Nil
  override def reduce(b: Seq[(Double, String)], a: (String, Double)): Seq[(Double, String)] =
    best(b :+ ((a._2, a._1)))
  override def merge(b1: Seq[(Double, String)], b2: Seq[(Double, String)]): Seq[(Double, String)] =
    best(b1 ++ b2)
  override def finish(b: Seq[(Double, String)]): Seq[(Double, String)] = b

  override def bufferEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column-level UDAF: topk(idCol, scoreCol) → array<struct<score,id>>. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new TopKAgg(k), ExpressionEncoder[(Long, Double)]())

  /** String-keyed variant: topk(termCol, scoreCol) → array<struct<score,term>>. */
  def udafStrFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(new TopKStrAgg(k), ExpressionEncoder[(String, Double)]())
}
