package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed top-K aggregator (`Aggregator[IN, BUF, OUT]` — the user-facing typed
  * UDAF surface; `udaf()` lowers it to a TypedImperativeAggregate with
  * map-side partials, so each partition contributes at most K values to the
  * shuffle instead of its whole input — the aggregation-shaped alternative
  * to a window + row_number top-N when only the VALUES are needed.
  *
  * Output is the multiset of the K largest inputs in descending order —
  * well-defined under ties, so it oracles exactly against a row_number
  * top-N in SQL.
  */
case class TopKAggregator(k: Int)
    extends Aggregator[Double, Seq[Double], Seq[Double]] {

  private def trim(s: Seq[Double]): Seq[Double] =
    s.sorted(Ordering[Double].reverse).take(k)

  override def zero: Seq[Double] = Nil
  override def reduce(b: Seq[Double], a: Double): Seq[Double] = trim(a +: b)
  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] = trim(x ++ y)
  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object TopKAgg {
  /** Column form for DataFrame aggregations. */
  def top_k(c: Column, k: Int): Column =
    udaf(TopKAggregator(k), Encoders.scalaDouble)(c)
}
