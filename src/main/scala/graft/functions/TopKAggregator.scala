package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as a typed Aggregator (SURVEY.md §2.6 T1/T2 at
  * scale): dumbo's `nlargestreducer(n)`/`nlargestcombiner(n)` pair is
  * one Aggregator — `reduce` is the combiner (map-side, bounded heap),
  * `merge` the reducer. Memory is O(k) per group on every path, so the
  * shuffle carries at most k values per key regardless of group size —
  * the property that makes per-key top-k viable on 100 TB skewed keys
  * (a Window+row_number sorts whole groups instead).
  *
  * Register with `functions.udaf(TopKAggregator(k))` for DataFrame use.
  */
case class TopKAggregator(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {

  override def zero: List[Double] = Nil

  // keep a descending-sorted list of at most k elements; List is fine
  // for small k (the only supported regime)
  private def insert(buf: List[Double], v: Double): List[Double] = {
    if (buf.size >= k && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      (hi ::: (v :: lo)).take(k)
    }
  }

  override def reduce(buf: List[Double], v: Double): List[Double] = insert(buf, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(r: List[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
