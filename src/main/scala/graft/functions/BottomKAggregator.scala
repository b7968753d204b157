package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded bottom-k of DISTINCT longs as a typed `Aggregator` — the
  * KMV (k-minimum-values) sketch builder behind
  * [[graft.operators.Dedup.sourceSketches]].
  *
  * Why an Aggregator and not `collect_set → sort → slice`: `collect_set`
  * materializes EVERY distinct value per group before the final slice, so
  * its partial-aggregation buffer grows with corpus cardinality — at 100 TB
  * a single source's set is billions of digests. This buffer is bounded at
  * k longs by construction, participates in partial aggregation (each map
  * task ships at most k values per group), and dedups on insert, so the
  * shuffle carries `partitions × k` longs per source no matter how large
  * the corpus is.
  *
  * The buffer invariant is ascending-sorted distinct, truncated at k —
  * exactly `sortedDistinct.take(k)`, which is what makes the result
  * oracle-comparable against a SQL `list_sort(list(DISTINCT v))[1:k]`.
  */
class BottomKAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  /** Insert keeping the buffer ascending-sorted and distinct, ≤ k. */
  private def insert(buf: Seq[Long], x: Long): Seq[Long] = {
    // full buffer and x ≥ max: either a duplicate of the max or too large
    if (buf.length >= k && x >= buf.last) buf
    else {
      val (front, back) = buf.span(_ < x)
      if (back.nonEmpty && back.head == x) buf // duplicate
      else ((front :+ x) ++ back).take(k)
    }
  }

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
