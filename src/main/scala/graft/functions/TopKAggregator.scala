package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k as a typed `Aggregator` (the §2.C custom-UDAF
  * surface, and the one Aggregator SURVEY.md §4 budgets for similarity
  * search).
  *
  * Why it matters at scale: `Window(row_number) ≤ k` must shuffle EVERY
  * scored pair to its group's partition before discarding all but k. An
  * Aggregator participates in partial aggregation — each map task keeps
  * only its local top-k, so the shuffle carries `partitions × k` rows
  * instead of the full cross product. At 100 TB that is the difference
  * between a bounded and an unbounded shuffle.
  *
  * Scores are (score, id); ordering is (score desc, id asc) — the same
  * deterministic tie-break the window formulation uses, so results are
  * identical and oracle-comparable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** Total order, NaN included: `java.lang.Double.compare` ranks NaN above
    * every real score — the same total order Spark's sort/window uses — so
    * a NaN cosine (zero vector, NaN embedding component) lands in the same
    * position under both formulations. Raw `>`/`==` are false for every
    * NaN comparison, which would silently corrupt the sorted-buffer
    * invariant and drop/misplace rows relative to the window plan. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** Insert keeping the buffer sorted best-first, truncated at k. */
  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front ++ ((x +: back))).take(k)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
