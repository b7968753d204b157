package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter summary as a typed `Aggregator`
  * (the frequent-items sketch; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * The summary holds at most `k` (token → counter) entries. Guarantees,
  * for a stream of n items:
  *  - SUPERSET: every token with true frequency > n/(k+1) is present in
  *    the final summary (so a candidate set drawn from the summary can
  *    feed an EXACT recount whose top-N is provably complete whenever
  *    the N-th heaviest item clears that bar);
  *  - COUNT BOUND: for every kept token,
  *    `true − n/(k+1) ≤ counter ≤ true` — counters only ever
  *    underestimate, by at most n/(k+1). Both gated in MisraGriesSuite.
  *
  * Why it matters at 100 TB: an exact `groupBy(token)` shuffles the full
  * vocabulary — billions of distinct keys for web-scale n-grams. This
  * aggregator participates in partial aggregation, so each map task
  * reduces its partition to ≤ k entries and the shuffle carries
  * `partitions × k` rows; the follow-up exact recount touches only the
  * ≤ k candidates (a broadcast semi-join, no vocabulary-wide shuffle).
  *
  * Determinism note: WHICH below-threshold tail tokens survive depends
  * on partition boundaries, but the guarantees above do not — the
  * heavy-hitter recount (q110) is exact and partition-independent.
  *
  * The reduce step is the classic decrement-all-on-overflow, amortized
  * O(1) per item (each decrement cancels one earlier increment); merge
  * sums counters then subtracts the (k+1)-th largest from every entry,
  * dropping non-positives.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"MisraGries summary size must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)            => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      val kth = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
