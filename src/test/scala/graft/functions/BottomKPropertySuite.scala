package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: a [[BottomKAggregator]] buffer is ALWAYS exactly
  * `sortedDistinct.take(k)` of everything it has absorbed, under any
  * reduce/merge tree — the invariant the KMV sketch family (q155-q157)
  * rests on: partial aggregation may split the input arbitrarily across
  * tasks and merge in any grouping, and the lossless-merge identity of
  * the incremental sketch index (q157) is exactly merge-associativity.
  * Generators sampled with fixed seeds (scalatestplus bridge is not in
  * the offline deps).
  */
class BottomKPropertySuite extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def model(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  private val inputGen: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.choose(0L, 50L),            // dense: many duplicates
      3 -> Gen.choose(Long.MinValue, Long.MaxValue),
      1 -> Gen.oneOf(Long.MinValue, Long.MaxValue, 0L)))

  test("reduce in any order ≡ sortedDistinct.take(k)") {
    for (k <- Seq(1, 2, 5, 16); (xs, i) <- samples(inputGen, 60, 11L).zipWithIndex) {
      val agg = new BottomKAggregator(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(buf) === model(xs, k), s"k=$k case $i: $xs")
      // order independence: a shuffled replay reaches the same buffer
      val shuffled = new scala.util.Random(i).shuffle(xs)
      assert(shuffled.foldLeft(agg.zero)(agg.reduce) === model(xs, k),
        s"k=$k shuffled case $i")
    }
  }

  test("merge over any partitioning ≡ one-shot reduce (partial-agg safety)") {
    for (k <- Seq(1, 3, 8); (xs, i) <- samples(inputGen, 40, 23L).zipWithIndex) {
      val agg = new BottomKAggregator(k)
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      // split into 1..4 chunks, reduce each, merge left-to-right
      val n = (i % 4) + 1
      val parts = xs.grouped(math.max(1, (xs.size + n - 1) / n)).toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      assert(merged === whole, s"k=$k split-$n case $i: $xs")
      // and merge is commutative on the partials
      val mergedRev = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .reverse.foldLeft(agg.zero)(agg.merge)
      assert(mergedRev === whole, s"k=$k reversed-merge case $i")
    }
  }

  test("buffer never exceeds k and stays sorted-distinct at every step") {
    for ((xs, i) <- samples(inputGen, 30, 37L).zipWithIndex) {
      val agg = new BottomKAggregator(4)
      xs.scanLeft(agg.zero)(agg.reduce).foreach { buf =>
        assert(buf.length <= 4, s"case $i overflow: $buf")
        assert(buf === buf.distinct.sorted, s"case $i invariant: $buf")
      }
    }
  }
}
