package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Properties of the exponential-bucket algebra the q158-q162 family
  * rests on, pinned against a pure-Scala reference model over randomized
  * inputs (generators sampled with fixed seeds — the scalatestplus
  * bridge is not in the offline deps):
  *
  *  - the bucket map is a MONOTONE IDEMPOTENT contraction with relative
  *    error < 2^−s — the three facts that make sketch quantiles equal
  *    `bucketRep(exact quantile)` and keep them inside the error bound;
  *  - the integer CDF walk commutes with the bucket map on ANY multiset
  *    (the oracle-ability identity, here on random data rather than the
  *    fixtures the DataFrame suite uses);
  *  - count tables form a group under addition: any interleaving of
  *    inserts and retracts lands on the multiset difference — the
  *    algebra behind the q159/q162 index maintenance;
  *  - one Spark cross-check ties the model to the shipped column: the
  *    codegen'd `bucketRep` agrees with the model on the same randoms.
  */
class HistogramPropertySuite extends AnyFunSuite {

  private val S = 5

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  /** Reference model of [[HistogramSketch.bucketRep]]. */
  private def rep(v: Long): Long = {
    require(v >= 0)
    if (v == 0) 0L
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val shift = math.max(0, e - S)
      (v >> shift) << shift
    }
  }

  /** Reference model of the integer CDF walk over a bucket-count table. */
  private def sketchQuantile(vals: Seq[Long], pct: Int): Long = {
    val counts = vals.groupBy(rep).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val n = vals.size.toLong
    val target = (n * pct + 99) / 100
    var cum = 0L
    counts.find { case (_, c) => cum += c; cum >= target }.get._1
  }

  private val valGen: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(0L, 200L),          // token-length-ish, dense
    3 -> Gen.choose(0L, 1L << 20),
    2 -> Gen.choose(0L, Long.MaxValue))

  private val multisetGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(valGen)

  test("bucket map: monotone, idempotent, lower bound, error < 2^-s") {
    for (v <- samples(valGen, 400, 41L)) {
      val r = rep(v)
      assert(r <= v, s"$v: rep above value")
      assert(rep(r) === r, s"$v: not idempotent")
      assert(v - r <= (if (v > 0) v >> S else 0L), s"$v: error bound")
    }
    val sorted = samples(valGen, 200, 43L).sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(rep(a) <= rep(b), s"monotonicity broke at ($a, $b)")
    }
  }

  test("CDF walk commutes with the bucket map on random multisets") {
    for ((xs, i) <- samples(multisetGen, 80, 47L).zipWithIndex;
         pct <- Seq(50, 90, 99)) {
      val sorted = xs.sorted
      val n = xs.size.toLong
      val exact = sorted(((n * pct + 99) / 100).toInt - 1)
      assert(sketchQuantile(xs, pct) === rep(exact),
        s"case $i p$pct: sketch != bucketRep(exact $exact) over $xs")
    }
  }

  test("count tables are a group: inserts ∪ retracts ≡ multiset difference") {
    for ((xs, i) <- samples(multisetGen, 60, 53L).zipWithIndex) {
      val removed = xs.zipWithIndex.filter(_._2 % 3 == 0).map(_._1)
      val kept = {
        val budget = scala.collection.mutable.Map.empty[Long, Int]
        removed.foreach(v => budget.update(v, budget.getOrElse(v, 0) + 1))
        xs.filter { v =>
          val b = budget.getOrElse(v, 0)
          if (b > 0) { budget.update(v, b - 1); false } else true
        }
      }
      // fold inserts and retracts in an arbitrary interleaving
      val table = scala.collection.mutable.Map.empty[Long, Long]
      val ops = new scala.util.Random(i).shuffle(
        xs.map(v => (rep(v), 1L)) ++ removed.map(v => (rep(v), -1L)))
      ops.foreach { case (r, d) => table.update(r, table.getOrElse(r, 0L) + d) }
      val expect = kept.groupBy(rep).view.mapValues(_.size.toLong).toMap
      assert(table.filter(_._2 != 0).toMap === expect, s"case $i")
      assert(table.values.forall(_ >= 0), s"case $i: negative residual count")
    }
  }

  test("the shipped bucketRep column agrees with the model") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hist-prop")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val vs = samples(valGen, 300, 59L)
      val got = vs.toDF("v")
        .select(col("v"), HistogramSketch.bucketRep(col("v"), S).as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      got.foreach { case (v, r) =>
        assert(r === rep(v), s"Spark bucketRep($v) = $r, model ${rep(v)}")
        // the streaming gap processor's in-JVM mirror must agree too
        assert(graft.streaming.StreamingEventGaps.bucketRep(v, S) === rep(v),
          s"streaming mirror diverges at $v")
      }
      // outside the defined domain the batch column NULLs the row — a
      // Long mirror can't express that, so it must REFUSE loudly rather
      // than silently return bucket 0 (the r12 ADVICE divergence)
      val neg = intercept[IllegalArgumentException] {
        graft.streaming.StreamingEventGaps.bucketRep(-1L, S)
      }
      assert(neg.getMessage.contains("negative"))
      // and the mirror's default subBits is COUPLED to the shipped
      // constant, not a restated literal
      assert(graft.streaming.StreamingEventGaps.bucketRep(12345L) ===
        rep(12345L),
        "mirror default subBits drifted from HistogramSketch.DefaultSubBits")
    } finally spark.stop()
  }
}
