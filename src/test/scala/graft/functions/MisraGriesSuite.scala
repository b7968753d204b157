package graft.functions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Gates for the Misra–Gries heavy-hitter summary: the superset
  * guarantee and the count-error bound on adversarial streams where the
  * summary is much smaller than the vocabulary (the regime the q110
  * oracle never exercises, because that corpus's bigram vocabulary fits
  * the production summary), plus end-to-end heavyHitters ≡ exact top-N.
  */
class MisraGriesSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-misra-gries")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Run the aggregator through Spark (forcing partial/merge across
    * partitions) and return the final summary. */
  private def summarize(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    val sql = spark
    import sql.implicits._
    val mg = udaf(new MisraGriesAggregator(k))
    items.toDF("tok").repartition(parts)
      .agg(mg($"tok").as("s"))
      .collect()(0).getMap[String, Long](0).toMap
  }

  // heavy items well above n/(k+1); long uniform noise tail below it
  private val heavies = (1 to 5).flatMap(i => Seq.fill(150)(s"heavy$i"))
  private val noise   = (1 to 250).flatMap(i => Seq.fill(1)(s"noise$i"))
  private val stream  = new scala.util.Random(7).shuffle(heavies ++ noise)

  test("superset guarantee: every item with freq > n/(k+1) survives, k << vocab") {
    val k = 9 // vocabulary is 255; n/(k+1) = 1000/10 = 100 < 150
    for (parts <- Seq(1, 4)) {
      val s = summarize(stream, k, parts)
      assert(s.size <= k)
      (1 to 5).foreach { i =>
        assert(s.contains(s"heavy$i"), s"heavy$i missing at parts=$parts")
      }
    }
  }

  test("count bound: summary counters underestimate by at most n/(k+1)") {
    val k = 9
    val n = stream.size
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val s = summarize(stream, k, 4)
    s.foreach { case (t, c) =>
      assert(c <= truth(t), s"$t overestimated: $c > ${truth(t)}")
      assert(truth(t) - c <= n / (k + 1),
        s"$t error ${truth(t) - c} exceeds ${n / (k + 1)}")
    }
  }

  test("all-distinct adversarial stream: no crash, bound still holds") {
    val s = summarize((1 to 100).map(i => s"x$i"), 5, 4)
    assert(s.size <= 5)
    s.values.foreach(c => assert(c >= 1L))
  }

  test("heavyHitters ≡ exact top-N with summaryK << vocabulary") {
    val sql = spark
    import sql.implicits._
    // phrase-skewed corpus: "hot pair" dominates; 200 singleton bigrams
    // top-3 bigrams: "hot pair" 120, "pair hot" 80, "mid one" 60 — all
    // above n/(summaryK+1) = 490/13 ≈ 38, so the MG superset guarantee
    // covers the whole top-3; the 200 singletons are the vocabulary the
    // sketch must evict.
    val docs = (
      Seq.fill(40)("hot pair hot pair hot pair").zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      } ++
      Seq.fill(30)("mid one mid one").zipWithIndex.map {
        case (t, i) => (500L + i, t)
      } ++
      (1000 to 1199).map(i => (i.toLong, s"u$i v$i"))
    ).toDF("doc_id", "text")
    val got = TextOps.heavyHitters(docs, summaryK = 12, topN = 3, n = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // exact truth via a plain groupBy
    val exact = docs
      .select(explode(expr(
        "transform(sequence(1, size(split(text,' '))-1), i -> concat_ws(' ', slice(split(text,' '), i, 2)))")).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"g").limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(x => (x._2, x._3)).toSeq == exact.toSeq)
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
  }
}
