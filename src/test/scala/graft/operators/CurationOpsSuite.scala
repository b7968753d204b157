package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination, blocklist filtering, and sequence packing — the
  * curation stages added around the dedup/quality core.
  */
class CurationOpsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-curation-ops")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("wordNgrams: windows, short docs, exact boundaries") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "a b c d"),   // 3 bigrams, 2 trigrams
      (2L, "a b"),       // 1 bigram, 0 trigrams
      (3L, "a"),         // too short for either
      (4L, "")           // splits to [""] — still shorter than n
    ).toDF("doc_id", "text")
    val tri = df.select($"doc_id", TextOps.wordNgrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(tri(1L) == Seq("a b c", "b c d"))
    assert(tri(2L).isEmpty && tri(3L).isEmpty && tri(4L).isEmpty)
  }

  test("decontaminate drops exactly the overlapping docs") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean doc with no overlap at all"),
      (2L, "prefix q1 q2 q3 q4 suffix"),     // contains an eval 4-gram
      (3L, "q1 q2 q3 stop"),                 // only a 3-gram — not flagged
      (4L, "x q2 q3 q4 tail")                // different 4-gram of the eval doc
    ).toDF("doc_id", "text")
    val flagged = TextOps.contaminatedIds(corpus, evalSet, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L, 4L))
    val kept = TextOps.decontaminate(corpus, evalSet, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("blocklistFilter is exact-token, not substring") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "totally fine text"),
      (2L, "contains bad token"),
      (3L, "badge is not bad-ness either") // substrings must NOT match
    ).toDF("doc_id", "text")
    val kept = TextOps.blocklistFilter(docs, Seq("bad", "worse"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("packSequences: chunk = floor(start offset / budget), per stratum") {
    val sql = spark
    import sql.implicits._
    // tokens: 3, 4, 2 in stratum A → starts 0, 3, 7 → budget 5 ⇒ 0, 0, 1
    val docs = Seq(
      (1L, "A", "t t t"),
      (2L, "A", "t t t t"),
      (3L, "A", "t t"),
      (10L, "B", "t t t t t t")             // independent stratum, start 0
    ).toDF("doc_id", "source", "text")
    val out = Pipeline.packSequences(docs, budgetTokens = 5)
      .select($"doc_id", $"chunk_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 10L -> 0L))
  }

  test("packSequences is stable under repartitioning") {
    val sql = spark
    import sql.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"src${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val a = Pipeline.packSequences(docs, 10)
      .select("doc_id", "chunk_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Pipeline.packSequences(docs.repartition(7), 10)
      .select("doc_id", "chunk_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("VecMeanAggregator matches per-dimension avg and handles singletons") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val vecMean = udaf(new graft.functions.VecMeanAggregator,
      ExpressionEncoder[Seq[Double]]())
    val df = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 6.0)), (0, Seq(5.0, 1.0)),
      (1, Seq(7.0, 7.0))
    ).toDF("g", "v").repartition(2)
    val out = df.groupBy($"g").agg(vecMean($"v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(3.0, 3.0))
    assert(out(1) == Seq(7.0, 7.0))
  }
}
