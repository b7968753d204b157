package graft.functions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

class TextExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-text-fns")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("char_shingles: overlapping k-grams, short-string fallback, null") {
    val sql = spark
    import sql.implicits._
    val df = Seq(Some("abcde"), Some("ab"), None).toDF("t")
    val got = df.select(TextFunctions.char_shingles($"t", 3)).collect()
    assert(got(0).getSeq[String](0) === Seq("abc", "bcd", "cde"))
    assert(got(1).getSeq[String](0) === Seq("ab")) // shorter than k → whole string
    assert(got(2).isNullAt(0))
  }

  test("char_shingles stays in whole-stage codegen") {
    val sql = spark
    import sql.implicits._
    val got = Seq("abcdef").toDF("t").repartition(1)
      .select(TextFunctions.char_shingles($"t", 4).as("sh"))
    assert(got.collect()(0).getSeq[String](0) === Seq("abcd", "bcde", "cdef"))
    val line = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("char_shingles")).get
    assert(line.contains("*("), "char_shingles must stay in WSCG")
  }

  test("char_shingles: multibyte chars split on char boundaries; values are stable copies") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    // multibyte (2- and 3-byte UTF8) chars: shingles must split on CHAR
    // boundaries, and collect_list must return stable values (a borrowed
    // row-buffer reference would mutate to later rows' bytes)
    val docs = Seq((1L, "héllo"), (2L, "日本語だ"), (3L, "ab"))
      .toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", TextFunctions.char_shingles($"text", 3).as("sh"))
      .orderBy($"doc_id")
      .agg(collect_list(struct($"doc_id", $"sh")).as("all"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) === Seq("hél", "éll", "llo"))
    assert(got(2L) === Seq("日本語", "本語だ"))
    assert(got(3L) === Seq("ab")) // short-string fallback, also a copy
  }

  test("shingle-minhash catches intra-token edits that token-minhash misses") {
    val sql = spark
    import sql.implicits._
    // one character changed INSIDE one long token: every token differs →
    // token-level jaccard 6/8; char-level shingles overlap heavily
    val base = "the quick brown foxhound jumped over lazy dogs"
    val edit = "the quick brown foxhoond jumped over lazy dogs"
    val docs = Seq((1L, base), (2L, edit)).toDF("doc_id", "text")
    val shingle = Dedup.minhashLsh(docs, 0.8, shingleK = 5).collect()
    assert(shingle.length === 1)
    assert(shingle.head.getDouble(2) >= 0.8,
      s"shingle estimate too low: ${shingle.head.getDouble(2)}")
  }
}
