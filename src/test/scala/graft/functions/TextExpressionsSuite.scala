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

  test("ngram_repetition: counts, edge cases, null") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, Some("a b a b c")),   // bigrams: "a b","b a","a b","b c" → dup=2, top=2
      (2L, Some("x y z")),       // all distinct → dup=0, top=1
      (3L, Some("go go go go")), // "go go"×3 → n=3, dup=3, top=3
      (4L, Some("solo")),        // 1 token → no bigrams
      (5L, Some("")),            // splits to [""] → no bigrams
      (6L, None)
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextFunctions.ngram_repetition($"text", 2).as("r"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(got(1L).getLong(0) === 4L && got(1L).getLong(1) === 2L && got(1L).getLong(2) === 2L)
    assert(got(2L).getLong(0) === 2L && got(2L).getLong(1) === 0L && got(2L).getLong(2) === 1L)
    assert(got(3L).getLong(0) === 3L && got(3L).getLong(1) === 3L && got(3L).getLong(2) === 3L)
    assert(got(4L).getLong(0) === 0L && got(5L).getLong(0) === 0L)
    assert(got(6L) == null)
  }

  test("ngram_repetition: empty tokens and multibyte text match the split contract") {
    val sql = spark
    import sql.implicits._
    // consecutive spaces produce EMPTY tokens (split keeps them): "a  a"
    // tokens are [a, "", a] → bigrams "a " and " a" (distinct) — and the
    // gram text is the contiguous byte range, so multibyte chars survive
    val df = Seq((1L, "a  a"), (2L, "日本 語 日本 語")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextFunctions.ngram_repetition($"text", 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(got(1L).getLong(0) === 2L && got(1L).getLong(1) === 0L)
    // bigrams: "日本 語","語 日本","日本 語" → dup=2, top=2
    assert(got(2L).getLong(0) === 3L && got(2L).getLong(1) === 2L && got(2L).getLong(2) === 2L)
  }

  test("ngram_repetition stays in whole-stage codegen and matches a composed plan") {
    val sql = spark
    import sql.implicits._
    import graft.operators.TextOps
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(6)(Seq("a", "b", "c")(i % 3) + " " + Seq("x", "y")(i % 2)).mkString(" ")))
      .toDF("doc_id", "text")
    val got = docs.repartition(1)
      .select($"doc_id", TextFunctions.ngram_repetition($"text", 2).as("r"))
    got.collect() // finalize the adaptive plan before reading it
    val line = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ngram_repetition")).get
    assert(line.contains("*("), "ngram_repetition must stay in WSCG")
    // cross-check against the declarative explode→count formulation
    val composed = docs
      .select($"doc_id", explode(TextOps.wordNgrams($"text", 2)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(
        sum($"c").as("n_grams"),
        sum(when($"c" >= 2, $"c").otherwise(0L)).as("n_dup"),
        max($"c").as("top_count"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got.collect().foreach { r =>
      val s = r.getStruct(1)
      assert(composed(r.getLong(0)) === ((s.getLong(0), s.getLong(1), s.getLong(2))))
    }
  }

  test("gram_set_starts: membership positions match the composed HOF formulation") {
    val sql = spark
    import sql.implicits._
    import graft.operators.TextOps
    val grams = Seq("q1 q2 q3", "q3 q4 q5", "日本 語 x", "a  b") // incl. empty token
    val docs = Seq(
      (1L, "q1 q2 q3 q4 q5 tail"),        // matches at 1 and 3
      (2L, "no hits here at all"),
      (3L, "日本 語 x mid q1 q2 q3 end"), // multibyte gram at 1, ascii at 5
      (4L, "a  b c"),                      // empty token: tokens [a,"",b,c] → "a  b" at 1
      (5L, "q1 q2"),                       // shorter than n → empty
      (6L, "")                             // [""] → empty
    ).toDF("doc_id", "text")
    val got = docs
      .select($"doc_id", TextFunctions.gram_set_starts(
        TextOps.tokens($"text"), 3, grams).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(got(1L) === Seq(1, 3))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq(1, 5))
    assert(got(4L) === Seq(1))
    assert(got(5L) === Seq.empty && got(6L) === Seq.empty)
    // composed cross-check: filter(sequence) + array_contains
    val composed = docs
      .select($"doc_id", TextOps.tokens($"text").as("t"))
      .select($"doc_id", when(size($"t") >= 3,
          filter(sequence(lit(1), size($"t") - 2),
            i => array_contains(typedLit(grams),
              concat_ws(" ", slice($"t", i, lit(3))))))
        .otherwise(array().cast("array<int>")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(got === composed)
  }

  test("gram_set_starts: null array passes through; null token refuses loudly") {
    val sql = spark
    import sql.implicits._
    val nullArr = Seq((1L, None: Option[Seq[String]]),
      (2L, Some(Seq("a", "b", "c")))).toDF("doc_id", "toks")
    val got = nullArr.select($"doc_id",
        TextFunctions.gram_set_starts($"toks", 2, Seq("a b")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(got(1L) == null && got(2L) === Seq(1))
    val withNullTok = Seq((1L, Seq("a", null, "b"))).toDF("doc_id", "toks")
    val ex = intercept[Exception] {
      withNullTok.select(TextFunctions.gram_set_starts($"toks", 2, Seq("a b")))
        .collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("null token") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("null token")),
      s"must refuse null tokens loudly: $ex")
  }

  test("gram_set_starts stays in whole-stage codegen") {
    val sql = spark
    import sql.implicits._
    import graft.operators.TextOps
    val got = Seq("q1 q2 q3 q4").toDF("text").repartition(1)
      .select(TextFunctions.gram_set_starts(
        TextOps.tokens($"text"), 3, Seq("q2 q3 q4")).as("s"))
    assert(got.collect()(0).getSeq[Int](0) === Seq(2))
    val line = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("gram_set_starts")).get
    assert(line.contains("*("), "gram_set_starts must stay in WSCG")
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

  // --- r18 optimization kernels: pinned equal to the HOF forms they replaced

  test("word_ngrams ≡ transform/concat_ws HOF form (incl. <n tokens, null array, null token)") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      Some(Seq("a", "b", "c", "d")),
      Some(Seq("a", "b")),
      Some(Seq("a")),
      Some(Seq.empty[String]),
      None,
      Some(Seq("x", null, "z", "w"))).toDF("toks")
    for (n <- Seq(1, 2, 3)) {
      val hof = when(size($"toks") >= n,
        transform(sequence(lit(1), size($"toks") - (n - 1)),
          i => concat_ws(" ", slice($"toks", i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(TextFunctions.word_ngrams($"toks", n).as("k"),
        hof.as("h")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n row=$r")
      }
    }
  }

  test("word_ngrams stays in whole-stage codegen") {
    val sql = spark
    import sql.implicits._
    val got = Seq(Seq("a", "b", "c")).toDF("toks").repartition(1)
      .select(TextFunctions.word_ngrams($"toks", 2).as("g"))
    assert(got.collect()(0).getSeq[String](0) === Seq("a b", "b c"))
    val line = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("word_ngrams")).get
    assert(line.contains("*("), "word_ngrams must stay in WSCG")
  }

  test("prefix_poly_hash ≡ per-char HOF fold (ASCII, non-ASCII, empty, null)") {
    val sql = spark
    import sql.implicits._
    val df = Seq(Some("hello world"), Some(""), Some("héllo"),
      Some("日本語だよ"), Some("a"), None, Some("x" * 64)).toDF("t")
    val hof = aggregate(
      sequence(lit(1), length($"t")),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(substring($"t", i.cast("int"), lit(1)))) % 1000000007L)
    val rows = df.select(TextFunctions.prefix_poly_hash($"t").as("k"), hof.as("h"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"null mismatch: $r")
      else assert(r.getLong(0) === r.getLong(1), s"row=$r")
    }
  }

  test("md5_prefix ≡ conv(substring(md5, 1, L), 16, 10)") {
    val sql = spark
    import sql.implicits._
    val df = Seq("", "a", "hello world", "héllo", "日本語").toDF("t")
    for (l <- Seq(1, 8, 15)) {
      val rows = df.select(HashFunctions.md5_prefix($"t", l).as("k"),
        conv(substring(md5($"t"), 1, l), 16, 10).cast("long").as("h")).collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1), s"L=$l row=$r"))
    }
  }
}
