package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** The SQL surface of the codegen'd expressions, registered through
  * SparkSessionExtensions — a user who only speaks SQL gets the same
  * engine primitives as the Column API.
  */
class GraftExtensionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("graft_array_dot / graft_array_norm match the Column API bit-for-bit") {
    val row = spark.sql(
      """SELECT graft_array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dot,
        |       graft_array_norm(array(3.0d, 4.0d)) AS nrm""".stripMargin).head()
    assert(row.getDouble(0) === 32.0)
    assert(row.getDouble(1) === 5.0)
  }

  test("graft_minhash64 / graft_simhash64 agree with the Column API") {
    import org.apache.spark.sql.functions._
    val sqlRow = spark.sql(
      """SELECT graft_minhash64(array('a','b','c'), 8) AS mh,
        |       graft_simhash64(array('a','b','c')) AS sh""".stripMargin).head()
    val df = spark.range(1).select(
      graft.functions.HashFunctions.minhash64(
        typedLit(Seq("a", "b", "c")), 8).as("mh"),
      graft.functions.HashFunctions.simhash64(
        typedLit(Seq("a", "b", "c"))).as("sh"))
    val apiRow = df.head()
    assert(sqlRow.getSeq[Long](0) === apiRow.getSeq[Long](0))
    assert(sqlRow.getLong(1) === apiRow.getLong(1))
  }

  test("graft_equal_lanes works in SQL") {
    val got = spark.sql(
      "SELECT graft_equal_lanes(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS n")
      .head().getInt(0)
    assert(got === 2)
  }

  test("graft_char_shingles works in SQL") {
    val got = spark.sql("SELECT graft_char_shingles('abcde', 3) AS sh")
      .head().getSeq[String](0)
    assert(got === Seq("abc", "bcd", "cde"))
  }

  test("graft_gram_set_starts works in SQL; non-foldable grams refused") {
    val got = spark.sql(
        "SELECT graft_gram_set_starts(split('a b c d e', ' '), 3, " +
          "array('b c d', 'c d e')) AS s")
      .head().getSeq[Int](0)
    assert(got === Seq(2, 3))
    // the gram set compiles into the plan — a per-row column cannot
    val err = intercept[Exception] {
      spark.sql("SELECT graft_gram_set_starts(split(x, ' '), 3, split(x, ' ')) " +
        "FROM (SELECT 'a b c' AS x)").head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("foldable")), s"must refuse: $err")
    // a NULL array and a null element refuse LOUDLY, never NPE
    val errNull = intercept[Exception] {
      spark.sql("SELECT graft_gram_set_starts(split('a b', ' '), 2, " +
        "CAST(NULL AS ARRAY<STRING>))").head()
    }
    assert(msgs(errNull).exists(_.contains("must not be NULL")),
      s"NULL grams must refuse: $errNull")
    val errElem = intercept[Exception] {
      spark.sql("SELECT graft_gram_set_starts(split('a b', ' '), 2, " +
        "array('a b', NULL))").head()
    }
    assert(msgs(errElem).exists(_.contains("null gram")),
      s"null gram element must refuse: $errElem")
    // the byte-dimension cap (r15): ONE gram can be a 34 MB payload —
    // far under the 500k element cap yet past the 32 MB byte cap. The
    // guard fires at expression-build time (before anything serializes
    // into a plan), so the fixture costs one string allocation.
    val errBytes = intercept[Exception] {
      spark.sql("SELECT graft_gram_set_starts(split('a b', ' '), 2, " +
        "array(repeat('xy', 17000000)))").head()
    }
    assert(msgs(errBytes).exists(m =>
        m.contains("UTF-8 bytes") && m.contains("plan-weight cap")),
      s"a heavy payload must refuse by BYTES: $errBytes")
  }

  test("graft_lsh_sign_bits works in SQL; literal params are enforced") {
    val n = spark.sql(
      "SELECT graft_lsh_sign_bits(array(0.5d, -0.2d, 1.0d), 0, 4) AS sig").head().getLong(0)
    assert(n >= 0 && n < 16) // 4-bit signature
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash64(array('a'), cast(rand() * 4 AS INT))").head()
    }
    assert(err.getMessage.contains("integer literal") ||
      Option(err.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
