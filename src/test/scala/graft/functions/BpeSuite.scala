package graft.functions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BpeTokenizer._
import graft.operators.TextOps

/** Hand-computed gates for the BPE trainer and encoder (the Sennrich
  * word-frequency fixture), plus the distributed count path.
  */
class BpeSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-bpe")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the classic fixture: low×5, lower×2, newest×6, widest×3
  private val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("fit: first merges are hand-computable, ties break pair-ASC") {
    // round 1 pair counts: (e,s)=9 and (s,t</w>)=9 tie at the top —
    // pair-ASC picks (e,s). Round 2: (es,t</w>)=9 dominates. Round 3:
    // (l,o)=7 (5 from low + 2 from lower).
    val m = fit(freq, 3)
    assert(m.merges == Vector(("e", "s"), ("es", "t</w>"), ("l", "o")),
      s"unexpected merges: ${m.merges}")
  }

  test("encode: rank-greedy inference reproduces trained segmentations") {
    val m = fit(freq, 3)
    assert(encodeWord(m, "newest") == Vector("n", "e", "w", "est</w>"))
    assert(encodeWord(m, "widest") == Vector("w", "i", "d", "est</w>"))
    assert(encodeWord(m, "low") == Vector("lo", "w</w>"))
    // unseen characters fall back to char tokens, never crash
    assert(encodeWord(m, "zzz") == Vector("z", "z", "z</w>"))
    assert(encodeWord(m, "") == Vector.empty)
  }

  test("encode invariant: token concat strips back to word + EOW") {
    val m = fit(freq, 3)
    Seq("newest", "lowest", "low", "zzz", "a").foreach { w =>
      val enc = encodeWord(m, w)
      assert(enc.mkString.replace(EOW, "") == w, s"lossy encode of '$w': $enc")
    }
  }

  test("more merges never increase a trained word's token count") {
    val m0 = fit(freq, 0)
    val m8 = fit(freq, 8)
    freq.keys.foreach { w =>
      assert(encodeWord(m8, w).length <= encodeWord(m0, w).length, w)
    }
  }

  test("bpeTokenCounts: distributed counts match driver-side encode; bounds hold") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src0", "low lower newest"),
      (2L, "src0", "newest newest widest"),
      (3L, "src1", "zz low")
    ).toDF("doc_id", "source", "text")
    val m = TextOps.fitBpeModel(docs, nMerges = 3, sampleDocs = 10)
    val got = TextOps.bpeTokenCounts(docs, m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val memo = collection.mutable.HashMap.empty[String, Int]
    val expect = Map(
      1L -> countTokens(m, memo, "low lower newest"),
      2L -> countTokens(m, memo, "newest newest widest"),
      3L -> countTokens(m, memo, "zz low"))
    assert(got == expect, s"got $got, expected $expect")
    // a word is never fewer than 1 token nor more than its char count + EOW
    got.foreach { case (_, c) => assert(c >= 2L) }
    // repartitioning cannot move counts (pure per-row function)
    val re = TextOps.bpeTokenCounts(docs.repartition(5), m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(re == got)
  }
}
