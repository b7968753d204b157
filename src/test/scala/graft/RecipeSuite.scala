package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The one-call recipe: plan → materialize → pack → order in a single
  * gated call, artifacts persisted, the cross-step invariants FORCED —
  * and the gate genuinely refuses (tolerances are contracts, not
  * logging).
  */
class RecipeSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-recipe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus = {
    val sql = spark
    import sql.implicits._
    (1L to 600L).map { i =>
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("one call: artifacts persisted, per-epoch permutations, composite glue, gates proven") {
    val out = Files.createTempDirectory("graft-recipe").toString
    val report = Recipe.run(corpus, out, budgetTokens = 20000L,
      chunkTokens = 64, seed = 11L, nEpochs = 2)

    assert(report.artifacts ===
      Seq(s"$out/plan", s"$out/assignments", s"$out/order", s"$out/meta",
        s"$out/stats"))
    assert(report.nStrata === 4L && report.nEpochs === 2)

    // assignments: every materialized copy exactly once, the composite
    // mix_id built once and UNIQUE (the glue a hand composition drops)
    val assigned = spark.read.parquet(s"$out/assignments")
    assert(assigned.count() === report.multisetRows)
    assert(assigned.select("mix_id").distinct().count() === report.multisetRows,
      "mix_id must be the multiset primary key")
    assert(assigned.agg(sum(col("n_tokens"))).head().getLong(0) ===
      report.multisetTokens)
    // the mixture actually repeats docs (epochs > 1 in this fixture) —
    // without the copy glue these rows would have merged
    assert(report.multisetRows > 600L,
      s"fixture drift: the mix must oversample (got ${report.multisetRows})")

    // order: each epoch an exact permutation, and the two epochs differ
    val order = spark.read.parquet(s"$out/order")
    (0L to 1L).foreach { e =>
      val pos = order.filter(col("epoch") === e).select("pos")
        .collect().map(_.getLong(0)).sorted
      assert(pos.length.toLong === report.nChunks &&
          pos.headOption.contains(0L) && pos.last === report.nChunks - 1,
        s"epoch $e must be the exact permutation 0..${report.nChunks - 1}")
    }
    val byEpoch = order.collect()
      .map(r => (r.getLong(3), (r.getString(0), r.getLong(1)), r.getLong(2)))
    val p0 = byEpoch.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val p1 = byEpoch.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(p0 != p1, "epochs must be different permutations")

    // the report's measured mixing health is within the gate it passed
    assert(report.maxMixDeltaMicro <= 250000L && report.maxMixDeltaMicro > 0L,
      s"maxMixDeltaMicro must be the real measured worst delta: " +
        s"${report.maxMixDeltaMicro}")

    // single-epoch form: no epoch column, same gates
    val out1 = Files.createTempDirectory("graft-recipe-1ep").toString
    val r1 = Recipe.run(corpus, out1, budgetTokens = 20000L,
      chunkTokens = 64, seed = 11L)
    val o1 = spark.read.parquet(s"$out1/order")
    assert(!o1.columns.contains("epoch"))
    assert(o1.count() === r1.nChunks)
  }

  test("textCol threads through BOTH the plan and the packing (never a hardcoded 'text')") {
    val sql = spark
    import sql.implicits._
    // docs carry a DECOY 'text' column with wildly different token
    // counts: if either the plan or the packing read 'text' instead of
    // the declared textCol, the token economics split from the
    // governance record and the numbers below diverge
    val docs = corpus.withColumnRenamed("text", "body")
      .withColumn("text", lit("one two"))
    val out = Files.createTempDirectory("graft-recipe-textcol").toString
    val report = Recipe.run(docs, out, budgetTokens = 20000L,
      chunkTokens = 64, seed = 11L, textCol = "body")
    val assigned = spark.read.parquet(s"$out/assignments")
    // every copy's n_tokens is its body's count, never the decoy's 2
    val twoTok = assigned.filter(col("n_tokens") === 2L).count()
    val bodyToks = corpus.select(
      sum(size(split(col("text"), " "))).cast("long")).head().getLong(0)
    assert(twoTok === 0L,
      s"packing read the decoy 'text' column: $twoTok rows at 2 tokens")
    assert(report.multisetTokens > bodyToks,
      s"fixture drift: the mix must oversample body tokens " +
        s"(${report.multisetTokens} vs corpus $bodyToks)")
  }

  test("the mixing gate REFUSES a schedule outside tolerance; bad params refuse") {
    val out = Files.createTempDirectory("graft-recipe-tol").toString
    val e = intercept[IllegalArgumentException] {
      Recipe.run(corpus, out, budgetTokens = 20000L, chunkTokens = 64,
        seed = 11L, nEpochs = 1, mixingTolMicro = 1L)
    }
    assert(e.getMessage.contains("mixing") &&
        e.getMessage.contains("do not train on it"),
      s"the gate must refuse, naming the decision: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      Recipe.run(corpus, out, budgetTokens = 20000L, nEpochs = 0)
    }
    intercept[IllegalArgumentException] {
      Recipe.run(corpus, out, budgetTokens = 20000L, mixingTolMicro = 0L)
    }
  }

  test("identity hygiene at the door: duplicate or null doc ids refuse before any artifact proves") {
    val sql = spark
    import sql.implicits._
    val out = Files.createTempDirectory("graft-recipe-ids").toString
    // a repeated id mints colliding mix_ids (id#copy carries no stratum)
    val duped = corpus.unionByName(
      Seq((7L, "srcX", "a b c")).toDF("doc_id", "source", "text"))
    val eDup = intercept[IllegalArgumentException] {
      Recipe.run(duped, out, budgetTokens = 20000L, chunkTokens = 64)
    }
    assert(eDup.getMessage.contains("repeats across the corpus") &&
      eDup.getMessage.contains("mix_id"))
    // a null id can never be retracted and also collides its mix_ids
    val withNull = corpus.unionByName(
      Seq((Option.empty[java.lang.Long], "src0", "a b"))
        .toDF("doc_id", "source", "text"))
    val eNull = intercept[IllegalArgumentException] {
      Recipe.run(withNull, out, budgetTokens = 20000L, chunkTokens = 64)
    }
    assert(eNull.getMessage.contains("null"))
  }
}
