package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HistogramSketch, TextOps}

class MaintainSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-maintain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("one call consolidates every index family; reads unchanged; histories collapse") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-maintain").toString
    val docs = (1L to 60L).map { id =>
      (id, if (id % 2 == 0) "web" else "book",
        Seq.fill((id % 6 + 2).toInt)(s"tok${id % 9} w${id % 4}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val (histDir, kmvDir, spanDir) =
      (s"$base/hist", s"$base/kmv", s"$base/span")
    // grow real generation histories on all three families
    HistogramSketch.buildHistogramIndex(docs.filter($"doc_id" <= 30), histDir)
    HistogramSketch.appendHistogramIndex(docs.filter($"doc_id" > 30), histDir)
    HistogramSketch.retractHistogramIndex(
      docs.filter($"doc_id" % 7 === 0), histDir)
    Dedup.buildSketchIndex(docs.filter($"doc_id" <= 30), kmvDir, k = 16)
    Dedup.appendSketchIndex(docs.filter($"doc_id" > 30), kmvDir, k = 16)
    TextOps.buildSpanIndex(docs, spanDir, n = 4)
    // the batch SHARES grams with the corpus (doc 1's text is repeated
    // "tok1 w1"), so the shared grams hold 2 generation rows each and
    // consolidation has real history to collapse
    TextOps.dupSpansIncremental(
      Seq((200L, "tok1 w1 tok1 w1 tok1 w1 extra words here"))
        .toDF("doc_id", "text"), spanDir, n = 4).collect()
    // and a forget: its negative generations cancel doc 200's riders
    // and zero out its unique grams — real history for the grams
    // consolidation to collapse
    TextOps.forgetFromSpanIndex(Seq(200L).toDF("doc_id"), spanDir)
    // a plain fact artifact for the compaction leg
    val factDir = s"$base/facts"
    docs.repartition(8).write.parquet(factDir)

    val histBefore = HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted.toSeq
    val kmvBefore = Dedup.readSketchIndex(spark, kmvDir, k = 16)
      .collect().map(_.toString).sorted.toSeq
    val gramsBefore = spark.read.parquet(s"$spanDir/grams").count()
    val factFilesBefore = new java.io.File(factDir)
      .listFiles().count(_.getName.endsWith(".parquet"))

    val report = Maintain.maintain(spark,
      histIndexDirs = Seq(histDir),
      kmvIndexDirs = Seq(kmvDir), kmvK = 16,
      spanIndexDirs = Seq(spanDir),
      compactTargets = Seq(factDir -> Seq.empty))

    // the report names every surface (observing it IS the passed gate)
    assert(report.histConsolidated === Seq(s"$histDir/hist"))
    assert(report.kmvConsolidated === Seq(s"$kmvDir/sketches"))
    assert(report.spanGramsConsolidated === Seq(s"$spanDir/grams"))
    assert(report.compacted === Seq(factDir))
    // reads unchanged (maintain's own forced gates re-checked here)
    assert(HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted.toSeq == histBefore)
    assert(Dedup.readSketchIndex(spark, kmvDir, k = 16)
      .collect().map(_.toString).sorted.toSeq == kmvBefore)
    // histories actually collapsed
    assert(spark.read.parquet(s"$spanDir/grams").count() < gramsBefore,
      "span gram history must collapse")
    val factFilesAfter = new java.io.File(factDir)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(factFilesAfter < factFilesBefore,
      s"fact artifact must compact: $factFilesBefore -> $factFilesAfter")
    assert(spark.read.parquet(factDir).count() === 60L,
      "compaction preserves rows exactly")

    // idempotent: maintaining a maintained set is a no-op rewrite
    val again = Maintain.maintain(spark, histIndexDirs = Seq(histDir),
      kmvIndexDirs = Seq(kmvDir), kmvK = 16, spanIndexDirs = Seq(spanDir))
    assert(again.histConsolidated.nonEmpty)
    assert(HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted.toSeq == histBefore)

    // nothing-to-do refuses (the Forget.forget empty-call rule)
    val ex = intercept[IllegalArgumentException] { Maintain.maintain(spark) }
    assert(ex.getMessage.contains("nothing to maintain"))
  }

  test("indexCensus: files/bytes/rows per surface; shows the maintenance payoff") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-census").toString
    val docs = (1L to 40L).map(id => (id, s"s${id % 2}", s"w$id x$id"))
      .toDF("doc_id", "source", "text")
    val histDir = s"$base/hist"
    HistogramSketch.buildHistogramIndex(docs.filter($"doc_id" <= 20), histDir)
    HistogramSketch.appendHistogramIndex(docs.filter($"doc_id" > 20), histDir)
    val before = Maintain.indexCensus(spark,
        Seq("hist" -> s"$histDir/hist"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(before("hist")._1 >= 2L, "two generations land >= 2 files")
    assert(before("hist")._2 > 0L, "bytes must be counted")
    // independent expectation, not the implementation's own computation:
    // two generations of 2-source length histograms over 2-token docs =
    // one (source, rep) bucket row per (source, generation) = 4 rows
    assert(before("hist")._3 === 4L,
      s"fixture row count must gate n_rows: ${before("hist")._3}")
    // hidden files (a crashed writer's _temporary residue with a clean
    // leaf name) must not count as generation pressure
    val tmpDir = new java.io.File(s"$histDir/hist/_temporary/0")
    tmpDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${tmpDir.getPath}/part-ghost.parquet"),
      Array.fill(64)(0.toByte))
    val withGhost = Maintain.indexCensus(spark, Seq("hist" -> s"$histDir/hist"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(withGhost === ((before("hist")._1, before("hist")._2)),
      "files under _temporary must be invisible to the census")
    assert(new java.io.File(s"${tmpDir.getPath}/part-ghost.parquet").delete())
    Maintain.maintain(spark, histIndexDirs = Seq(histDir))
    val after = Maintain.indexCensus(spark, Seq("hist" -> s"$histDir/hist"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(after("hist") < before("hist")._1,
      s"the census must show the compaction payoff: ${before("hist")._1} -> ${after("hist")}")
    // duplicate labels refuse
    intercept[IllegalArgumentException] {
      Maintain.indexCensus(spark,
        Seq("a" -> s"$histDir/hist", "a" -> s"$histDir/hist"))
    }
  }
}
