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

  test("auto mode: a fresh index is skipped, an overdue one pays; report names both") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-maintain-auto").toString
    def docs(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"s${i % 2}", s"doc $i words ${i * 3}"))
        .toDF("doc_id", "source", "text")
    val (freshDir, overdueDir) = (s"$base/fresh", s"$base/overdue")
    Dedup.buildSketchIndex(docs(1, 20), freshDir, k = 8)
    Dedup.buildSketchIndex(docs(1, 20), overdueDir, k = 8)
    (1 to 10).foreach(g =>
      Dedup.appendSketchIndex(docs(g * 20L + 1, g * 20L + 20), overdueDir, k = 8))
    val freshFiles = new java.io.File(s"$freshDir/sketches")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val overdueFiles = new java.io.File(s"$overdueDir/sketches")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(freshFiles < 8 && overdueFiles >= 8,
      s"fixture drift: fresh=$freshFiles overdue=$overdueFiles vs threshold 8")
    val freshReadBefore = Dedup.readSketchIndex(spark, freshDir, k = 8)
      .collect().map(_.toString).sorted.toSeq
    val overdueReadBefore = Dedup.readSketchIndex(spark, overdueDir, k = 8)
      .collect().map(_.toString).sorted.toSeq

    val report = Maintain.maintain(spark,
      kmvIndexDirs = Seq(freshDir, overdueDir), kmvK = 8,
      auto = true, autoFactor = 8)
    // ONE call: only the overdue surface paid the rewrite
    assert(report.kmvConsolidated === Seq(s"$overdueDir/sketches"),
      s"only the overdue surface must consolidate: $report")
    val bySurface = report.decisions.map(d => d.surface -> d).toMap
    val fresh = bySurface(s"$freshDir/sketches")
    val over = bySurface(s"$overdueDir/sketches")
    assert(!fresh.ran && fresh.reason.contains("skipped") &&
        fresh.nFiles == freshFiles.toLong,
      s"the report must say WHY the fresh surface was spared: $fresh")
    assert(over.ran && over.reason.contains("overdue") &&
        over.nFiles == overdueFiles.toLong,
      s"the report must name the overdue surface's pressure: $over")
    // skipped surface untouched on disk, consolidated one read-equal
    assert(new java.io.File(s"$freshDir/sketches")
      .listFiles().count(_.getName.endsWith(".parquet")) === freshFiles,
      "a skipped surface must not be rewritten")
    assert(Dedup.readSketchIndex(spark, freshDir, k = 8)
      .collect().map(_.toString).sorted.toSeq == freshReadBefore)
    assert(Dedup.readSketchIndex(spark, overdueDir, k = 8)
      .collect().map(_.toString).sorted.toSeq == overdueReadBefore)
    assert(new java.io.File(s"$overdueDir/sketches")
      .listFiles().count(_.getName.endsWith(".parquet")) < overdueFiles,
      "the overdue surface's history must collapse")
  }

  test("auto cadence is idempotent: a just-consolidated surface is NOT overdue again") {
    val sql = spark
    import sql.implicits._
    // the r15 review finding: with shuffle.partitions > autoFactor, a
    // consolidation that wrote one file per shuffle partition would make
    // the surface immediately overdue again and auto mode would rewrite
    // every night forever — the consolidations therefore coalesce their
    // bounded outputs to ONE file, and this pins it at a partition count
    // ABOVE the threshold
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val base = Files.createTempDirectory("graft-maintain-idem").toString
      val kmvDir = s"$base/kmv"
      def docs(lo: Long, hi: Long) =
        (lo to hi).map(i => (i, s"s${i % 8}", s"idem doc $i"))
          .toDF("doc_id", "source", "text")
      Dedup.buildSketchIndex(docs(1, 40), kmvDir, k = 8)
      (1 to 9).foreach(g =>
        Dedup.appendSketchIndex(docs(g * 40L + 1, g * 40L + 40), kmvDir, k = 8))
      val first = Maintain.maintain(spark, kmvIndexDirs = Seq(kmvDir),
        kmvK = 8, auto = true, autoFactor = 8)
      assert(first.kmvConsolidated === Seq(s"$kmvDir/sketches"),
        s"the grown index must be overdue: ${first.decisions}")
      val files = new java.io.File(s"$kmvDir/sketches")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(files === 1,
        s"a bounded consolidation must collapse to ONE file, got $files")
      val second = Maintain.maintain(spark, kmvIndexDirs = Seq(kmvDir),
        kmvK = 8, auto = true, autoFactor = 8)
      assert(second.kmvConsolidated.isEmpty,
        s"a just-consolidated surface must be SKIPPED, not rewritten " +
          s"nightly forever: ${second.decisions}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("a crashed swap self-heals BEFORE the gate read (rerun, not PATH_NOT_FOUND)") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-maintain-heal").toString
    val kmvDir = s"$base/kmv"
    val docs = (1L to 30L).map(i => (i, s"s${i % 2}", s"text $i"))
      .toDF("doc_id", "source", "text")
    Dedup.buildSketchIndex(docs, kmvDir, k = 8)
    Dedup.appendSketchIndex(docs.withColumn("text", concat($"text", lit(" more"))),
      kmvDir, k = 8)
    val readBefore = Dedup.readSketchIndex(spark, kmvDir, k = 8)
      .collect().map(_.toString).sorted.toSeq
    // simulate a crash INSIDE the swap window: dir renamed aside, stage
    // never renamed in — the exact residue ADVICE r14 flagged as
    // breaking maintain's before-read
    val live = new java.io.File(s"$kmvDir/sketches")
    val aside = new java.io.File(s"$kmvDir/sketches__consolidate_old")
    assert(live.renameTo(aside), "fixture: could not stage the crash residue")
    val report = Maintain.maintain(spark, kmvIndexDirs = Seq(kmvDir), kmvK = 8)
    assert(report.kmvConsolidated === Seq(s"$kmvDir/sketches"))
    assert(Dedup.readSketchIndex(spark, kmvDir, k = 8)
      .collect().map(_.toString).sorted.toSeq == readBefore,
      "the healed rerun must read exactly the pre-crash index")
    assert(!aside.exists(), "the aside residue must be cleared")
  }

  test("census reports marker debt: survives consolidation, cleared by rebuild") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-maintain-markers").toString
    val histDir = s"$base/hist"
    val docs = (1L to 40L).map(id => (id, s"s${id % 2}", s"w$id x$id y$id"))
      .toDF("doc_id", "source", "text")
    HistogramSketch.buildHistogramIndex(docs.filter($"doc_id" <= 20), histDir)
    HistogramSketch.appendHistogramIndex(docs.filter($"doc_id" > 20), histDir)
    def markerCount: Long = Maintain.indexCensus(spark,
        Seq("hist" -> s"$histDir/hist"))
      .collect().head.getLong(5)
    assert(markerCount === 0L, "no forgets yet, no marker debt")
    // a forget writes one replay marker per (dir, idSet)
    Forget.forget(Seq(7L).toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir),
      removedDocs = Some(docs.filter($"doc_id" === 7)))
    Forget.forget(Seq(8L, 9L).toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir),
      removedDocs = Some(docs.filter($"doc_id".isin(8L, 9L))))
    assert(markerCount === 2L,
      "each distinct delete list must surface as marker debt")
    // markers SURVIVE consolidation (the retraction is folded into the
    // consolidated rows; the marker still guards replay)
    Maintain.maintain(spark, histIndexDirs = Seq(histDir))
    assert(markerCount === 2L,
      "consolidation must not clear marker debt - the r14 invariant, " +
        "now observable in the census")
    // and are CLEARED by a full rebuild (fresh index, stale markers
    // would wrongly suppress future retractions)
    HistogramSketch.buildHistogramIndex(docs, histDir)
    assert(markerCount === 0L,
      "a rebuild must invalidate the marker debt the census shows")
  }

  test("census marker debt is scoped to the histogram surface, never a co-located sibling") {
    val sql = spark
    import sql.implicits._
    // ONE index root hosting BOTH families: hist/ + hist_forget_markers/
    // beside sketches/ — the r15 census attributed the markers by parent
    // dir, so the KMV surface inherited the histogram's debt
    val root = Files.createTempDirectory("graft-marker-scope").toString
    val docs = (1L to 40L).map(id => (id, s"s${id % 2}", s"w$id x$id y$id"))
      .toDF("doc_id", "source", "text")
    HistogramSketch.buildHistogramIndex(docs, root)
    graft.operators.Dedup.buildSketchIndex(docs, root, 16)
    Forget.forget(Seq(7L).toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(root),
      removedDocs = Some(docs.filter($"doc_id" === 7)))
    val census = Maintain.indexCensus(spark,
        Seq("hist" -> s"$root/hist", "kmv" -> s"$root/sketches"))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(census("hist") === 1L,
      "the histogram surface owns its marker debt")
    assert(census("kmv") === 0L,
      "a co-located surface must not inherit the histogram's markers")
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
    // a not-yet-built surface fails WITH its label - the census is the
    // cadence decision input; a bare FileNotFoundException doesn't say
    // which of a dozen surfaces is missing
    val eMissing = intercept[IllegalArgumentException] {
      Maintain.indexCensus(spark, Seq("ghost" -> s"$base/never_built"))
    }
    assert(eMissing.getMessage.contains("'ghost'"),
      s"the missing surface must be named: ${eMissing.getMessage}")
  }
}
