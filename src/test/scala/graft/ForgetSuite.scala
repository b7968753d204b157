package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.operators.AnnIndex
import graft.state.{RescaleCounterFns, RocksDbStateStoreProvider, StateTestHelper}

/** The one-call GDPR story: ids seeded across streaming state, a serving
  * ANN index, and two derived artifacts are forgotten by a single
  * [[Forget.forget]] call whose exit gate PROVES zero residuals — then
  * the live query resumes, search never returns a pruned id, and
  * replaying the delete log is a no-op.
  */
class ForgetSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-forget")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def vec(j: Long): Seq[Double] =
    (0 until 8).map(i => 1.0 + ((j * 31 + i * 17) % 11) / 10.0)

  test("one call forgets across state + index + artifacts; gate, resume, replay") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("graft-forget").toString
    val forgetIds = Seq(3L, 7L)

    // ---- seed 1: two derived parquet artifacts keyed by doc_id
    val idx1 = s"$base/tokidx"
    val idx2 = s"$base/shards"
    (1L to 20L).flatMap(id => Seq((id, s"a$id"), (id, s"b$id")))
      .toDF("doc_id", "token").write.parquet(idx1)
    (1L to 20L).map(id => (id, id % 4)).toDF("doc_id", "shard").write.parquet(idx2)

    // ---- seed 2: a serving ANN index over the same ids
    val annDir = s"$base/ann"
    val corpus = (1L to 20L).map(j => (j, vec(j))).toDF("vec_id", "embedding")
    AnnIndex.build(corpus, annDir, nClusters = 4, iters = 2,
      numSub = 4, codebookK = 4, subIters = 1)

    // ---- seed 3: streaming state keyed by the same ids (ints)
    val ckpt1 = Files.createTempDirectory("graft-forget-ck1")
    val ckpt2 = Files.createTempDirectory("graft-forget-ck2")
    val latest = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val input = MemoryStream[(Int, Int)]
    def start(ckpt: String) = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCounts)
      .toDF("id", "total")
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => latest.put(r.getInt(0), r.getInt(1)))
      }
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start(ckpt1.toString)
    input.addData((1, 10), (3, 30), (7, 70), (9, 90))
    q1.processAllAvailable()
    q1.stop()

    // ---- ONE call
    val keySchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    val target = Forget.StateTarget(() => new RocksDbStateStoreProvider,
      ckpt1.toString, ckpt2.toString, operatorId = 0, numPartitions = 2,
      keySchema, keySchema, StateTestHelper.storeConf(),
      keyToId = row => row.getInt(0).toLong)
    val report = Forget.forget(forgetIds.toDF("doc_id"), "doc_id",
      states = Seq(target), annDir = Some(annDir),
      artifacts = Seq(idx1 -> "doc_id", idx2 -> "doc_id"))

    // a returned report IS the passed gate; sanity its contents
    assert(report.nIds === 2L)
    assert(report.stateKeysKept === Seq(2L), s"2 of 4 state keys survive: $report")
    assert(report.artifactsPruned.toSet ===
      Set(idx1, idx2, s"$annDir/codes"), s"report: $report")

    // artifacts really pruned, survivors intact
    assert(spark.read.parquet(idx1)
      .filter(col("doc_id").isin(forgetIds: _*)).count() === 0L)
    assert(spark.read.parquet(idx1).count() === 2L * 18)
    assert(spark.read.parquet(idx2).count() === 18L)

    // search over the pruned index NEVER returns a forgotten id, and
    // still serves survivors (3's nearest surviving neighbors rank)
    val hits = AnnIndex.search(corpus, annDir,
        corpus.filter(col("vec_id").isin(1L, 5L)), k = 5, nProbe = 4)
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.intersect(forgetIds.toSet).isEmpty,
      s"pruned ids must never be served: $hits")

    // the query RESUMES on the pruned checkpoint: forgotten users start
    // fresh, everyone else's state is intact
    latest.clear()
    val q2 = start(ckpt2.toString)
    input.addData((1, 1), (3, 3))
    q2.processAllAvailable()
    q2.stop()
    val after = latest.asScala.toMap
    assert(after === Map(1 -> 11, 3 -> 3),
      s"user 3 must restart fresh, user 1 keeps state: $after")

    // replaying the delete log is a no-op that still passes the gate
    // (fresh pruned-checkpoint path: in-place state rewrites are refused)
    val ckpt3 = Files.createTempDirectory("graft-forget-ck3")
    val replay = Forget.forget(forgetIds.toDF("doc_id"), "doc_id",
      states = Seq(target.copy(checkpoint = ckpt2.toString,
        prunedCheckpoint = ckpt3.toString)),
      annDir = Some(annDir),
      artifacts = Seq(idx1 -> "doc_id", idx2 -> "doc_id"))
    assert(replay.nIds === 2L)
    assert(spark.read.parquet(idx1).count() === 2L * 18, "replay is a no-op")
  }

  test("span-index leg: one call prunes pos/, decrements dfs, rides the gate") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-forget-span").toString
    val U = (1 to 12).map(i => s"u$i").mkString(" ")
    val corpus = Seq(
      (100L, (Seq(U) ++ (1 to 5).map(i => s"f$i")).mkString(" ")),
      (101L, (Seq(U) ++ (1 to 6).map(i => s"g$i")).mkString(" ")),
      (102L, (1 to 20).map(i => s"h$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spanDir = s"$base/span"
    operators.TextOps.buildSpanIndex(corpus, spanDir, n = 6)
    val art = s"$base/idx"
    (100L to 102L).map(id => (id, id * 7)).toDF("doc_id", "v").write.parquet(art)

    // the r10 wart: forgetFromSpanIndex was a standalone call OUTSIDE the
    // forced audit gate — now the span index is a first-class leg
    val report = Forget.forget(Seq(101L).toDF("doc_id"), "doc_id",
      artifacts = Seq(art -> "doc_id"), spanIndexDirs = Seq(spanDir))
    assert(report.artifactsPruned.toSet === Set(art, s"$spanDir/pos"),
      s"span pos/ must appear in the pruned report: $report")
    assert(spark.read.parquet(s"$spanDir/pos")
      .filter($"doc_id" === 101L).count() === 0L)
    val uDf = spark.read.parquet(s"$spanDir/grams")
      .groupBy($"gram").agg(sum($"df").as("df"))
      .filter($"gram" === ((1 to 6).map(i => s"u$i").mkString(" ")))
      .collect().map(_.getLong(1))
    assert(uDf.toSeq === Seq(1L),
      s"U's df must reflect the removal through the gated leg: ${uDf.toSeq}")
    assert(Forget.residuals(Seq(101L).toDF("doc_id"), "doc_id",
      spanIndexDirs = Seq(spanDir)).isEmpty)

    // a re-ingested pos row is caught by the same sweep forget throws on
    spark.read.parquet(s"$spanDir/pos").limit(1)
      .withColumn("doc_id", lit(101L))
      .withColumn("db", lit((101L % 64).toInt))
      .write.mode("append").partitionBy("db").parquet(s"$spanDir/pos")
    val res = Forget.residuals(Seq(101L).toDF("doc_id"), "doc_id",
      spanIndexDirs = Seq(spanDir))
    assert(res.size === 1 && res.head.contains(s"$spanDir/pos"),
      s"span residual must name the surface: $res")

    // the narrowing doctrine reaches the standalone span call too: a null
    // id fails loudly instead of silently shrinking the delete list
    val eNull = intercept[IllegalArgumentException] {
      operators.TextOps.forgetFromSpanIndex(
        Seq(Some(100L), None).toDF("doc_id"), spanDir)
    }
    assert(eNull.getMessage.contains("null or not castable"),
      s"null id must name the drop: ${eNull.getMessage}")
  }

  test("CDC-index leg: digests pruned with layout preserved; probe finds no ghost pairs") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-forget-cdc").toString
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (200L, body),
      (201L, "inserted preamble text here " + body),
      (202L, (1 to 50).map(i => s"w$i x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cdcDir = s"$base/cdc"
    operators.TextOps.buildCdcIndex(corpus, cdcDir)

    val report = Forget.forget(Seq(201L).toDF("doc_id"), "doc_id",
      cdcIndexDirs = Seq(cdcDir))
    assert(report.artifactsPruned.toSet === Set(s"$cdcDir/digests"),
      s"digests/ must appear in the pruned report: $report")
    assert(spark.read.parquet(s"$cdcDir/digests")
      .filter($"doc_id" === 201L).count() === 0L,
      "forgotten doc's digest rows must be pruned")
    // the db partition layout SURVIVES the prune — a flat rewrite would
    // have destroyed the ingest probe's partition pruning
    val dirs = new java.io.File(s"$cdcDir/digests").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("db=")),
      s"db= directories must survive the prune: ${dirs.toSeq}")
    assert(Forget.residuals(Seq(201L).toDF("doc_id"), "doc_id",
      cdcIndexDirs = Seq(cdcDir)).isEmpty)

    // a batch that near-dups the FORGOTTEN doc's content still pairs
    // against the surviving copy (200) but never the forgotten id
    val pairs = operators.TextOps.cdcNearDupIngest(
        Seq((300L, body + " tail bit")).toDF("doc_id", "text"),
        cdcDir, minFrac = 0.1, append = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((200L, 300L)), s"survivor must still pair: $pairs")
    assert(!pairs.exists(p => p._1 == 201L || p._2 == 201L),
      s"forgotten doc must not ghost-pair: $pairs")

    // a re-ingested digest row is caught by the residual sweep
    spark.read.parquet(s"$cdcDir/digests").limit(1)
      .withColumn("doc_id", lit(201L))
      .write.mode("append").partitionBy("db").parquet(s"$cdcDir/digests")
    val res = Forget.residuals(Seq(201L).toDF("doc_id"), "doc_id",
      cdcIndexDirs = Seq(cdcDir))
    assert(res.size === 1 && res.head.contains(s"$cdcDir/digests"),
      s"CDC residual must name the surface: $res")
  }

  test("residuals gate: red on an unpruned surface, green after, red on regression") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-forget-gate").toString
    val art = s"$base/idx"
    (1L to 10L).map(id => (id, id * 7)).toDF("doc_id", "v").write.parquet(art)
    val forget = Seq(4L, 8L).toDF("doc_id")

    // red BEFORE any prune: the compliance sweep catches the unpruned surface
    val before = Forget.residuals(forget, "doc_id", artifacts = Seq(art -> "doc_id"))
    assert(before.size === 1 && before.head.contains("2 residual rows"),
      s"unpruned surface must surface: $before")

    // forget passes its own gate (a return IS the proof)
    Forget.forget(forget, "doc_id", artifacts = Seq(art -> "doc_id"))
    assert(Forget.residuals(forget, "doc_id",
      artifacts = Seq(art -> "doc_id")).isEmpty)

    // a regression (an id re-ingested after the deletion) is caught by the
    // same sweep — this is the scenario forget's throw wiring guards
    Seq((4L, 28L)).toDF("doc_id", "v").write.mode("append").parquet(art)
    val after = Forget.residuals(forget, "doc_id", artifacts = Seq(art -> "doc_id"))
    assert(after.size === 1 && after.head.contains("1 residual rows"),
      s"re-ingested id must surface: $after")

    intercept[IllegalArgumentException] {
      Forget.forget(Seq.empty[Long].toDF("doc_id"), "doc_id",
        artifacts = Seq(art -> "doc_id"))
    }
    intercept[IllegalArgumentException] {
      Forget.forget(forget, "doc_id") // nothing to forget from
    }

    // a malformed delete-list entry must fail LOUDLY, not narrow the
    // proof: a null id silently dropped by normalization would let the
    // audit prove deletion of fewer ids than the caller submitted
    val withNull = Seq(Some(4L), None, Some(8L)).toDF("doc_id")
    val eNull = intercept[IllegalArgumentException] {
      Forget.forget(withNull, "doc_id", artifacts = Seq(art -> "doc_id"))
    }
    assert(eNull.getMessage.contains("null or not castable"),
      s"null id must name the drop: ${eNull.getMessage}")
    val unparsable = Seq("4", "not-an-id").toDF("doc_id")
    val eBad = intercept[Exception] {
      Forget.forget(unparsable, "doc_id", artifacts = Seq(art -> "doc_id"))
    } // ANSI sessions throw on the cast itself; either way it cannot pass
    assert(!(eBad.isInstanceOf[IllegalStateException]),
      s"unparsable id must fail before the audit gate: $eBad")
  }

  test("recipe leg: one call retracts published recipe artifacts and audits them") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-forget-recipe").toString
    val corpus = (1L to 600L).map { i =>
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
    val recipeDir = s"$base/recipe"
    Recipe.run(corpus, recipeDir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2)
    val forget = Seq(5L, 9L, 13L).toDF("doc_id")

    // red before: the compliance sweep covers BOTH id-keyed recipe
    // surfaces — assignments AND the r17 stats index (the refresh
    // materialization source, where a residual row resurrects)
    val before = Forget.residuals(forget, "doc_id",
      recipeDirs = Seq(recipeDir))
    assert(before.size === 2 && before.forall(_.contains("residual rows")),
      s"unretracted recipe must surface on both surfaces: $before")
    assert(before.exists(_.contains("/assignments")) &&
      before.exists(_.contains("/stats")))

    val report = Forget.forget(forget, "doc_id", recipeDirs = Seq(recipeDir))
    assert(report.artifactsPruned.toSet ===
      Set(s"$recipeDir/assignments", s"$recipeDir/order",
        s"$recipeDir/stats"))
    // the r17 token index is pruned too — an unpruned index would
    // RESURRECT forgotten docs through Recipe.refresh
    assert(spark.read.parquet(s"$recipeDir/stats")
      .join(forget, Seq("doc_id"), "left_semi").count() === 0L)
    assert(Forget.residuals(forget, "doc_id",
      recipeDirs = Seq(recipeDir)).isEmpty)

    // the schedule was repaired, not just pruned: each epoch is the
    // exact permutation 0..n-1 over the surviving chunk table
    val order = spark.read.parquet(s"$recipeDir/order")
    val nChunks = spark.read.parquet(s"$recipeDir/assignments")
      .filter(col("chunk_id").isNotNull)
      .select("source", "chunk_id").distinct().count()
    (0L to 1L).foreach { e =>
      val pos = order.filter(col("epoch") === e).select("pos")
        .collect().map(_.getLong(0)).sorted
      assert(pos.length.toLong === nChunks &&
          pos.headOption.contains(0L) && pos.last === nChunks - 1,
        s"epoch $e must be the exact permutation 0..${nChunks - 1}")
    }
  }

  test("recipe leg: heterogeneous key columns - one call covers differently-keyed recipes") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-forget-recipe-het").toString
    def corpus(idName: String, srcName: String) =
      (1L to 400L).map { i =>
        (i, s"s${i % 3}",
          Seq.tabulate((i % 5 + 3).toInt)(j => s"w${(i * 7 + j) % 30}")
            .mkString(" "))
      }.toDF(idName, srcName, "text")
    // two recipes published with DIFFERENT id/strata column names —
    // pre-r16 this took one forget call per schema (the forgettable-step
    // hazard); recipeTargets names the keys per dir
    val dirA = s"$base/recipeA"
    val dirB = s"$base/recipeB"
    Recipe.run(corpus("doc_id", "source"), dirA, budgetTokens = 12000L,
      chunkTokens = 64, seed = 3L)
    Recipe.run(corpus("item_id", "origin"), dirB, budgetTokens = 12000L,
      chunkTokens = 64, seed = 3L, strataCol = "origin", idCol = "item_id")
    val forget = Seq(5L, 9L).toDF("uid")

    // red before on BOTH dirs (assignments + stats each), audited on
    // each dir's own id column
    val before = Forget.residuals(forget, "uid",
      recipeTargets = Seq((dirA, "doc_id", "source"),
        (dirB, "item_id", "origin")))
    assert(before.size === 4, s"both unretracted recipes must surface " +
      s"on both surfaces: $before")

    val report = Forget.forget(forget, "uid",
      recipeTargets = Seq((dirA, "doc_id", "source"),
        (dirB, "item_id", "origin")))
    assert(report.recipeMixDeltasMicro.size === 2)
    assert(report.artifactsPruned.contains(s"$dirA/assignments") &&
      report.artifactsPruned.contains(s"$dirB/assignments"))

    // green after on both
    assert(Forget.residuals(forget, "uid",
      recipeTargets = Seq((dirA, "doc_id", "source"),
        (dirB, "item_id", "origin"))).isEmpty)

    // a dir listed in both spellings refuses (one retraction per dir)
    val dup = intercept[IllegalArgumentException] {
      Forget.forget(forget, "uid", recipeDirs = Seq(dirA),
        recipeTargets = Seq((dirA, "doc_id", "source")))
    }
    assert(dup.getMessage.contains("duplicate recipe dirs"))
  }

  test("aggregate indexes: histogram retraction leg + id-freedom audit for both") {
    val sql = spark
    import sql.implicits._
    import graft.operators.{Dedup, HistogramSketch}
    val base = Files.createTempDirectory("graft-forget-agg").toString
    // docs across two sources with id-dependent lengths, so a retraction
    // visibly moves the quantiles
    val docs = (1L to 24L).map { id =>
      (id, if (id % 2 == 0) "web" else "book",
        Seq.fill((id % 7 + 1).toInt)(s"tok$id word").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val histDir = s"$base/hist_idx"
    val kmvDir = s"$base/kmv_idx"
    HistogramSketch.buildHistogramIndex(docs, histDir)
    Dedup.buildSketchIndex(docs, kmvDir)

    val deleteIds = Seq(3L, 7L, 14L)
    val removed = docs.filter(col("doc_id").isin(deleteIds: _*))

    // the forget call: retraction leg + forced id-freedom audit — a
    // returned report IS the passed gate
    val report = Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), removedDocs = Some(removed),
      kmvIndexDirs = Seq(kmvDir))
    assert(report.aggregateIndexes.toSet ===
      Set(s"$histDir/hist", s"$kmvDir/sketches"), s"report: $report")

    // retraction accuracy: the index now reports EXACTLY the
    // survivor-only statistics (the q162 group-algebra property,
    // reached through the GDPR surface)
    val survivors = docs.filter(!col("doc_id").isin(deleteIds: _*))
    val fromIndex = HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted
    val fromScratch = HistogramSketch.sourceLengthQuantiles(survivors)
      .collect().map(_.toString).sorted
    assert(fromIndex.sameElements(fromScratch),
      "post-forget index must equal a survivor-only rebuild")

    // the histogram leg cannot be silently skipped: dirs without docs fail
    val eNoDocs = intercept[IllegalArgumentException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        histIndexDirs = Seq(histDir))
    }
    assert(eNoDocs.getMessage.contains("removedDocs"))

    // retracting a doc NOBODY deleted must fail loudly — it would
    // corrupt survivors' statistics
    val eExtra = intercept[IllegalArgumentException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        histIndexDirs = Seq(histDir),
        removedDocs = Some(docs.filter(col("doc_id").isin(3L, 5L))))
    }
    assert(eExtra.getMessage.contains("not in the delete list"))

    // id-freedom audit: an index that grew an id-bearing column (the
    // future-provenance hazard) turns every forget into a loud failure
    val badHist = s"$base/bad_hist"
    Seq(("web", 8L, 2L, 99L)).toDF("source", "rep", "cnt", "doc_id")
      .write.parquet(s"$badHist/hist")
    val res = Forget.residuals(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(badHist))
    assert(res.size === 1 && res.head.contains("id-free aggregate shape"),
      s"id-bearing column must surface: $res")
    // same through forget's throw wiring — via a KMV dir, whose leg
    // never writes, so the gate deterministically reads the bad schema
    val badKmv = s"$base/bad_kmv"
    Seq(("web", Seq(1L, 2L), 99L)).toDF("source", "kmv", "doc_id")
      .write.parquet(s"$badKmv/sketches")
    val eBadSchema = intercept[IllegalStateException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        kmvIndexDirs = Seq(badKmv))
    }
    assert(eBadSchema.getMessage.contains("id-free aggregate shape"))

    // clean sweep: the compliance re-proof over both aggregate indexes
    assert(Forget.residuals(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), kmvIndexDirs = Seq(kmvDir)).isEmpty)

    // REPLAY idempotence (the object's doctrine) for the retraction
    // leg: re-running the SAME forget call — the standard recovery when
    // the exit gate threw on another surface — must not double-subtract
    // (the marker skips the already-landed retraction); and a
    // duplicate-row removedDocs frame must not double-count either
    val dupRows = removed.union(removed)
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), removedDocs = Some(dupRows),
      kmvIndexDirs = Seq(kmvDir))
    val replayed = HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted
    assert(replayed.sameElements(fromScratch),
      "replaying the forget (with a duplicated removedDocs frame) must " +
        "leave the index at the survivor-only statistics, not subtract again")
  }

  test("KMV leg: in-call survivor rebuild ≡ a fresh survivor-only build; ghosts refused") {
    val sql = spark
    import sql.implicits._
    import graft.operators.Dedup
    val base = Files.createTempDirectory("graft-forget-kmv").toString
    val docs = (1L to 40L).map { id =>
      (id, if (id % 3 == 0) "web" else "book",
        Seq.fill((id % 6 + 3).toInt)(s"tok${id % 11} w${id % 7}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val kmvDir = s"$base/kmv_idx"
    Dedup.buildSketchIndex(docs, kmvDir)
    val deleteIds = Seq(6L, 11L, 30L)
    val survivors = docs.filter(!col("doc_id").isin(deleteIds: _*))

    // the prescribed-but-manual maintenance step now runs INSIDE the
    // call: the bottom-k monoid cannot subtract, so accuracy maintenance
    // is a survivor rebuild — and after it, the index reads EXACTLY like
    // a fresh build over the survivors (q157's lossless-merge identity)
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      kmvIndexDirs = Seq(kmvDir), kmvSurvivors = Some(survivors))
    val rebuilt = Dedup.readSketchIndex(spark, kmvDir)
      .collect().map(_.toString).sorted
    val freshDir = s"$base/fresh_idx"
    Dedup.buildSketchIndex(survivors, freshDir)
    val fresh = Dedup.readSketchIndex(spark, freshDir)
      .collect().map(_.toString).sorted
    assert(rebuilt.sameElements(fresh),
      "forget-with-rebuild must equal a survivor-only fresh build")

    // a "survivor" frame still holding a delete-list id would re-insert
    // the deleted doc's shingle minima — refused loudly, nothing written
    val beforeRows = spark.read.parquet(s"$kmvDir/sketches")
      .collect().map(_.toString).sorted
    val eGhost = intercept[IllegalArgumentException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        kmvIndexDirs = Seq(kmvDir),
        kmvSurvivors = Some(docs.filter(!col("doc_id").isin(6L, 11L))))
    }
    assert(eGhost.getMessage.contains("delete-list 'doc_id' ids"),
      s"ghost survivors must name the refusal: $eGhost")
    val afterRows = spark.read.parquet(s"$kmvDir/sketches")
      .collect().map(_.toString).sorted
    assert(afterRows.sameElements(beforeRows),
      "the refusal must land before any rebuild write")

    // survivors WITHOUT index dirs is a loud refusal, not a silent
    // no-op: the caller clearly wanted the rebuild (review fix) — with
    // another surface present so the entry guard passes and THIS guard
    // is the one proven
    val artDir = s"$base/some_artifact"
    docs.write.parquet(artDir)
    val eNoDirs = intercept[IllegalArgumentException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        artifacts = Seq((artDir, "doc_id")),
        kmvSurvivors = Some(survivors))
    }
    assert(eNoDirs.getMessage.contains("kmvSurvivors given without"),
      s"dropped rebuild must refuse: $eNoDirs")
  }

  test("KMV rebuild derives k from the index: a default-k forget cannot downgrade a wide build") {
    val sql = spark
    import sql.implicits._
    import graft.operators.Dedup
    val base = Files.createTempDirectory("graft-forget-kmvk").toString
    // 3 sources × 120 unique docs: every source FILLS a k=96 sketch, so
    // a rebuild at the default kmvK=64 would permanently discard minima
    // 65..96 and readSketchIndex(k=96) would report est_distinct as an
    // exact 64 — the silent downgrade the derivation closes (review fix)
    val docs = (1L to 360L).map(i => (i, s"s${i % 3}", s"unique body $i"))
      .toDF("doc_id", "source", "text")
    val kmvDir = s"$base/kmv_idx"
    Dedup.buildSketchIndex(docs, kmvDir, k = 96)
    val deleteIds = Seq(5L, 17L)
    val survivors = docs.filter(!col("doc_id").isin(deleteIds: _*))
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      kmvIndexDirs = Seq(kmvDir), kmvSurvivors = Some(survivors)) // kmvK default
    val rebuilt = Dedup.readSketchIndex(spark, kmvDir, k = 96)
      .collect().map(_.toString).sorted
    val freshDir = s"$base/fresh_idx"
    Dedup.buildSketchIndex(survivors, freshDir, k = 96)
    val fresh = Dedup.readSketchIndex(spark, freshDir, k = 96)
      .collect().map(_.toString).sorted
    assert(rebuilt.sameElements(fresh),
      "a default-kmvK forget must preserve the wide build's k=96 reads")
  }

  test("histogram markers: survive consolidation, invalidate on rebuild, fail-fast pre-write") {
    val sql = spark
    import sql.implicits._
    import graft.operators.HistogramSketch
    val base = Files.createTempDirectory("graft-forget-markers").toString
    val docs = (1L to 30L).map { id =>
      (id, if (id % 2 == 0) "web" else "book",
        Seq.fill((id % 5 + 2).toInt)(s"t$id w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val histDir = s"$base/hist_idx"
    HistogramSketch.buildHistogramIndex(docs, histDir)
    val deleteIds = Seq(4L, 9L)
    val removed = docs.filter(col("doc_id").isin(deleteIds: _*))
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), removedDocs = Some(removed))
    val survivorStats = HistogramSketch.sourceLengthQuantiles(
        docs.filter(!col("doc_id").isin(deleteIds: _*)))
      .collect().map(_.toString).sorted

    // 1) consolidation keeps the markers: applied retractions are IN
    //    the consolidated counts, so a replayed forget must STILL skip
    //    (a re-subtraction against the consolidated generation would
    //    corrupt silently — shared buckets stay net-positive)
    HistogramSketch.consolidateHistogramIndex(spark, histDir)
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), removedDocs = Some(removed))
    val afterReplay = HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted
    assert(afterReplay.sameElements(survivorStats),
      "replay after consolidation must skip (marker survives the rewrite)")

    // 2) REBUILD invalidates the markers (r13 ADVICE): a fresh build
    //    contains no retractions, so a stale (dir, idSet) marker from
    //    the previous build would silently skip a LEGITIMATE forget of
    //    the same id set — the rebuilt index would keep counting the
    //    deleted docs with no error anywhere
    HistogramSketch.buildHistogramIndex(docs, histDir) // re-includes 4, 9
    Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
      histIndexDirs = Seq(histDir), removedDocs = Some(removed))
    val afterRebuildForget = HistogramSketch.readHistogramIndex(spark, histDir)
      .collect().map(_.toString).sorted
    assert(afterRebuildForget.sameElements(survivorStats),
      "the same id set must retract NORMALLY against a rebuilt index - " +
        "stale markers from the previous build must not survive it")

    // 3) fail-FAST pre-write (r13 ADVICE): against a schema-drifted
    //    index the old flow appended (source, rep, cnt) retraction rows
    //    FIRST and only then failed in the exit gate — landing
    //    mixed-schema parquet into the very index the audit protects.
    //    The pre-write check must refuse BEFORE anything lands.
    val driftedDir = s"$base/drifted_idx"
    Seq(("web", 8L, 2L, 99L)).toDF("source", "rep", "cnt", "doc_id")
      .write.parquet(s"$driftedDir/hist")
    val filesBefore = new java.io.File(s"$driftedDir/hist")
      .listFiles().map(_.getName).toSet
    val eDrift = intercept[IllegalArgumentException] {
      Forget.forget(deleteIds.toDF("doc_id"), "doc_id",
        histIndexDirs = Seq(driftedDir), removedDocs = Some(removed))
    }
    assert(eDrift.getMessage.contains("id-free aggregate shape"),
      s"pre-write refusal must name the drift: $eDrift")
    val filesAfter = new java.io.File(s"$driftedDir/hist")
      .listFiles().map(_.getName).toSet
    assert(filesAfter === filesBefore,
      "the refusal must land BEFORE any retraction rows are written")
  }
}
