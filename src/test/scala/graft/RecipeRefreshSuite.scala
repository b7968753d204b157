package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17: [[Recipe.refresh]] — the incremental re-publish from a corpus
  * delta. The contract under test: refresh(base-publish, delta) lands
  * artifacts BYTE-IDENTICAL to `Recipe.run(base ∪ delta)` at the dir's
  * own recorded parameters, while reading text only from the delta
  * (everything else re-derives from the persisted `stats/` index), and
  * a stratum whose materialized multiset is proven unchanged keeps its
  * packed rows verbatim (the passthrough split).
  */
class RecipeRefreshSuite extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("recipe-refresh-suite")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the RecipeSuite fixture: 4 sources, 600 docs, 3-9 tokens each
  private def allDocs = {
    import spark.implicits._
    (1L to 660L).map { i =>
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
  }
  // base = 600 docs; delta = the 60 appended ids (append-only by id)
  private def baseDocs = allDocs.filter(col("doc_id") <= 600L)
  private def deltaDocs = allDocs.filter(col("doc_id") > 600L)

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def artifactSet(dir: String, name: String): Set[Seq[Any]] = {
    val df = spark.read.parquet(s"$dir/$name")
    df.collect().map(_.toSeq).toSet
  }

  private def assertSameArtifacts(got: String, want: String): Unit =
    Seq("plan", "assignments", "order", "stats").foreach { a =>
      assert(artifactSet(got, a) === artifactSet(want, a),
        s"$a/ must be byte-identical to the full publish")
    }

  test("refresh(base, delta) is byte-identical to run(base ∪ delta) — flat publish") {
    val inc = tmp("graft-refresh-inc")
    val full = tmp("graft-refresh-full")
    Recipe.run(baseDocs, inc, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val rep = Recipe.refresh(deltaDocs, inc)
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    assertSameArtifacts(inc, full)
    assert(rep.deltaDocs === 60L)
    assert(rep.nEpochs === 1)
    assert(rep.repackedStrata + rep.passthroughStrata === rep.nStrata)
    // the governance exit record rides the publish: diff's exact card,
    // prior publish vs this one, one row per stratum in either plan
    val card = spark.read.parquet(s"$inc/refresh_diff")
    assert(card.count() === rep.nStrata)
    assert(card.columns.toSet === Set("source", "alloc_a", "alloc_b",
      "packed_a", "packed_b", "n_copies_a", "n_copies_b",
      "copies_only_a", "copies_only_b"))
    // every delta doc's copies are B-only churn in its stratum
    val deltaCopies = spark.read.parquet(s"$inc/assignments")
      .filter(col("doc_id") > 600L).count()
    assert(deltaCopies > 0L, "fixture drift: the delta must materialize")
    assert(card.agg(sum(col("copies_only_b"))).head().getLong(0) >= deltaCopies)
  }

  test("curriculum refresh: kernel + band spec re-derived from meta, byte-identical to the full curriculum publish") {
    val inc = tmp("graft-refresh-curr-inc")
    val full = tmp("graft-refresh-curr-full")
    val spec = Some(Recipe.CurriculumSpec(2L, 3L))
    Recipe.run(baseDocs, inc, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    Recipe.refresh(deltaDocs, inc)
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    assertSameArtifacts(inc, full)
    assert(spark.read.parquet(s"$inc/order").columns.contains("band"))
  }

  test("refresh after retract equals a fresh publish over survivors ∪ delta — forgotten docs cannot resurrect") {
    import spark.implicits._
    val inc = tmp("graft-refresh-retract-inc")
    val full = tmp("graft-refresh-retract-full")
    Recipe.run(baseDocs, inc, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val forgotten = (1L to 600L by 13).toSeq
    Recipe.retract(forgotten.toDF("doc_id"), inc)
    Recipe.refresh(deltaDocs, inc)
    Recipe.run(
      allDocs.filter(!col("doc_id").isin(forgotten: _*)), full,
      budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    assertSameArtifacts(inc, full)
    // the GDPR point, stated directly: no forgotten id anywhere
    Seq("stats", "assignments").foreach { a =>
      assert(spark.read.parquet(s"$inc/$a")
        .filter(col("doc_id").isin(forgotten: _*)).count() === 0L,
        s"$a/ must not resurrect retracted ids")
    }
  }

  test("curriculum + retract + refresh compose: equals the curriculum publish over survivors ∪ delta") {
    import spark.implicits._
    val inc = tmp("graft-refresh-cr-inc")
    val full = tmp("graft-refresh-cr-full")
    val spec = Some(Recipe.CurriculumSpec(2L, 3L))
    Recipe.run(baseDocs, inc, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    val forgotten = (1L to 600L by 17).toSeq
    Recipe.retract(forgotten.toDF("doc_id"), inc)
    Recipe.refresh(deltaDocs, inc)
    Recipe.run(allDocs.filter(!col("doc_id").isin(forgotten: _*)), full,
      budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    assertSameArtifacts(inc, full)
    // the refreshed dir re-proves clean end to end
    val card = Recipe.verify(spark, inc).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    Seq("order_permutation", "kernel_shape", "bands_current",
      "plan_strata", "stats_tokens", "mix_id_unique").foreach { k =>
      assert(card(k) === "ok", s"$k must be ok after the composition")
    }
  }

  test("refresh of an EXTENDED recipe re-deals every recorded epoch: equals the multi-epoch publish over the union") {
    val inc = tmp("graft-refresh-ext-inc")
    val full = tmp("graft-refresh-ext-full")
    Recipe.run(baseDocs, inc, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L, nEpochs = 1)
    Recipe.extendEpochs(spark, inc, nEpochs = 3)
    val rep = Recipe.refresh(deltaDocs, inc)
    assert(rep.nEpochs === 3, "refresh must honor the EXTENDED meta record")
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L, nEpochs = 3)
    assertSameArtifacts(inc, full)
  }

  test("refresh re-cuts a published shards manifest at its persisted budget; verify reads all-ok after") {
    val dir = tmp("graft-refresh-shards")
    Recipe.run(baseDocs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    Recipe.shards(spark, dir, shardTokens = 150)
    val rep = Recipe.refresh(deltaDocs, dir)
    assert(rep.artifacts.contains(s"$dir/shards"))
    val card = Recipe.verify(spark, dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    Seq("shards_tiling", "shards_mass", "shards_budget", "plan_strata",
      "stats_tokens", "order_permutation", "order_chunks_match",
      "mix_id_unique", "tokenized_assigned").foreach { k =>
      assert(card(k) === "ok", s"$k must be ok after a refresh, got ${card(k)}")
    }
  }

  test("passthrough: a stratum whose allocation survives the re-plan keeps its packed rows without re-packing") {
    import spark.implicits._
    // replicate the plan arithmetic in driver Scala (same JVM sqrt, same
    // integer div) and pick a delta token count that leaves at least one
    // OTHER stratum's allocation — hence its whole multiset — unchanged.
    // The budget is small so per-stratum allocations sit where a
    // one-token corpus delta moves them by less than one integer unit.
    val budget = 2000L
    val totals = baseDocs
      .groupBy(col("source")).agg(sum(size(split(col("text"), " "))).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    def wOf(n: Long): Long = math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    def allocs(ts: Map[String, Long]): Map[String, Long] = {
      val w = ts.map { case (s, n) => s -> wOf(n) }
      val tot = w.values.sum
      w.map { case (s, v) =>
        s -> (BigInt(budget) * v / tot).toLong }
    }
    val before = allocs(totals)
    val t = (1 to 20).find { cand =>
      val after = allocs(totals.updated("src0", totals("src0") + cand))
      before.exists { case (s, a) => s != "src0" && after(s) == a }
    }
    assert(t.isDefined,
      "fixture drift: no delta size keeps any allocation fixed")
    // the delta doc must DRAW a copy under src0's refreshed epochs
    // (otherwise even src0's multiset is unchanged and the whole refresh
    // legitimately passes through): replicate materializeMix's md5 draw
    // and pick a doc_id whose draw lands under the new fractional rate
    val newTotals = totals.updated("src0", totals("src0") + t.get)
    val epochsMicro0 = {
      val w = newTotals.map { case (s, n) => s -> wOf(n) }
      val tot = w.values.sum
      val alloc0 = (BigInt(budget) * w("src0") / tot).toLong
      (BigInt(alloc0) * 1000000 / newTotals("src0")).toLong
    }
    def drawOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:src0".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString, 16) % 1000000L
    }
    val deltaId = (700L to 900L)
      .find(id => drawOf(id) < epochsMicro0 % 1000000L)
    assert(deltaId.isDefined, "fixture drift: no delta id draws a copy")
    val dir = tmp("graft-refresh-pass")
    Recipe.run(baseDocs, dir, budgetTokens = budget, chunkTokens = 64,
      seed = 5L)
    val delta = Seq((deltaId.get, "src0",
      Seq.tabulate(t.get)(j => s"d$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val rep = Recipe.refresh(delta, dir)
    assert(rep.passthroughStrata >= 1L,
      "the crafted delta must leave at least one stratum's multiset " +
        s"unchanged (delta of ${t.get} tokens)")
    assert(rep.repackedStrata >= 1L, "src0 itself must re-pack")
    // and the publish is still exactly the full run's
    val full = tmp("graft-refresh-pass-full")
    Recipe.run(baseDocs.unionByName(delta), full,
      budgetTokens = budget, chunkTokens = 64, seed = 5L)
    assertSameArtifacts(dir, full)
  }

  test("continuous ingest: micro-batched refresh via foreachBatch ≡ the one-shot publish") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-refresh-stream")
    val full = tmp("graft-refresh-stream-full")
    Recipe.run(baseDocs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    // the "nightly delta" generalized to a live feed: each micro-batch
    // of new docs refreshes the published recipe in place — the same
    // API, driven by Structured Streaming's foreachBatch (the sink that
    // owns arbitrary batch-side effects), no streaming twin needed
    def docsTuple(i: Long): (Long, String, String) =
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = input.toDS().toDF("doc_id", "source", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (!df.isEmpty) { Recipe.refresh(df, dir); () }
      }
      .option("checkpointLocation", tmp("graft-refresh-stream-ckpt"))
      .start()
    Seq(601L to 620L, 621L to 640L, 641L to 660L).foreach { batch =>
      input.addData(batch.map(docsTuple): _*)
      q.processAllAvailable()
    }
    q.stop()
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    assertSameArtifacts(dir, full)
  }

  test("refusals: non-append deltas, duplicate ids, and pre-index dirs refuse loudly") {
    import spark.implicits._
    val dir = tmp("graft-refresh-refuse")
    Recipe.run(baseDocs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    // an id already in the index is a mutation, not an append
    val eKnown = intercept[IllegalArgumentException] {
      Recipe.refresh(Seq((5L, "src1", "mutated text"))
        .toDF("doc_id", "source", "text"), dir)
    }
    assert(eKnown.getMessage.contains("APPEND-ONLY"))
    // a delta that repeats an id would mint colliding mix_ids
    val eDup = intercept[IllegalArgumentException] {
      Recipe.refresh(Seq((701L, "src1", "a b"), (701L, "src1", "c d"))
        .toDF("doc_id", "source", "text"), dir)
    }
    assert(eDup.getMessage.contains("repeats"))
    // a null identity can never be retracted and collides its mix_ids
    val eNull = intercept[IllegalArgumentException] {
      Recipe.refresh(Seq((Option.empty[java.lang.Long], "src1", "a b"))
        .toDF("doc_id", "source", "text"), dir)
    }
    assert(eNull.getMessage.contains("null"))
    // a pre-r17 dir (no stats index) names the upgrade path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/stats"), true)
    val eStats = intercept[IllegalArgumentException] {
      Recipe.refresh(deltaDocs, dir)
    }
    assert(eStats.getMessage.contains("stats/"))
    assert(eStats.getMessage.contains("re-publish"))
  }

  test("work ∝ delta: refresh completes with the base corpus DELETED from disk — base text is provably never read") {
    import spark.implicits._
    def heavyText(i: Long): String = {
      val rnd = new java.util.Random(i)
      Seq.fill(400)(java.lang.Long.toHexString(rnd.nextLong()))
        .mkString(" ")
    }
    val heavyBase = (1L to 400L).map { i =>
      (i, s"src${i % 3}", heavyText(i))
    }.toDF("doc_id", "source", "text")
    val heavyDelta = (401L to 404L).map { i =>
      (i, s"src${i % 3}", heavyText(i))
    }.toDF("doc_id", "source", "text")
    val baseP = tmp("graft-refresh-io-base")
    heavyBase.write.mode("overwrite").parquet(baseP)

    val dir = tmp("graft-refresh-io-inc")
    Recipe.run(spark.read.parquet(baseP), dir,
      budgetTokens = 30000L, chunkTokens = 256, seed = 5L)
    // the IO-level evidence, stronger than any byte accounting: the
    // base corpus is GONE before the refresh runs. If refresh touched
    // base text through ANY read path it would throw; instead it
    // publishes from the persisted index + the delta alone, and the
    // result still matches the publish that could read everything.
    val fsz = new org.apache.hadoop.fs.Path(baseP)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsz.delete(new org.apache.hadoop.fs.Path(baseP), true))
    spark.catalog.refreshByPath(baseP)
    val rep = Recipe.refresh(heavyDelta, dir)
    assert(rep.deltaDocs === 4L)
    val fullDir = tmp("graft-refresh-io-full")
    Recipe.run(heavyBase.unionByName(heavyDelta), fullDir,
      budgetTokens = 30000L, chunkTokens = 256, seed = 5L)
    assertSameArtifacts(dir, fullDir)
  }
}
