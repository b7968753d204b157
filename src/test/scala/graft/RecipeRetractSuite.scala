package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** [[Recipe.retract]] + [[Pipeline.recompactPositions]] +
  * [[Pipeline.shardManifest]]: the r15 deletion-propagation and
  * read-side manifest tier over published recipe artifacts.
  */
class RecipeRetractSuite extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("recipe-retract-suite")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    // RecipeSuite's proven fixture shape: 4 sources, 600 docs, enough
    // chunks that the mixing gate's tolerance is comfortably met
    (1L to 600L).map { i =>
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("recompactPositions: holes close, relative order preserved, per epoch") {
    import spark.implicits._
    val order = Seq(
      // epoch 0 with holes at 1 and 4
      ("a", 0L, 0L, 0L), ("b", 1L, 2L, 0L), ("c", 2L, 3L, 0L), ("d", 3L, 5L, 0L),
      // epoch 1 with a different survivor order
      ("c", 2L, 0L, 1L), ("a", 0L, 3L, 1L), ("d", 3L, 4L, 1L), ("b", 1L, 6L, 1L)
    ).toDF("stratum", "chunk_id", "pos", "epoch")
    val out = Pipeline.recompactPositions(order)
      .orderBy(col("epoch"), col("pos"))
      .select(col("epoch"), col("pos"), col("stratum")).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((0L, 0L, "a"), (0L, 1L, "b"), (0L, 2L, "c"), (0L, 3L, "d"),
        (1L, 0L, "c"), (1L, 1L, "a"), (1L, 2L, "d"), (1L, 3L, "b")))
  }

  test("recompactPositions: flat (no epoch column) input keeps its schema") {
    import spark.implicits._
    val order = Seq(("a", 0L, 10L), ("b", 1L, 20L), ("c", 2L, 35L))
      .toDF("stratum", "chunk_id", "pos")
    val out = Pipeline.recompactPositions(order)
    assert(out.columns.toSeq === Seq("stratum", "chunk_id", "pos"))
    assert(out.orderBy("pos").select("stratum", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("recompactPositions: duplicate position refuses loudly") {
    import spark.implicits._
    val order = Seq(("a", 0L, 1L), ("b", 1L, 1L)).toDF("stratum", "chunk_id", "pos")
    val e = intercept[org.apache.spark.SparkException] {
      Pipeline.recompactPositions(order).collect()
    }
    assert(e.getMessage.contains("duplicate position") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate position")))
  }

  test("retract: prune + chunk drop + recompaction on a 3-epoch recipe") {
    import spark.implicits._
    val dir = tmp("graft-retract-epochs")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 3)
    // PRE-RETRACT state as plain values: the staged rewrite refreshes
    // the path's caches, so frames over these dirs re-read the
    // POST-rewrite files once retract has run
    val orderBefore = spark.read.parquet(s"$dir/order")
    val assignedBefore = spark.read.parquet(s"$dir/assignments")
    val victimIds = assignedBefore.select("doc_id").distinct()
      .orderBy("doc_id").limit(8).as[Long].collect().toSeq
    val victims = victimIds.toDF("doc_id")
    val chunksBeforeCount = orderBefore
      .select("stratum", "chunk_id").distinct().count()

    // expected survivors + recompacted order, computed the SLOW way
    // (Window) as an independent check of the two-pass kernel
    val survivors = assignedBefore
      .filter(!col("doc_id").isin(victimIds: _*) && col("chunk_id").isNotNull)
      .select(col("source").as("stratum"), col("chunk_id")).distinct()
    val expectedNChunks = survivors.count()
    val expected = orderBefore
      .join(survivors, Seq("stratum", "chunk_id"))
      .withColumn("npos", row_number().over(
        Window.partitionBy("epoch").orderBy("pos")).cast("long") - 1L)
      .select(col("stratum"), col("chunk_id"), col("npos").as("pos"), col("epoch"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val rep = Recipe.retract(victims, dir)
    assert(rep.nIds === victimIds.length.toLong)
    assert(rep.nEpochs === 3)
    assert(rep.copiesRemoved > 0L && rep.tokensRemoved > 0L)

    val after = spark.read.parquet(s"$dir/order")
    val got = after.collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("epoch"))).toSet
    assert(got === expected)

    // zero-residual: assignments hold none of the victims
    val res = spark.read.parquet(s"$dir/assignments")
      .filter(col("doc_id").isin(victimIds: _*)).count()
    assert(res === 0L)
    // report reconciles with the artifacts
    assert(rep.nChunks === expectedNChunks)
    assert(rep.chunksDropped === chunksBeforeCount - rep.nChunks)

    // idempotent: replaying the delete log re-proves the gates, changes nothing
    val rep2 = Recipe.retract(victims, dir)
    assert(rep2.copiesRemoved === 0L)
    assert(rep2.chunksDropped === 0L)
    assert(rep2.nChunks === rep.nChunks)
  }

  test("retract: flat (nEpochs=1) recipe and absent ids are a no-op") {
    import spark.implicits._
    val dir = tmp("graft-retract-flat")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    val before = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"))).toSet
    val rep = Recipe.retract(Seq(99999L, 88888L).toDF("doc_id"), dir)
    assert(rep.copiesRemoved === 0L && rep.chunksDropped === 0L)
    val after = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"))).toSet
    assert(after === before)
  }

  test("shardManifest: greedy token-budget shards per epoch, ranges contiguous") {
    import spark.implicits._
    val dir = tmp("graft-shards")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2)
    val order = spark.read.parquet(s"$dir/order")
    val chunkTokens = spark.read.parquet(s"$dir/assignments")
      .filter(col("chunk_id").isNotNull)
      .groupBy(col("source").as("stratum"), col("chunk_id"))
      .agg(sum(col("n_tokens")).cast("bigint").as("n_tokens"))
    val manifest = Pipeline.shardManifest(order, chunkTokens, shardTokens = 150)
      .orderBy(col("epoch"), col("shard_id")).collect()

    // expected via the slow Window cumsum
    val expected = order.join(chunkTokens, Seq("stratum", "chunk_id"))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy("epoch").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", ((col("cum") - col("n_tokens")) / 150L)
        .cast("long"))
      .groupBy("epoch", "shard_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").cast("bigint").as("sum_tokens"),
        min("pos").cast("bigint").as("first_pos"),
        max("pos").cast("bigint").as("last_pos"))
      .orderBy(col("epoch"), col("shard_id")).collect()
    assert(manifest.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)

    // position ranges tile each epoch contiguously: next first = prev last + 1
    manifest.groupBy(_.getAs[Long]("epoch")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("shard_id"))
      assert(sorted.head.getAs[Long]("first_pos") === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("first_pos") === a.getAs[Long]("last_pos") + 1L)
        case _ => ()
      }
    }
  }

  test("stagedRewrite refreshes the path: a pre-retract cached read never serves deleted rows") {
    import spark.implicits._
    val dir = tmp("graft-retract-cache")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    // cache a read of the artifact BEFORE the rewrite — without the
    // refreshByPath in stagedRewrite, this relation keeps serving the
    // pre-prune rows (the exact bug the r15 fix closes)
    val cached = spark.read.parquet(s"$dir/assignments").cache()
    assert(cached.filter(col("doc_id") === 1L).count() > 0L)
    Recipe.retract(Seq(1L).toDF("doc_id"), dir)
    assert(cached.filter(col("doc_id") === 1L).count() === 0L,
      "a cached pre-rewrite relation must not survive the staged swap")
    cached.unpersist()
  }

  test("Recipe.shards: manifest artifact ≡ the hand composition; refresh after retract") {
    import spark.implicits._
    val dir = tmp("graft-recipe-shards")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    val n = Recipe.shards(spark, dir, shardTokens = 150)
    val manifest = spark.read.parquet(s"$dir/shards")
    assert(n === manifest.count())
    val hand = Pipeline.shardManifest(
      spark.read.parquet(s"$dir/order"),
      spark.read.parquet(s"$dir/assignments")
        .filter(col("chunk_id").isNotNull)
        .groupBy(col("source").as("stratum"), col("chunk_id"))
        .agg(sum(col("n_tokens")).cast("bigint").as("n_tokens")), 150)
    // the artifact = the kernel's manifest + the persisted budget column
    assert(manifest.drop("shard_tokens").orderBy("shard_id").collect()
      .map(_.toSeq).toSeq ===
      hand.orderBy("shard_id").collect().map(_.toSeq).toSeq)

    // retract REGENERATES the manifest itself (at the budget the
    // manifest persists): the refreshed tiling must cover exactly the
    // RECOMPACTED position space — a stale manifest would hand readers
    // slices past the new end
    val rep = Recipe.retract(Seq(2L, 4L, 6L).toDF("doc_id"), dir)
    assert(rep.artifacts.contains(s"$dir/shards"),
      "retract must report the regenerated manifest")
    val refreshed = spark.read.parquet(s"$dir/shards")
      .orderBy("shard_id").collect()
    assert(refreshed.forall(_.getAs[Long]("shard_tokens") === 150L),
      "regeneration must re-cut at the manifest's own persisted budget")
    val nChunks = spark.read.parquet(s"$dir/order").count()
    assert(refreshed.head.getAs[Long]("first_pos") === 0L)
    assert(refreshed.last.getAs[Long]("last_pos") === nChunks - 1L)
    refreshed.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("first_pos") === a.getAs[Long]("last_pos") + 1L)
      case _ => ()
    }
  }

  test("retract: a budget-less shards manifest refuses BEFORE any mutation") {
    import spark.implicits._
    val dir = tmp("graft-retract-badshards")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    // a hand-rolled manifest without the persisted budget column
    Seq((0L, 1L)).toDF("shard_id", "n_chunks")
      .write.parquet(s"$dir/shards")
    val before = spark.read.parquet(s"$dir/assignments").count()
    val e = intercept[IllegalArgumentException] {
      Recipe.retract(Seq(1L).toDF("doc_id"), dir)
    }
    assert(e.getMessage.contains("shard_tokens"))
    // fail-fast: the recipe dir is untouched
    assert(spark.read.parquet(s"$dir/assignments").count() === before)
  }

  test("retract: idempotent replay against a fully-emptied epoch order (no NPE)") {
    import spark.implicits._
    val dir = tmp("graft-retract-empty")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2)
    val all = docs.select("doc_id").distinct()
    val rep1 = Recipe.retract(all, dir)
    assert(rep1.nChunks === 0L)
    assert(spark.read.parquet(s"$dir/order").count() === 0L)
    // the replay must re-prove the gates on the emptied artifact, not NPE
    val rep2 = Recipe.retract(all, dir)
    assert(rep2.nChunks === 0L && rep2.copiesRemoved === 0L)
  }

  test("Recipe.report: plan vs delivered reconciliation; a fully-retracted stratum shows zeros") {
    import spark.implicits._
    val dir = tmp("graft-recipe-report")
    val rep = Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val card = Recipe.report(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(card.size.toLong === rep.nStrata)
    // reconciles with the run report and the plan artifact
    assert(card.values.map(_.getAs[Long]("packed_tokens")).sum ===
      rep.multisetTokens)
    assert(card.values.map(_.getAs[Long]("n_chunks")).sum === rep.nChunks)
    val plan = spark.read.parquet(s"$dir/plan").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc_tokens")).toMap
    card.foreach { case (s, r) =>
      assert(r.getAs[Long]("alloc_tokens") === plan(s))
      assert(r.getAs[Long]("mix_delta_micro") <= 250000L,
        "the card's mixing delta must sit within the gate the run passed")
    }

    // retract EVERY doc of one stratum: its plan row survives (the
    // governance record) with delivered columns at zero — the row a
    // review needs to see
    val victimSrc = card.keys.min
    val victims = docs.filter(col("source") === victimSrc)
      .select("doc_id").distinct()
    Recipe.retract(victims, dir)
    val after = Recipe.report(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(after.size.toLong === rep.nStrata)
    val z = after(victimSrc)
    assert(z.getAs[Long]("alloc_tokens") === plan(victimSrc))
    assert(z.getAs[Long]("n_copies") === 0L &&
      z.getAs[Long]("packed_tokens") === 0L &&
      z.getAs[Long]("n_chunks") === 0L &&
      z.getAs[Long]("utilization_micro") === 0L &&
      z.getAs[Long]("mix_delta_micro") === 0L)
  }

  test("shardBreakdown: reconciles with the manifest; shares are exact per-shard fractions") {
    import spark.implicits._
    val dir = tmp("graft-shard-mix")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2)
    val order = spark.read.parquet(s"$dir/order")
    val chunkTokens = spark.read.parquet(s"$dir/assignments")
      .filter(col("chunk_id").isNotNull)
      .groupBy(col("source").as("stratum"), col("chunk_id"))
      .agg(sum(col("n_tokens")).cast("bigint").as("n_tokens"))
    val manifest = Pipeline.shardManifest(order, chunkTokens, 150)
    val breakdown = Pipeline.shardBreakdown(order, chunkTokens, 150)

    // the two views fold the SAME shard assignment: per-(epoch, shard)
    // chunk and token totals must agree exactly
    val fromBreakdown = breakdown.groupBy("epoch", "shard_id")
      .agg(sum("n_chunks").as("n_chunks"),
        sum("sum_tokens").cast("bigint").as("sum_tokens"))
      .orderBy("epoch", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fromManifest = manifest
      .select("epoch", "shard_id", "n_chunks", "sum_tokens")
      .orderBy("epoch", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fromBreakdown.toSeq === fromManifest.toSeq)

    // shares: exact integer fractions of the shard's own mass — they
    // sum to 10^6 minus div-truncation slack (< strata per shard)
    breakdown.groupBy("epoch", "shard_id")
      .agg(sum("token_share_micro").as("s"), count(lit(1)).as("n"))
      .collect().foreach { r =>
        val (s, n) = (r.getAs[Long]("s"), r.getAs[Long]("n"))
        assert(s <= 1000000L && s > 1000000L - n,
          s"shares must sum to 1e6 within truncation slack: $r")
      }
  }

  test("publish self-heal: a crash inside the root swap window is restored by the next reader") {
    import spark.implicits._
    val dir = tmp("graft-publish-heal")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    val before = Recipe.report(spark, dir).collect().map(_.toSeq).toSet
    // simulate the crash window: live dir renamed aside, stage never
    // renamed in (the exact residue stagedOverwrite's swap can leave)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(dir + "__publish_old")))
    // the next reader self-heals and serves the intact publish
    val healed = Recipe.report(spark, dir).collect().map(_.toSeq).toSet
    assert(healed === before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__publish_old")))
  }

  test("extendEpochs: old epochs byte-identical, new epochs are the seed-derived permutations") {
    import spark.implicits._
    val dir = tmp("graft-extend")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2)
    val before = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("epoch"))).toSet

    val rep = Recipe.extendEpochs(spark, dir, 3)
    assert(rep.oldEpochs === 2 && rep.nEpochs === 3)
    val after = spark.read.parquet(s"$dir/order")
    // epochs 0-1 unchanged row-for-row
    val oldRows = after.filter(col("epoch") < 2L).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("epoch"))).toSet
    assert(oldRows === before)
    // epoch 2 IS the kernel at seed XOR 2 over the same chunk table
    val chunks = spark.read.parquet(s"$dir/assignments")
      .filter(col("chunk_id").isNotNull)
      .select(col("source").as("stratum"), col("chunk_id")).distinct()
    val expected = graft.operators.Pipeline
      .trainingOrder(chunks, 11L ^ 2L, Seq("stratum", "chunk_id"))
      .collect().map(r => (r.getAs[String]("stratum"),
        r.getAs[Long]("chunk_id"), r.getAs[Long]("pos"))).toSet
    val got = after.filter(col("epoch") === 2L)
      .collect().map(r => (r.getAs[String]("stratum"),
        r.getAs[Long]("chunk_id"), r.getAs[Long]("pos"))).toSet
    assert(got === expected)
    // meta flipped
    assert(spark.read.parquet(s"$dir/meta").head()
      .getAs[Long]("n_epochs") === 3L)
    // shrinking refuses
    val e = intercept[IllegalArgumentException] {
      Recipe.extendEpochs(spark, dir, 2)
    }
    assert(e.getMessage.contains("must exceed"))
  }

  test("extendEpochs: a flat single-epoch schedule gains its epoch column; manifest re-cut") {
    import spark.implicits._
    val dir = tmp("graft-extend-flat")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    Recipe.shards(spark, dir, shardTokens = 150)
    val flatBefore = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"))).toSet

    val rep = Recipe.extendEpochs(spark, dir, 2)
    assert(rep.artifacts.contains(s"$dir/shards"))
    val after = spark.read.parquet(s"$dir/order")
    assert(after.columns.contains("epoch"))
    val epoch0 = after.filter(col("epoch") === 0L).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"))).toSet
    assert(epoch0 === flatBefore)
    // manifest re-cut over BOTH epochs at the persisted budget
    val manifest = spark.read.parquet(s"$dir/shards")
    assert(manifest.columns.contains("epoch"))
    assert(manifest.select("epoch").distinct().count() === 2L)
    assert(manifest.head().getAs[Long]("shard_tokens") === 150L)
  }

  test("extendEpochs: replay after a crash-before-meta-flip converges, never duplicates") {
    import spark.implicits._
    val dir = tmp("graft-extend-replay")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    Recipe.extendEpochs(spark, dir, 2)
    val extended = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("epoch"))).toSet
    // simulate the crash window: order/ and shards/ already extended,
    // meta/ still records the OLD epoch count (the flip is the commit
    // point and never happened)
    val rolled = spark.read.parquet(s"$dir/meta")
      .withColumn("n_epochs", lit(1L))
    val rows = rolled.collect() // break lineage off the path being rewritten
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq), rolled.schema)
      .write.mode("overwrite").parquet(s"$dir/meta")
    // the replayed call must RE-DERIVE epoch 1, not append a duplicate
    val rep = Recipe.extendEpochs(spark, dir, 2)
    assert(rep.oldEpochs === 1 && rep.nEpochs === 2)
    val replayed = spark.read.parquet(s"$dir/order").collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("pos"), r.getAs[Long]("epoch"))).toSet
    assert(replayed === extended)
    assert(spark.read.parquet(s"$dir/meta").head()
      .getAs[Long]("n_epochs") === 2L)
  }

  test("run re-publish: an existing shards manifest is re-cut over the new publish, not orphaned") {
    import spark.implicits._
    val dir = tmp("graft-republish")
    Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    Recipe.shards(spark, dir, shardTokens = 150)
    // re-publish with a different seed: the whole root swaps, but the
    // fleet's shards path must keep serving — re-cut at the persisted
    // budget over the NEW schedule
    val rep = Recipe.run(docs, dir, budgetTokens = 20000L, chunkTokens = 64,
      seed = 9L)
    assert(rep.artifacts.contains(s"$dir/shards"))
    val manifest = spark.read.parquet(s"$dir/shards")
      .orderBy("shard_id").collect()
    assert(manifest.nonEmpty)
    assert(manifest.forall(_.getAs[Long]("shard_tokens") === 150L))
    val nChunks = spark.read.parquet(s"$dir/order").count()
    assert(manifest.last.getAs[Long]("last_pos") === nChunks - 1L,
      "the re-cut manifest must tile the NEW publish's position space")

    // an EMPTY prior manifest keeps its budget in the r16 `_budget`
    // sidecar: re-publish re-cuts at it instead of refusing (the legacy
    // sidecar-less refusal is pinned in RecipeCurriculumSuite)
    val dir2 = tmp("graft-republish-empty")
    Recipe.run(docs, dir2, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    Recipe.shards(spark, dir2, shardTokens = 150)
    Recipe.retract(docs.select("doc_id").distinct(), dir2) // empties it
    val rep2 = Recipe.run(docs, dir2, budgetTokens = 20000L, chunkTokens = 64,
      seed = 9L)
    assert(rep2.artifacts.contains(s"$dir2/shards"))
    val m2 = spark.read.parquet(s"$dir2/shards")
    assert(m2.count() > 0L &&
      m2.select("shard_tokens").distinct().collect()
        .map(_.getLong(0)).toSeq === Seq(150L),
      "the re-publish must re-cut the emptied manifest at its sidecar budget")
  }

  test("shardManifest: missing or duplicated token rows refuse loudly") {
    import spark.implicits._
    val order = Seq(("a", 0L, 0L), ("a", 1L, 1L)).toDF("stratum", "chunk_id", "pos")
    val missing = Seq(("a", 0L, 10L)).toDF("stratum", "chunk_id", "n_tokens")
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.shardManifest(order, missing, 100)
    }
    assert(e1.getMessage.contains("exactly one n_tokens row"))
    val dup = Seq(("a", 0L, 10L), ("a", 0L, 10L), ("a", 1L, 5L))
      .toDF("stratum", "chunk_id", "n_tokens")
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.shardManifest(order, dup, 100)
    }
    assert(e2.getMessage.contains("exactly one n_tokens row"))

    // r16: one MISSING + one DUPLICATED row OFFSET in the raw count
    // (nJoined == nOrder) — the count-only gate shipped a manifest with
    // a double-counted mass and a positional hole; the distinct-position
    // leg separates the cases
    val offset = Seq(("a", 0L, 10L), ("a", 0L, 10L))
      .toDF("stratum", "chunk_id", "n_tokens") // chunk 1 missing, chunk 0 doubled
    val e3 = intercept[IllegalArgumentException] {
      Pipeline.shardManifest(order, offset, 100)
    }
    assert(e3.getMessage.contains("distinct positions"))
  }
}
