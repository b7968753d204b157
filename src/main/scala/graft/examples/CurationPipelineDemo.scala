package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipeline, TextOps}

/** Usage demo of the batch curation surface end to end — the nightly
  * flow a library user composes from the public operators, run against
  * the bundled test corpus:
  *
  *   1. per-source funnel report   (raw → quality → exact → near-dup →
  *                                  CDC chunk-dup)
  *   2. nightly index builds       (CDC chunk-digest index, KMV sketch
  *                                  index)
  *   3. a daily ingest probing + growing both indexes (work ∝ batch)
  *   4. the governance report card a mix review reads
  *   5. recipe execution (r15): mixture plan → materialized multiset →
  *      packing → seeded training-order shuffle → mixing audit, as ONE
  *      gated Recipe.run call with persisted artifacts — then the
  *      nightly corpus delta re-published INCREMENTALLY
  *      (Recipe.refresh, r17: delta text only, index-derived re-plan,
  *      refresh_diff governance card), a document correction landing
  *      as ONE swap (Recipe.upsert, r18), and the fleet restart walk
  *      (readShard consumed + resumeShards remainder ≡ the schedule
  *      exactly once)
  *   6. surgical span-level decontamination (cut the leaked passage,
  *      keep the doc)
  *   7. right-to-be-forgotten across the persisted indexes, with the
  *      forced deletion-audit gate
  *
  * Run: `sbt "runMain graft.examples.CurationPipelineDemo [sfDir]"`
  */
object CurationPipelineDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    // 1) where does each source lose its docs?
    println("== curation funnel (per source, first 5) ==")
    Pipeline.curationFunnel(docs, minTokens = 10, maxTokens = 200,
        minTtr = 0.3, nearDupThreshold = 0.8, maxTokenDf = 100)
      .orderBy(col("source")).show(5, truncate = false)

    // 2) nightly artifacts: docs < 250 stand in for the ingested corpus
    val corpus = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val base = Files.createTempDirectory("graft-demo").toString
    TextOps.buildCdcIndex(corpus, s"$base/cdc")
    Dedup.buildSketchIndex(corpus, s"$base/sketch", k = 64)

    // 3) the daily ingest: near-dup pairs vs the union corpus, index grown
    val pairs = TextOps.cdcNearDupIngest(batch, s"$base/cdc", minFrac = 0.25)
    println(s"== ingest: ${pairs.count()} CDC near-dup pairs vs corpus+batch ==")
    pairs.show(5, truncate = false)
    Dedup.appendSketchIndex(batch, s"$base/sketch", k = 64)
    println("== per-source distinct estimates from the merged sketch index ==")
    Dedup.readSketchIndex(spark, s"$base/sketch", k = 64)
      .select(col("source"), col("n_kmv"), col("est_distinct"))
      .orderBy(col("source")).show(5, truncate = false)

    // 4) the one-table governance view
    println("== source report card (first 5) ==")
    Pipeline.sourceReportCard(docs,
        isGoodSeed = col("source") === "src0" && col("lang") === "en",
        isBadSeed = col("source") === "src0" && col("lang") =!= "en")
      .orderBy(col("source")).show(5, truncate = false)

    // 5) recipe execution (r15): the whole plan → materialize → pack →
    //    order pipeline is ONE gated call now — the conservation,
    //    permutation, and mixing proofs ran or Recipe.run threw; the
    //    report is the record. Published over 9/10ths of the corpus so
    //    the nightly INCREMENTAL path (r17) can be driven next.
    val recipe = graft.Recipe.run(docs.filter(col("doc_id") % 10 =!= 0),
      s"$base/recipe", budgetTokens = 200000L, chunkTokens = 256, seed = 7L)
    println(s"== recipe: ${recipe.nStrata} strata, " +
      s"${recipe.multisetRows} copies / ${recipe.multisetTokens} tokens " +
      s"packed into ${recipe.nChunks} chunks; worst mixing delta " +
      s"${recipe.maxMixDeltaMicro} micro ==")
    //    ... the nightly corpus delta re-publishes INCREMENTALLY (r17):
    //    text is read only from the delta — plan, multiset, packing,
    //    and order re-derive from the persisted stats/ token index, and
    //    strata whose multiset provably did not move keep their packed
    //    rows verbatim; the drift vs the prior publish persists at
    //    refresh_diff/ as the governance exit record
    val refreshed = graft.Recipe.refresh(
      docs.filter(col("doc_id") % 10 === 0), s"$base/recipe")
    println(s"== refresh: +${refreshed.deltaDocs} docs / " +
      s"${refreshed.deltaTokens} tokens ingested; " +
      s"${refreshed.repackedStrata} strata re-packed, " +
      s"${refreshed.passthroughStrata} passed through ==")
    println("== refresh_diff: what the re-publish changed (first 5) ==")
    spark.read.parquet(s"$base/recipe/refresh_diff")
      .orderBy(col("source")).show(5, truncate = false)
    //    ... and a DOCUMENT UPDATE lands in ONE swap (r18): a corrected
    //    doc replaces its old rows in every artifact — no
    //    retract-then-refresh mid-state a reading fleet could see
    val upserted = graft.Recipe.upsert(
      docs.filter(col("doc_id") === 7L)
        .withColumn("text", concat(col("text"), lit(" corrected"))),
      s"$base/recipe")
    println(s"== upsert: ${upserted.updatedDocs} doc updated in one " +
      s"swap (${upserted.insertedDocs} inserted); " +
      s"${upserted.repackedStrata} strata re-packed ==")
    println("== mixture plan (first 5, from the persisted artifact) ==")
    spark.read.parquet(s"$base/recipe/plan")
      .orderBy(col("source")).show(5, truncate = false)
    println("== training-order mixing audit (same_next vs share, first 5) ==")
    Pipeline.orderMixingAudit(
        spark.read.parquet(s"$base/recipe/order"))
      .orderBy(col("stratum")).show(5, truncate = false)
    //    ... and the read side: the shard manifest a training fleet
    //    uses to hand each reader a contiguous slice of the schedule
    val nShards = graft.Recipe.shards(spark, s"$base/recipe",
      shardTokens = 8192)
    println(s"== shard manifest: $nShards shards (first 5) ==")
    spark.read.parquet(s"$base/recipe/shards")
      .orderBy(col("shard_id")).show(5, truncate = false)
    //    ... a reader consumes ONE audited slice (r16) ...
    println("== readShard(1): the slice a fleet reader materializes (first 5) ==")
    graft.Recipe.readShard(spark, s"$base/recipe", shardId = 1L)
      .show(5, truncate = false)
    //    ... and a restart mid-schedule resumes from the clamped
    //    remainder — manifest-shaped, so the fleet code is unchanged
    println("== resumeShards(pos = 5): the remaining manifest (first 5) ==")
    graft.Recipe.resumeShards(spark, s"$base/recipe", pos = 5L)
      .show(5, truncate = false)
    //    ... the full restart WALK (r17): shard 0 was consumed via
    //    readShard, the run crashed 2 chunks into shard 1, and the
    //    resume manifest drives the SAME consumer code for the rest —
    //    consumed ∪ resumed must be the schedule exactly once
    val walkManifest = spark.read.parquet(s"$base/recipe/shards")
      .orderBy(col("shard_id")).collect()
    // fixture guard (the suite version asserts the same shape): the walk
    // below indexes shard 1 and crashes 2 chunks into it — a corpus
    // drift that shards thinner than that must say so, not out-of-bounds
    require(walkManifest.length >= 3 &&
        walkManifest(1).getAs[Long]("n_chunks") >= 2L,
      s"demo fixture drift: the restart walk needs >= 3 shards with " +
        s">= 2 chunks in shard 1, got ${walkManifest.length} shard(s) " +
        "- lower shardTokens above or grow the demo corpus")
    val crashAt = walkManifest(1).getAs[Long]("first_pos") + 2L
    def sliceRows(lo: Long, hi: Long): Long =
      spark.read.parquet(s"$base/recipe/order")
        .filter(col("pos") >= lo && col("pos") <= hi).count()
    val consumedRows =
      graft.Recipe.readShard(spark, s"$base/recipe", 0L).select("pos")
        .distinct().count() +
        sliceRows(walkManifest(1).getAs[Long]("first_pos"), crashAt - 1L)
    val resumedRows = graft.Recipe.resumeShards(spark, s"$base/recipe",
        crashAt).collect()
      .map(r => sliceRows(r.getAs[Long]("first_pos"),
        r.getAs[Long]("last_pos"))).sum
    val scheduleRows = spark.read.parquet(s"$base/recipe/order").count()
    require(consumedRows + resumedRows == scheduleRows,
      s"restart walk must tile the schedule exactly once: " +
        s"$consumedRows consumed + $resumedRows resumed != $scheduleRows")
    println(s"== restart walk: $consumedRows positions consumed + " +
      s"$resumedRows resumed = $scheduleRows scheduled, exactly once ==")

    // 6) surgical decontamination: cut the leaked passages, keep the docs
    val evalSet = docs.filter(col("doc_id") < 20)
    val scrubbed = TextOps.decontaminateSpans(
      docs.filter(col("doc_id") >= 20), evalSet, n = 4)
    println("== surgical decontamination (touched docs, first 5) ==")
    scrubbed.filter(col("n_removed") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"))
      .orderBy(col("doc_id")).show(5, truncate = false)

    // 7) forget one doc everywhere it landed — the audit gate proves it,
    //    and the published recipe rides the same call (r15): assignments
    //    pruned, fully-forgotten chunks dropped, the schedule recompacted
    import spark.implicits._
    val report = graft.Forget.forget(Seq(42L).toDF("doc_id"), "doc_id",
      cdcIndexDirs = Seq(s"$base/cdc"),
      recipeDirs = Seq(s"$base/recipe"))
    println(s"== forgotten ${report.nIds} id(s); " +
      s"pruned+audited: ${report.artifactsPruned.mkString(", ")} ==")
    //    the shards manifest was REGENERATED inside the retract leg (it
    //    persists its own budget); the re-measured mixing health of the
    //    pruned schedule is reported, never gated
    println(s"== recipe schedule after retract: worst mixing delta " +
      s"${report.recipeMixDeltasMicro.mkString(", ")} micro; " +
      "shard manifest re-cut at its persisted budget ==")
    //    ... and the integrity card re-proves the mutated dir (r16):
    //    the compliance sweep before pointing a training run at it
    println("== Recipe.verify: the integrity card after the retraction ==")
    graft.Recipe.verify(spark, s"$base/recipe").show(truncate = false)

    // 8) nightly maintenance (r15): ONE census-driven call — maintain
    //    measures each surface itself, only overdue ones pay the
    //    rewrite, and the report says who ran and why. The standalone
    //    census remains the governance view of the same pressure.
    println("== index census (generation pressure before maintenance) ==")
    graft.Maintain.indexCensus(spark,
        Seq("sketch" -> s"$base/sketch/sketches",
          "cdc" -> s"$base/cdc/digests"))
      .show(truncate = false)
    val maint = graft.Maintain.maintain(spark,
      kmvIndexDirs = Seq(s"$base/sketch"),
      compactTargets = Seq(s"$base/cdc/digests" -> Seq("db")),
      auto = true, autoFactor = 2)
    maint.decisions.foreach(d => println(
      s"== maintenance decision: ${d.surface}: ${d.reason} =="))
    println(s"== maintained: ${(maint.kmvConsolidated ++ maint.compacted)
      .mkString(", ")} ==")

    spark.stop()
  }
}
