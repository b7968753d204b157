package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r18: [[Recipe.upsert]] — document UPDATE as one staged swap. The
  * contract under test: upsert(changed, dir) lands artifacts
  * BYTE-IDENTICAL to `Recipe.run(survivors ∪ changed)` at the dir's own
  * recorded parameters (survivors = the index's docs minus changed's
  * ids), in ONE swap — no mid-state publish with the updated doc
  * absent, the window the retract-then-refresh two-step exposes — and
  * REPLAY IS IDEMPOTENT (re-running the same upsert prunes the rows it
  * just wrote and re-adds them, unlike refresh's append-only refusal).
  */
class RecipeUpsertSuite extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("recipe-upsert-suite")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the RecipeRefreshSuite fixture: 4 sources, 3-9 tokens per doc
  private def allDocs = {
    import spark.implicits._
    (1L to 660L).map { i =>
      (i, s"src${i % 4}",
        Seq.tabulate((i % 7 + 3).toInt)(j => s"w${(i * 13 + j) % 40}")
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
  }
  // base publish sees 1..600 with every id ≡ 3 (mod 7) PERTURBED (the
  // update leg) and 601..660 absent (the insert leg); the upsert delta
  // carries the TRUE text of both sets
  private def basePerturbed = allDocs.filter(col("doc_id") <= 600L)
    .withColumn("text",
      when(col("doc_id") % 7 === 3,
        concat(col("text"), lit(" stale draft suffix")))
        .otherwise(col("text")))
  private def upsertDelta = allDocs
    .filter(col("doc_id") > 600L || col("doc_id") % 7 === 3)

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def artifactSet(dir: String, name: String): Set[Seq[Any]] =
    spark.read.parquet(s"$dir/$name").collect().map(_.toSeq).toSet

  private def assertSameArtifacts(got: String, want: String): Unit =
    Seq("plan", "assignments", "order", "stats").foreach { a =>
      assert(artifactSet(got, a) === artifactSet(want, a),
        s"$a/ must be byte-identical to the corrected full publish")
    }

  test("upsert corrects UPDATE and INSERT legs in one swap: byte-identical to run over survivors ∪ changed") {
    val up = tmp("graft-upsert-up")
    val full = tmp("graft-upsert-full")
    Recipe.run(basePerturbed, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val rep = Recipe.upsert(upsertDelta, up)
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    assertSameArtifacts(up, full)
    // 86 updates (ids 3,10,…,598) + 60 inserts (601..660)
    assert(rep.updatedDocs === 86L)
    assert(rep.insertedDocs === 60L)
    assert(rep.repackedStrata + rep.passthroughStrata === rep.nStrata)
    // the exit card rides the publish, diff's exact shape
    val card = spark.read.parquet(s"$up/refresh_diff")
    assert(card.count() === rep.nStrata)
    assert(card.columns.contains("copies_only_b"))
  }

  test("pure update: the old text's contribution is gone from every artifact") {
    import spark.implicits._
    val up = tmp("graft-upsert-pure")
    val full = tmp("graft-upsert-pure-full")
    Recipe.run(allDocs, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val newText = Seq.tabulate(40)(j => s"n$j").mkString(" ")
    val delta = Seq((5L, "src1", newText)).toDF("doc_id", "source", "text")
    val rep = Recipe.upsert(delta, up)
    assert(rep.updatedDocs === 1L && rep.insertedDocs === 0L)
    assert(rep.deltaTokens === 40L)
    // the index holds exactly ONE row for the doc, at the NEW length
    val statRows = spark.read.parquet(s"$up/stats")
      .filter(col("doc_id") === 5L).collect()
    assert(statRows.length === 1 && statRows.head.getAs[Long]("n_tokens") === 40L)
    // every assignment copy of the doc carries the new token count
    val aTok = spark.read.parquet(s"$up/assignments")
      .filter(col("doc_id") === 5L).select(col("n_tokens"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(aTok.isEmpty || aTok === Seq(40L))
    // and the whole publish equals the corrected corpus's
    Recipe.run(allDocs.filter(col("doc_id") =!= 5L)
        .unionByName(delta), full,
      budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    assertSameArtifacts(up, full)
  }

  test("replay is idempotent: the same upsert twice lands byte-identical artifacts") {
    val up = tmp("graft-upsert-replay")
    Recipe.run(basePerturbed, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    Recipe.upsert(upsertDelta, up)
    val first = Seq("plan", "assignments", "order", "stats")
      .map(a => a -> artifactSet(up, a)).toMap
    // the crash-after-swap story: a rerun of the applied delta is a
    // no-op re-publish, not a refusal and not a duplication
    val rep2 = Recipe.upsert(upsertDelta, up)
    assert(rep2.updatedDocs === 146L && rep2.insertedDocs === 0L,
      "on replay every delta id is already present (86 + 60)")
    Seq("plan", "assignments", "order", "stats").foreach { a =>
      assert(artifactSet(up, a) === first(a),
        s"$a/ must be unchanged by the replay")
    }
  }

  test("crash inside the swap window: the next upsert self-heals and converges") {
    val up = tmp("graft-upsert-crash")
    Recipe.run(basePerturbed, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    Recipe.upsert(upsertDelta, up)
    val want = Seq("plan", "assignments", "order", "stats")
      .map(a => a -> artifactSet(up, a)).toMap
    // simulate the crash window stagedOverwrite can leave: live root
    // renamed aside, stage never renamed in
    val p = new org.apache.hadoop.fs.Path(up)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(up + "__publish_old")))
    val rep = Recipe.upsert(upsertDelta, up)
    assert(rep.updatedDocs === 146L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(up + "__publish_old")))
    Seq("plan", "assignments", "order", "stats").foreach { a =>
      assert(artifactSet(up, a) === want(a),
        s"$a/ must converge after the crash replay")
    }
  }

  test("curriculum + shards compose: upsert re-deals the recorded kernel and re-cuts at the persisted budget") {
    val up = tmp("graft-upsert-curr")
    val full = tmp("graft-upsert-curr-full")
    val spec = Some(Recipe.CurriculumSpec(2L, 3L))
    Recipe.run(basePerturbed, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    Recipe.shards(spark, up, shardTokens = 150)
    val rep = Recipe.upsert(upsertDelta, up)
    assert(rep.artifacts.contains(s"$up/shards"))
    assert(rep.nEpochs === 2)
    Recipe.run(allDocs, full, budgetTokens = 20000L, chunkTokens = 64,
      seed = 11L, nEpochs = 2, mixingTolMicro = 990000L, curriculum = spec)
    assertSameArtifacts(up, full)
    val card = Recipe.verify(spark, up).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    Seq("order_permutation", "kernel_shape", "bands_current",
      "plan_strata", "stats_tokens", "stats_ids", "mix_id_unique",
      "shards_tiling", "shards_mass", "shards_budget").foreach { k =>
      assert(card(k) === "ok", s"$k must be ok after the upsert, got ${card(k)}")
    }
  }

  test("an upsert that MOVES a doc across strata leaves no trace in the old stratum") {
    import spark.implicits._
    val up = tmp("graft-upsert-move")
    val full = tmp("graft-upsert-move-full")
    Recipe.run(allDocs, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    // doc 5 lived in src1; the correction re-homes it to src2 — the old
    // (id, src1) index row must be pruned, not joined around, or the
    // doc would double-count across strata
    val delta = Seq((5L, "src2", "a b c d e f"))
      .toDF("doc_id", "source", "text")
    val rep = Recipe.upsert(delta, up)
    assert(rep.updatedDocs === 1L)
    val homes = spark.read.parquet(s"$up/stats")
      .filter(col("doc_id") === 5L).select(col("source"))
      .collect().map(_.getString(0)).toSeq
    assert(homes === Seq("src2"), s"doc 5 must live ONLY in src2: $homes")
    Recipe.run(allDocs.filter(col("doc_id") =!= 5L).unionByName(delta),
      full, budgetTokens = 20000L, chunkTokens = 64, seed = 5L)
    assertSameArtifacts(up, full)
  }

  test("an EMPTY delta is a no-op re-publish, not a refusal") {
    import spark.implicits._
    val up = tmp("graft-upsert-empty")
    Recipe.run(allDocs, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val before = Seq("plan", "assignments", "order", "stats")
      .map(a => a -> artifactSet(up, a)).toMap
    val rep = Recipe.upsert(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"),
      up)
    assert(rep.updatedDocs === 0L && rep.insertedDocs === 0L)
    assert(rep.passthroughStrata === rep.nStrata,
      "an unchanged corpus must pass every stratum through")
    Seq("plan", "assignments", "order", "stats").foreach { a =>
      assert(artifactSet(up, a) === before(a))
    }
  }

  test("a retract after upsert leaves no residue — the forget surfaces stay consistent") {
    import spark.implicits._
    val up = tmp("graft-upsert-forget")
    Recipe.run(basePerturbed, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    Recipe.upsert(upsertDelta, up)
    val ids = Seq(3L, 10L, 605L).toDF("doc_id")
    // red before: the upserted ids live in stats/ and assignments/
    val before = Forget.residuals(ids, "doc_id", recipeDirs = Seq(up),
      hadoopConf = spark.sparkContext.hadoopConfiguration)
    assert(before.nonEmpty, "fixture drift: the ids must be present before")
    Recipe.retract(ids, up)
    val after = Forget.residuals(ids, "doc_id", recipeDirs = Seq(up),
      hadoopConf = spark.sparkContext.hadoopConfiguration)
    assert(after.isEmpty,
      s"no stats/ or assignments/ residue may survive: $after")
  }

  test("refusals: duplicate ids, null identities, and pre-index dirs refuse loudly") {
    import spark.implicits._
    val up = tmp("graft-upsert-refuse")
    Recipe.run(allDocs, up, budgetTokens = 20000L, chunkTokens = 64,
      seed = 5L)
    val eDup = intercept[IllegalArgumentException] {
      Recipe.upsert(Seq((5L, "src1", "a b"), (5L, "src1", "c d"))
        .toDF("doc_id", "source", "text"), up)
    }
    assert(eDup.getMessage.contains("repeats") &&
      eDup.getMessage.contains("Recipe.upsert"))
    val eNull = intercept[IllegalArgumentException] {
      Recipe.upsert(Seq((Option.empty[java.lang.Long], "src1", "a b"))
        .toDF("doc_id", "source", "text"), up)
    }
    assert(eNull.getMessage.contains("null"))
    val fs = new org.apache.hadoop.fs.Path(up)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$up/stats"), true)
    val eStats = intercept[IllegalArgumentException] {
      Recipe.upsert(Seq((5L, "src1", "a b"))
        .toDF("doc_id", "source", "text"), up)
    }
    assert(eStats.getMessage.contains("stats/"))
  }
}
