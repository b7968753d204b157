package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generic persisted-artifact prune: the right-to-be-forgotten rewrite
  * must drop exactly the requested ids from ANY id-keyed parquet
  * artifact, survive replay, and leave no staging residue.
  */
class ArtifactPruneSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-artifact-prune")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("prune drops exactly the listed ids; replay idempotent; no stage residue") {
    val sql = spark
    import sql.implicits._
    // a token-index-shaped artifact: multiple rows per doc id
    val dir = Files.createTempDirectory("graft-prune-art").toString + "/tokidx"
    (1L to 100L).flatMap(id => Seq((id, s"tok_a_$id"), (id, s"tok_b_$id")))
      .toDF("doc_id", "token").write.parquet(dir)

    val forget = Seq(3L, 50L, 97L, 999999L).toDF("doc_id") // incl. an absent id
    Pipeline.pruneArtifact(forget, dir, "doc_id")

    val after = spark.read.parquet(dir)
    assert(after.count() === 2L * 97)
    assert(after.filter(col("doc_id").isin(3L, 50L, 97L)).count() === 0L)
    // surviving rows untouched (both token rows per survivor)
    assert(after.filter(col("doc_id") === 4L).count() === 2L)

    // replaying the same delete log is a no-op, not an error
    Pipeline.pruneArtifact(forget, dir, "doc_id")
    assert(spark.read.parquet(dir).count() === 2L * 97)

    // no staging or aside directory left behind
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f =>
        f.getName.contains("__prune_stage") || f.getName.contains("__prune_old")),
      s"swap residue in ${parent.listFiles().map(_.getName).toSeq}")
  }

  test("crash after the aside move (no live dir) self-heals on rerun") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-prune-crash1").toString + "/idx"
    (1L to 10L).map(id => (id, id * 100)).toDF("doc_id", "v").write.parquet(dir)
    // simulate the r8 data-loss window: live copy moved aside, swap-in
    // never happened — the serving path is empty
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "__prune_old")))
    Pipeline.pruneArtifact(Seq(3L).toDF("doc_id"), dir, "doc_id")
    val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(ids === (1L to 10L).toSet - 3L,
      s"rerun must restore the aside copy and then prune: $ids")
    assert(!new java.io.File(dir + "__prune_old").exists())
  }

  test("stale aside copy from a crash after swap-in is cleared on rerun") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-prune-crash2").toString + "/idx"
    // live dir already holds the NEW data; a stale aside copy survived the crash
    (1L to 8L).map(id => (id, id)).toDF("doc_id", "v").write.parquet(dir)
    (1L to 10L).map(id => (id, id)).toDF("doc_id", "v")
      .write.parquet(dir + "__prune_old")
    Pipeline.pruneArtifact(Seq(8L).toDF("doc_id"), dir, "doc_id")
    val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(ids === (1L to 7L).toSet, s"live copy pruned, stale aside ignored: $ids")
    assert(!new java.io.File(dir + "__prune_old").exists())
  }

  test("deletionAudit: residuals surface per artifact; clean after prune") {
    val sql = spark
    import sql.implicits._
    val base = Files.createTempDirectory("graft-audit").toString
    val idx1 = s"$base/idx1"
    val idx2 = s"$base/idx2"
    (1L to 20L).map(id => (id, s"t$id")).toDF("doc_id", "token").write.parquet(idx1)
    (1L to 20L).map(id => (id, id * 7)).toDF("doc_id", "v").write.parquet(idx2)
    val forget = Seq(5L, 9L).toDF("doc_id")

    // prune only idx1 — the audit must catch idx2's residuals
    Pipeline.pruneArtifact(forget, idx1, "doc_id")
    val audit = Pipeline.deletionAudit(forget,
        Seq(idx1 -> "doc_id", idx2 -> "doc_id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[String](2).toSet))).toMap
    assert(audit(idx1) === ((0L, Set.empty[String])), s"idx1 must be clean: $audit")
    assert(audit(idx2) === ((2L, Set("5", "9"))), s"idx2 must show residuals: $audit")

    // after pruning idx2 too, the audit is all-clean
    Pipeline.pruneArtifact(forget, idx2, "doc_id")
    val clean = Pipeline.deletionAudit(forget,
        Seq(idx1 -> "doc_id", idx2 -> "doc_id"))
      .collect()
    assert(clean.forall(_.getLong(1) === 0L), "post-prune audit must be clean")
    intercept[IllegalArgumentException] {
      Pipeline.deletionAudit(forget, Seq.empty)
    }
  }

  test("prune composes with append-style growth (the daily-ingest artifact lifecycle)") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-prune-cycle").toString + "/idx"
    (1L to 10L).map(id => (id, id * 100)).toDF("doc_id", "v").write.parquet(dir)
    Pipeline.pruneArtifact(Seq(2L, 4L).toDF("doc_id"), dir, "doc_id")
    (11L to 12L).map(id => (id, id * 100)).toDF("doc_id", "v")
      .write.mode("append").parquet(dir)
    Pipeline.pruneArtifact(Seq(11L).toDF("doc_id"), dir, "doc_id")
    val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(ids === (1L to 10L).toSet -- Set(2L, 4L) + 12L)
  }

  test("compact shrinks an append-grown artifact's file count, rows exact") {
    val sql = spark
    import sql.implicits._
    def partFiles(d: String): Array[java.io.File] =
      new java.io.File(d).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val dir = Files.createTempDirectory("graft-compact").toString + "/idx"
    // ten appends of 4-file writes → 40+ small files, the nightly-append
    // shape imageNearDupIngest/videoNearDupIngest/AnnIndex.append leave
    (0 until 10).foreach { day =>
      (1L to 20L).map(i => (day * 100L + i, i * 7))
        .toDF("doc_id", "v").repartition(4)
        .write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partFiles(dir).length >= 40, "fixture must start fragmented")

    Pipeline.compactArtifact(spark, dir)
    val after = spark.read.parquet(dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "compaction must preserve rows exactly")
    assert(partFiles(dir).length === 1,
      s"200 tiny rows fit one target-size file, got ${partFiles(dir).length}")
    assert(!new java.io.File(dir + "__compact_stage").exists() &&
      !new java.io.File(dir + "__compact_old").exists(), "no staging residue")

    // crash residue self-heals exactly as pruneArtifact's: a mid-swap
    // crash (dir gone, aside present) restores on the next run
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + "__compact_old")))
    Pipeline.compactArtifact(spark, dir)
    assert(spark.read.parquet(dir).collect().map(_.getLong(0)).toSet ===
      before.map(_._1), "self-healed compaction must recover every row")
    assert(!new java.io.File(dir + "__compact_old").exists())
  }

  test("prune preserves a PARTITIONED index's layout") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-prune-part").toString + "/members"
    (1L to 40L).map(i => (i, (i % 3).toInt))
      .toDF("doc_id", "cid")
      .write.partitionBy("cid").parquet(dir)
    Pipeline.pruneArtifact(Seq(3L, 9L).toDF("doc_id"), dir, "doc_id",
      partitionCols = Seq("cid"))
    val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).toSet
    assert(ids === (1L to 40L).toSet -- Set(3L, 9L))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("cid=0", "cid=1", "cid=2"),
      s"cid= directories must survive the prune rewrite: $dirs")
  }

  test("compact preserves a PARTITIONED index's layout and pruning") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/grams"
    // gb-partitioned, append-grown like the span index's grams/
    (0 until 6).foreach { gen =>
      (1L to 30L).map(i => (gen * 100L + i, i % 4))
        .toDF("gram", "gb").repartition(3)
        .write.mode("append").partitionBy("gb").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def filesUnder(d: java.io.File): Int =
      if (d.isDirectory) d.listFiles().map(filesUnder).sum
      else if (d.getName.endsWith(".parquet")) 1 else 0
    val nBefore = filesUnder(new java.io.File(dir))

    Pipeline.compactArtifact(spark, dir, partitionCols = Seq("gb"))
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after === before, "partitioned compaction must preserve rows")
    assert(filesUnder(new java.io.File(dir)) < nBefore,
      "compaction must reduce the file count")
    // the partition directories survive — so does partition pruning
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === Set("gb=0", "gb=1", "gb=2", "gb=3"),
      s"gb= directories must survive the rewrite: $dirs")
    val pruned = spark.read.parquet(dir).filter($"gb" === 2)
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "gb")) &&
      scan.selectedPartitions.partitionCount === 1,
      "partition pruning must still fire after compaction")
  }

  test("prune/compact AUTO-DETECT the partition layout when the caller omits it") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-autodetect").toString + "/grams"
    (1L to 120L).map(i => (i, (i % 4).toInt))
      .toDF("gram", "gb").write.partitionBy("gb").parquet(dir)

    // NO partitionCols passed — until r12 this silently flattened the
    // artifact and destroyed its partition pruning
    Pipeline.pruneArtifact(Seq(1L, 2L).toDF("gram"), dir, "gram")
    val dirs1 = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs1 === Set("gb=0", "gb=1", "gb=2", "gb=3"),
      s"prune must detect + preserve the gb layout: $dirs1")
    assert(spark.read.parquet(dir).count() === 118L)

    Pipeline.compactArtifact(spark, dir)
    val dirs2 = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs2 === Set("gb=0", "gb=1", "gb=2", "gb=3"),
      s"compact must detect + preserve the gb layout: $dirs2")
    val scan = spark.read.parquet(dir).filter($"gb" === 2)
      .queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan"))
    assert(scan.selectedPartitions.partitionCount === 1,
      "partition pruning must still fire after the detected rewrites")
  }

  test("auto-detect survives an EMPTY first value directory in a multi-level layout") {
    val sql = spark
    import sql.implicits._
    // two-level layout a/b; then make the lexicographically-FIRST a-value
    // directory empty (crash residue / fully-pruned value). A head-only
    // descent stops at level 1 and under-detects; the sibling-scanning
    // detector must still find both levels.
    val dir = Files.createTempDirectory("graft-empty-sibling").toString + "/idx"
    (1L to 80L).map(i => (i, (i % 2).toInt, (i % 3).toInt))
      .toDF("id", "a", "b").write.partitionBy("a", "b").parquet(dir)
    val a0 = new java.io.File(s"$dir/a=0")
    a0.listFiles().foreach(f => {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete(); ()
      }
      rm(f)
    })
    assert(a0.exists() && a0.listFiles().isEmpty, "fixture: a=0 must be empty")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val detected = Pipeline.detectPartitionCols(fs,
      new org.apache.hadoop.fs.Path(dir))
    assert(detected === Seq("a", "b"),
      s"empty a=0 sibling must not hide the b level: $detected")

    // and the rewrite built on detection preserves the full layout
    Pipeline.pruneArtifact(Seq(1L).toDF("id"), dir, "id")
    val lvl2 = new java.io.File(s"$dir/a=1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(lvl2 === Set("b=0", "b=1", "b=2"),
      s"prune after detection must keep the b level: $lvl2")
  }

  test("partitioned compact honors targetBytes: a hot partition splits, cold stay single") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-compact-hot").toString + "/grams"
    // one HOT partition value (gb=0: 20k rows) + three cold (50 rows each),
    // append-grown across generations
    (0 until 4).foreach { gen =>
      ((1L to 5000L).map(i => (gen * 100000L + i, 0)) ++
        (1L to 50L).map(i => (gen * 100000L + 90000L + i, (i % 3 + 1).toInt)))
        .toDF("gram", "gb").repartition(3)
        .write.mode("append").partitionBy("gb").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def filesIn(name: String): Int =
      new java.io.File(s"$dir/$name").listFiles()
        .count(_.getName.endsWith(".parquet"))

    // a tiny targetBytes forces the hot value across MANY files; the
    // cold values must still compact to one file each
    Pipeline.compactArtifact(spark, dir, targetBytes = 16L << 10,
      partitionCols = Seq("gb"))
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after === before, "hot-partition compaction must preserve rows")
    assert(filesIn("gb=0") > 1,
      s"hot partition must split by targetBytes, got ${filesIn("gb=0")} file(s)")
    (1 to 3).foreach { g =>
      assert(filesIn(s"gb=$g") === 1,
        s"cold partition gb=$g must compact to ONE file, got ${filesIn(s"gb=$g")}")
    }
  }

  test("compact rerun after a mid-swap crash still takes the per-value sizing path") {
    val sql = spark
    import sql.implicits._
    val dir = Files.createTempDirectory("graft-compact-crash").toString + "/grams"
    (0 until 4).foreach { gen =>
      ((1L to 5000L).map(i => (gen * 100000L + i, 0)) ++
        (1L to 50L).map(i => (gen * 100000L + 90000L + i, (i % 3 + 1).toInt)))
        .toDF("gram", "gb").repartition(3)
        .write.mode("append").partitionBy("gb").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // simulate a crash between the two swap renames: the live dir is
    // gone, the layout only visible in the __compact_old aside — until
    // the r12 fix this rerun silently took the FLAT branch (layout
    // detection ran before stagedRewrite's self-heal)
    assert(new java.io.File(dir).renameTo(
      new java.io.File(dir + "__compact_old")))

    Pipeline.compactArtifact(spark, dir, targetBytes = 16L << 10)
    def filesIn(name: String): Int =
      new java.io.File(s"$dir/$name").listFiles()
        .count(_.getName.endsWith(".parquet"))
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after === before, "crash-heal compaction must preserve rows")
    assert(filesIn("gb=0") > 1, "hot partition must still split after heal")
    (1 to 3).foreach { g =>
      assert(filesIn(s"gb=$g") === 1,
        s"cold gb=$g must stay a single file (flat branch would shard it), " +
          s"got ${filesIn(s"gb=$g")}")
    }
  }
}
