package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Skew-guard semantics of the dedup operators: capped tokens/buckets
  * bound candidate generation without corrupting the scores of surviving
  * pairs.
  */
class DedupGuardSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dedup-guards")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exact mode (prefix filtering) equals the naive all-pairs Jaccard") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    // adversarial shapes for the prefix lemma: single-token docs, docs of
    // very different lengths, docs sharing only their hottest tokens, two
    // blocks, plus a deterministic random corpus over a tiny vocabulary
    // (maximal token heat = the regime where a buggy prefix drops pairs)
    val rng = new scala.util.Random(42)
    val vocab = ('a' to 'j').map(_.toString)
    val random = (100L until 160L).map { id =>
      val len = 1 + rng.nextInt(8)
      (id, if (id % 2 == 0) "b1" else "b2",
        rng.shuffle(vocab).take(len).mkString(" "))
    }
    val handPicked = Seq(
      (1L, "b1", "x"), (2L, "b1", "x"),                    // identical singletons
      (3L, "b1", "x y z w v u t s"), (4L, "b1", "x y"),    // length-filter edge
      (5L, "b2", "p q"), (6L, "b2", "q p"))                // order-independence
    val docs = (handPicked ++ random).toDF("doc_id", "source", "text")

    val fast = Dedup.jaccardPairs(docs, 0.5, maxTokenDf = Int.MaxValue)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val prefix = Dedup.jaccardPairsPrefix(docs, 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    // naive oracle: all pairs within a block, exact set Jaccard
    val sets = docs.select(col("doc_id"), col("source"),
      array_distinct(split(col("text"), " ")).as("toks"))
    val naive = sets.as("a").join(sets.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.toks"), col("b.toks"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a.toks")) + size(col("b.toks")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(naive.nonEmpty, "degenerate fixture: the oracle found no pairs")
    assert(fast === naive)
    assert(prefix === naive)
  }

  test("jaccardPairs: df-capped tokens skip candidate gen but still score") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src", "common a b c"),
      (2L, "src", "common a b c"),
      (3L, "src", "common z y w q"))
      .toDF("doc_id", "source", "text")
    // 'common' has df 3 > cap 2 → excluded from the inverted index; a/b/c
    // (df 2) still generate the (1,2) candidate
    val pairs = Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 2).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert((p.getLong(0), p.getLong(1)) === (1L, 2L))
    // the capped token must still count in the exact score: 4/4, not 3/4
    assert(p.getDouble(2) === 1.0)
  }

  test("jaccardPairs: pairs sharing only capped tokens are the documented loss") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src", "common common2"),
      (2L, "src", "common common2"))
      .toDF("doc_id", "source", "text")
    // every shared token is block-wide → candidate never generated
    assert(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 1).count() === 0)
    // with the guard loose the pair is exact-dup, jaccard 1.0
    assert(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 10).count() === 1)
  }

  // spec gate for the q91/q92 capped bench tier: every pair the capped
  // mode emits must appear in exact mode WITH THE SAME SCORE (the cap
  // bounds candidate recall, never corrupts verification), for both the
  // lexical and the hybrid operator, on the real sf0.001 corpus with a
  // cap small enough to actually fire there.
  test("capped tier is a score-preserving subset of exact mode (q91/q92 gate)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairsOf(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = Int.MaxValue))
    val capped = pairsOf(Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 10))
    assert(exact.nonEmpty, "degenerate fixture: exact mode found no pairs")
    capped.foreach { case (k, j) =>
      assert(exact.get(k).contains(j), s"capped pair $k missing or rescored") }

    val hExact = pairsOf(Dedup.hybridPairs(docs, emb, 0.5, 0.05,
      maxTokenDf = Int.MaxValue))
    val hCapped = pairsOf(Dedup.hybridPairs(docs, emb, 0.5, 0.05,
      maxTokenDf = 10))
    assert(hExact.nonEmpty, "degenerate fixture: hybrid exact found no pairs")
    hCapped.foreach { case (k, j) =>
      assert(hExact.get(k).contains(j), s"capped hybrid pair $k missing or rescored") }
  }

  test("simhashPairs: degenerate buckets are dropped by the cap") {
    val sql = spark
    import sql.implicits._
    val docs = (1L to 6L).map(i => (i, s"identical text payload"))
      .toDF("doc_id", "text")
    // all 6 docs share one simhash → every band-bucket holds 6 docs
    assert(Dedup.simhashPairs(docs, 3, maxBucketSize = 5).count() === 0)
    assert(Dedup.simhashPairs(docs, 3, maxBucketSize = 6).count() === 15) // C(6,2)
  }

  test("sketch index: build + appends ≡ full-corpus sketches (lossless KMV merge)") {
    val sql = spark
    import sql.implicits._
    def gen(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, s"s${i % 3}", s"doc $i body ${i * 7}"))
        .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    Dedup.buildSketchIndex(gen(1, 40), dir, k = 8)
    Dedup.appendSketchIndex(gen(41, 70), dir, k = 8)
    Dedup.appendSketchIndex(gen(71, 90), dir, k = 8)
    val merged = Dedup.readSketchIndex(spark, dir, k = 8)
      .collect().map(_.toSeq).toSet
    val full = Dedup.sourceSketches(gen(1, 90), k = 8)
      .collect().map(_.toSeq).toSet
    assert(merged === full,
      s"generation merge must be lossless:\nmerged $merged\nfull   $full")

    // the index-served overlap matrix ≡ the corpus-computed one
    val fromIndex = Dedup.sketchIndexOverlap(spark, dir, k = 8)
      .collect().map(_.toSeq).toSet
    val fromCorpus = Dedup.sketchOverlap(gen(1, 90), k = 8)
      .collect().map(_.toSeq).toSet
    assert(fromIndex === fromCorpus && fromIndex.nonEmpty,
      s"index-served overlap must equal corpus-computed:\n$fromIndex\n$fromCorpus")

    // CONSOLIDATION (r14): collapse the 3-generation history to one row
    // per source — read-before ≡ read-after (bottom-k merge is lossless)
    val rowsBefore = spark.read.parquet(s"$dir/sketches").count()
    Dedup.consolidateSketchIndex(spark, dir, k = 8)
    val afterConsol = Dedup.readSketchIndex(spark, dir, k = 8)
      .collect().map(_.toSeq).toSet
    assert(afterConsol === full, "consolidation must not change the read")
    val raw = spark.read.parquet(s"$dir/sketches")
    assert(raw.count() === 3L && raw.count() < rowsBefore,
      s"one row per source after consolidation (was $rowsBefore)")
    assert(raw.schema.fieldNames.toSet === Set("source", "kmv", "build_k"),
      "the id-freedom audit shape (+ the build_k width metadata) must " +
        "survive consolidation")
    // the monoid homomorphism: generations appended AFTER a
    // consolidation still merge exactly (bottomK(bottomK(A) ∪ B) =
    // bottomK(A ∪ B)) — the property that makes consolidate-then-append
    // a safe nightly cadence
    Dedup.appendSketchIndex(gen(91, 120), dir, k = 8)
    val grown = Dedup.readSketchIndex(spark, dir, k = 8)
      .collect().map(_.toSeq).toSet
    val fullGrown = Dedup.sourceSketches(gen(1, 120), k = 8)
      .collect().map(_.toSeq).toSet
    assert(grown === fullGrown,
      "append-after-consolidation must still equal the full-corpus run")

    // the k contract is enforced BY DERIVATION (review fix): asking for
    // a consolidation at k=2 on an index whose sketches are 8 long must
    // merge at 8, not truncate — the k=8 read stays exact
    Dedup.consolidateSketchIndex(spark, dir, k = 2)
    val afterNarrowAsk = Dedup.readSketchIndex(spark, dir, k = 8)
      .collect().map(_.toSeq).toSet
    assert(afterNarrowAsk === fullGrown,
      "a narrow-k consolidation ask must not truncate a wider build")
  }

  test("sketch index: unfilled generations cannot be narrowed below the persisted build k") {
    val sql = spark
    import sql.implicits._
    // Three generations, NONE of which fills build-k: each generation
    // holds 10 distinct texts per source (sketch length 10), build k =
    // 64, so observed max sketch length (10) < a narrow consolidation
    // ask (16) < the cross-generation union (30) < build k (64). A
    // length-derived effective width would merge at max(16, 10) = 16
    // and silently drop union minima 17..30 that a build-width read is
    // entitled to see — the persisted build_k metadata is what keeps
    // the derivation safe here (the r14 hole).
    def gen(g: Int) =
      (1L to 20L).map(i => (g * 100L + i, s"s${i % 2}", s"gen $g text $i"))
        .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-unfilled")
      .toString
    Dedup.buildSketchIndex(gen(1), dir, k = 64)
    Dedup.appendSketchIndex(gen(2), dir, k = 64)
    Dedup.appendSketchIndex(gen(3), dir, k = 64)
    val wideBefore = Dedup.readSketchIndex(spark, dir, k = 64)
      .collect().map(_.toSeq).toSet
    // sanity: the scenario is the hole's shape — no sketch filled, the
    // union exceeds every single-generation sketch
    val gens = spark.read.parquet(s"$dir/sketches")
    import org.apache.spark.sql.functions.{col, max, size}
    val obs = gens.agg(max(size(col("kmv")))).head().getInt(0)
    assert(obs === 10, s"fixture drift: observed max sketch length $obs")
    assert(wideBefore.map(_(1).asInstanceOf[Long]).max === 30L,
      "fixture drift: the union must exceed the observed max")

    Dedup.consolidateSketchIndex(spark, dir, k = 16)
    val wideAfterConsol = Dedup.readSketchIndex(spark, dir, k = 64)
      .collect().map(_.toSeq).toSet
    assert(wideAfterConsol === wideBefore,
      "a narrow-k consolidation of an UNFILLED-generation index must " +
        "not truncate the cross-generation union the build width saw")
    assert(spark.read.parquet(s"$dir/sketches")
        .agg(max(col("build_k"))).head().getInt(0) === 64,
      "the persisted width must survive the consolidation")

    // same hole on the GDPR rebuild path: a narrow-k rebuild ask over
    // the full corpus as survivors must re-sketch at the build width
    Dedup.rebuildSketchIndex(
      gen(1).union(gen(2)).union(gen(3)), dir, k = 16)
    val wideAfterRebuild = Dedup.readSketchIndex(spark, dir, k = 64)
      .collect().map(_.toSeq).toSet
    assert(wideAfterRebuild === wideBefore,
      "a narrow-k survivor rebuild must re-sketch at the persisted " +
        "build width, not the asked width")
  }

  test("sketch index mid-migration: legacy generations without build_k next to r15 ones") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions.col
    // a PRE-metadata index (no build_k column in its footers) that a
    // current appendSketchIndex has since grown: the dir holds MIXED
    // parquet schemas, and a plain read may resolve the legacy footer —
    // the width derivation must still see the r15 generations' build_k
    // (mergeSchema-forced metadata read), or the narrow-consolidation
    // hole silently re-opens on exactly the indexes mid-migration
    def gen(g: Int) =
      (1L to 20L).map(i => (g * 100L + i, s"s${i % 2}", s"mig $g text $i"))
        .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-mig")
      .toString
    Dedup.buildSketchIndex(gen(1), dir, k = 64)
    // strip the metadata column in place — the legacy footer shape
    val legacy = spark.read.parquet(s"$dir/sketches")
      .drop("build_k").collect()
    val legacySchema = spark.read.parquet(s"$dir/sketches")
      .drop("build_k").schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacy.toSeq), legacySchema)
      .write.mode("overwrite").parquet(s"$dir/sketches")
    Dedup.appendSketchIndex(gen(2), dir, k = 64)
    Dedup.appendSketchIndex(gen(3), dir, k = 64)
    val wideBefore = Dedup.readSketchIndex(spark, dir, k = 64)
      .collect().map(_.toSeq).toSet
    assert(wideBefore.map(_(1).asInstanceOf[Long]).max === 30L,
      "fixture drift: the union must exceed any single generation")
    Dedup.consolidateSketchIndex(spark, dir, k = 16)
    val wideAfter = Dedup.readSketchIndex(spark, dir, k = 64)
      .collect().map(_.toSeq).toSet
    assert(wideAfter === wideBefore,
      "a narrow-k consolidation of a MIXED-SCHEMA index must derive " +
        "the width from the r15 generations' metadata")
  }

  test("sketchIndexDrift: duplicates don't move the estimate, new content does, identical zero") {
    val sql = spark
    import sql.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-kmvdrift").toString
    def corpus(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
    val old = corpus((1L to 30L).map(i => (i, "dupsrc", s"payload ${i % 5}")) ++
      (31L to 60L).map(i => (i, "fresh", s"unique doc $i")))
    // since then: dupsrc doubled its rows with PURE DUPLICATES (same 5
    // payloads), fresh ingested genuinely new content, and a brand-new
    // source appeared
    val nw = corpus((1L to 60L).map(i => (i, "dupsrc", s"payload ${i % 5}")) ++
      (61L to 90L).map(i => (i, "fresh", s"unique doc ${i - 30}")) ++
      (91L to 120L).map(i => (i, "fresh", s"brand new doc $i")) ++
      (121L to 130L).map(i => (i, "newsrc", s"newcomer $i")))
    Dedup.buildSketchIndex(old, s"$base/old", k = 16)
    Dedup.buildSketchIndex(nw, s"$base/new", k = 16)
    val drift = Dedup.sketchIndexDrift(spark, s"$base/old", s"$base/new", k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // pure duplicates: the sketch is identical, delta exactly 0 — the
    // discrimination this governance view exists for
    assert(drift("dupsrc")._3 === 0L,
      s"duplicate ingest must not move the estimate: ${drift("dupsrc")}")
    assert(drift("fresh")._3 > 0L,
      s"new content must grow the estimate: ${drift("fresh")}")
    assert(drift("newsrc")._1 === 0L && drift("newsrc")._3 === drift("newsrc")._2,
      s"a new source surfaces at full magnitude: ${drift("newsrc")}")
    // identical snapshots: every delta exactly zero
    val zero = Dedup.sketchIndexDrift(spark, s"$base/new", s"$base/new", k = 16)
      .collect().map(_.getLong(3))
    assert(zero.nonEmpty && zero.forall(_ == 0L),
      s"identical snapshots must drift zero: ${zero.toSeq}")
  }

  test("capByKey: null keys drop; guarded shuffled fallback matches the broadcast path") {
    val sql = spark
    import sql.implicits._
    val rows = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),            // over cap 2 → dropped
      (4L, "b"), (5L, "b"),                        // at cap → kept
      (6L, null.asInstanceOf[String]), (7L, null.asInstanceOf[String]),
      (8L, null.asInstanceOf[String])              // null keys → dropped outright
    ).toDF("doc_id", "k")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").collect().map(_.getLong(0)).toSet

    val plain = ids(Dedup.capByKey(rows, Seq("k"), 2))
    assert(plain === Set(4L, 5L),
      s"over-cap and null-keyed rows must both drop: $plain")

    // the lineage-keeping storage mode (cluster fault tolerance) is
    // result-identical
    spark.conf.set("spark.graft.capByKey.storage", "persist")
    try assert(ids(Dedup.capByKey(rows, Seq("k"), 2)) === Set(4L, 5L))
    finally spark.conf.unset("spark.graft.capByKey.storage")

    // guarded mode with a 0-key limit drops the broadcast HINT — with
    // auto-broadcast also off, the plan must fall back to a shuffled
    // anti-join (with auto-broadcast on, Catalyst may still broadcast
    // from the checkpoint's accurate size stats, which is correct:
    // the guard removes the FORCED hint, it doesn't forbid broadcast)
    spark.conf.set("spark.graft.capByKey.guardBroadcast", "true")
    spark.conf.set("spark.graft.capByKey.broadcastKeyLimit", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val guarded = Dedup.capByKey(rows, Seq("k"), 2)
      assert(ids(guarded) === Set(4L, 5L), "fallback path must match")
      val p = guarded.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("BroadcastHashJoin"),
        s"0-key limit + no auto-broadcast must plan a shuffled anti-join:\n$p")
    } finally {
      spark.conf.unset("spark.graft.capByKey.guardBroadcast")
      spark.conf.unset("spark.graft.capByKey.broadcastKeyLimit")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
  test("joinKeySkewReport: hand-computed pair work, shares, and the no-dup path") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    // k1 x4 (work 6), k2 x3 (work 3), k3 x2 (work 1), k4 x1 (work 0)
    val rows = (Seq.fill(4)("k1") ++ Seq.fill(3)("k2") ++
      Seq.fill(2)("k3") ++ Seq("k4")).toDF("k")
    val got = Dedup.joinKeySkewReport(rows, Seq("k"), topN = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got === Array(
      (1, "k1", 4L, 6L, 600000L, 10L, 4L, 10L),
      (2, "k2", 3L, 3L, 300000L, 10L, 4L, 10L),
      (3, "k3", 2L, 1L, 100000L, 10L, 4L, 10L)))

    // all-unique keys: total pair work 0, shares must be 0 (not a div0)
    val unique = Seq("a", "b", "c").toDF("k")
    val u = Dedup.joinKeySkewReport(unique, Seq("k"), topN = 2)
      .select(col("pair_work"), col("work_share_micro"), col("total_pair_work"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(u.forall(_ == (0L, 0L, 0L)), s"no-dup path: ${u.toSeq}")
  }
}
