package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decontamination, blocklist filtering, and sequence packing — the
  * curation stages added around the dedup/quality core.
  */
class CurationOpsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-curation-ops")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("wordNgrams: windows, short docs, exact boundaries") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "a b c d"),   // 3 bigrams, 2 trigrams
      (2L, "a b"),       // 1 bigram, 0 trigrams
      (3L, "a"),         // too short for either
      (4L, "")           // splits to [""] — still shorter than n
    ).toDF("doc_id", "text")
    val tri = df.select($"doc_id", TextOps.wordNgrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(tri(1L) == Seq("a b c", "b c d"))
    assert(tri(2L).isEmpty && tri(3L).isEmpty && tri(4L).isEmpty)
  }

  test("decontaminate drops exactly the overlapping docs") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean doc with no overlap at all"),
      (2L, "prefix q1 q2 q3 q4 suffix"),     // contains an eval 4-gram
      (3L, "q1 q2 q3 stop"),                 // only a 3-gram — not flagged
      (4L, "x q2 q3 q4 tail")                // different 4-gram of the eval doc
    ).toDF("doc_id", "text")
    val flagged = TextOps.contaminatedIds(corpus, evalSet, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L, 4L))
    val kept = TextOps.decontaminate(corpus, evalSet, n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("decontaminateSpansServe ≡ the batch join tier (map-literal serve)") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail"), (101L, "r1 r2 r3 r4 x"))
      .toDF("doc_id", "text")
    val corpus = (1L to 40L).map { i =>
      val mid = i % 4 match {
        case 0 => "q1 q2 q3 q4"; case 1 => "r2 r3 r4 x"
        case _ => s"c$i d$i e$i f$i"
      }
      (i, s"s${i % 3}", s"pre$i a b $mid y z post$i")
    }.toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val batch = rows(TextOps.decontaminateSpans(corpus, evalSet, n = 4))
    val serve = rows(TextOps.decontaminateSpansServe(corpus,
      TextOps.evalGramStrings(evalSet, n = 4), n = 4))
    assert(batch.exists(_._4 > 0), "fixture must actually cut something")
    assert(serve === batch, "serve tier must equal the join tier row-for-row")
  }

  test("decontaminateSpansServe ≡ batch on a >4096-gram panel; zero joins/shuffles") {
    val sql = spark
    import sql.implicits._
    // a benchmark-suite-sized panel: 1100 eval docs × 5 four-grams each
    // = 5500 grams — past the old literal-map tier's 4096 cap (it was a
    // linear scan per gram; the compiled-HashSet tier is O(tokens))
    val evalSet = (0L until 1100L).map(k =>
        (k, s"e${k}a e${k}b e${k}c e${k}d e${k}e e${k}f e${k}g e${k}h"))
      .toDF("doc_id", "text")
    val grams = TextOps.evalGramStrings(evalSet, n = 4)
    assert(grams.size > 4096, s"fixture must exceed the old cap: ${grams.size}")
    val corpus = (1L to 120L).map { i =>
      val k = i % 1100
      val mid = if (i % 3 == 0) s"e${k}b e${k}c e${k}d e${k}e" // one eval gram
        else s"c$i d$i f$i g$i"
      (i, s"s${i % 4}", s"pre$i a b $mid y z post$i")
    }.toDF("doc_id", "source", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    val serveDf = TextOps.decontaminateSpansServe(corpus, grams, n = 4)
    val batch = rows(TextOps.decontaminateSpans(corpus, evalSet, n = 4))
    val serve = rows(serveDf)
    assert(batch.exists(_._4 > 0), "fixture must actually cut something")
    assert(serve === batch, "serve tier must equal the join tier row-for-row")
    // the serve tier's contract: ONE pure projection — no join, no
    // exchange, no state, so the identical call runs on a stream.
    // (plan read off a Range-backed frame: a local Seq constant-folds
    // the whole projection into a LocalTableScan and hides the shape)
    val rangeCorpus = spark.range(120)
      .select($"id".as("doc_id"), lit("s").as("source"),
        concat_ws(" ", lit("pre"), $"id".cast("string"), lit("y z")).as("text"))
    val p = TextOps.decontaminateSpansServe(rangeCorpus, grams, n = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"serve tier must stay a zero-join zero-shuffle projection:\n$p")
    assert(p.contains("gram_set_starts"),
      s"expected the compiled set-membership expression:\n$p")

    // the plan-weight caps are TWO-DIMENSIONAL (r15): an element count
    // under maxServeGrams can still carry an arbitrarily heavy UTF-8
    // payload (long grams), so the byte cap refuses it by total bytes —
    // message names the measured growth law so the caller knows what
    // resource the refusal protects
    val eBytes = intercept[IllegalArgumentException] {
      TextOps.decontaminateSpansServe(corpus, grams, n = 4,
        maxServeGramBytes = 1024L)
    }
    assert(eBytes.getMessage.contains("UTF-8 bytes") &&
        eBytes.getMessage.contains("task") ,
      s"the byte-cap refusal must name the resource: ${eBytes.getMessage}")
  }

  test("contaminationMatrixFromIndex survives pervasive contamination (unhinted hits join)") {
    val sql = spark
    import sql.implicits._
    // the r13 code FORCE-broadcast the (doc_id, eval_name) hit set — a
    // frame sized by the contamination itself, i.e. exactly what this
    // screen exists to discover; pervasive leakage would OOM it. The
    // join is now unhinted (AQE picks from the runtime size); this
    // fixture leaks eval grams into >50% of the corpus and pins the
    // serve-from-index identity there.
    val evalSet = Seq((1000L, "z1 z2 z3 z4 z5"), (1001L, "w1 w2 w3 w4"))
      .map { case (id, t) => (id, "eval", t) }.toDF("doc_id", "source", "text")
    val corpus = (1L to 60L).map { i =>
      val mid = i % 5 match {
        case 0 | 1 => "z1 z2 z3 z4"   // evalA gram
        case 2     => "w1 w2 w3 w4"   // evalB gram
        case 3     => "z2 z3 z4 z5"   // another evalA gram
        case _     => s"c$i d$i e$i f$i"
      }
      (i, s"s${i % 2}", s"pre$i $mid post$i")
    }.toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-pervasive").toString
    TextOps.buildSpanIndex(corpus, dir, n = 4, hashGrams = false)
    val evals = Seq(
      "evalA" -> evalSet.filter($"doc_id" === 1000L),
      "evalB" -> evalSet.filter($"doc_id" === 1001L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val fromIndex = rows(TextOps.contaminationMatrixFromIndex(
      spark, dir, evals, corpus.select($"doc_id", $"source"), n = 4))
    val direct = rows(TextOps.contaminationMatrix(corpus, evals, n = 4))
    assert(fromIndex === direct, "serve-from-index identity under pervasive leak")
    // toSeq before map: both sources carry the SAME count (18), and a
    // Set.map would collapse them before the sum
    val nContam = fromIndex.toSeq.filter(_._2 == "evalA").map(_._3).sum
    assert(nContam >= 30, s"fixture must be pervasively leaked: $nContam/60")
  }

  test("contaminationDrift: signs track cleaner/dirtier; identical snapshots read zero") {
    val sql = spark
    import sql.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val evalSet = Seq((1000L, "e", "z1 z2 z3 z4 z5")).toDF("doc_id", "source", "text")
    val evals = Seq("evalA" -> evalSet)
    // old audit: web leaks 1 of 2 docs (500000µ); book is clean
    val oldCorpus = Seq(
      (1L, "web", "a z1 z2 z3 z4 b"),
      (2L, "web", "clean doc here now"),
      (3L, "book", "also clean text here")).toDF("doc_id", "source", "text")
    // since then: web got CLEANER (the leak scrubbed), book DIRTIER
    // (a new ingest brought eval text), and a NEW source appeared leaked
    val newCorpus = Seq(
      (1L, "web", "a scrubbed now clean b"),
      (2L, "web", "clean doc here now"),
      (3L, "book", "also clean text here"),
      (4L, "book", "x z2 z3 z4 z5 y"),
      (5L, "forum", "z1 z2 z3 z4 fresh leak")).toDF("doc_id", "source", "text")
    TextOps.buildSpanIndex(oldCorpus, s"$base/old", n = 4)
    TextOps.buildSpanIndex(newCorpus, s"$base/new", n = 4)
    val drift = TextOps.contaminationDrift(spark, s"$base/old", s"$base/new",
        evals, oldCorpus.select($"doc_id", $"source"),
        newCorpus.select($"doc_id", $"source"), n = 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4),
        r.getLong(6), r.getLong(7))).toList
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // (source -> (old_docs, new_docs, delta_docs, delta_rate_micro))
    assert(drift("web") === ((1L, 0L, -1L, -500000L)),
      s"web got cleaner: ${drift.get("web")}")
    assert(drift("book") === ((0L, 1L, 1L, 500000L)),
      s"book got dirtier: ${drift.get("book")}")
    assert(drift("forum") === ((0L, 1L, 1L, 1000000L)),
      s"a new leaked source surfaces at full magnitude: ${drift.get("forum")}")
    // identical snapshots: every delta is exactly zero (the q129/q161
    // zero-on-identical drift discipline)
    val zero = TextOps.contaminationDrift(spark, s"$base/new", s"$base/new",
        evals, newCorpus.select($"doc_id", $"source"),
        newCorpus.select($"doc_id", $"source"), n = 4)
      .collect().map(r => (r.getLong(6), r.getLong(7)))
    assert(zero.nonEmpty && zero.forall(_ == ((0L, 0L))),
      s"identical snapshots must drift zero: ${zero.toSeq}")
  }

  test("contaminationMatrixFromIndex refuses a hash-built index loudly") {
    val sql = spark
    import sql.implicits._
    // a hashed pos/ (gram: bigint) joined against string eval grams
    // would match NOTHING — an all-clear contamination report; the
    // string-gram requirement is checked, not assumed
    val dir = java.nio.file.Files.createTempDirectory("graft-hashidx").toString
    val docs = Seq((1L, "web", "a b c d e f")).toDF("doc_id", "source", "text")
    TextOps.buildSpanIndex(docs, dir, n = 4, hashGrams = true)
    val ex = intercept[IllegalArgumentException] {
      TextOps.contaminationMatrixFromIndex(spark, dir,
        Seq("e" -> docs), docs.select($"doc_id", $"source"), n = 4)
    }
    assert(ex.getMessage.contains("hashGrams"), s"must name the fix: $ex")
    // the graded tier shares the check (one helper, all probes refuse)
    val ex2 = intercept[IllegalArgumentException] {
      TextOps.contaminationRateFromIndex(spark, dir, docs, n = 4)
    }
    assert(ex2.getMessage.contains("hashGrams"), s"must name the fix: $ex2")
  }

  test("contaminationRateFromIndex ≡ the direct pass (serve-from-index identity)") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((1000L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val corpus = (1L to 30L).map { i =>
      val mid = if (i % 3 == 0) "z1 z2 z3 z4" else s"c$i d$i e$i f$i"
      // a repeated gram INSIDE one doc: pos/ holds it per occurrence,
      // the graded counts must still be per-doc DISTINCT
      (i, s"pre$i $mid y $mid z")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-rate-idx").toString
    TextOps.buildSpanIndex(corpus, dir, n = 4, hashGrams = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromIndex = rows(TextOps.contaminationRateFromIndex(
      spark, dir, evalSet, n = 4))
    val direct = rows(TextOps.contaminationRate(corpus, evalSet, n = 4))
    assert(fromIndex === direct && fromIndex.nonEmpty,
      s"graded serve-from-index identity:\nindex  $fromIndex\ndirect $direct")
  }

  test("decontaminateSpans cuts only the leaked passage; clean docs pass untouched") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "web", "clean doc with no overlap at all"),
      // one eval 4-gram mid-doc: whole-doc decontamination (above) drops
      // the doc; surgical keeps prefix+suffix
      (2L, "web", "keep me q1 q2 q3 q4 and me too"),
      // two OVERLAPPING eval grams (q1..q4, q2..tail): coverage merges
      (3L, "book", "a q1 q2 q3 q4 tail b"),
      (4L, "book", "q1 q2 q3 stop")) // sub-n overlap: untouched
      .toDF("doc_id", "source", "text")
    val out = TextOps.decontaminateSpans(corpus, evalSet, n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((7L, 0L, "clean doc with no overlap at all")))
    assert(out(2L) === ((9L, 4L, "keep me and me too")),
      s"only the leaked 4-gram is cut: ${out(2L)}")
    assert(out(3L) === ((7L, 5L, "a b")),
      s"overlapping eval grams merge into one removed span: ${out(3L)}")
    assert(out(4L) === ((4L, 0L, "q1 q2 q3 stop")),
      "a sub-n overlap never cuts")
    // the surgical output keeps tokens the whole-doc tier throws away
    val wholeDocKeptTokens = TextOps.decontaminate(corpus, evalSet, n = 4)
      .select(org.apache.spark.sql.functions.sum(
        TextOps.tokenCount($"text"))).head().getLong(0)
    val surgicalKeptTokens = out.values.map { case (n, r, _) => n - r }.sum
    assert(surgicalKeptTokens > wholeDocKeptTokens,
      s"surgical ($surgicalKeptTokens) must keep more than whole-doc ($wholeDocKeptTokens)")
  }

  test("contaminationRate counts distinct-gram overlap per doc") {
    val sql = spark
    import sql.implicits._
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean doc with no overlap at all"),     // no hits → absent
      (2L, "prefix q1 q2 q3 q4 suffix"),            // 1 of 3 distinct grams
      // both eval 4-grams, and the repeat must NOT double-count:
      (4L, "q1 q2 q3 q4 tail q1 q2 q3 q4 tail")
    ).toDF("doc_id", "text")
    val got = TextOps.contaminationRate(corpus, evalSet, n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 2: grams {prefix q1 q2 q3, q1 q2 q3 q4, q2 q3 q4 suffix} → 1 hit
    assert(got(2L) == ((3L, 1L)))
    // doc 4: 10 tokens → 7 windows, 5 DISTINCT grams (the trailing
    // repeat re-produces "q1 q2 q3 q4" and "q2 q3 q4 tail");
    // hits = {q1 q2 q3 q4, q2 q3 q4 tail}
    assert(got(4L) == ((5L, 2L)))
    assert(!got.contains(1L))
  }

  test("blocklistFilter is exact-token, not substring") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "totally fine text"),
      (2L, "contains bad token"),
      (3L, "badge is not bad-ness either") // substrings must NOT match
    ).toDF("doc_id", "text")
    val kept = TextOps.blocklistFilter(docs, Seq("bad", "worse"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("packSequences: chunk = floor(start offset / budget), per stratum") {
    val sql = spark
    import sql.implicits._
    // tokens: 3, 4, 2 in stratum A → starts 0, 3, 7 → budget 5 ⇒ 0, 0, 1
    val docs = Seq(
      (1L, "A", "t t t"),
      (2L, "A", "t t t t"),
      (3L, "A", "t t"),
      (10L, "B", "t t t t t t")             // independent stratum, start 0
    ).toDF("doc_id", "source", "text")
    val out = Pipeline.packSequences(docs, budgetTokens = 5)
      .select($"doc_id", $"chunk_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 10L -> 0L))
  }

  test("packChunks: ordered concatenation with exact boundary offsets") {
    val sql = spark
    import sql.implicits._
    // stratum A: tokens 3, 4, 2 → starts 0, 3, 7; budget 5 ⇒ chunks
    // {1,2} and {3}; offsets restart per chunk
    val docs = Seq(
      (1L, "A", "a b c"),
      (2L, "A", "d e f g"),
      (3L, "A", "h i"),
      (10L, "B", "x y z")
    ).toDF("doc_id", "source", "text")
    val out = Pipeline.packChunks(docs, budgetTokens = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5),
          r.getString(6)))).toMap
    assert(out === Map(
      ("A", 0L) -> ((2L, 7L, "1,2", "0,3", "a b c d e f g")),
      ("A", 1L) -> ((1L, 2L, "3", "0", "h i")),
      ("B", 0L) -> ((1L, 3L, "10", "0", "x y z"))), s"got $out")

    // stable under repartitioning (the sort is inside the group)
    val again = Pipeline.packChunks(docs.repartition(7), budgetTokens = 5)
      .collect().map(_.toSeq).toSet
    assert(again === Pipeline.packChunks(docs, 5).collect().map(_.toSeq).toSet)
  }

  test("packBatches: per-bucket batches, exact padding economics, stability") {
    val sql = spark
    import sql.implicits._
    // bucketWidth 4, batchSize 2, nSalts 1 (degenerate = plain
    // per-bucket): lens 1,2,3 → bucket 0; 5,6 → bucket 1.
    // bucket 0 order (len, id): (1,#1)(2,#2)(3,#3) → batches [1,2], [3]
    val docs = Seq(
      (1L, "t"), (2L, "t t"), (3L, "t t t"),
      (4L, "t t t t t"), (5L, "t t t t t t")
    ).toDF("doc_id", "text")
    val out = Pipeline.packBatches(docs, batchSize = 2, bucketWidth = 4,
        nSalts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(out === Map(
      (0L, 0L) -> ((2L, 2L, 3L, 4L, 1L)),  // docs 1,2: pad to 2×2=4, waste 1
      (0L, 1L) -> ((1L, 3L, 3L, 3L, 0L)),  // partial batch: pads to itself
      (1L, 0L) -> ((2L, 6L, 11L, 12L, 1L))), s"got $out")

    // batching vs ONE global batch: bucketing strictly reduces waste
    val one = Pipeline.packBatches(docs, batchSize = 5, bucketWidth = 1000,
        nSalts = 1)
      .collect().map(r => r.getLong(7)).sum
    assert(out.values.map(_._5).sum < one,
      "length-bucketed batches must waste less than one global batch")

    // deterministic under repartitioning; supplied token column honored
    val big = (0L until 60L).map(i =>
      (i, Seq.fill((i % 9 + 1).toInt)("w").mkString(" "), i % 9 + 1))
      .toDF("doc_id", "text", "n_tok")
    val a = Pipeline.packBatches(big, 4).collect().map(_.toSeq).toSet
    val b = Pipeline.packBatches(big.repartition(7), 4).collect().map(_.toSeq).toSet
    assert(a === b, "stable under repartitioning")
    val c = Pipeline.packBatches(big, 4, tokenCountCol = Some("n_tok"))
      .collect().map(_.toSeq).toSet
    assert(c === a, "supplied count column equals derived counts here")
    intercept[IllegalArgumentException] { Pipeline.packBatches(big, 0) }
  }

  test("packBatchesByBudget: boundary every budget tokens; oversize doc alone") {
    val sql = spark
    import sql.implicits._
    // one cell (nSalts 1, wide bucket): lens 3,4,5 → cum 3,7,12; budget 6
    // ⇒ starts 0,3,7 ⇒ batches 0,0,1. A 20-token doc lands in its own
    // bucket and, though over budget, forms its own batch (start 0).
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),
      (2L, Seq.fill(4)("w").mkString(" ")),
      (3L, Seq.fill(5)("w").mkString(" ")),
      (9L, Seq.fill(200)("w").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Pipeline.packBatchesByBudget(docs, budgetTokens = 6,
        bucketWidth = 64, nSalts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map(
      (0L, 0L) -> ((2L, 4L, 7L)),   // docs 1+2: 3+4 = 7 tokens (starts 0, 3)
      (0L, 1L) -> ((1L, 5L, 5L)),   // doc 3 starts at 7 → next batch
      (3L, 0L) -> ((1L, 200L, 200L))), // oversize doc: own batch, not dropped
      s"got $out")

    // token conservation: Σ sum_len over batches ≡ Σ doc tokens,
    // regardless of salting
    val big = (0L until 80L).map(i =>
      (i, Seq.fill((i % 13 + 1).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val batched = Pipeline.packBatchesByBudget(big, budgetTokens = 16, nSalts = 4)
      .collect()
    assert(batched.map(_.getLong(5)).sum === (0L until 80L).map(_ % 13 + 1).sum)
    assert(batched.forall(r => r.getLong(6) == r.getLong(4) * r.getLong(3) &&
      r.getLong(7) == r.getLong(6) - r.getLong(5)))
  }

  test("packBatches: salt de-skews hot buckets, economics stay bucket-bounded") {
    val sql = spark
    import sql.implicits._
    // Hump-shaped corpus: 120 docs, ALL in one length bucket (lens
    // 65..72, bucketWidth 64 → bucket 1) — the q137 scale wart shape.
    val big = (0L until 120L).map(i =>
      (i, Seq.fill((65 + i % 8).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val salted = Pipeline.packBatches(big, batchSize = 8, nSalts = 4)

    // the exchange is keyed (bucket, salt), not bucket alone: the hot
    // bucket's rank sort spreads across nSalts cells
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(bucket"),
      s"window exchange must hash on bucket: $plan")
    assert(plan.matches("(?s).*hashpartitioning\\(bucket[^)]*salt.*"),
      s"window exchange must include the salt key: $plan")
    val rows = salted.collect()
    assert(rows.map(_.getLong(1)).distinct.sorted.toSeq.size > 1,
      "hot bucket must actually split across salt cells")

    // every doc batched exactly once; max_len still bucket-bounded
    assert(rows.map(_.getLong(3)).sum === 120L)
    assert(rows.forall { r =>
      val bucket = r.getLong(0); val maxLen = r.getLong(4)
      maxLen >= bucket * 64 && maxLen < (bucket + 1) * 64
    }, "salting must not leak lengths across bucket bounds")
    // padding economics keep their exact form per batch
    assert(rows.forall(r => r.getLong(6) == r.getLong(4) * r.getLong(3) &&
      r.getLong(7) == r.getLong(6) - r.getLong(5)))

    // deterministic: salt is a pure function of doc_id
    val again = Pipeline.packBatches(big.repartition(5), batchSize = 8,
        nSalts = 4).collect().map(_.toSeq).toSet
    assert(again === rows.map(_.toSeq).toSet)
  }

  test("packSequences: ONE giant stratum spreads across partitions, chunks exact") {
    val sql = spark
    import sql.implicits._
    // a single hot source (the Common-Crawl-is-one-source case): the old
    // window formulation put ALL of it on one task; the prefix sum must
    // spread it across partitions AND assign byte-identical chunks
    val docs = (1L to 4000L).map(i => (i, "cc", s"t${i % 7} " * ((i % 5 + 1).toInt)))
      .toDF("doc_id", "source", "text")
    // AQE (size-aware) rightly coalesces these TINY partitions into one;
    // at corpus scale partitions sit at the advisory size, so the range
    // layout keeps a hot stratum spread. Pin the layout property itself
    // with AQE off.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ordered = Pipeline.packOrdered(
        docs.withColumn("n_tokens", TextOps.tokenCount($"text")),
        "source", "doc_id")
      val sizes = ordered.rdd
        .mapPartitions(it => Iterator.single(it.size)).collect()
      assert(sizes.count(_ > 0) > 1,
        s"one stratum must span MANY partitions, got ${sizes.toSeq}")
      assert(sizes.max < 4000,
        s"no single partition may hold the whole stratum: ${sizes.toSeq}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")

    // chunk assignment equals a sequential reference computed exactly as
    // the operator counts tokens (split on single space, trailing
    // empties KEPT — Spark split uses limit -1)
    val got = Pipeline.packSequences(docs, budgetTokens = 64)
      .select($"doc_id", $"chunk_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val want = (1L to 4000L).map { i =>
      val text = s"t${i % 7} " * ((i % 5 + 1).toInt)
      val start = cum
      cum += text.split(" ", -1).length.toLong
      i -> start / 64
    }.toMap
    assert(got === want, "chunk ids must match the sequential reference")
  }

  test("packSequences is stable under repartitioning") {
    val sql = spark
    import sql.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"src${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val a = Pipeline.packSequences(docs, 10)
      .select("doc_id", "chunk_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Pipeline.packSequences(docs.repartition(7), 10)
      .select("doc_id", "chunk_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("temperatureResample: rates follow count^alpha, selection monotone in alpha") {
    val sql = spark
    import sql.implicits._
    val docs = ((0L until 64L).map(i => (i, "big")) ++
      (100L until 116L).map(i => (i, "small")))
      .toDF("doc_id", "lang").withColumn("text", lit("w"))
    def kept(alpha: Double): Map[String, Set[Long]] =
      Pipeline.temperatureResample(docs, "lang", alpha)
        .select($"lang", $"doc_id").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val rates = Pipeline.temperatureResample(docs, "lang", 0.5)
      .select($"lang", $"sample_per_mille").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt(16)/sqrt(64) = 1/2 → 500‰; the largest stratum is always 1000‰
    assert(rates("big") === 1000L && rates("small") === 500L)
    val at0 = kept(0.0); val at05 = kept(0.5); val at1 = kept(1.0)
    assert(at0("big").size === 64 && at0("small").size === 16) // α=0 keeps everything
    assert(at05("big").size === 64) // rate 1000‰ ⇒ complete
    // raising α only REMOVES docs from smaller strata (hash-bucket nesting)
    assert(at1("small").subsetOf(at05("small")) && at05("small").subsetOf(at0("small")))
    assert(at1("small").size < at05("small").size)
  }

  test("groupExemplars: exactly k per group, stable under repartitioning") {
    val sql = spark
    import sql.implicits._
    val docs = (0L until 60L).map(i => (i, s"g${i % 4}", s"text number $i"))
      .toDF("doc_id", "lang", "text")
    val a = Pipeline.groupExemplars(docs, "lang", k = 2)
      .select($"lang", $"rn", $"doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a.size === 8 && a.groupBy(_._1).forall(_._2.size == 2))
    val b = Pipeline.groupExemplars(docs.repartition(7), "lang", k = 2)
      .select($"lang", $"rn", $"doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("bm25TopK: ranks only matching docs, scores descending, formula spot-check") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "apple banana"),
      (3L, "banana banana banana"),
      (4L, "cherry date egg")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, Seq("apple", "banana"), k = 10)
      .orderBy($"rn").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L)) // doc 4 has no query term
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
    assert(got.sliding(2).forall(p => p.head._2 >= p.last._2))
    // doc 3 by hand: dl=3, avgdl=3, banana tf=3 df=3, N=4
    val idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    val tfc = (3 * (1.2 + 1)) / (3 + 1.2 * ((1 - 0.75) + 0.75 * 3.0 / 3.0))
    val expected = BigDecimal(BigDecimal(idf * tfc)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val doc3 = got.find(_._1 == 3L).get._2
    assert(math.abs(doc3 - expected) < 1e-9, s"got $doc3, expected $expected")
  }

  test("exactIncremental: drops corpus dups and batch dups, keeps first-of-batch") {
    val sql = spark
    import sql.implicits._
    val existing = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha text"),  // dup vs corpus → dropped
      (11L, "gamma text"),  // fresh
      (12L, "gamma text"),  // dup within batch → dropped (11 wins)
      (13L, "delta text")   // fresh
    ).toDF("doc_id", "text")
    val index = Dedup.digestIndex(existing)
    val kept = Dedup.exactIncremental(incoming, index)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 13L))
    // normalization: digesting a prefix collapses docs differing later on
    val norm = (t: org.apache.spark.sql.Column) => substring(t, 1, 5)
    val keptNorm = Dedup.exactIncremental(incoming, Dedup.digestIndex(existing, normalize = norm),
        normalize = norm)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNorm === Set(11L, 13L)) // "alpha"/"gamma" prefixes still distinct
  }

  test("qualityScore: bounded, rewards diversity, exact fixture value") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "the the the the"),                 // degenerate
      (2L, "sparse vocabulary rich diverse")   // diverse, no stopwords
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextOps.qualityScore($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(2L) > got(1L))
    // doc 1 by hand: ttr=0.25, stop=1.0, lenNorm=0.04
    val expected = BigDecimal(0.4 * 0.25 + 0.3 * (1 - 1.0) + 0.3 * 0.04)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L) - expected) < 1e-12)
  }

  test("redact masks whole tokens only; redactPii scrubs emails before numbers") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (1L, "the customer called spark support"),
      (2L, "customers sparked interest"), // substrings must NOT match
      (3L, "mail bob.smith+x@corp.example.com or call +1 (555) 123-4567 now"),
      (4L, "ids 1234567890 and 42 stay typed") // 42 too short for <NUM>
    ).toDF("doc_id", "text")
    val red = df.select($"doc_id",
        TextOps.redact($"text", Seq("customer", "spark")).as("r"),
        TextOps.redactPii($"text").as("p"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(red(1L)._1 === "the <MASK> called <MASK> support")
    assert(red(2L)._1 === "customers sparked interest")
    assert(red(3L)._2 === "mail <EMAIL> or call <NUM> now")
    assert(red(4L)._2 === "ids <NUM> and 42 stay typed")
    // malformed term lists fail fast, not silently as regex metachars
    intercept[IllegalArgumentException] {
      TextOps.redact($"text", Seq("a|b"))
    }
    intercept[IllegalArgumentException] {
      TextOps.redact($"text", Seq.empty)
    }
  }

  test("hybridPairs keeps only pairs passing BOTH lexical and semantic gates") {
    val sql = spark
    import sql.implicits._
    // (1,2): jaccard 0.8, cos 1 → kept. (1,4)/(2,4): jaccard ≥ 0.5 but
    // vec4 is antipodal → dropped. (3,*): no lexical overlap → never a
    // candidate, so its embedding is irrelevant.
    val docs = Seq(
      (1L, "src0", "a b c d"),
      (2L, "src0", "a b c d e"),
      (3L, "src0", "x y z w"),
      (4L, "src0", "a b c e")
    ).toDF("doc_id", "source", "text")
    val embs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(1f, 0f)), (4L, Array(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.hybridPairs(docs, embs, lexThreshold = 0.5,
        semThreshold = 0.0, maxTokenDf = Int.MaxValue)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("crossSourceOverlap counts each shared digest once per source pair") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "src0", "dup one"), (2L, "src1", "dup one"), (3L, "src1", "dup one"),
      (4L, "src0", "dup two"), (5L, "src1", "dup two"), (6L, "src2", "dup two"),
      (7L, "src0", "only here"), (8L, "src2", "also unique")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceOverlap(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // "dup one" twice inside src1 must not double-count the (src0,src1) cell
    assert(got == Map(("src0", "src1") -> 2L, ("src0", "src2") -> 1L,
      ("src1", "src2") -> 1L))
  }

  test("anchorOutliers flags vectors far from the block anchor, never the anchor") {
    val sql = spark
    import sql.implicits._
    val embs = Seq(
      (0L, 0, Array(1f, 0f)),    // anchor of label 0
      (1L, 0, Array(0.9f, 0.1f)),
      (2L, 0, Array(-1f, 0f)),   // cos −1 → outlier
      (10L, 1, Array(0f, 1f)),   // anchor of label 1
      (11L, 1, Array(0f, -1f)),  // cos −1 → outlier
      (12L, 1, Array(0f, 0f))    // zero norm = broken row → outlier, no crash
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.anchorOutliers(embs, threshold = -0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 11L, 12L))
  }

  test("jaccardPairsIncremental: corpus pairs absent, corpus→batch oriented, batch a<b") {
    val sql = spark
    import sql.implicits._
    // corpus ids {1, 9} straddle batch ids {2, 5}: the corpus→batch pair
    // (9, 2) must still emit (corpus side is doc_a regardless of id order)
    val near = (s: String) => s // all docs share tokens → every pair ≥ 0.5
    val corpus = Seq((1L, "s", "a b c"), (9L, "s", "a b c d")).toDF("doc_id", "source", "text")
    val batch = Seq((2L, "s", "a b c"), (5L, "s", "a b c d")).toDF("doc_id", "source", "text")
    val got = Dedup.jaccardPairsIncremental(Dedup.tokenIndex(corpus), batch, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 5L), (9L, 2L), (9L, 5L), (2L, 5L)),
      s"got $got") // (1,9) corpus×corpus absent; (2,5) within-batch once
  }

  test("chunkDocs: boundaries, overlap, tail chunk, parameter validation") {
    val sql = spark
    import sql.implicits._
    val df = Seq((1L, "t1 t2 t3 t4 t5"), (2L, "x")).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(df, chunkTokens = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(3), r.getString(4))).toMap
    assert(got == Map(
      (1L, 0L) -> (3, "t1 t2 t3"), (1L, 1L) -> (3, "t3 t4 t5"),
      (1L, 2L) -> (1, "t5"), (2L, 0L) -> (1, "x")))
    intercept[IllegalArgumentException] { TextOps.chunkDocs(df, 3, 0) }
    intercept[IllegalArgumentException] { TextOps.chunkDocs(df, 3, 4) }
  }

  test("VecMeanAggregator matches per-dimension avg and handles singletons") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val vecMean = udaf(new graft.functions.VecMeanAggregator,
      ExpressionEncoder[Seq[Double]]())
    val df = Seq(
      (0, Seq(1.0, 2.0)), (0, Seq(3.0, 6.0)), (0, Seq(5.0, 1.0)),
      (1, Seq(7.0, 7.0))
    ).toDF("g", "v").repartition(2)
    val out = df.groupBy($"g").agg(vecMean($"v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(3.0, 3.0))
    assert(out(1) == Seq(7.0, 7.0))
  }

  test("dupSpanStats: cross-doc spans only; within-doc repeats don't inflate") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      // docs 1 and 2 share the span "a b c"; doc 1 repeats it twice
      // INTERNALLY — array_distinct must count it once, so its dup_grams
      // is 1 of 4 distinct spans, not 2 of 5
      (1L, "s1", "a b c a b c x"),  // distinct 3-grams: abc, bca, cab, bcx → abc dup
      (2L, "s1", "a b c y"),        // distinct: abc, bcy → abc dup
      (3L, "s2", "p q r s"),        // pqr, qrs — unique
      (4L, "s2", "p q"))            // shorter than n → no spans, absent
      .toDF("doc_id", "source", "text")
    val got = TextOps.dupSpanStats(docs, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      1L -> ((4L, 1L)),
      2L -> ((2L, 1L)),
      3L -> ((2L, 0L))))
    intercept[IllegalArgumentException] { TextOps.dupSpanStats(docs, n = 1) }
  }

  // spec gate for q93_dup_spans_hashed (rows-only in the driver): the
  // production hashed-gram mode must reproduce the string-keyed exact
  // output — at test SF there are no 64-bit collisions, so any diff is
  // a logic bug, not hash luck
  test("dupSpanStats: hashed-gram production mode equals string mode") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val asMap = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = asMap(TextOps.dupSpanStats(docs, n = 6))
    val hashed = asMap(TextOps.dupSpanStats(docs, n = 6, hashGrams = true))
    assert(exact.nonEmpty && exact.values.exists(_._2 > 0),
      "degenerate fixture: no duplicated spans at sf0.001")
    assert(hashed === exact)
  }

  test("dedupSpans: removes covered tokens only; overlap unions; short docs pass") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      // docs 1+2 share "a b c": doc 1's tokens 2-4 covered (1-based),
      // keeping "x y"; doc 2 keeps "z". Doc 1's SECOND occurrence of the
      // span (positions 5-7... none here) — use doc 3 for overlap: spans
      // "a b c" (pos 2) and "b c d" (pos 3) both duplicated → coverage
      // union is positions 2-5, keeping "k m".
      (1L, "s1", "x a b c y"),
      (2L, "s1", "a b c z"),
      (3L, "s2", "k a b c d m"),
      (4L, "s2", "b c d q"),
      (5L, "s3", "u v"), // shorter than n → untouched
      (6L, "s3", "n o p r s t")) // no shared spans → untouched
      .toDF("doc_id", "source", "text")
    val got = TextOps.dedupSpans(docs, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((5L, 3L, "x y")))
    assert(got(2L) == ((4L, 3L, "z")))
    assert(got(3L) == ((6L, 4L, "k m")))
    assert(got(4L) == ((4L, 3L, "q")))
    assert(got(5L) == ((2L, 0L, "u v")))
    assert(got(6L) == ((6L, 0L, "n o p r s t")))
    intercept[IllegalArgumentException] { TextOps.dedupSpans(docs, n = 1) }
  }

  // spec gate for q105_dedup_spans_hashed (rows-only in the driver):
  // same contract as the q93 gate — no 64-bit collisions at test SF, so
  // hashed-key output must equal the string-keyed exact tier exactly
  test("dedupSpans: hashed-gram production mode equals string mode") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val asMap = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val exact = asMap(TextOps.dedupSpans(docs, n = 6))
    val hashed = asMap(TextOps.dedupSpans(docs, n = 6, hashGrams = true))
    assert(exact.nonEmpty && exact.values.exists(_._2 > 0),
      "degenerate fixture: no duplicated spans at sf0.001")
    assert(hashed === exact)
  }

  test("maximalDupSpans: one island at true length, not n-gram hit counts") {
    val sql = spark
    import sql.implicits._
    // docs 1+2 share a 40-token block: doc 1 carries it at positions
    // 11-50, doc 2 at 1-40. The 35 duplicated 6-gram starts must merge
    // into ONE island of span_len 40 per doc.
    val shared = (1 to 40).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, ((1 to 10).map(i => s"a$i") ++ Seq(shared) ++
        (11 to 20).map(i => s"a$i")).mkString(" ")),
      (2L, (Seq(shared) ++ (1 to 15).map(i => s"b$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.maximalDupSpans(docs, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 11L, 40L), (2L, 1L, 40L)), s"got $got")

    // two disjoint shared regions → two islands, split at the gap
    val u = (1 to 10).map(i => s"u$i").mkString(" ")
    val v = (1 to 10).map(i => s"v$i").mkString(" ")
    val two = Seq(
      (3L, (Seq(u) ++ (1 to 10).map(i => s"c$i") ++ Seq(v)).mkString(" ")),
      (4L, (Seq(u) ++ (1 to 5).map(i => s"d$i") ++ Seq(v)).mkString(" ")))
      .toDF("doc_id", "text")
    val gotTwo = TextOps.maximalDupSpans(two, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotTwo === Set((3L, 1L, 10L), (3L, 21L, 10L),
      (4L, 1L, 10L), (4L, 16L, 10L)), s"got $gotTwo")

    // island coverage ≡ dedupSpans removal: per doc, Σ span_len equals
    // the tokens dedupSpans drops (same dup definition, same coverage)
    val spanSum = TextOps.maximalDupSpans(docs.withColumn("source", lit("s")),
        n = 6)
      .groupBy($"doc_id").agg(sum($"span_len").as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val removed = TextOps.dedupSpans(docs.withColumn("source", lit("s")), n = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(spanSum === removed.filter(_._2 > 0L))

    // hashed production tier equals string mode; width guard
    val hashed = TextOps.maximalDupSpans(docs, n = 6, hashGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed === got)
    intercept[IllegalArgumentException] { TextOps.maximalDupSpans(docs, n = 1) }
  }

  test("dupSpansIncremental: build ∪ increments ≡ full run; retro fires once") {
    val sql = spark
    import sql.implicits._
    val U = (1 to 12).map(i => s"u$i").mkString(" ")
    val V = (1 to 10).map(i => s"v$i").mkString(" ")
    val corpus = Seq(
      (100L, ((1 to 5).map(i => s"f$i") ++ Seq(U) ++
        (6 to 10).map(i => s"f$i")).mkString(" ")), // U at 6-17, unique in corpus
      (101L, (Seq(V) ++ (1 to 8).map(i => s"g$i")).mkString(" ")),
      (102L, ((1 to 4).map(i => s"h$i") ++ Seq(V)).mkString(" ")))
      .toDF("doc_id", "text")
    val batch1 = Seq((1L, (Seq(U) ++ (1 to 7).map(i => s"w$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val batch2 = Seq((2L, ((1 to 3).map(i => s"x$i") ++ Seq(U)).mkString(" ")))
      .toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("graft-span-idx")
      .resolve("index").toString
    TextOps.buildSpanIndex(corpus, dir, n = 6)
    val buildSpans = TextOps.maximalDupSpans(corpus, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(buildSpans === Set((101L, 1L, 10L), (102L, 5L, 10L)),
      s"build-time spans: $buildSpans")

    val inc1 = TextOps.dupSpansIncremental(batch1, dir, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(inc1 === Set((1L, 1L, 12L, "batch"), (100L, 6L, 12L, "retro")),
      s"inc1 must pair the batch doc AND retro-report the corpus owner: $inc1")

    // batch2 re-duplicates U: the index (grown by inc1's append) already
    // counts it at df 2, so doc 2 pairs WITHOUT re-triggering retro
    val inc2 = TextOps.dupSpansIncremental(batch2, dir, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(inc2 === Set((2L, 4L, 12L, "batch")),
      s"inc2: batch span only, retro must not re-fire: $inc2")

    // latest-per-doc identity with the full frozen run on the union
    val full = TextOps.maximalDupSpans(
        corpus.unionAll(batch1).unionAll(batch2), n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val latest = buildSpans ++ (inc1 ++ inc2).map(t => (t._1, t._2, t._3))
    assert(latest === full,
      s"build ∪ increments must equal the full run:\ngot  $latest\nfull $full")

    // the probe's index reads prune at the PARTITION level (the
    // SemDeDupIndexSuite IO gate): a gb/db filter must land as a
    // partition filter on the scan, and listing must touch only the
    // filtered directories
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan in the probe-read plan"))
    val gramRead = spark.read.parquet(s"$dir/grams").filter(col("gb").isin(3, 7))
    assert(scanOf(gramRead).partitionFilters
        .exists(_.references.exists(_.name == "gb")),
      "gb must prune grams/ at the partition level")
    val posRead = spark.read.parquet(s"$dir/pos").filter(col("db").isin(100L % 64))
    val posScan = scanOf(posRead)
    assert(posScan.partitionFilters.exists(_.references.exists(_.name == "db")),
      "db must prune pos/ at the partition level")
    assert(posScan.selectedPartitions.partitionCount === 1,
      "one doc bucket listed, not the whole index")

    // incremental REWRITE parity: batch docs rewritten through the index
    // probe must equal the full-corpus dedupSpans restricted to them
    val freshDir = java.nio.file.Files.createTempDirectory("graft-span-rw")
      .resolve("index").toString
    TextOps.buildSpanIndex(corpus, freshDir, n = 6)
    val rw = TextOps.dedupSpansIncrementalRewrite(
        batch1.withColumn("source", lit("s")), freshDir, n = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val fullRw = TextOps.dedupSpans(
        corpus.unionAll(batch1).withColumn("source", lit("s")), n = 6)
      .filter($"doc_id" === 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rw === fullRw,
      s"incremental rewrite diverged:\nincr $rw\nfull $fullRw")

    // hashed production tier ≡ string tier on the same increment
    val hdir = java.nio.file.Files.createTempDirectory("graft-span-idx-h")
      .resolve("index").toString
    TextOps.buildSpanIndex(corpus, hdir, n = 6, hashGrams = true)
    val hInc = TextOps.dupSpansIncremental(batch1, hdir, n = 6,
        hashGrams = true, append = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(hInc === inc1, s"hashed tier diverged: $hInc vs $inc1")
  }

  test("consolidateSpanIndexGrams: reads identical to the full history; forgotten ids vanish") {
    val sql = spark
    import sql.implicits._
    val U = (1 to 12).map(i => s"u$i").mkString(" ")
    val W = (1 to 10).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, ((1 to 5).map(i => s"f$i") ++ Seq(U)).mkString(" ")), // U unique
      (101L, (Seq("a b c d e") ++ (1 to 8).map(i => s"g$i")).mkString(" ")),
      (103L, ((1 to 4).map(i => s"h$i") ++ Seq(W)).mkString(" "))) // W's solo owner
      .toDF("doc_id", "text")
    // identical histories on TWO dirs; only A consolidates — every later
    // read must be byte-equal between them (the losslessness gate)
    val base = java.nio.file.Files.createTempDirectory("graft-grams-consol")
    val (dirA, dirB) = (base.resolve("a").toString, base.resolve("b").toString)
    val batch1 = Seq((1L, (Seq(U) ++ (1 to 7).map(i => s"p$i")).mkString(" ")))
      .toDF("doc_id", "text")
    Seq(dirA, dirB).foreach { d =>
      TextOps.buildSpanIndex(corpus, d, n = 6)
      TextOps.dupSpansIncremental(batch1, d, n = 6).collect() // appends U gen
      // forget the batch doc (U: 2 → 1, its rider cancelled by the
      // negative) and W's solo owner (W: 1 → 0, net-zero gram)
      TextOps.forgetFromSpanIndex(Seq(1L, 103L).toDF("doc_id"), d)
    }
    TextOps.consolidateSpanIndexGrams(spark, dirA)
    // physical state after consolidation: no negative generations, no
    // forgotten ids readable, net-zero gram W gone, history collapsed
    val rawA = spark.read.parquet(s"$dirA/grams")
    assert(rawA.filter(col("df") < 0).count() === 0, "negatives must cancel")
    assert(rawA.filter(col("solo_doc_id").isin(1L, 103L)).count() === 0,
      "forgotten ids must stop being physically readable in grams/")
    assert(rawA.filter(col("gram").startsWith("w1 ")).count() === 0,
      "the fully-forgotten gram must vanish")
    assert(rawA.count() < spark.read.parquet(s"$dirB/grams").count(),
      "the history must actually collapse")
    assert(rawA.schema.fieldNames.toSet === Set("gram", "df", "solo_doc_id", "gb"))
    // the algebra is preserved: a new increment re-duplicating U must
    // retro-report the SURVIVING owner (100) identically in both dirs —
    // the 1 → 0 → 1 rider rule working THROUGH a consolidation
    val batch2 = Seq((2L, ((1 to 3).map(i => s"x$i") ++ Seq(U)).mkString(" ")))
      .toDF("doc_id", "text")
    def inc(d: String) = TextOps.dupSpansIncremental(batch2, d, n = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val incA = inc(dirA); val incB = inc(dirB)
    assert(incA === incB,
      s"consolidated read diverged from the full history:\nA $incA\nB $incB")
    assert(incA.exists(t => t._1 == 100L && t._4 == "retro"),
      s"the surviving owner must retro-report: $incA")
    assert(!incA.exists(t => t._1 == 1L || t._1 == 103L),
      s"forgotten docs must never resurface: $incA")
    // corruption refuses: a hand-planted over-forget (negative past net
    // zero) must not get baked into the consolidated generation
    spark.read.parquet(s"$dirA/grams").filter(col("df") > 0).limit(1)
      .select(col("gram"), lit(-99L).as("df"),
        lit(null).cast("long").as("solo_doc_id"), col("gb"))
      .write.mode("append").partitionBy("gb").parquet(s"$dirA/grams")
    val ex = intercept[Exception] {
      TextOps.consolidateSpanIndexGrams(spark, dirA)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative merged df")),
      s"over-forget corruption must refuse loudly: ${msgs(ex)}")
  }

  test("forgetFromSpanIndex: positions pruned, dfs decremented, probes consistent") {
    val sql = spark
    import sql.implicits._
    val U = (1 to 12).map(i => s"u$i").mkString(" ")
    val corpus = Seq(
      (100L, (Seq(U) ++ (1 to 5).map(i => s"f$i")).mkString(" ")), // holds U
      (101L, (Seq(U) ++ (1 to 6).map(i => s"g$i")).mkString(" ")), // also holds U
      (102L, (1 to 20).map(i => s"h$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-span-forget")
      .resolve("index").toString
    TextOps.buildSpanIndex(corpus, dir, n = 6)

    // forget doc 101: its positions vanish, U's df drops 2 -> 1
    TextOps.forgetFromSpanIndex(Seq(101L).toDF("doc_id"), dir)
    assert(spark.read.parquet(s"$dir/pos")
      .filter($"doc_id" === 101L).count() === 0L,
      "forgotten doc's positions must be pruned")
    val uDf = spark.read.parquet(s"$dir/grams")
      .groupBy($"gram").agg(sum($"df").as("df"))
      .filter($"gram" === ((1 to 6).map(i => s"u$i").mkString(" ")))
      .collect().map(_.getLong(1))
    assert(uDf.toSeq === Seq(1L), s"U's leading gram df must decrement to 1: ${uDf.toSeq}")

    // a batch re-duplicating U pairs against the SURVIVING doc only:
    // batch spans emit (union df 1+1 >= 2); the lost solo rider means no
    // retro row — conservative, never wrong — and never a phantom doc 0
    val inc = TextOps.dupSpansIncremental(
        Seq((1L, (Seq(U) ++ (1 to 4).map(i => s"w$i")).mkString(" ")))
          .toDF("doc_id", "text"),
        dir, n = 6, append = false)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(inc === Set((1L, "batch")),
      s"post-forget increment: batch span only, no retro, no doc 0: $inc")
  }

  test("forgetFromSpanIndex: 1→0→1 df history — retro fires on the LIVE doc, not the forgotten rider") {
    val sql = spark
    import sql.implicits._
    val U = (1 to 12).map(i => s"q$i").mkString(" ")
    // doc 50 is the SOLE owner of U (df 1, solo rider = 50)
    val corpus = Seq(
      (50L, (Seq(U) ++ (1 to 5).map(i => s"f$i")).mkString(" ")),
      (60L, (1 to 20).map(i => s"h$i").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-span-101")
      .resolve("index").toString
    TextOps.buildSpanIndex(corpus, dir, n = 6)

    // forget 50 (df 1 → 0), then append doc 70 restoring U (df 0 → 1):
    // 70 is now the live solo owner, but 50's stale df=1 rider is still
    // physically present in grams/
    TextOps.forgetFromSpanIndex(Seq(50L).toDF("doc_id"), dir)
    val inc1 = TextOps.dupSpansIncremental(
        Seq((70L, (Seq(U) ++ (1 to 4).map(i => s"w$i")).mkString(" ")))
          .toDF("doc_id", "text"),
        dir, n = 6, append = true)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(inc1 === Set(), s"U is unique again after the forget: $inc1")

    // a later batch re-duplicates U: retro must name 70 (the live owner,
    // whose pos/ rows exist) — min() across generations would have
    // picked the forgotten 50 and silently skipped 70's retro spans
    val inc2 = TextOps.dupSpansIncremental(
        Seq((80L, (Seq(U) ++ (1 to 3).map(i => s"v$i")).mkString(" ")))
          .toDF("doc_id", "text"),
        dir, n = 6, append = false)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(inc2.contains((80L, "batch")) && inc2.contains((70L, "retro")),
      s"retro must fire on the live doc 70: $inc2")
    assert(!inc2.exists(_._1 == 50L), s"forgotten doc must not reappear: $inc2")
  }

  test("cdcChunks: boundaries survive insertions; dup chunks found at any offset") {
    val sql = spark
    import sql.implicits._
    // doc 2 = doc 1 with a prefix INSERTED: every fixed-offset window
    // shifts, but the content-defined boundaries re-synchronize, so the
    // tail chunks' digests must match across the two docs
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "inserted preamble text here " + body),
      (3L, "completely different content with no shared bytes at all"))
      .toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))

    // exact cover: chunks tile each doc with no gap or overlap
    docs.collect().foreach { d =>
      val id = d.getLong(0); val len = d.getString(1).length
      val cs = chunks.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 1L && cs.map(_._4).sum == len.toLong,
        s"doc $id chunks must tile its ${len} chars: ${cs.toSeq}")
      cs.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 == a._3 + a._4, s"gap/overlap in doc $id: $a -> $b")
      case _ => ()
      }
    }

    // the CDC property: doc 1 and doc 2 share tail digests despite the
    // shifted offsets; doc 3 shares nothing
    val d1 = chunks.filter(_._1 == 1L).map(_._5).toSet
    val d2 = chunks.filter(_._1 == 2L).map(_._5).toSet
    val d3 = chunks.filter(_._1 == 3L).map(_._5).toSet
    assert((d1 & d2).nonEmpty,
      s"content-defined boundaries must re-sync after the insertion:\n$d1\n$d2")
    assert((d1 & d3).isEmpty && (d2 & d3).isEmpty)

    // group view: the shared chunks surface with doc 1 canonical
    val groups = TextOps.cdcDupChunks(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(groups.nonEmpty && groups.forall(g => g._2 == 2L && g._3 == 1L),
      s"dup chunks must pair docs 1+2 with canonical 1: ${groups.toSeq}")
    assert(groups.map(_._1).toSet == (d1 & d2),
      "group digests must be exactly the shared set")

    // pair view: (1,2) surfaces with evidence = the shared digest count
    // and containment vs doc 1's chunk types; doc 3 pairs with nothing
    val pairs = TextOps.cdcNearDupPairs(docs, minFrac = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(pairs.keySet === Set((1L, 2L)), s"pair set: $pairs")
    val (nShared, nKeyA, frac) = pairs((1L, 2L))
    assert(nShared.toInt === (d1 & d2).size && nKeyA.toInt === d1.size)
    assert(math.abs(frac - nShared.toDouble / nKeyA) < 1e-6)
    // a degenerate chunk shared by many docs is capped out of candidacy
    val many = (1L to 70L).map(i => (i, body)).toDF("doc_id", "text")
    assert(TextOps.cdcNearDupPairs(many, minFrac = 0.0).count() === 0L,
      "over-cap digests must admit no candidates")
  }

  test("cdcChunksClamped: min skips close candidates, max forces cuts, identity clamp ≡ pure") {
    val sql = spark
    import sql.implicits._
    val body = (1 to 80).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, body), (2L, "prefix shift " + body),
      (3L, "zz"), (4L, "")).toDF("doc_id", "text")

    // identity clamp is byte-identical to the pure tier
    val pure = TextOps.cdcChunks(docs).collect().map(_.toSeq).toSet
    val ident = TextOps.cdcChunksClamped(docs, minLen = 1,
      maxLen = Int.MaxValue).collect().map(_.toSeq).toSet
    assert(ident === pure, "identity clamp must reproduce the pure tier")

    // clamped invariants: every chunk ≤ maxLen; every NON-FINAL chunk ≥
    // minLen (the final chunk ends at the text end and may be shorter);
    // chunks still tile the doc exactly
    val clamped = TextOps.cdcChunksClamped(docs, minLen = 16, maxLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    docs.collect().foreach { d =>
      val id = d.getLong(0); val len = d.getString(1).length
      val cs = clamped.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 1L && cs.map(_._4).sum == len.toLong,
        s"doc $id must tile its $len chars: ${cs.toSeq}")
      assert(cs.forall(_._4 <= 64L), s"maxLen violated: ${cs.toSeq}")
      assert(cs.dropRight(1).forall(_._4 >= 16L),
        s"non-final chunk under minLen: ${cs.toSeq}")
    }

    // a doc with NO boundary candidates cuts at exactly maxLen intervals
    // (content rule never fires on 'aaaa…' unless the hash happens to —
    // verify against the pure tier producing one chunk)
    val flat = Seq((9L, "a" * 200)).toDF("doc_id", "text")
    val flatPure = TextOps.cdcChunks(flat).collect()
    if (flatPure.length == 1) {
      val forced = TextOps.cdcChunksClamped(flat, minLen = 16, maxLen = 64)
        .collect().map(r => r.getLong(3)).toSeq.sorted
      assert(forced == Seq(8L, 64L, 64L, 64L),
        s"forced cuts must tile 200 as 64+64+64+8: $forced")
    }

    // min clamp: the pure tier's consecutive candidates (closer than
    // minLen) collapse — clamped must have strictly fewer-or-equal cuts
    // and every clamped boundary must be a pure boundary or a forced cut
    val pureEnds = TextOps.cdcChunks(docs.filter($"doc_id" === 1L))
      .collect().map(r => r.getLong(2) + r.getLong(3) - 1).toSet
    val clampedRows = TextOps.cdcChunksClamped(docs.filter($"doc_id" === 1L),
      minLen = 16, maxLen = 64).collect()
    val clampedEnds = clampedRows.map(r => r.getLong(2) + r.getLong(3) - 1)
    clampedRows.foreach { r =>
      val end = r.getLong(2) + r.getLong(3) - 1
      assert(pureEnds.contains(end) || r.getLong(3) == 64L ||
        end == body.length.toLong,
        s"clamped end $end is neither a content cut, a forced cut, nor the text end")
    }
    assert(clampedEnds.length <= pureEnds.size + body.length / 64 + 1)
  }

  test("cdcNearDupIngest: build ∪ consecutive ingests ≡ full run on the union corpus") {
    val sql = spark
    import sql.implicits._
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val other = (1 to 50).map(i => s"w$i x$i").mkString(" ")
    // gen0: 1-2 near-dup; gen1 doc 11 dups gen0; gen2 doc 21 dups gen1's 12
    val gen0 = Seq((1L, body), (2L, "inserted preamble text here " + body))
      .toDF("doc_id", "text")
    val gen1 = Seq((11L, body + " trailing addition"), (12L, other))
      .toDF("doc_id", "text")
    val gen2 = Seq((21L, "prefix " + other), (22L, "unrelated fresh material entirely"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdc-ingest").toString

    TextOps.buildCdcIndex(gen0, dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val p0 = pairSet(TextOps.cdcNearDupPairs(gen0, minFrac = 0.1))
    val p1 = pairSet(TextOps.cdcNearDupIngest(gen1, dir, minFrac = 0.1))
    val p2 = pairSet(TextOps.cdcNearDupIngest(gen2, dir, minFrac = 0.1))
    assert(p1.exists(p => p._1 <= 2L && p._2 == 11L),
      s"ingest 1 must find the cross-generation dup: $p1")
    assert(p2.exists(p => p._1 == 12L && p._2 == 21L),
      s"ingest 2 must find the dup against ingest 1's APPENDED rows: $p2")
    val full = pairSet(TextOps.cdcNearDupPairs(
      gen0.unionAll(gen1).unionAll(gen2), minFrac = 0.1))
    assert((p0 ++ p1 ++ p2) === full,
      s"build ∪ ingests must equal the full union run:\n${p0 ++ p1 ++ p2}\n$full")

    // append=false is a pure probe: running the same what-if batch twice
    // yields identical pairs (the first run did not grow the index)
    val gen3 = Seq((31L, body)).toDF("doc_id", "text")
    val probe1 = pairSet(TextOps.cdcNearDupIngest(gen3, dir, minFrac = 0.1,
      append = false))
    val probe2 = pairSet(TextOps.cdcNearDupIngest(gen3, dir, minFrac = 0.1,
      append = false))
    assert(probe1 === probe2 && probe1.exists(_._2 == 31L), s"$probe1")

    // the probe's index read prunes at the PARTITION level: a db filter
    // lands as a partition filter, listing only the touched buckets
    val idxRead = spark.read.parquet(s"$dir/digests").filter(col("db").isin(3, 7))
    val scan = idxRead.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in the index-read plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "db")),
      "db must prune digests/ at the partition level")
  }

  test("dupMassBySource: disjoint islands sum to covered tokens, per source") {
    val sql = spark
    import sql.implicits._
    val shared = (1 to 40).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, "sA", ((1 to 10).map(i => s"a$i") ++ Seq(shared) ++
        (11 to 20).map(i => s"a$i")).mkString(" ")),          // 60 toks, 40 dup
      (2L, "sB", (Seq(shared) ++ (1 to 15).map(i => s"b$i")).mkString(" ")),
      (3L, "sB", (1 to 30).map(i => s"c$i").mkString(" ")))    // clean
      .toDF("doc_id", "source", "text")
    val got = TextOps.dupMassBySource(docs, n = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("sA") === ((60L, 40L, 0.666667)), s"sA: ${got("sA")}")
    assert(got("sB") === ((85L, 40L, 0.470588)), s"sB: ${got("sB")}")
  }

  test("qualityThresholdSweep: kept counts monotone, seeds separate") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "clean prose flows nicely here", "good"),
      (2L, "clean prose reads nicely too", "good"),
      (3L, "junk junk spam spam click", "bad"),
      (4L, "spam click junk buy now", "bad"),
      (5L, "clean prose flows here too", ""),
      (6L, "spam spam click buy junk", ""))
      .toDF("doc_id", "text", "label")
    val sweep = Pipeline.qualityThresholdSweep(docs,
        $"label" === "good", $"label" === "bad",
        thresholdsMicro = Seq(-5000000L, 0L, 5000000L), buckets = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sweep.map(_._1).toSeq == Seq(-5000000L, 0L, 5000000L))
    // n_kept monotone non-increasing in the threshold; all kept at -5
    val kept = sweep.map(_._2)
    assert(kept.head == 6L && kept.sliding(2).forall(p => p(0) >= p(1)),
      s"kept counts must fall as the threshold rises: ${kept.toSeq}")
    // at threshold 0 the seeds separate: both good kept, no bad kept
    val at0 = sweep.find(_._1 == 0L).get
    assert(at0._3 == 2L && at0._4 == 0L, s"seed split at 0: $at0")
  }

  test("corpusDiff classifies added/removed/changed/unchanged per doc") {
    val sql = spark
    import sql.implicits._
    val oldSnap = Seq(
      (1L, "s1", "same text"),
      (2L, "s1", "will change"),
      (3L, "s2", "will vanish")
    ).toDF("doc_id", "source", "text")
    val newSnap = Seq(
      (1L, "s1", "same text"),
      (2L, "s1", "changed text"),
      (4L, "s2", "brand new")
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.corpusDiff(oldSnap, newSnap, detail = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got == Map(
      1L -> (("s1", "unchanged")),
      2L -> (("s1", "changed")),
      3L -> (("s2", "removed")),
      4L -> (("s2", "added"))), s"$got")
    val rollup = Pipeline.corpusDiff(oldSnap, newSnap)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rollup == Map(
      "s1" -> ((0L, 0L, 1L, 1L)),
      "s2" -> ((1L, 1L, 0L, 0L))), s"$rollup")
  }

  test("importanceWeights: target-vocab docs outrank raw-only; n_feats; repartition-stable") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "alpha beta gamma delta", true),
      (3L, "alpha beta gamma", false),  // target vocabulary, outside target
      (4L, "omega psi chi phi", false), // raw-only vocabulary
      (5L, "omega psi", false)
    ).toDF("doc_id", "text", "is_t")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Pipeline.importanceWeights(d, $"is_t", buckets = 4096)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = run(docs)
    // n_feats = tokens + bigrams = 2t − 1
    assert(w(4L)._1 == 7L, s"doc 4 expected 7 feats, got ${w(4L)._1}")
    assert(w(5L)._1 == 3L)
    // a doc written in the target's vocabulary scores above one written
    // entirely in never-in-target vocabulary
    assert(w(3L)._2 > w(4L)._2,
      s"target-like ${w(3L)._2} should outrank raw-only ${w(4L)._2}")
    // scores are a pure function of content — partitioning can't move them
    assert(run(docs.repartition(5)) == w)
  }

  test("refreshIncremental: admits new/changed content; drops exact dups, near-dups, contamination") {
    val sql = spark
    import sql.implicits._
    val a = "one two three four five six seven eight"
    val oldSnap = Seq(
      (1L, "s0", a),
      (2L, "s0", "b old text here")
    ).toDF("doc_id", "source", "text")
    val newSnap = Seq(
      (1L, "s0", a),                                      // unchanged → retained
      (2L, "s0", "b brand new content words"),            // changed → admitted
      (3L, "s0", a),                                      // exact dup of retained → dropped
      (4L, "s0", "one two three four five six seven nine"), // near-dup of retained → dropped
      (5L, "s0", "filler q1 q2 q3 q4 trailer"),           // eval 4-gram → dropped
      (6L, "s0", "totally fresh unique vocabulary words") // added clean → admitted
    ).toDF("doc_id", "source", "text")
    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val admitted = Pipeline.refreshIncremental(oldSnap, newSnap, evalSet,
        nearDupThreshold = 0.5, evalN = 4)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L, 6L), s"expected {2, 6}, got $admitted")
  }

  test("mixPlan: budget conserved within floor loss; sqrt temperature up-weights small strata") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "big", "a b c d e f g h i j a b c d e f g h i j"), // 20 tokens
      (2L, "big", "a b c d e f g h i j a b c d e f g h i j"),
      (3L, "big", "a b c d e f g h i j a b c d e f g h i j"),
      (4L, "small", "a b c d e")                               // 5 tokens
    ).toDF("doc_id", "source", "text")
    val b = 1000L
    val plan = Pipeline.mixPlan(docs, "source", b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val allocSum = plan.values.map(_._2).sum
    assert(allocSum <= b && b - allocSum < plan.size,
      s"allocation $allocSum vs budget $b (floor loss must be < |strata|)")
    // sqrt flattening: the small stratum gets MORE effective epochs
    assert(plan("small")._3 > plan("big")._3,
      s"small ${plan("small")._3} should out-epoch big ${plan("big")._3}")
    // and more than its proportional share of the budget
    val (nSmall, aSmall, _) = plan("small")
    val nTot = plan.values.map(_._1).sum
    assert(aSmall.toDouble / b > nSmall.toDouble / nTot,
      "sqrt temperature must over-allocate the small stratum vs proportional")
    // pretraining-scale budget: the BIGINT product would overflow (1e15
    // × w_micro ~ 4.5e9 ≈ 4.5e24 >> 2^63); the decimal route must not
    val big = 1000000000000000L
    val bigPlan = Pipeline.mixPlan(docs, "source", big)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val bigSum = bigPlan.values.sum
    assert(bigPlan.values.forall(_ > 0L), s"overflowed allocation: $bigPlan")
    assert(bigSum <= big && big - bigSum < bigPlan.size,
      s"big-budget conservation broke: $bigSum vs $big")
  }

  test("fit+scoreImportance ≡ importanceWeights on the fitted corpus; unseen grams score the default") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "alpha beta gamma delta", true),
      (3L, "alpha beta gamma", false),
      (4L, "omega psi chi phi", false),
      (5L, "omega psi", false),
      (6L, null.asInstanceOf[String], false) // null text: BOTH paths drop it
    ).toDF("doc_id", "text", "is_t")
    val batch = Pipeline.importanceWeights(docs, $"is_t", buckets = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val model = Pipeline.fitImportanceModel(docs, $"is_t", buckets = 512)
    val served = Pipeline.scoreImportance(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == batch, s"serve path diverged:\nbatch  $batch\nserved $served")
    assert(!batch.exists(_._1 == 6L) && !served.exists(_._1 == 6L),
      "null-text doc must be dropped by BOTH the batch and serve paths")
    // a doc of never-seen grams: every feature takes the Laplace default,
    // so the integer mean IS the default
    val novel = Seq((9L, "zz yy xx")).toDF("doc_id", "text")
    val n = Pipeline.scoreImportance(novel, model).collect()(0)
    assert(n.getLong(1) == 5L) // 3 unigrams + 2 bigrams
    assert(n.getLong(2) == model.defaultMicro,
      s"unseen-gram doc scored ${n.getLong(2)}, expected default ${model.defaultMicro}")
  }

  test("curationFunnel: each stage's attrition lands in its own column") {
    val sql = spark
    import sql.implicits._
    val body = (1 to 12).map(i => s"w$i").mkString(" ") // 12 distinct tokens
    val docs = Seq(
      (1L, "sA", body),                    // survives everything
      (2L, "sA", "too short"),             // quality: under minTokens
      (3L, "sA", body),                    // exact dup of 1 → exact stage
      (4L, "sA", body + " extra"),         // jaccard 12/13 ≈ 0.92 → near-dup
      (5L, "sB", (13 to 24).map(i => s"v$i").mkString(" ")) // clean source
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.curationFunnel(docs, minTokens = 5, maxTokens = 100,
        minTtr = 0.3, nearDupThreshold = 0.8, maxTokenDf = 100)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got("sA") === ((4L, 3L, 2L, 1L, 1L, 1L)),
      s"sA: raw 4 → quality 3 → exact 2 → final 1 → cdc 1 → band 1, got ${got("sA")}")
    assert(got("sB") === ((1L, 1L, 1L, 1L, 1L, 1L)), s"sB untouched: ${got("sB")}")

    // CDC stage fires on what Jaccard can't see: doc 7 is doc 6 with a
    // SHIFTED byte prefix and enough token edits to dodge the 0.8
    // Jaccard bar, but its CDC chunks re-sync — n_cdc drops below
    // n_final for exactly that source
    val chunkBody = (1 to 80).map(i => s"chunktok$i").mkString(" ")
    val cdcDocs = Seq(
      (6L, "sC", chunkBody),
      (7L, "sC", "totally reworded preamble goes here now " + chunkBody))
      .toDF("doc_id", "source", "text")
    val got2 = Pipeline.curationFunnel(cdcDocs, minTokens = 5,
        maxTokens = 1000, minTtr = 0.3, nearDupThreshold = 0.99,
        maxTokenDf = 100)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5)))).toMap
    assert(got2("sC") === ((2L, 1L)),
      s"sC: both survive near-dup (threshold .99) but CDC prunes the copy: ${got2("sC")}")

    // band stage fires on what NO dedup stage can see: a doc with wholly
    // fresh content whose LENGTH is a corpus outlier — 30 ordinary docs
    // plus one 1000-token doc, all pairwise disjoint vocabularies; at
    // bandHighPct = 90 the outlier's bucket sits above hi_rep
    val bandDocs = ((1 to 30).map { i =>
      (i.toLong, "sD", (1 to 20).map(j => s"t${i}_$j").mkString(" "))
    } :+ ((31L, "sD", (1 to 1000).map(j => s"big_$j").mkString(" "))))
      .toDF("doc_id", "source", "text")
    // cdcMinFrac raised to .9: short docs have ~4 chunks each, so one
    // coincidentally-shared byte run would otherwise trip the .25 default
    // — this scenario isolates the BAND stage
    val got3 = Pipeline.curationFunnel(bandDocs, minTokens = 5,
        maxTokens = 5000, minTtr = 0.3, nearDupThreshold = 0.8,
        maxTokenDf = 100, cdcMinFrac = 0.9, bandLowPct = 5, bandHighPct = 90)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    assert(got3("sD") === ((31L, 30L)),
      s"sD: all 31 survive every dedup stage, the band trims the length outlier: ${got3("sD")}")
  }

  test("quality classifier: fit/serve ≡ batch; target ranks above; unseen defaults") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "clean prose flows nicely here", "good"),
      (2L, "clean prose reads nicely too", "good"),
      (3L, "junk junk spam spam click", "bad"),
      (4L, "spam click junk buy now", "bad"),
      (5L, "clean prose flows here too", ""),   // held out, good-domain
      (6L, "spam spam click buy junk", ""),     // held out, bad-domain
      (7L, null.asInstanceOf[String], ""))      // null text: scores = prior
      .toDF("doc_id", "text", "label")
    val batch = Pipeline.qualityScores(docs,
        $"label" === "good", $"label" === "bad", buckets = 512)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

    // nightly-fit / serve split must reproduce the distributed batch
    val model = Pipeline.fitQualityClassifier(
      docs.filter($"label" =!= ""), $"label" === "good", buckets = 512)
    val served = Pipeline.scoreQuality(docs.select($"doc_id", $"text"), model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(served === batch, s"serve diverged:\nbatch  $batch\nserved $served")
    // null text ≡ zero features in BOTH paths: kept, scored by the
    // prior alone with n_feats = 0
    assert(batch.exists(t => t._1 == 7L && t._2 == 0L
        && t._3 == model.priorMicro),
      s"null-text doc must score the prior with n_feats 0: $batch")

    // the learned judgment generalizes: the HELD-OUT good-domain doc
    // scores positive and above the held-out bad-domain doc
    val score = batch.map(t => t._1 -> t._3).toMap
    assert(score(5L) > 0L && score(6L) < 0L && score(5L) > score(6L),
      s"held-out ranking broke: $score")

    // a doc of never-seen grams: every feature takes the Laplace
    // default, so the score is exactly prior + default
    val novel = Seq((9L, "zz yy xx")).toDF("doc_id", "text")
    val n = Pipeline.scoreQuality(novel, model).collect()(0)
    assert(n.getLong(1) == 5L)
    assert(n.getLong(2) == model.priorMicro + model.defaultMicro,
      s"unseen-gram doc scored ${n.getLong(2)}, expected " +
        s"${model.priorMicro} + ${model.defaultMicro}")

    // one-class seed sets must fail loudly, not fit a degenerate model
    intercept[IllegalArgumentException] {
      Pipeline.fitQualityClassifier(
        docs.filter($"label" === "good"), $"label" === "good", buckets = 512)
    }
  }

  test("leakageSafeSplit: near-dup clusters co-shard; singletons ≡ shardAssign") {
    val sql = spark
    import sql.implicits._
    // a transitive chain 1~2~3 (1 and 3 share nothing) plus singletons
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma echo"),
      (3L, "alpha beta foxtrot echo"),
      (7L, "golf hotel india juliet"),
      (9L, "kilo lima mike november"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Pipeline.leakageSafeSplit(docs, pairs, nShards = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap

    // the WHOLE chain lands on one shard — including the transitive
    // (1, 3) pair no direct edge connects
    assert(Set(1L, 2L, 3L).map(out(_)).size === 1,
      s"chain must co-shard atomically: $out")
    assert(out(1L)._1 === 1L, "canonical is the min id")

    // singletons shard exactly as plain shardAssign — leakage safety
    // changes nothing where there is nothing to leak
    val plain = Pipeline.shardAssign(docs, "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(7L)._2 === plain(7L) && out(9L)._2 === plain(9L),
      s"singleton parity broke: $out vs $plain")
    // and the cluster's shard is its CANONICAL member's plain shard
    assert(out(1L)._2 === plain(1L),
      "cluster shard must be the canonical member's content shard")

    // a malformed pair set (id 0 absent from docs becomes the component
    // canonical) must FAIL LOUDLY, not silently drop the component
    val badPairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val ex = intercept[Exception] {
      Pipeline.leakageSafeSplit(docs, badPairs, nShards = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("absent from docs")),
      s"expected the loud malformed-pair failure, got: $ex")
  }

  test("shardAssign: content-hashed, stable under reorder, dups co-shard") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha beta gamma"), // exact dup of 1 → MUST share its shard
      (4L, "zeta eta theta"), (5L, "iota kappa"))
      .toDF("doc_id", "text")
    val a = Pipeline.shardAssign(docs, "text", 4)
      .select($"doc_id", $"shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < 4))
    assert(a(1L) === a(3L), "exact duplicates must land in the same shard")
    // stable under physical reordering / repartitioning (content hash,
    // not row position)
    val b = Pipeline.shardAssign(docs.repartition(5).sort($"doc_id".desc), "text", 4)
      .select($"doc_id", $"shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // md5-prefix ground truth for one value: first 8 hex chars of
    // md5("alpha beta gamma") parsed base-16, mod 4
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    assert(a(1L) === java.lang.Long.parseLong(hex, 16) % 4)
    intercept[IllegalArgumentException] { Pipeline.shardAssign(docs, "text", 0) }
  }

  test("packSequences: tokenCountCol packs on the supplied budget measure") {
    val sql = spark
    import sql.implicits._
    // whitespace counts are 2 everywhere, but the supplied BPE-ish counts
    // are 5 — with budget 10, supplied counts must split after 2 docs
    // where whitespace counts would fit 5
    val docs = Seq(
      (1L, "a b", "s", 5L), (2L, "a b", "s", 5L), (3L, "a b", "s", 5L),
      (4L, "a b", "s", 5L), (5L, "a b", "s", 5L))
      .toDF("doc_id", "text", "source", "n_bpe")
    val got = Pipeline.packSequences(docs, budgetTokens = 10,
        tokenCountCol = Some("n_bpe"))
      .select($"doc_id", $"chunk_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L),
      s"supplied-count packing: $got")
    val ws = Pipeline.packSequences(docs, budgetTokens = 10)
      .select($"doc_id", $"chunk_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ws.values.forall(_ == 0L), s"whitespace packing unchanged: $ws")
  }

  test("sourceReport: each verdict leg fires independently; filter applies it") {
    val sql = spark
    import sql.implicits._
    // goodsrc: 3 rich distinct docs. dupsrc: 3 docs, two identical →
    // dup-rate 2/3 trips the 0.5 bar. smallsrc: 1 doc → minDocs. Quality
    // leg: lowqsrc's docs are one repeated word (TTR collapses).
    val rich = (i: Int) => s"alpha$i beta$i gamma$i delta$i epsilon$i " +
      s"zeta$i eta$i theta$i iota$i kappa$i"
    val docs = Seq(
      (1L, rich(1), "goodsrc"), (2L, rich(2), "goodsrc"), (3L, rich(3), "goodsrc"),
      (4L, rich(4), "dupsrc"), (5L, "same same text here", "dupsrc"),
      (6L, "same same text here", "dupsrc"),
      (7L, rich(7), "smallsrc"),
      (8L, "word word word word word word word word", "lowqsrc"),
      (9L, "word word word word word word word word w2", "lowqsrc"),
      (10L, "word word word word word word word word w3", "lowqsrc"))
      .toDF("doc_id", "text", "source")
    val report = Pipeline.sourceReport(docs, minDocs = 3,
      minMeanQuality = 0.5, maxDupRate = 0.5,
      normalize = identity)
    val v = report.collect().map(r =>
      r.getString(0) -> r.getString(4)).toMap
    assert(v === Map("goodsrc" -> "keep", "dupsrc" -> "drop",
      "smallsrc" -> "drop", "lowqsrc" -> "drop"), s"verdicts: $v")

    val kept = Pipeline.filterBySources(docs, report)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L), s"kept: $kept")

    // dup leg counts GLOBAL collisions: a doc mirrored across two
    // sources marks both copies
    val cross = Seq(
      (1L, rich(1), "a"), (2L, rich(2), "a"), (3L, rich(3), "a"),
      (4L, rich(1), "b"), (5L, rich(5), "b"), (6L, rich(6), "b"))
      .toDF("doc_id", "text", "source")
    val nd = Pipeline.sourceReport(cross, minDocs = 1,
        minMeanQuality = 0.0, maxDupRate = 1.0, normalize = identity)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(nd === Map("a" -> 1L, "b" -> 1L), s"cross-source dups: $nd")
  }

  test("rrfFuse: exact micro contributions; asymmetric lists; id tie-break") {
    val sql = spark
    import sql.implicits._
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val sem = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rn")
    val fused = graft.operators.TextOps.rrfFuse(Seq(lex, sem), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // contributions: 1e6 div (60+rn): rn1=16393, rn2=16129, rn3=15873
    // doc 20 in both lists wins; 10 vs 40: 16393 > 16129; id-asc tiebreak unused
    assert(fused.toSeq === Seq(
      (20L, 16129L + 16393L, 2L, 1),
      (10L, 16393L, 1L, 2),
      (40L, 16129L, 1L, 3),
      (30L, 15873L, 1L, 4)), s"fused: ${fused.toSeq}")
    // exact tie (same rank, single list each) breaks to the lower id
    val a = Seq((7L, 1)).toDF("doc_id", "rn")
    val b = Seq((3L, 1)).toDF("doc_id", "rn")
    val tied = graft.operators.TextOps.rrfFuse(Seq(a, b), topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(tied === Seq(3L, 7L))
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.rrfFuse(Seq.empty, topK = 5)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.rrfFuse(Seq(a), topK = 0)
    }
  }

  test("vocabDrift: new/gone/grew/shrunk verdicts exact; flat suppressed; topN total order") {
    val sql = spark
    import sql.implicits._
    val oldS = Seq((1L, "a a b c stable"), (2L, "a d stable")).toDF("doc_id", "text")
    val newS = Seq((1L, "a b b c stable"), (2L, "b e stable")).toDF("doc_id", "text")
    // counts old: a=3 b=1 c=1 d=1 stable=2 ; new: a=1 b=3 c=1 e=1 stable=2
    val rows = graft.operators.TextOps.vocabDrift(oldS, newS, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(rows.toSet === Set(
      ("a", 3L, 1L, -2L, "shrunk"), ("b", 1L, 3L, 2L, "grew"),
      ("d", 1L, 0L, -1L, "gone"), ("e", 0L, 1L, 1L, "new")),
      s"verdicts: ${rows.toSeq}")
    // flat tokens (c, stable) never surface; order is |Δ| desc then token asc
    assert(rows.map(_._1).toSeq === Seq("a", "b", "d", "e"))
    // topN truncates ON the total order, deterministically
    val top2 = graft.operators.TextOps.vocabDrift(oldS, newS, topN = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top2 === Seq("a", "b"))
    intercept[IllegalArgumentException] {
      graft.operators.TextOps.vocabDrift(oldS, newS, topN = 0)
    }
  }
}
