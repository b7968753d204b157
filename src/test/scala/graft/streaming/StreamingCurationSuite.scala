package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.TextOps
import graft.state.RocksDbStateStoreProvider

/** Decontamination as a streaming admission gate: stream-static broadcast
  * semi-join on grams + state-backed dropDuplicates (on our RocksDB
  * provider), with flags surfacing incrementally per batch and exactly
  * once per doc. Map-side gates (blocklist) run on streams unchanged.
  */
class StreamingCurationSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-curation")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming decontamination flags each overlapping doc once, per batch") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evalDocs = Seq((100L, "q1 q2 q3 q4 q5 tail")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val flags = StreamingCuration.contaminatedIdsStream(
      input.toDS().toDF("doc_id", "text"), evalDocs, n = 4)

    val query = flags.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sdecon")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdecon").toString)
      .start()

    // batch 1: doc 2 shares TWO eval 4-grams (q1..q4 and q2..q5) — must
    // still be flagged exactly once; doc 1 is clean
    input.addData((1L, "clean words only here"), (2L, "x q1 q2 q3 q4 q5 y"))
    query.processAllAvailable()
    val b1 = spark.table("sdecon").collect().map(_.getLong(0)).toSeq
    assert(b1 == Seq(2L), s"batch 1 flags: $b1")

    // batch 2: doc 3 contaminated, doc 4 clean — flags accumulate
    input.addData((3L, "prefix q2 q3 q4 q5 suffix"), (4L, "also clean text"))
    query.processAllAvailable()
    val all = spark.table("sdecon").collect().map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(2L, 3L), s"accumulated flags: $all")
    query.stop()
  }

  test("fitted importance model scores a stream; parity with the batch fit") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "alpha beta gamma delta", true),
      (3L, "alpha beta gamma", false),
      (4L, "omega psi chi phi", false),
      (5L, "omega psi", false)
    ).toDF("doc_id", "text", "is_t")
    val model = graft.operators.Pipeline.fitImportanceModel(
      corpus, $"is_t", buckets = 512)
    val batchScores = graft.operators.Pipeline.scoreImportance(
        corpus.select($"doc_id", $"text"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // the scorer is a pure projection (map literal, zero state), so the
    // SAME call runs on a stream — no streaming-specific variant needed
    val input = MemoryStream[(Long, String)]
    val scored = graft.operators.Pipeline.scoreImportance(
      input.toDS().toDF("doc_id", "text"), model)
    val query = scored.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("simp")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-simp").toString)
      .start()
    input.addData((1L, "alpha beta gamma alpha beta"), (2L, "alpha beta gamma delta"))
    query.processAllAvailable()
    input.addData((3L, "alpha beta gamma"), (4L, "omega psi chi phi"), (5L, "omega psi"))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("simp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batchScores,
      s"stream scores diverged:\nbatch  $batchScores\nstream $streamed")
  }

  test("fitted quality classifier scores a stream; parity with the batch fit") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val seeds = Seq(
      (1L, "clean prose flows nicely here", true),
      (2L, "clean prose reads nicely too", true),
      (3L, "junk junk spam spam click", false),
      (4L, "spam click junk buy now", false)
    ).toDF("doc_id", "text", "is_good")
    val model = graft.operators.Pipeline.fitQualityClassifier(
      seeds, $"is_good", buckets = 512)
    val corpus = seeds.select($"doc_id", $"text")
      .union(Seq((5L, "clean prose flows here too"),
        (6L, "spam spam click buy junk")).toDF("doc_id", "text"))
    val batchScores = graft.operators.Pipeline.scoreQuality(corpus, model)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

    // pure projection (map literal, zero state) — the SAME call runs on
    // a stream, no streaming-specific variant
    val input = MemoryStream[(Long, String)]
    val scored = graft.operators.Pipeline.scoreQuality(
      input.toDS().toDF("doc_id", "text"), model)
    val query = scored.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("squal")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-squal").toString)
      .start()
    input.addData((1L, "clean prose flows nicely here"),
      (2L, "clean prose reads nicely too"),
      (3L, "junk junk spam spam click"))
    query.processAllAvailable()
    input.addData((4L, "spam click junk buy now"),
      (5L, "clean prose flows here too"),
      (6L, "spam spam click buy junk"))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("squal")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(streamed == batchScores,
      s"stream quality diverged:\nbatch  $batchScores\nstream $streamed")
  }

  test("fitted outlier model flags a stream; parity with the batch serve") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // type A: nine 10.0s and one 110.0 (2σ spike); type B singleton
    val ref = ((1L to 9L).map(i => (i, "A", 10.0)) ++
      Seq((10L, "A", 110.0), (11L, "B", 42.0)))
      .toDF("event_id", "event_type", "value")
    val model = graft.operators.Sessionize.fitOutlierModel(ref, k = 2)
    val batchFlags = graft.operators.Sessionize.flagOutliers(ref, model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // serving is one folded map literal — a pure projection, so the SAME
    // call runs on the stream; an unseen type ("C") must pass through
    val input = MemoryStream[(Long, String, Double)]
    val flagged = graft.operators.Sessionize.flagOutliers(
      input.toDS().toDF("event_id", "event_type", "value"), model)
    val query = flagged.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("soutl")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-soutl").toString)
      .start()
    input.addData((1L to 9L).map(i => (i, "A", 10.0)): _*)
    query.processAllAvailable()
    input.addData((10L, "A", 110.0), (11L, "B", 42.0), (20L, "C", 1e9))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("soutl")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batchFlags,
      s"stream flags diverged:\nbatch  $batchFlags\nstream $streamed")
    assert(streamed.map(_._1) == Set(10L), s"only the spike flags: $streamed")
  }

  test("semantic decontamination serve tier screens a stream; parity with batch join tier") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // eval direction e1; vectors 1,2 leak (parallel / near-parallel),
    // 3,4 orthogonal and survive
    val evalVecs = Seq(Seq(1.0, 0.0, 0.0, 0.0))
    val rows = Seq(
      (1L, Seq(2.0, 0.0, 0.0, 0.0)),   // parallel → cos 1
      (2L, Seq(1.0, 0.1, 0.0, 0.0)),   // near-parallel → cos ≈ 0.995
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),   // orthogonal
      (4L, Seq(0.0, 0.0, 3.0, 4.0)))   // orthogonal
    val train = rows.toDF("vec_id", "embedding")

    val batchKept = graft.operators.Similarity.semanticDecontaminate(
        train, evalVecs.zipWithIndex.map { case (v, i) => (100L + i, v) }
          .toDF("vec_id", "embedding"), tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    val serveKept = graft.operators.Similarity.semanticDecontaminateServe(
        train, evalVecs, tau = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(batchKept === Set(3L, 4L) && serveKept === batchKept,
      s"batch=$batchKept serve=$serveKept")

    // the serve tier is a pure projection — the SAME call runs on a stream
    val input = MemoryStream[(Long, Seq[Double])]
    val screened = graft.operators.Similarity.semanticDecontaminateServe(
      input.toDS().toDF("vec_id", "embedding"), evalVecs, tau = 0.9)
    val query = screened.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("ssemdec")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssemdec").toString)
      .start()
    input.addData(rows.take(2): _*)
    query.processAllAvailable()
    input.addData(rows.drop(2): _*)
    query.processAllAvailable()
    query.stop()
    val streamKept = spark.table("ssemdec").collect().map(_.getLong(0)).toSet
    assert(streamKept === batchKept, s"stream=$streamKept batch=$batchKept")
  }

  test("fitted length band trims a stream; parity with the batch trim") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // long-tailed corpus: fit the [p10, p90] band on it (batch), then
    // serve the SAME lengthBandTrim call on a stream — the thresholds
    // are a ≤|sources|-row static side of a stream-static broadcast
    // join, the decision a stateless bucket filter
    val rnd = new scala.util.Random(5)
    val corpus = (1 to 120).map { i =>
      val len = 1 + math.pow(2.0, rnd.nextDouble() * 9).toInt
      (i.toLong, s"s${i % 2}", Seq.fill(len)("w").mkString(" "))
    } :+ ((121L, "s0", null.asInstanceOf[String]))
    val corpusDf = corpus.toDF("doc_id", "source", "text")
    val thr = graft.operators.HistogramSketch.lengthThresholds(corpusDf, 10, 90)

    val batchKept = graft.operators.HistogramSketch
      .lengthBandTrim(corpusDf, thr)
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    val input = MemoryStream[(Long, String, String)]
    val trimmed = graft.operators.HistogramSketch.lengthBandTrim(
      input.toDS().toDF("doc_id", "source", "text"), thr)
    val query = trimmed.select($"doc_id").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sbandtrim")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sbandtrim").toString)
      .start()
    corpus.grouped(40).foreach { g =>
      input.addData(g.toSeq: _*); query.processAllAvailable()
    }
    val streamKept = spark.table("sbandtrim").collect()
      .map(_.getLong(0)).toSet
    query.stop()

    assert(batchKept.nonEmpty && batchKept.size < corpus.size - 1,
      s"degenerate fixture: band must bite (kept ${batchKept.size})")
    assert(streamKept === batchKept,
      s"stream kept $streamKept must equal batch kept $batchKept")
  }

  test("surgical decontamination serve tier scrubs a stream; parity with batch") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evalSet = Seq((100L, "q1 q2 q3 q4 tail")).toDF("doc_id", "text")
    val grams = TextOps.evalGramStrings(evalSet, n = 4)
    val corpus = Seq(
      (1L, "web", "clean words entirely here today"),
      (2L, "web", "keep q1 q2 q3 q4 rest stays"),
      (3L, "book", "a q1 q2 q3 q4 tail b"))
    val batch = TextOps.decontaminateSpansServe(
        corpus.toDF("doc_id", "source", "text"), grams, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4))).toSet

    // zero joins/state: the SAME call runs on the ingest stream
    val input = MemoryStream[(Long, String, String)]
    val scrubbed = TextOps.decontaminateSpansServe(
      input.toDS().toDF("doc_id", "source", "text"), grams, n = 4)
    val query = scrubbed.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sscrub")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sscrub").toString)
      .start()
    corpus.grouped(2).foreach { g =>
      input.addData(g.toSeq: _*); query.processAllAvailable()
    }
    val streamed = spark.table("sscrub")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getString(4))).toSet
    query.stop()
    assert(batch.exists(_._2 > 0) && streamed === batch,
      s"stream scrub diverged:\nbatch  $batch\nstream $streamed")
  }

  test("materializeMix executes a plan on a stream; parity with the batch multiset") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the mix executor is broadcast-plan + map-side draw/explode — a
    // pure projection, so the SAME call runs on an ingest stream (the
    // scoreImportance/flagOutliers serve-tier rule)
    val corpus = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "big" else "small", s"text $i"))
    val corpusDf = corpus.toDF("doc_id", "source", "text")
    val plan = Seq(("big", 1700000L), ("small", 400000L))
      .toDF("source", "epochs_micro")
    val batch = graft.operators.Pipeline.materializeMix(corpusDf, plan)
      .select($"doc_id", $"copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val input = MemoryStream[(Long, String, String)]
    val mixed = graft.operators.Pipeline.materializeMix(
      input.toDS().toDF("doc_id", "source", "text"), plan)
    val query = mixed.select($"doc_id", $"copy").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("smix")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-smix").toString)
      .start()
    corpus.grouped(25).foreach { g =>
      input.addData(g.toSeq: _*); query.processAllAvailable()
    }
    val streamed = spark.table("smix").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()
    assert(batch.nonEmpty && streamed === batch,
      s"stream mix diverged: batch ${batch.size} rows, stream ${streamed.size}")
  }

  test("map-side gates (blocklist) apply to a stream unchanged") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val kept = TextOps.blocklistFilter(
      input.toDS().toDF("doc_id", "text"), Seq("bad"))

    val query = kept.select("doc_id").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sblock")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sblock").toString)
      .start()

    input.addData((1L, "all fine"), (2L, "this is bad content"), (3L, "badge ok"))
    query.processAllAvailable()
    val got = spark.table("sblock").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L), s"kept: $got")
    query.stop()
  }

  test("redaction and chunking compose on a stream (stateless projections/generates)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    // redact → chunk in one streaming plan: both are per-row, so the
    // query needs no state store and emits in Append mode batch-by-batch
    val out = TextOps.chunkDocs(
      input.toDS().toDF("doc_id", "text")
        .withColumn("text", TextOps.redact(org.apache.spark.sql.functions.col("text"),
          Seq("secret"))),
      chunkTokens = 3, stride = 3)

    val query = out.select("doc_id", "chunk_idx", "chunk_text").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sredchunk")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sredchunk").toString)
      .start()

    input.addData((1L, "a secret b c d"))
    query.processAllAvailable()
    val rows = spark.table("sredchunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq((1L, 0L, "a <MASK> b"), (1L, 1L, "c d")), s"got: $rows")
    query.stop()
  }
}
