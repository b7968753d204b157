package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The exponential-bucket quantile sketch: pure-integer bucket math,
  * lossless count-addition merge, and the exact identity that makes it
  * oracle-able — order statistics commute with the monotone bucket map,
  * so the sketch's p-quantile EQUALS bucketRep(exact p-quantile).
  */
class HistogramSketchSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hist-sketch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomDocs(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      // long-tailed lengths: most docs short, a few huge — the shape
      // that makes p99 land in a shifted (approximate) bucket
      val len = 1 + (math.pow(2.0, rnd.nextDouble() * 12).toInt)
      val text = if (i % 37 == 0) null else Seq.fill(len)("w").mkString(" ")
      (i.toLong, s"s${i % 3}", text)
    }
  }

  test("bucketRep: exact under 2^s, lower bound above, null off-domain") {
    val sql = spark
    import sql.implicits._
    val vs = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 65L, 127L, 128L,
      1000L, 1024L, 1025L, (1L << 40) + 12345L, -1L)
    val got = vs.toDF("v")
      .select(col("v"), HistogramSketch.bucketRep(col("v"), 5).as("rep"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // values with ≤ s+1 significant bits are EXACT
    for (v <- Seq(0L, 1L, 31L, 32L, 33L, 63L)) assert(got(v) === Some(v))
    // powers of two are always their own bucket lower bound
    for (v <- Seq(64L, 128L, 1024L)) assert(got(v) === Some(v))
    assert(got(65L) === Some(64L))   // e=6, shift=1
    assert(got(127L) === Some(126L))
    assert(got(1000L) === Some(992L)) // e=9, shift=4 — the DuckDB cross-check
    assert(got(1025L) === Some(1024L))
    val big = (1L << 40) + 12345L
    val rep = got(big).get
    assert(rep <= big && big - rep < (1L << 35), "relative error bound 2^-s")
    assert(got(-1L) === None, "negative values are off-domain")
  }

  test("sketch quantile ≡ bucketRep(exact quantile) — the monotone-map identity") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(7, 600).toDF("doc_id", "source", "text")
    val report = HistogramSketch.sourceLengthQuantiles(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val lens = docs.filter(col("text").isNotNull)
      .select(col("source"), TextOps.tokenCount(col("text")).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def bucketOf(v: Long): Long = Seq(v).toDF("v")
      .select(HistogramSketch.bucketRep(col("v"), 5)).head().getLong(0)

    for ((src, sortedVals) <- lens) {
      val n = sortedVals.length.toLong
      val (nDocs, p50, p90, p99) = report(src)
      assert(nDocs === n)
      for ((pct, got) <- Seq(50 -> p50, 90 -> p90, 99 -> p99)) {
        val exact = sortedVals(((n * pct + 99) / 100).toInt - 1)
        assert(got === bucketOf(exact),
          s"$src p$pct: sketch $got != bucket(exact $exact)")
        assert(got <= exact && exact - got <= exact / 32,
          s"$src p$pct: relative error bound violated")
      }
    }
  }

  test("partition-invariant: same report at 1 and 7 partitions") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(11, 400).toDF("doc_id", "source", "text")
    def run(p: Int) = HistogramSketch.sourceLengthQuantiles(docs.repartition(p))
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    assert(run(1) === run(7))
  }

  test("band trim: kept docs are exactly the in-band buckets, non-vacuous") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(17, 700).toDF("doc_id", "source", "text")
    val thr = HistogramSketch.lengthThresholds(docs, 5, 99)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val kept = HistogramSketch.lengthBandTrim(docs, 5, 99)
      .select(col("doc_id"), col("source"),
        HistogramSketch.bucketRep(
          TextOps.tokenCount(col("text")).cast("long"), 5).as("rep"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val all = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        HistogramSketch.bucketRep(
          TextOps.tokenCount(col("text")).cast("long"), 5).as("rep"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = all.filter { case (_, src, rep) =>
      val (lo, hi) = thr(src); rep >= lo && rep <= hi }
    assert(kept.toSet === expect.toSet, "trim must equal bucket-band membership")
    // the long tail makes both cuts bite: something trimmed on each side
    for (src <- thr.keys) {
      val (lo, hi) = thr(src)
      val srcAll = all.filter(_._2 == src)
      val srcKept = kept.filter(_._2 == src)
      assert(srcKept.nonEmpty && srcKept.length < srcAll.length,
        s"$src: trim must be non-vacuous (${srcKept.length}/${srcAll.length})")
      assert(srcAll.exists(_._3 < lo) || srcAll.exists(_._3 > hi))
    }
  }

  test("generic value band: any score column trims through the same kernel") {
    val sql = spark
    import sql.implicits._
    // a per-row SCORE (not length): long-tailed synthetic surprisal per
    // key, with a null key and a negative score that must drop loudly
    // by the documented rule (explicit filter, not a silent join miss)
    val rnd = new scala.util.Random(23)
    val rows = (1L to 500L).map { i =>
      val k: String = if (i == 500) null else s"k${i % 3}"
      val v: java.lang.Long =
        if (i == 499) java.lang.Long.valueOf(-5L)
        else java.lang.Long.valueOf(1L + math.pow(2.0, rnd.nextDouble() * 12).toLong)
      (i, k, v)
    }.toDF("id", "key", "score")
    val thr = HistogramSketch.valueThresholds(rows, "key", col("score"), 10, 90)
    val thrMap = thr.collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val kept = HistogramSketch.valueBandTrim(rows, "key", col("score"), thr)
      .select(col("id"), col("key"),
        HistogramSketch.bucketRep(col("score"), 5).as("rep"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!kept.exists(t => t._1 == 499L || t._1 == 500L),
      "null key / negative value rows must drop")
    val all = rows.filter(col("key").isNotNull && col("score") >= 0)
      .select(col("id"), col("key"),
        HistogramSketch.bucketRep(col("score"), 5).as("rep"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = all.filter { case (_, k, rep) =>
      val (lo, hi) = thrMap(k); rep >= lo && rep <= hi }
    assert(kept.toSet === expect.toSet,
      "generic trim must equal bucket-band membership")
    // the fit keeps a null-key group (plain GROUP BY semantics, same as
    // the SQL oracle side); only the TRIM drops null keys — so the
    // bite check runs over the real keys
    thrMap.keys.filter(_ != null).foreach { k =>
      assert(kept.count(_._2 == k) < all.count(_._2 == k),
        s"$k: the long tail must make the band bite")
    }
  }

  test("drift: zero on identical snapshots, positive under a length shift") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(19, 500).toDF("doc_id", "source", "text")
    val same = HistogramSketch.lengthDrift(docs, docs)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(same.nonEmpty && same.values.forall(_ === 0L),
      s"identical snapshots must have zero drift, got $same")
    // double every doc's length in the new snapshot: every bucket moves
    val shifted = docs.filter(col("text").isNotNull)
      .withColumn("text", concat(col("text"), lit(" "), col("text")))
    val moved = HistogramSketch.lengthDrift(docs, shifted)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(moved.forall(_._4 > 500000L),
      s"a 2x length shift must move most of the mass, got $moved")
  }

  test("index: build ∪ append ≡ full corpus (lossless count merge)") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(13, 500).toDF("doc_id", "source", "text")
    val dir = Files.createTempDirectory("graft-hist-suite").toString
    HistogramSketch.buildHistogramIndex(docs.filter(col("doc_id") <= 250), dir)
    HistogramSketch.appendHistogramIndex(docs.filter(col("doc_id") > 250), dir)
    val merged = HistogramSketch.readHistogramIndex(spark, dir)
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    val full = HistogramSketch.sourceLengthQuantiles(docs)
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    assert(merged === full)
  }

  test("guards: out-of-range/duplicate pcts throw; norm envelope fails loudly") {
    val sql = spark
    import sql.implicits._
    val docs = Seq((1L, "s0", "a b c")).toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      HistogramSketch.sourceLengthQuantiles(docs, pcts = Seq(50, 101))
    }
    intercept[IllegalArgumentException] {
      HistogramSketch.sourceLengthQuantiles(docs, pcts = Seq(50, 50))
    }
    intercept[IllegalArgumentException] {
      HistogramSketch.sourceLengthQuantiles(docs, pcts = Seq.empty)
    }
    // a coordinate past the |x| <= 100 envelope must raise, not wrap or
    // vanish — the exploding-norm case is what the report exists to catch
    val exploding = Seq((1L, Seq(5000.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val ex = intercept[Exception] {
      Similarity.normQuantiles(exploding).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("envelope")), s"got: ${msgs(ex)}")
  }

  test("normQuantiles: healthy normalized snapshot is ONE bucket; anomalies surface") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(29)
    def unit(): Seq[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val healthy = (1 to 60).map(i => (i.toLong, unit(), i % 2)).toDF("vec_id", "embedding", "label")
    val h = Similarity.normQuantiles(healthy)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(h.values.forall(_ === 1L),
      s"unit-normalized vectors must collapse to one norm bucket: $h")

    // scale anomalies must split the bucket and lift p99 above p50
    val broken = healthy.withColumn("embedding",
      when(col("vec_id") % 5 === 0,
        transform(col("embedding").cast("array<double>"), x => x * lit(3.0)))
        .otherwise(col("embedding").cast("array<double>")))
    val b = Similarity.normQuantiles(broken)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(b.forall(_._2 > 1L), s"anomaly must add buckets: ${b.toSeq}")
    assert(b.forall(r => r._4 > r._3), s"p99 must exceed p50: ${b.toSeq}")
  }

  test("index: build ∪ retract ≡ survivor-only run (count group algebra)") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(23, 500).toDF("doc_id", "source", "text")
    val dir = Files.createTempDirectory("graft-hist-retract").toString
    HistogramSketch.buildHistogramIndex(docs, dir)
    HistogramSketch.retractHistogramIndex(docs.filter(col("doc_id") % 4 === 0), dir)
    val got = HistogramSketch.readHistogramIndex(spark, dir)
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    val survivors = HistogramSketch.sourceLengthQuantiles(
        docs.filter(col("doc_id") % 4 =!= 0))
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    assert(got === survivors,
      "retracted index must equal a survivor-only full run incl. n_buckets")

    // retract an ENTIRE source: its rows all cancel and the source
    // disappears from the report, same as the survivor-only run
    val dir2 = Files.createTempDirectory("graft-hist-retract2").toString
    HistogramSketch.buildHistogramIndex(docs, dir2)
    HistogramSketch.retractHistogramIndex(docs.filter(col("source") === "s1"), dir2)
    val got2 = HistogramSketch.readHistogramIndex(spark, dir2)
      .select(col("source")).collect().map(_.getString(0)).toSet
    assert(got2 === Set("s0", "s2"), s"fully-retracted source must vanish: $got2")

    // over-retraction (docs never built into the index) must fail LOUDLY
    // at read, not silently corrupt the quantiles
    val dir3 = Files.createTempDirectory("graft-hist-retract3").toString
    HistogramSketch.buildHistogramIndex(docs.filter(col("doc_id") <= 100), dir3)
    HistogramSketch.retractHistogramIndex(docs, dir3) // retracts all 500
    val ex = intercept[Exception] {
      HistogramSketch.readHistogramIndex(spark, dir3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("negative merged count")),
      s"over-retraction must name the corruption: ${msgs(ex)}")
  }

  test("index: consolidation is lossless and collapses the generation history") {
    val sql = spark
    import sql.implicits._
    val docs = randomDocs(29, 400).toDF("doc_id", "source", "text")
    val dir = Files.createTempDirectory("graft-hist-consol").toString
    // a realistic history: build + three nightly appends + a retraction
    HistogramSketch.buildHistogramIndex(docs.filter(col("doc_id") < 100), dir)
    HistogramSketch.appendHistogramIndex(
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), dir)
    HistogramSketch.appendHistogramIndex(
      docs.filter(col("doc_id") >= 200 && col("doc_id") < 300), dir)
    HistogramSketch.appendHistogramIndex(docs.filter(col("doc_id") >= 300), dir)
    HistogramSketch.retractHistogramIndex(
      docs.filter(col("doc_id") % 5 === 0), dir)
    val before = HistogramSketch.readHistogramIndex(spark, dir)
      .collect().map(_.toString).sorted
    val rawBefore = spark.read.parquet(s"$dir/hist")
    val rowsBefore = rawBefore.count()
    HistogramSketch.consolidateHistogramIndex(spark, dir)
    // lossless: the read is row-identical
    val after = HistogramSketch.readHistogramIndex(spark, dir)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before),
      "consolidation must not change the read (count addition is lossless)")
    // collapsed: exactly one row per live (source, rep) bucket, so the
    // raw row count equals the distinct-bucket count — strictly fewer
    // rows than the 5-generation history held
    val raw = spark.read.parquet(s"$dir/hist")
    val rowsAfter = raw.count()
    assert(rowsAfter === raw.select("source", "rep").distinct().count(),
      "one row per bucket after consolidation")
    assert(rowsAfter < rowsBefore,
      s"history must shrink: $rowsBefore -> $rowsAfter")
    // schema unchanged: the id-freedom audit contract survives
    assert(raw.schema.fieldNames.toSet === Set("source", "rep", "cnt"))
    // net-zero buckets drop OUT of the stored rows, not just the read:
    // fully retract one source, consolidate, and the raw parquet holds
    // no rows for it
    HistogramSketch.retractHistogramIndex(
      docs.filter(col("source") === "s1" && col("doc_id") % 5 =!= 0), dir)
    HistogramSketch.consolidateHistogramIndex(spark, dir)
    val sources = spark.read.parquet(s"$dir/hist")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(!sources.contains("s1"),
      s"fully-cancelled buckets must not survive consolidation: $sources")
    // corruption refuses: an over-retraction (net-negative bucket) must
    // not get baked into the single surviving generation
    HistogramSketch.retractHistogramIndex(
      docs.filter(col("source") === "s1"), dir) // s1 already gone
    val ex2 = intercept[Exception] {
      HistogramSketch.consolidateHistogramIndex(spark, dir)
    }
    def msgs2(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs2(t.getCause)
    assert(msgs2(ex2).exists(_.contains("negative merged count")),
      s"consolidating corruption must refuse loudly: ${msgs2(ex2)}")
    // and the refusal left the live index untouched (staged rewrite:
    // the swap never happened)
    assert(spark.read.parquet(s"$dir/hist").count() > 0)
  }
}
