package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

import graft.Tables
import graft.queries.QuerySpec

/** Per-source length-quantile sketches over exponential buckets — the
  * order-statistics member of the sketch family next to the KMV distinct
  * sketches ([[Dedup.sourceSketches]]) and the Misra-Gries heavy hitters.
  *
  * The question a curation pipeline asks nightly is "what are p50/p90/p99
  * document lengths per source?" — the percentile thresholds that drive
  * length filters and packing budgets. Exact percentiles need a full sort
  * per source; at 100 TB that is a corpus-sized shuffle for three numbers.
  * This sketch is the HdrHistogram/DDSketch design (public: HdrHistogram's
  * exponent+sub-bucket layout; Masson et al., "DDSketch", VLDB 2019)
  * restated in PURE INTEGER math so that, like the KMV family, even the
  * ESTIMATES hash-gate exactly against a DuckDB replay:
  *
  *  - bucket of a value v ≥ 1: keep the top `subBits`+1 significant bits,
  *    zero the rest — `rep = (v >> shift) << shift` with
  *    `shift = max(0, floor(log2 v) − subBits)`, and `floor(log2 v)` is
  *    `length(bin(v)) − 1` (a string-length of the binary rendering: no
  *    float log to round differently across engines). `rep` is both the
  *    bucket key and its representative (the bucket's lower bound);
  *    relative error is < 2^−subBits by construction.
  *  - the sketch is the (rep → count) table: ≤ (64−s)·2^s + 2^s rows per
  *    source (s=5 → ≤ 1920), shuffled as map-side-combined partial counts.
  *  - merge is COUNT ADDITION — lossless by algebra, so the persisted
  *    index's generations merge exactly and build ∪ appends ≡ full run
  *    (the q157 discipline; the incremental oracle IS the full-corpus
  *    construction).
  *  - a quantile at fraction p reads off the CDF: smallest rep whose
  *    cumulative count ≥ ceil(n·p). Because bucketing is a MONOTONE map,
  *    order statistics commute with it: the sketch's p-quantile is
  *    EXACTLY `bucketRep(exact p-quantile)` — an identity the suite pins
  *    (not an error-bound assertion, an equality).
  *
  * Scale shape: one corpus scan → map-side bucket projection → one
  * partial-aggregated exchange of ≤1920-row groups; the quantile walk is
  * a per-source window over those bucket rows (bounded by construction —
  * the legitimately-small-partition class, like per-digest keeper
  * selection). After the scan, every quantile question is answered from
  * k-row sketches; the persisted index never re-reads the corpus.
  */
object HistogramSketch {

  private def shiftR(v: Column, n: Column): Column =
    column(ShiftRight(expression(v), expression(n)))
  private def shiftL(v: Column, n: Column): Column =
    column(ShiftLeft(expression(v), expression(n)))

  /** Exponential-bucket lower bound of a non-negative LONG value: the
    * value with all but its top `subBits`+1 significant bits zeroed.
    * Pure integer/string ops — engine-portable (DuckDB replays it as
    * `(v >> s) << s` with `length(bin(v))`). Negative values map to
    * null (lengths/counts cannot be negative; callers filter). */
  def bucketRep(v: Column, subBits: Int): Column = {
    require(subBits >= 0 && subBits <= 30,
      s"bucketRep: subBits must be in [0, 30], got $subBits")
    val long = v.cast("long")
    val e = length(bin(long)) - lit(1) // floor(log2 v) for v ≥ 1; 0 for v = 0
    val shift = greatest(lit(0), e - lit(subBits))
    when(long < 0, lit(null)).otherwise(shiftL(shiftR(long, shift), shift))
  }

  /** `(source, rep, cnt)` sketch frame of a per-document value — the
    * mergeable representation every consumer shares. Null values (null
    * text upstream) contribute nothing, the [[Dedup.kmvFrame]] rule. */
  private def histFrame(docs: DataFrame, value: Column,
                        subBits: Int): DataFrame =
    docs.select(col("source"), bucketRep(value, subBits).as("rep"))
      .filter(col("rep").isNotNull)
      .groupBy(col("source"), col("rep"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile report over a `(source, rep, cnt)` frame: for each pct the
    * smallest rep whose cumulative count reaches ceil(n·pct/100) — all
    * integer arithmetic, so the row hash-gates exactly. The window runs
    * over bucket rows (≤1920 per source by construction). */
  private def quantileSummary(frame: DataFrame, pcts: Seq[Int]): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("rep"))
    val cum = frame.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n_docs", sum(col("cnt")).over(Window.partitionBy(col("source"))))
    val qCols = pcts.map { p =>
      min(when(col("cum") >= expr(s"(n_docs * $p + 99) div 100"), col("rep")))
        .as(s"p$p")
    }
    val aggs = Seq(max(col("n_docs")).as("n_docs"),
      count(lit(1)).as("n_buckets")) ++ qCols
    cum.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-source token-length quantile report: one corpus scan, bounded
    * sketches, exact-integer p50/p90/p99 bucket estimates. */
  def sourceLengthQuantiles(docs: DataFrame, subBits: Int = 5,
                            pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantileSummary(
      histFrame(docs.filter(col("text").isNotNull),
        TextOps.tokenCount(col("text")).cast("long"), subBits), pcts)

  /** Persist the per-source histogram sketch at `dir/hist` — the nightly
    * artifact. Count addition is lossless, so the index follows the
    * generation-append discipline: [[appendHistogramIndex]] appends the
    * batch's bucket rows without reading the index (work ∝ batch), and
    * [[readHistogramIndex]] merges generations at read by summing. */
  def buildHistogramIndex(docs: DataFrame, dir: String,
                          subBits: Int = 5): Unit =
    histFrame(docs.filter(col("text").isNotNull),
      TextOps.tokenCount(col("text")).cast("long"), subBits)
      .write.mode("overwrite").parquet(s"$dir/hist")

  /** Append a batch generation's bucket rows (same `subBits` as the
    * build — a coarser generation would not merge bucket-for-bucket). */
  def appendHistogramIndex(batch: DataFrame, dir: String,
                           subBits: Int = 5): Unit =
    histFrame(batch.filter(col("text").isNotNull),
      TextOps.tokenCount(col("text")).cast("long"), subBits)
      .write.mode("append").parquet(s"$dir/hist")

  /** Current per-source quantile report from the persisted index:
    * generations merged by count addition, then the same summary. */
  def readHistogramIndex(spark: SparkSession, dir: String,
                         pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantileSummary(
      spark.read.parquet(s"$dir/hist")
        .groupBy(col("source"), col("rep"))
        .agg(sum(col("cnt")).as("cnt")), pcts)

  /** Build-once memo for the q159 harness query (the q157 split: corpus
    * built from doc_id < 250, the later generation appended — once per
    * sf-dir per JVM). Library users call the build/append entry points
    * with their own storage. */
  private def cachedHistogramIndex(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-hist-index", d) { dir =>
      val docs = Tables.documents(s, d)
      buildHistogramIndex(docs.filter(col("doc_id") < 250), dir)
      appendHistogramIndex(docs.filter(col("doc_id") >= 250), dir)
      dir
    }

  private val quantileOracle = """
    WITH v AS (
      SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
      FROM documents WHERE text IS NOT NULL),
    b AS (
      SELECT source,
             (v >> greatest(0, length(bin(v)) - 1 - 5))
               << greatest(0, length(bin(v)) - 1 - 5) AS rep
      FROM v),
    g AS (SELECT source, rep, COUNT(*) AS cnt FROM b GROUP BY source, rep),
    c AS (
      SELECT source, rep,
             SUM(cnt) OVER (PARTITION BY source ORDER BY rep) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS n_docs
      FROM g)
    SELECT source,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MIN(CASE WHEN cum >= (n_docs * 50 + 99) // 100 THEN rep END) AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cum >= (n_docs * 90 + 99) // 100 THEN rep END) AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cum >= (n_docs * 99 + 99) // 100 THEN rep END) AS BIGINT) AS p99
    FROM c GROUP BY source ORDER BY source"""

  val specs: Seq[QuerySpec] = Seq(

    // Exponential-bucket length quantiles (r12): every number in the row
    // is integer bucket arithmetic, so the full report — including the
    // p50/p90/p99 ESTIMATES — hash-gates against the DuckDB replay.
    QuerySpec(
      "q158_length_quantiles",
      (s, d) => sourceLengthQuantiles(Tables.documents(s, d))
        .orderBy(col("source")),
      Some(quantileOracle)),

    // Incremental histogram index (r12): corpus bucket rows persisted
    // once, the batch generation appended, generations merged at read by
    // count addition — lossless, so the oracle is LITERALLY the
    // full-corpus q158 construction (the q157 discipline).
    QuerySpec(
      "q159_length_quantiles_incr",
      (s, d) => readHistogramIndex(s, cachedHistogramIndex(s, d))
        .orderBy(col("source")),
      Some(quantileOracle)))
}
