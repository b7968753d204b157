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

  /** The family-wide default sub-bucket precision: every fitted
    * threshold and every membership test must share ONE bucket space,
    * so call sites that fit and test at different places reference this
    * constant rather than restating the literal. */
  val DefaultSubBits: Int = 5

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

  /** `(key, rep, cnt)` sketch frame of a per-row value — the mergeable
    * representation every consumer shares. Null values (null text
    * upstream) contribute nothing, the [[Dedup.kmvFrame]] rule. */
  private def histFrame(rows: DataFrame, keyCol: String, value: Column,
                        subBits: Int): DataFrame =
    rows.select(col(keyCol), bucketRep(value, subBits).as("rep"))
      .filter(col("rep").isNotNull)
      .groupBy(col(keyCol), col("rep"))
      .agg(count(lit(1)).as("cnt"))

  /** The token-length instance of [[histFrame]] — the frame every
    * length-family entry point (quantiles, thresholds, drift) shares.
    * Null-text docs contribute nothing. */
  private def lengthFrame(docs: DataFrame, subBits: Int): DataFrame =
    histFrame(docs.filter(col("text").isNotNull), "source",
      TextOps.tokenCount(col("text")).cast("long"), subBits)

  /** [[lengthFrame]] carrying per-bucket token MASS alongside the count —
    * one corpus scan then serves both a token-volume rollup and the
    * drift legs ([[Pipeline.snapshotCard]]), instead of tokenizing the
    * snapshot once per leg. */
  private[operators] def lengthFrameWithMass(docs: DataFrame,
      subBits: Int = DefaultSubBits): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("__v"))
      .select(col("source"), col("__v"),
        bucketRep(col("__v"), subBits).as("rep"))
      .filter(col("rep").isNotNull)
      .groupBy(col("source"), col("rep"))
      .agg(count(lit(1)).as("cnt"), sum(col("__v")).cast("long").as("tok"))

  /** Quantile report over a `(key, rep, cnt)` frame: for each pct the
    * smallest rep whose cumulative count reaches ceil(n·pct/100) — all
    * integer arithmetic, so the row hash-gates exactly. The window runs
    * over bucket rows (≤1920 per key by construction). `nName` is the
    * total-count column's output name (`n_docs` for the length family). */
  private def quantileSummary(frame: DataFrame, keyCol: String,
                              pcts: Seq[Int],
                              nName: String = "n_docs"): DataFrame = {
    // every entry point funnels through here: pct > 100 would yield a
    // silently-NULL quantile (target above n — the silent-narrowing
    // class), duplicates would emit ambiguous duplicate column names
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"quantile pcts must be in [1, 100], got $pcts")
    require(pcts.distinct.size == pcts.size,
      s"quantile pcts must be distinct, got $pcts")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("rep"))
    val cum = frame.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(Window.partitionBy(col(keyCol))))
    val qCols = pcts.map { p =>
      min(when(col("cum") >= expr(s"(__n * $p + 99) div 100"), col("rep")))
        .as(s"p$p")
    }
    val aggs = Seq(max(col("__n")).as(nName),
      count(lit(1)).as("n_buckets")) ++ qCols
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-key quantile report of ANY non-negative long value — the
    * generic surface behind [[sourceLengthQuantiles]]: bucket `value`
    * per row, count per `(key, rep)`, read the quantiles off the
    * integer CDF. Null values contribute nothing. */
  def valueQuantiles(rows: DataFrame, keyCol: String, value: Column,
                     subBits: Int = DefaultSubBits, pcts: Seq[Int] = Seq(50, 90, 99),
                     nName: String = "n_vals"): DataFrame =
    quantileSummary(histFrame(rows, keyCol, value, subBits), keyCol,
      pcts, nName)

  /** Per-source token-length quantile report: one corpus scan, bounded
    * sketches, exact-integer p50/p90/p99 bucket estimates. */
  def sourceLengthQuantiles(docs: DataFrame, subBits: Int = DefaultSubBits,
                            pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantileSummary(lengthFrame(docs, subBits), "source", pcts)

  /** GENERIC per-key `(lo_rep, hi_rep)` trim band over any non-negative
    * value expression — the fitted-model tier [[valueQuantiles]] is the
    * report tier of. ≤ |keys| rows, the broadcast-join class. Length is
    * one instance ([[lengthThresholds]]); LM surprisal, quality scores,
    * or any per-row long can fit a band through the same integer bucket
    * arithmetic (so the fitted band — and every trim decision made with
    * it — is engine-exact). */
  def valueThresholds(rows: DataFrame, keyCol: String, value: Column,
                      lowPct: Int, highPct: Int,
                      subBits: Int = DefaultSubBits,
                      nName: String = "n_vals"): DataFrame = {
    require(0 < lowPct && lowPct < highPct && highPct <= 100,
      s"valueThresholds: need 0 < lowPct < highPct <= 100, got $lowPct/$highPct")
    quantileSummary(histFrame(rows, keyCol, value, subBits), keyCol,
        Seq(lowPct, highPct), nName)
      .select(col(keyCol), col(nName),
        col(s"p$lowPct").as("lo_rep"), col(s"p$highPct").as("hi_rep"))
  }

  /** GENERIC band trim: keep rows whose value BUCKET falls inside the
    * per-key `[lo_rep, hi_rep]` band ([[valueThresholds]] output or any
    * frame with those columns). Membership is decided in bucket space —
    * the same integer arithmetic an oracle replays. Rows with a null
    * key or null/negative value are dropped EXPLICITLY (the capByKey
    * null-key rule — the histogram never saw them either). Thresholds
    * broadcast onto one scan: zero extra shuffles. */
  def valueBandTrim(rows: DataFrame, keyCol: String, value: Column,
                    thresholds: DataFrame,
                    subBits: Int = DefaultSubBits): DataFrame = {
    // the internal bucket column would silently replace-then-drop a
    // caller's __rep (the tokenQuota __qkey rule)
    require(!rows.columns.contains("__rep"),
      "valueBandTrim: input already has a '__rep' column (the kernel's " +
        "internal bucket name) - rename it first")
    rows.filter(col(keyCol).isNotNull)
      .withColumn("__rep", bucketRep(value, subBits))
      .filter(col("__rep").isNotNull)
      .join(broadcast(thresholds.select(col(keyCol),
        col("lo_rep"), col("hi_rep"))), Seq(keyCol))
      .filter(col("__rep") >= col("lo_rep") && col("__rep") <= col("hi_rep"))
      .drop("__rep", "lo_rep", "hi_rep")
  }

  /** Per-source `(lo_rep, hi_rep)` trim band from the sketch: the bucket
    * reps at `lowPct`/`highPct`. ≤ |sources| rows — the fitted-model
    * class that rides a broadcast join. The length instance of
    * [[valueThresholds]]. */
  def lengthThresholds(docs: DataFrame, lowPct: Int, highPct: Int,
                       subBits: Int = DefaultSubBits): DataFrame =
    valueThresholds(docs.filter(col("text").isNotNull), "source",
      TextOps.tokenCount(col("text")).cast("long"), lowPct, highPct,
      subBits, nName = "n_docs")

  /** Sketch-driven length-outlier trim — the curation step the quantile
    * report exists to drive: keep docs whose length BUCKET falls inside
    * the per-source `[lo_rep, hi_rep]` band of `thresholds`
    * ([[lengthThresholds]] output or any frame with those columns).
    * Because membership is decided in bucket space, the decision is the
    * same integer arithmetic the oracle replays — no float percentile to
    * disagree on. Null-text docs are dropped (their length is
    * undefined; the histogram never saw them either).
    *
    * Scale shape: thresholds are ≤ |sources| rows broadcast to a single
    * corpus scan — one map-side hash join + filter, zero extra
    * shuffles. */
  def lengthBandTrim(docs: DataFrame, thresholds: DataFrame,
                     subBits: Int = DefaultSubBits): DataFrame =
    // the length instance of [[valueBandTrim]] — ONE trim kernel, so
    // band semantics (the explicit null-key drop, the bucket-space
    // membership, the broadcast join) cannot drift between the length
    // and generic tiers. Null text → null tokenCount → null rep →
    // dropped by the kernel's rep filter, the old explicit text filter's
    // exact effect.
    valueBandTrim(docs, "source",
      TextOps.tokenCount(col("text")).cast("long"), thresholds, subBits)

  /** One-call tier: fit the band on `docs` itself, then trim. */
  def lengthBandTrim(docs: DataFrame, lowPct: Int,
                     highPct: Int): DataFrame =
    lengthBandTrim(docs, lengthThresholds(docs, lowPct, highPct))

  /** Length-DISTRIBUTION drift between two corpus snapshots — the
    * histogram companion to the token-vocabulary drift audit
    * ([[TextOps.vocabDrift]], q129): vocabDrift says which TOKENS moved,
    * this says whether a source's length SHAPE moved (a scraper that
    * starts truncating, a boilerplate injection, a source-mix shift all
    * show up here before a training metric does). Per source: doc
    * counts of both snapshots and the L1 distance between the two
    * bucket distributions in integer µ-probability units
    * (`p = cnt·10⁶ div n` per bucket; `l1_micro = Σ|p_old − p_new|`,
    * 0..2·10⁶ — twice the total-variation distance). Every number is
    * integer arithmetic over bucket rows, so the report hash-gates
    * exactly.
    *
    * Scale shape: two corpus scans → two bounded sketch frames; the
    * full-outer join, per-source totals, and the L1 rollup all run over
    * ≤1920-row-per-source bucket tables. */
  def lengthDrift(oldDocs: DataFrame, newDocs: DataFrame,
                  subBits: Int = DefaultSubBits): DataFrame =
    driftFromFrames(
      lengthFrame(oldDocs, subBits).withColumnRenamed("cnt", "cnt_old"),
      lengthFrame(newDocs, subBits).withColumnRenamed("cnt", "cnt_new"))

  /** [[lengthDrift]] over pre-built `(source, rep, cnt_old/cnt_new)`
    * frames — [[Pipeline.snapshotCard]] routes here so one scan's bucket
    * frame can feed both the drift and the token rollup. */
  private[operators] def driftFromFrames(o: DataFrame,
                                         n: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
    o.join(n, Seq("source", "rep"), "full_outer")
      .select(col("source"), col("rep"),
        coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
        coalesce(col("cnt_new"), lit(0L)).as("cnt_new"))
      .withColumn("n_old", sum(col("cnt_old")).over(w))
      .withColumn("n_new", sum(col("cnt_new")).over(w))
      .withColumn("p_old", when(col("n_old") === 0, lit(0L))
        .otherwise(expr("(cnt_old * 1000000) div n_old")))
      .withColumn("p_new", when(col("n_new") === 0, lit(0L))
        .otherwise(expr("(cnt_new * 1000000) div n_new")))
      .groupBy(col("source"))
      .agg(max(col("n_old")).as("n_docs_old"),
        max(col("n_new")).as("n_docs_new"),
        count(lit(1)).as("n_buckets"),
        sum(abs(col("p_old") - col("p_new"))).cast("bigint").as("l1_micro"))
  }

  /** Inter-event-gap quantiles per event type — the sketch applied to
    * the behavioral table: per-user consecutive-event gaps (nanosecond
    * longs — the [[Sessionize]] family's integer-time discipline, tie
    * order `(ts, id)` so the predecessor is engine-deterministic), keyed
    * by the LATER event's type, then the same bounded-bucket CDF walk.
    * Answers "what's the p99 latency between a user's events of type X"
    * — the observability question exact percentiles would answer with a
    * corpus-sized sort per type.
    *
    * Scale shape: ONE per-user window pass (the q54 sessionize
    * exchange), then map-side bucket counts; every later operator runs
    * over bounded bucket rows. */
  def eventGapQuantiles(events: DataFrame, userCol: String = "user_id",
                        tsCol: String = "ts", idCol: String = "event_id",
                        typeCol: String = "event_type", subBits: Int = DefaultSubBits,
                        pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gaps = events
      .withColumn("__gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("__gap").isNotNull)
    valueQuantiles(gaps, typeCol, col("__gap"), subBits, pcts,
      nName = "n_gaps")
  }

  /** Persist the per-source histogram sketch at `dir/hist` — the nightly
    * artifact. Count addition is lossless, so the index follows the
    * generation-append discipline: [[appendHistogramIndex]] appends the
    * batch's bucket rows without reading the index (work ∝ batch), and
    * [[readHistogramIndex]] merges generations at read by summing. */
  def buildHistogramIndex(docs: DataFrame, dir: String,
                          subBits: Int = DefaultSubBits): Unit = {
    // a rebuild starts a NEW count history: replay markers from the
    // previous build describe retractions that are no longer in the
    // index, and keeping them would make a later LEGITIMATE forget of
    // the same id set silently skip (r13 ADVICE). Invalidated BEFORE the
    // overwrite: the crash window then leaves old-index-without-markers,
    // whose natural recovery is rerunning this build — the reverse order
    // would leave new-index-with-stale-markers, which IS the bug.
    val markers = new org.apache.hadoop.fs.Path(s"$dir/hist_forget_markers")
    val fs = markers.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(markers))
      require(fs.delete(markers, true),
        s"buildHistogramIndex: could not invalidate stale forget " +
          s"markers at $markers - a rebuild must not inherit them")
    lengthFrame(docs, subBits)
      .write.mode("overwrite").parquet(s"$dir/hist")
  }

  /** Append a batch generation's bucket rows (same `subBits` as the
    * build — a coarser generation would not merge bucket-for-bucket). */
  def appendHistogramIndex(batch: DataFrame, dir: String,
                           subBits: Int = DefaultSubBits): Unit =
    lengthFrame(batch, subBits)
      .write.mode("append").parquet(s"$dir/hist")

  /** Retract removed docs from the index by appending NEGATIVE-count
    * generation rows — the property that distinguishes count sketches
    * from the KMV family: counts form a GROUP (subtraction exists), a
    * bottom-k set only a monoid (an insert cannot be undone), so the
    * histogram index supports work-∝-batch deletion maintenance where
    * the sketch index (q157) must rebuild. After a retract,
    * build ∪ appends ∪ retracts ≡ a survivor-only full run EXACTLY —
    * the read-time sum cancels the removed docs' buckets (a bucket
    * reaching zero drops out of the report entirely, including from
    * `n_buckets`).
    *
    * This is ACCURACY maintenance, not a GDPR surface: the index stores
    * only `(source, rep, cnt)` — no doc ids — so `Forget.forget`'s
    * audit has nothing to prove here; what a deletion batch must fix is
    * the survivors' length statistics, which is exactly this append.
    * Callers pass the REMOVED docs (their text is in hand in a deletion
    * batch — the same frame that feeds the id-keyed index prunes). */
  def retractHistogramIndex(removed: DataFrame, dir: String,
                            subBits: Int = DefaultSubBits): Unit =
    lengthFrame(removed, subBits)
      .select(col("source"), col("rep"), (-col("cnt")).as("cnt"))
      .write.mode("append").parquet(s"$dir/hist")

  /** Current per-source quantile report from the persisted index:
    * generations merged by count addition (retraction rows subtract;
    * fully-cancelled buckets drop out), then the same summary.
    *
    * Guard scope — what the negative-count check does and does NOT
    * catch: a bucket whose merged count goes NET-NEGATIVE (a retraction
    * exceeding what was ever built) fails loudly, because letting it
    * through would corrupt every downstream quantile (the cum walk
    * subtracts). But a retraction of never-built docs whose buckets
    * ALSO hold live docs stays net-positive and passes silently —
    * counts are anonymous, so the index cannot tell "retracted a ghost"
    * from "retracted a twin". The exactness contract therefore lives at
    * the WRITE side: retract only docs previously built/appended
    * ([[graft.Forget.forget]]'s histogram leg enforces
    * removedDocs ⊆ delete list for exactly this reason). Callers
    * wanting belt-and-braces read-time strictness can diff a batch's
    * per-bucket counts against the merged index (cnt ≤ merged) before
    * retracting. */
  def readHistogramIndex(spark: SparkSession, dir: String,
                         pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    quantileSummary(
      spark.read.parquet(s"$dir/hist")
        .groupBy(col("source"), col("rep"))
        .agg(sum(col("cnt")).as("cnt"))
        .withColumn("cnt", when(col("cnt") < 0,
            expr("raise_error(CONCAT('readHistogramIndex: bucket (', source, " +
              "', ', rep, ') has negative merged count ', cnt, " +
              "' - a retraction exceeded what was built'))").cast("long"))
          .otherwise(col("cnt")))
        .filter(col("cnt") =!= 0), "source", pcts)

  /** Consolidate the index's generation history into ONE generation —
    * the maintenance leg the append-forever discipline needs: nightly
    * [[appendHistogramIndex]]s plus retractions accumulate parquet
    * generations without bound, and [[readHistogramIndex]] re-merges ALL
    * of them on every read (a year of nightly appends makes every
    * quantile read scan ~365 generations for a ≤1920-row answer).
    * Count addition is associative, so summing the generations down to
    * one row per live (source, rep) bucket — net-zero (fully-retracted)
    * buckets dropped — is LOSSLESS: read-before ≡ read-after exactly.
    * Runs as the crash-safe staged rename-aside rewrite
    * ([[graft.operators.Pipeline]]'s `stagedRewrite` discipline): the
    * index is never unreadable, and a rerun self-heals residue.
    *
    * Marker semantics (the forget-replay contract): applied retractions
    * are IN the consolidated counts, so the per-(dir, idSet) replay
    * markers at `hist_forget_markers/` MUST survive consolidation —
    * they live beside `hist/`, not inside it, and this rewrite touches
    * only `hist/`. Replaying an already-applied forget after a
    * consolidation therefore still skips, exactly as before. (A full
    * REBUILD is the opposite case: [[buildHistogramIndex]] invalidates
    * the markers, because a fresh build contains no retractions.)
    *
    * The same net-negative guard as the read applies: a bucket whose
    * merged count is negative means a retraction exceeded what was ever
    * built, and consolidating it would bake the corruption into the
    * single surviving generation — refused loudly instead. */
  def consolidateHistogramIndex(spark: SparkSession, dir: String): Unit =
    Pipeline.stagedRewrite(spark, s"$dir/hist", "consolidate") { df =>
      df.groupBy(col("source"), col("rep"))
        .agg(sum(col("cnt")).as("cnt"))
        .withColumn("cnt", when(col("cnt") < 0,
            expr("raise_error(CONCAT('consolidateHistogramIndex: bucket (', " +
              "source, ', ', rep, ') has negative merged count ', cnt, " +
              "' - a retraction exceeded what was built; refusing to " +
              "bake the corruption into the consolidated generation'))")
              .cast("long"))
          .otherwise(col("cnt")))
        .filter(col("cnt") =!= 0)
        // bounded rows (|sources| × buckets) → ONE file: the
        // consolidation's whole point is collapsing file pressure, and
        // Maintain's auto-cadence optimum counts on the post-rewrite
        // floor being the leaf-dir count, not shuffle.partitions
        .coalesce(1)
    }

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

  /** Build-once memo for the q162 harness: full-corpus build, then a
    * deletion batch (doc_id % 13 = 0) retracted — the oracle is the
    * survivor-only full run. */
  private def cachedRetractedIndex(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-hist-retract", d) { dir =>
      val docs = Tables.documents(s, d)
      buildHistogramIndex(docs, dir)
      retractHistogramIndex(docs.filter(col("doc_id") % 13 === 0), dir)
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
      Some(quantileOracle)),

    // Generic-value tier on the behavioral table (r12): per-user
    // consecutive-event gaps in integer nanos, keyed by the later
    // event's type — the p99-latency observability question through the
    // same bounded-bucket CDF walk, hash-gated end to end.
    QuerySpec(
      "q163_event_gap_quantiles",
      (s, d) => eventGapQuantiles(Tables.events(s, d))
        .orderBy(col("event_type")),
      Some("""
        WITH g AS (
          SELECT event_type,
                 epoch_ns(ts) - LAG(epoch_ns(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
                   AS gap
          FROM events),
        v AS (SELECT event_type, CAST(gap AS BIGINT) AS v FROM g
              WHERE gap IS NOT NULL),
        b AS (
          SELECT event_type,
                 (v >> greatest(0, length(bin(v)) - 1 - 5))
                   << greatest(0, length(bin(v)) - 1 - 5) AS rep
          FROM v),
        gr AS (SELECT event_type, rep, COUNT(*) AS cnt FROM b
               GROUP BY event_type, rep),
        c AS (
          SELECT event_type, rep,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY rep) AS cum,
                 SUM(cnt) OVER (PARTITION BY event_type) AS n
          FROM gr)
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_gaps,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN rep END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN rep END) AS BIGINT) AS p90,
               CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN rep END) AS BIGINT) AS p99
        FROM c GROUP BY event_type ORDER BY event_type""")),

    // Retraction maintenance (r12): full-corpus build, a deletion
    // batch's buckets retracted as NEGATIVE generation rows, read-time
    // sum cancels them — the oracle is the survivor-only full run, so
    // the hash gate proves the group-algebra identity (the operation
    // the monoid-only KMV index cannot support).
    QuerySpec(
      "q162_length_quantiles_retract",
      (s, d) => readHistogramIndex(s, cachedRetractedIndex(s, d))
        .orderBy(col("source")),
      Some("""
        WITH v AS (
          SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
          FROM documents WHERE text IS NOT NULL AND doc_id % 13 <> 0),
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
        FROM c GROUP BY source ORDER BY source""")),

    // Sketch-driven length-band trim (r12): the curation step the
    // quantile report drives — per-source [p5, p99] bucket band fitted
    // from the sketch, docs kept by BUCKET membership (integer space, so
    // the kept count hash-gates). The report row gates the trim operator
    // itself: n_kept is counted from lengthBandTrim's actual output.
    QuerySpec(
      "q160_length_band_trim",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val thr = lengthThresholds(docs, lowPct = 5, highPct = 99)
        val kept = lengthBandTrim(docs, thr)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        thr.join(kept, Seq("source"), "left_outer")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            col("lo_rep"), col("hi_rep"))
          .orderBy(col("source"))
      },
      Some("""
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
                 SUM(cnt) OVER (PARTITION BY source) AS n
          FROM g),
        t AS (
          SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
                 CAST(MIN(CASE WHEN cum >= (n * 5 + 99) // 100 THEN rep END) AS BIGINT) AS lo_rep,
                 CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN rep END) AS BIGINT) AS hi_rep
          FROM c GROUP BY source)
        SELECT b.source, MAX(t.n_docs) AS n_docs,
               CAST(SUM(CASE WHEN b.rep BETWEEN t.lo_rep AND t.hi_rep
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               MAX(t.lo_rep) AS lo_rep, MAX(t.hi_rep) AS hi_rep
        FROM b JOIN t USING (source)
        GROUP BY b.source ORDER BY b.source""")),

    // Length-distribution drift (r12): the histogram companion to q129's
    // vocab drift, on the same q107 snapshot pair — the " v2" suffix adds
    // one token to every %5 doc and the differing %7/%11 memberships
    // shift the per-source length shape; the L1 distance between bucket
    // distributions in integer µ-probability units hash-gates exactly.
    QuerySpec(
      "q161_length_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        lengthDrift(oldSnap, newSnap).orderBy(col("source"))
      },
      Some("""
        WITH ov AS (
          SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
          FROM documents WHERE doc_id % 7 <> 0 AND text IS NOT NULL),
        nv AS (
          SELECT source, CAST(len(string_split(
                   CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END,
                   ' ')) AS BIGINT) AS v
          FROM documents WHERE doc_id % 11 <> 0 AND text IS NOT NULL),
        ob AS (SELECT source,
                      (v >> greatest(0, length(bin(v)) - 1 - 5))
                        << greatest(0, length(bin(v)) - 1 - 5) AS rep
               FROM ov),
        nb AS (SELECT source,
                      (v >> greatest(0, length(bin(v)) - 1 - 5))
                        << greatest(0, length(bin(v)) - 1 - 5) AS rep
               FROM nv),
        og AS (SELECT source, rep, COUNT(*) AS cnt_old FROM ob GROUP BY source, rep),
        ng AS (SELECT source, rep, COUNT(*) AS cnt_new FROM nb GROUP BY source, rep),
        j AS (
          SELECT source, rep,
                 CAST(COALESCE(cnt_old, 0) AS BIGINT) AS cnt_old,
                 CAST(COALESCE(cnt_new, 0) AS BIGINT) AS cnt_new
          FROM og FULL OUTER JOIN ng USING (source, rep)),
        p AS (
          SELECT source, cnt_old, cnt_new,
                 SUM(cnt_old) OVER (PARTITION BY source) AS n_old,
                 SUM(cnt_new) OVER (PARTITION BY source) AS n_new
          FROM j)
        SELECT source,
               CAST(MAX(n_old) AS BIGINT) AS n_docs_old,
               CAST(MAX(n_new) AS BIGINT) AS n_docs_new,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(ABS(
                 (CASE WHEN n_old = 0 THEN 0 ELSE (cnt_old * 1000000) // n_old END)
                 - (CASE WHEN n_new = 0 THEN 0 ELSE (cnt_new * 1000000) // n_new END)
               )) AS BIGINT) AS l1_micro
        FROM p GROUP BY source ORDER BY source""")))
}
