package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.queries.QuerySpec

/** Deduplication operators for a training-data pipeline (north star).
  *
  * Scale design (100 TB):
  *  - Exact dedup is a hash `groupBy` on a content digest — one shuffle on
  *    the digest, never on the full text (`xxhash64(text)` travels, the
  *    document body does not need to).
  *  - Near-dup candidate generation is MinHash + LSH banding: shuffle key is
  *    the (band_id, band_hash) bucket, so each comparison group is tiny and
  *    the O(n²) all-pairs comparison is avoided. Exact Jaccard verification
  *    then runs only inside candidate buckets.
  *  - The exact token-Jaccard pair join (used as the correctness oracle) is
  *    an inverted-index self-join on rare tokens — the scalable exact
  *    formulation — not a cross join.
  *  - SimHash is a 64-bit fingerprint; near-dups are found by hamming
  *    distance over rotated-band buckets, same bucketing idea as LSH.
  */
object Dedup {

  /** Distinct whitespace tokens per doc. */
  private def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Prospective skew cap on a candidate key WITHOUT a window: rows whose
    * `keys` group exceeds `maxN` are dropped before any candidate
    * self-join, with the group sizes computed by a map-side-combined
    * `groupBy(keys).count()` (only (keys, count) rows shuffle) and the
    * over-cap key set — bounded by |rows|/maxN, in practice the handful of
    * degenerate buckets the cap exists for — broadcast into an anti-join.
    * A `count(*).over(Window.partitionBy(keys))` formulation has the same
    * semantics but materializes each key's FULL partition on one task's
    * sorter before the filter discards it — a boilerplate LSH bucket or
    * CDC chunk digest shared by 10⁸ docs would put 10⁸ rows through a
    * single task only to be thrown away, precisely the mega-bucket the cap
    * is meant to neutralize (the [[cappedAssignment]] doctrine, applied
    * family-wide). The raw rows are checkpointed because both the count
    * aggregate and the anti-join's left input read them — and every caller
    * then feeds two self-join sides, which replay only the cheap broadcast
    * anti-join against the stored blocks, never the upstream
    * banding/signature scan.
    *
    * Null-keyed rows are dropped outright: equality self-joins downstream
    * can never match them (so pair output is identical), and letting them
    * through uncapped — `left_anti` never matches null keys — would store
    * a degenerate uncapped null bucket in every persisted band index.
    *
    * The over-cap key set is bounded by |rows|/maxN — in practice the
    * handful of degenerate buckets the cap exists for — but a
    * pathological corpus (10¹⁰ band rows at cap 256 → ~40M keys) would
    * make a FORCED broadcast driver-sized. The guard that counts the
    * key set and falls back to a shuffled anti-join is CONF-SWITCHED
    * (`spark.graft.capByKey.guardBroadcast` = true, key limit
    * `spark.graft.capByKey.broadcastKeyLimit`, default 1M) rather than
    * always-on: the deciding count is an extra blocking job per call,
    * measured 10-30% of several capped queries' bench time, while the
    * un-guarded failure mode is Spark's own LOUD
    * cannot-broadcast-over-8GB error — a 100 TB deployment flips the
    * conf once; small runs don't pay the tax.
    *
    * Fault-tolerance note: `localCheckpoint` blocks are NON-REPLICATED —
    * an executor loss fails the job instead of recomputing lineage (fine
    * at local[32]). At cluster scale set
    * `spark.graft.capByKey.storage=persist` and the kernel stores its
    * cut with `persist(MEMORY_AND_DISK)` KEEPING lineage, so a lost
    * executor recomputes only its partitions — the conf-switchable
    * reliable path (see PLANS.md "localCheckpoint trade" for the full
    * menu).
    *
    * Persist-path LIFECYCLE: the kernel deliberately does NOT unpersist
    * its cut — the returned DataFrame's two self-join sides read the
    * stored blocks lazily, and the kernel cannot know when the caller's
    * last action over them has run (an eager unpersist here would
    * re-run the upstream banding scan per join side, the exact
    * double-compute the cut exists to prevent). The blocks are
    * MEMORY_AND_DISK and therefore LRU-EVICTABLE — safe-by-default in a
    * job-per-run deployment where the session exits. A LONG-LIVED
    * session (notebook, Thrift server) accumulates one cut per capped
    * call until eviction; release them between queries the way
    * graft.Bench does after each measurement:
    * `spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist())`
    * once the query's outputs are materialized (same rule for the
    * localCheckpoint default — Bench drops those blocks too).
    */
  private[graft] def capByKey(rows: DataFrame, keys: Seq[String],
                              maxN: Int): DataFrame = {
    val conf = rows.sparkSession.conf
    val guard = conf.getOption("spark.graft.capByKey.guardBroadcast")
      .exists(_.toBoolean)
    val cut = (df: DataFrame) =>
      if (conf.getOption("spark.graft.capByKey.storage").contains("persist"))
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df.localCheckpoint(false)
    val raw = cut(rows.filter(keys.map(col(_).isNotNull).reduce(_ && _)))
    val overCap = raw.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxN)
      .select(keys.map(col): _*)
    if (!guard) raw.join(broadcast(overCap), keys, "left_anti")
    else {
      val limit = conf.getOption("spark.graft.capByKey.broadcastKeyLimit")
        .map(_.toLong).getOrElse(1000000L)
      // read by the deciding count AND the anti-join build; the cut goes
      // through the same storage conf as `raw` — the guard path is the
      // 100 TB configuration, exactly where storage=persist must hold
      val stored = cut(overCap)
      if (stored.count() <= limit)
        raw.join(broadcast(stored), keys, "left_anti")
      else raw.join(stored, keys, "left_anti")
    }
  }

  // ---------------------------------------------------------------------
  // Exact dedup

  /** Keep the lowest doc_id per exact text digest. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol)), col(textCol)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Compact digest index of a corpus: one distinct 128-bit md5 per
    * (normalized) document text. This is the artifact an INCREMENTAL
    * ingest pipeline persists — at 100 TB the corpus itself is never
    * rescanned for dedup; each day's batch joins this narrow index
    * (16 bytes/doc vs the full text).
    *
    * @param normalize content canonicalization applied before digesting
    *        (lowercase, whitespace collapse, prefix truncation, …) —
    *        exact dedup in production is always "exact after
    *        normalization".
    */
  def digestIndex(docs: DataFrame, textCol: String = "text",
                  normalize: Column => Column = identity): DataFrame =
    docs.select(md5(normalize(col(textCol))).as("digest")).distinct()

  /** Per-source KMV (k-minimum-values) DISTINCT-CONTENT sketch — the
    * constant-memory answer to "how many distinct documents does each
    * source really have" at a scale where `countDistinct` per group is
    * exact but the full digest sets can't leave the executors for any
    * DOWNSTREAM reuse (overlap estimation, sketch unions across
    * snapshots). Each source's sketch is the k smallest distinct 60-bit
    * content-hash values (`sortedDistinct.take(k)` exactly — the
    * [[graft.functions.BottomKAggregator]] invariant), from which the
    * standard KMV estimator `(k-1)·2^60 / h_(k)` reads the distinct
    * count; a sketch that never filled is itself the exact count.
    *
    * Scale design: the typed Aggregator bounds the partial-aggregation
    * buffer at k longs per (task, source) — `collect_set`'s buffer grows
    * with corpus cardinality, this one never does, and the shuffle
    * carries ≤ partitions × k longs per source. The 60-bit hash is the
    * md5 hex prefix (uniform, engine-portable — the oracle replays it),
    * and the estimator product routes through DECIMAL(38,0) so the
    * division is exact integer arithmetic in both engines.
    */
  def sourceSketches(docs: DataFrame, k: Int = 256,
                     textCol: String = "text"): DataFrame = {
    require(k >= 2, s"sourceSketches: k must be >= 2, got $k")
    sketchSummary(kmvFrame(docs, k, textCol, identity), k)
  }

  /** The 60-bit content hash every sketch consumer shares (md5 hex
    * prefix — uniform, engine-portable, non-negative): ONE definition,
    * so the streaming twin reproduces the batch sketches exactly. */
  private[graft] def kmvHash(text: Column): Column =
    // ≡ conv(substring(md5(text), 1, 15), 16, 10) — digest-byte kernel,
    // no hex round-trip (r18; graft.functions.Md5Prefix), same values
    graft.functions.HashFunctions.md5_prefix(text, 15)

  /** `(source, kmv)` sketch frame — shared by [[sourceSketches]],
    * [[sketchOverlap]], and the persisted index family. */
  private def kmvFrame(docs: DataFrame, k: Int, textCol: String,
                       normalize: Column => Column): DataFrame = {
    val bottomK = udaf(new graft.functions.BottomKAggregator(k))
    docs.select(col("source"),
        kmvHash(normalize(col(textCol))).as("__h"))
      // a null text has no content hash and must contribute NOTHING: the
      // typed Aggregator's primitive Long input would silently unbox a
      // null hash to 0, injecting a phantom minimum into the sketch
      // (caught by the streaming-twin parity gate)
      .filter(col("__h").isNotNull)
      .groupBy(col("source"))
      .agg(bottomK(col("__h")).as("kmv"))
  }

  /** The reporting projection over a `(source, kmv)` frame: sketch
    * size, KMV distinct estimate, csv'd sketch. */
  private def sketchSummary(sk: DataFrame, k: Int): DataFrame =
    sk.select(col("source"),
      size(col("kmv")).cast("bigint").as("n_kmv"),
      when(size(col("kmv")) < k, size(col("kmv")).cast("long"))
        .otherwise(expr(
          s"CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976" +
            s" div element_at(kmv, $k)").cast("long"))
        .as("est_distinct"),
      // csv, not an array: the engine-portable hash-gate discipline
      array_join(transform(col("kmv"), v => v.cast("string")), ",")
        .as("kmv_csv"))

  /** Persist the per-source KMV sketches at `dir/sketches` — the
    * nightly sketch artifact. KMV sketches are EXACTLY mergeable
    * (bottom-k of a union ≡ bottom-k of the union of bottom-k
    * sketches), so the index follows the generation-append discipline
    * of the whole incremental family: [[appendSketchIndex]] appends the
    * batch's sketch rows (crash-safe append-only parquet — nothing
    * rewritten), and [[readSketchIndex]] merges generations at read.
    * Unlike the dedup indexes, the merge is LOSSLESS by algebra, so
    * build ∪ increments ≡ a full-corpus run EXACTLY — the q157 oracle
    * is literally the full-run oracle.
    *
    * Every persisted generation carries its build width as a constant
    * `build_k` column — metadata that travels WITH the rows (a sidecar
    * file would not survive a partial dir copy), so the maintenance
    * legs can derive the width the index was BUILT at rather than
    * infer it from sketch lengths. The distinction matters exactly when
    * no source ever filled its sketch: observed lengths then understate
    * the build width, and a narrower consolidation would be exact on
    * the rows it reads yet truncate the cross-generation UNION a
    * build-width read is entitled to see. */
  def buildSketchIndex(docs: DataFrame, dir: String, k: Int = 64,
                       textCol: String = "text"): Unit =
    kmvFrame(docs, k, textCol, identity)
      .withColumn("build_k", lit(k))
      .write.mode("overwrite").parquet(s"$dir/sketches")

  /** Append a batch generation's sketches (same `k` as the build — a
    * generation sketched coarser than the read k would break the merge
    * algebra). Work ∝ batch: the existing index is not read. */
  def appendSketchIndex(batch: DataFrame, dir: String, k: Int = 64,
                        textCol: String = "text"): Unit =
    kmvFrame(batch, k, textCol, identity)
      .withColumn("build_k", lit(k))
      .write.mode("append").parquet(s"$dir/sketches")

  /** Merge the index's generations to current per-source sketches and
    * report them ([[sourceSketches]]' row shape). The merge is the
    * exact bottom-k of the union of generation sketches — one
    * |sources|-keyed aggregation over k-long arrays. */
  def readSketchIndex(spark: SparkSession, dir: String,
                      k: Int = 64): DataFrame = {
    require(k >= 2, s"readSketchIndex: k must be >= 2, got $k")
    sketchSummary(mergedSketches(spark, dir, k), k)
  }

  /** Current per-source sketches: generations merged by the exact
    * bottom-k-of-union algebra. */
  private def mergedSketches(spark: SparkSession, dir: String,
                             k: Int): DataFrame =
    mergeKmvGenerations(spark.read.parquet(s"$dir/sketches"), k)

  /** The one definition of the KMV generation merge — shared by the
    * read path and [[consolidateSketchIndex]] so the two cannot drift
    * on what "current sketch" means. */
  private def mergeKmvGenerations(gens: DataFrame, k: Int): DataFrame =
    gens.groupBy(col("source"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
        1, k).as("kmv"))

  /** Consolidate the sketch index's generation history into ONE row per
    * source — the KMV twin of
    * [[graft.operators.HistogramSketch.consolidateHistogramIndex]]:
    * nightly [[appendSketchIndex]]s accumulate parquet generations
    * without bound and [[readSketchIndex]] re-merges ALL of them on
    * every read. The merge is LOSSLESS by the bottom-k monoid law —
    * `bottomK(bottomK(A) ∪ B) = bottomK(A ∪ B)` — so read-before ≡
    * read-after EXACTLY, and generations appended AFTER a consolidation
    * still merge exactly (the homomorphism property, suite-pinned).
    * Staged rename-aside rewrite: the index is never unreadable.
    *
    * The stated `k` contract (must be ≥ the largest k any read uses) is
    * ENFORCED BY DERIVATION, not trusted: the effective merge width is
    * `max(k, persisted build_k, longest sketch in the index)` — a
    * caller (or [[graft.Maintain.maintain]]'s default) passing a k
    * smaller than the build's cannot silently truncate minima that
    * larger-k reads need. The PERSISTED width is the load-bearing term:
    * observed sketch lengths alone are NOT a safe bound, because an
    * index whose generations never individually filled build-k
    * (observed max < build k) can still hold a cross-generation UNION
    * wider than any single sketch — a length-derived width would merge
    * exactly over the rows it reads yet drop union minima a
    * build-width read saw before the consolidation (the r14 hole,
    * DedupGuardSuite's unfilled-generations case). Legacy indexes
    * written before the metadata column fall back to the length
    * derivation. One extra bounded scan over the rows the rewrite
    * reads anyway. Unlike the histogram index there are no forget
    * markers to manage: the KMV deletion posture is the survivor
    * REBUILD ([[graft.Forget.forget]]'s `kmvSurvivors` leg), which
    * overwrites the whole history anyway. */
  def consolidateSketchIndex(spark: SparkSession, dir: String,
                             k: Int = 64): Unit = {
    require(k >= 2, s"consolidateSketchIndex: k must be >= 2, got $k")
    Pipeline.stagedRewrite(spark, s"$dir/sketches", "consolidate") { df =>
      val eff = effectiveKmvWidth(spark, s"$dir/sketches", df, k)
      mergeKmvGenerations(df, eff).withColumn("build_k", lit(eff))
        // |sources| rows → ONE file (the compaction's point; Maintain's
        // auto-cadence floor counts on it)
        .coalesce(1)
    }
  }

  /** The one definition of the maintenance width: `max(asked, persisted
    * build_k, observed sketch length)` — shared by
    * [[consolidateSketchIndex]] and [[rebuildSketchIndex]] so the two
    * legs cannot disagree on what width the index must keep. The
    * metadata read re-opens the dir with `mergeSchema` FORCED: an index
    * holding pre-metadata generations next to r15 ones has MIXED
    * footers, and a plain read may resolve the legacy schema (no
    * build_k column) — silently re-opening the unfilled-generation
    * truncation hole on exactly the indexes mid-migration. One bounded
    * extra read of rows the rewrite reads anyway. */
  private def effectiveKmvWidth(spark: SparkSession, sketchesDir: String,
                                df: DataFrame, asked: Int): Int = {
    val meta = spark.read.option("mergeSchema", "true").parquet(sketchesDir)
    val persisted =
      if (meta.columns.contains("build_k"))
        meta.agg(coalesce(max(col("build_k")), lit(0))).head().getInt(0)
      else 0
    val observed = df.agg(coalesce(max(size(col("kmv"))), lit(0)))
      .head().getInt(0)
    Seq(asked, persisted, observed).max
  }

  /** Crash-safe SURVIVOR REBUILD of the sketch index — the deletion-
    * accuracy maintenance the bottom-k monoid prescribes
    * ([[graft.Forget.forget]]'s `kmvSurvivors` leg routes here): a
    * plain `buildSketchIndex` overwrite deletes the live `sketches/`
    * before the job commits, so a mid-job crash leaves the index
    * missing — on the GDPR path, exactly where an unreadable index
    * hurts most. This variant computes the survivors' sketches into the
    * staged rename-aside swap instead (the consolidation discipline):
    * the index is never unreadable and a rerun self-heals residue.
    * The effective k is `max(k, persisted build_k, longest sketch in
    * the index being replaced)` — [[effectiveKmvWidth]], the same
    * derivation as [[consolidateSketchIndex]], so a default-k call
    * cannot silently downgrade an index built wider even when no
    * generation ever filled its sketch. */
  def rebuildSketchIndex(survivors: DataFrame, dir: String, k: Int = 64,
                         textCol: String = "text"): Unit = {
    require(k >= 2, s"rebuildSketchIndex: k must be >= 2, got $k")
    Pipeline.stagedRewrite(survivors.sparkSession, s"$dir/sketches",
        "rebuild") { existing =>
      val eff = effectiveKmvWidth(survivors.sparkSession, s"$dir/sketches",
        existing, k)
      kmvFrame(survivors, eff, textCol, identity)
        .withColumn("build_k", lit(eff))
        .coalesce(1)
    }
  }

  /** Cross-source overlap ESTIMATED from the KMV sketches — the
    * 100 TB tier of [[crossSourceOverlap]]'s exact digest matrix: the
    * exact tier joins every pair of sources on their full digest sets
    * (fine nightly, quadratic in stored digests), this one compares
    * k-long sketches. For each source pair the classic min-wise
    * resemblance estimator: merge the two sketches, keep the k smallest
    * of the union, count how many of those k lie in BOTH sketches —
    * that fraction estimates Jaccard(A, B) with error O(1/√k),
    * because the bottom-k of h(A ∪ B) is a uniform sample of the union
    * under a uniform hash. Emits `est_jaccard_micro` as an exact
    * integer (count·10⁶ div denominator) so the gate is engine-portable
    * with zero float-rounding ambiguity; when the union sketch never
    * fills, the estimate is exact.
    *
    * Scale shape: [[sourceSketches]]' bounded aggregation, then a
    * |sources|² self-join of k-long arrays — thousands of sources make
    * millions of cheap array rows, never touching the corpus again.
    */
  def sketchOverlap(docs: DataFrame, k: Int = 64,
                    textCol: String = "text",
                    normalize: Column => Column = identity): DataFrame = {
    require(k >= 2, s"sketchOverlap: k must be >= 2, got $k")
    pairResemblance(kmvFrame(docs, k, textCol, normalize), k)
  }

  /** [[sketchOverlap]] served FROM the persisted sketch index — the
    * nightly use: the overlap matrix refreshes from the k-long merged
    * sketches without re-reading a byte of corpus. Same estimator, same
    * exact-integer output. */
  def sketchIndexOverlap(spark: SparkSession, dir: String,
                         k: Int = 64): DataFrame = {
    require(k >= 2, s"sketchIndexOverlap: k must be >= 2, got $k")
    pairResemblance(mergedSketches(spark, dir, k), k)
  }

  /** Distinct-content DRIFT between two sketch-index snapshots — the
    * dedup-governance delta completing the drift family (q161 length
    * drift, q178 contamination drift): per source, the KMV
    * distinct-content estimate at the last audit vs now. A source whose
    * estimate barely moves while its row count doubles is ingesting
    * duplicates; one whose estimate jumps is genuinely new content —
    * the signal that decides which sources deserve a dedup pass before
    * the next training cut. Diffs in exact integers (the estimates are
    * already exact-DECIMAL divisions, so the delta hash-gates); a
    * source absent from a snapshot is zero distinct content, surfacing
    * new/retired sources at full magnitude.
    *
    * Scale shape: two index reads (each ≤ generations × |sources| rows
    * of k-long arrays — never the corpus) and a |sources|-row diff
    * join. */
  def sketchIndexDrift(spark: SparkSession, dirOld: String, dirNew: String,
                       k: Int = 64): DataFrame = {
    val old = readSketchIndex(spark, dirOld, k)
      .select(col("source"), col("est_distinct").as("est_old"))
    val nw = readSketchIndex(spark, dirNew, k)
      .select(col("source"), col("est_distinct").as("est_new"))
    old.join(nw, Seq("source"), "full_outer")
      .na.fill(0L, Seq("est_old", "est_new"))
      .withColumn("delta_est", col("est_new") - col("est_old"))
  }

  /** The min-wise resemblance pair join over a `(source, kmv)` frame. */
  private def pairResemblance(sketches: DataFrame, k: Int): DataFrame = {
    val sk = sketches
      .localCheckpoint(false) // |sources| rows; both self-join sides
    sk.alias("a").join(sk.alias("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.kmv").as("__ka"), col("b.kmv").as("__kb"))
      .withColumn("__m",
        expr(s"slice(array_sort(array_union(__ka, __kb)), 1, $k)"))
      .withColumn("__inter", expr(
        "size(filter(__m, v -> array_contains(__ka, v)" +
          " AND array_contains(__kb, v)))"))
      .select(col("src_a"), col("src_b"),
        col("__inter").cast("bigint").as("n_shared_sketch"),
        expr(s"CAST(CAST(__inter AS DECIMAL(38,0)) * 1000000" +
          s" div least($k, size(__m)) AS BIGINT)").as("est_jaccard_micro"))
  }

  /** Incremental exact dedup: drop incoming docs whose (normalized)
    * digest already exists in `existingIndex`, then keep the lowest id
    * per digest within the batch — the daily-ingest counterpart of
    * [[exact]] (and the batch analogue of
    * [[graft.streaming.StreamingDedup]]'s stateful index).
    *
    * Scale design: one hash join keyed on the digest (the incoming batch
    * is small relative to the corpus, so it broadcasts when it fits;
    * either way the 100 TB corpus contributes only its 16-byte digests),
    * plus one keyed window over the batch. md5 is 128-bit: a false
    * cross-doc collision needs ~2^64 docs, so digest equality IS
    * (normalized) content equality at any realistic corpus size — and
    * both engines of the oracle gate compute the same md5.
    */
  def exactIncremental(incoming: DataFrame, existingIndex: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       normalize: Column => Column = identity): DataFrame = {
    val withDigest = incoming.withColumn("__digest", md5(normalize(col(textCol))))
    val fresh = withDigest.join(
      existingIndex.select(col("digest").as("__digest")),
      Seq("__digest"), "left_anti")
    val w = Window.partitionBy(col("__digest")).orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__digest")
  }

  // ---------------------------------------------------------------------
  // Exact n-gram (token-set) Jaccard via inverted-index self-join

  /** All pairs (a < b) within the same blocking key whose token-set
    * Jaccard ≥ threshold. Exact within blocks: pairs are generated only
    * for docs sharing ≥1 token (inverted index), and the per-pair
    * intersection size comes from the join group count — no per-pair
    * array intersection.
    *
    * Blocking (here: the `source` column) is the standard exact-dedup
    * scale lever — cross-block comparisons are declared out of scope, the
    * way a 100 TB pipeline shards dedup by crawl/snapshot/domain. Without
    * it, a corpus whose docs share a small vocabulary degenerates to an
    * all-pairs join (observed: ~600M joined rows at sf0.1).
    */
  /** @param maxTokenDf skew guard: tokens appearing in more than this many
    *        docs of one block are excluded from CANDIDATE GENERATION (each
    *        such token alone contributes O(df²) joined rows — one stop-word
    *        inside a block is the all-pairs meltdown this operator exists
    *        to avoid). Verification then recomputes the EXACT Jaccard from
    *        the full token sets, so capped tokens still count toward the
    *        score of every surviving pair. Bound on the loss: only a pair
    *        whose every shared token exceeds the cap can be missed — at
    *        threshold ≥ 0.5 that is a pair built almost entirely of
    *        block-wide stopwords, which is not a meaningful near-dup.
    *        `Int.MaxValue` = exact mode: candidate recall is complete and
    *        the result equals the all-pairs Jaccard (this is what
    *        oracle-gated specs use, since capped recall is data-dependent).
    *        Exact mode is a single inverted-index join + one aggregation
    *        with a length filter; see also [[jaccardPairsPrefix]] for the
    *        prefix-filtered formulation that wins on Zipf vocabularies.
    */
  /** Candidate self-join input, re-keyed through an exact integer
    * dictionary when the (block, token) vocabulary is small enough to
    * broadcast: the inverted-index join then probes on one long instead
    * of hashing/comparing token strings per candidate row — measured 4×
    * faster on the synthetic corpus (sf0.1: 4.3 s → 1.0 s for the same
    * 6.3M candidate rows), bit-identical output (the dictionary is a
    * bijection). Vocabulary size is estimated with one HLL aggregation
    * (map-side sketches, no data-sized shuffle); above the cap — the
    * 100 TB web-corpus regime, where a dictionary would not broadcast —
    * the string-keyed join is kept unchanged. The dictionary id is
    * assigned by `row_number` over a canonical order (NOT
    * `monotonically_increasing_id`: the self-join evaluates the dict
    * plan twice, and nondeterministic ids would diverge between sides).
    */
  private val DictVocabCap = 1 << 20 // ~50 MB broadcast; one-task window stays trivial
  private def dictKeyed(idx: DataFrame): (DataFrame, DataFrame, Column) = {
    val vocabEst = idx.agg(
      approx_count_distinct(struct(col("blk"), col("tok"))).as("v"))
      .head.getLong(0)
    if (vocabEst <= DictVocabCap) {
      val dict = idx.select(col("blk"), col("tok")).distinct()
        .withColumn("__jk",
          row_number().over(Window.orderBy(col("blk"), col("tok"))).cast("long"))
      val keyed = idx.join(broadcast(dict), Seq("blk", "tok")).drop("blk", "tok")
      (keyed.as("a"), keyed.as("b"), col("a.__jk") === col("b.__jk"))
    } else
      (idx.as("a"), idx.as("b"),
        col("a.blk") === col("b.blk") && col("a.tok") === col("b.tok"))
  }

  def jaccardPairs(docs: DataFrame, threshold: Double,
                   blockCol: String = "source", maxTokenDf: Int = 1000): DataFrame = {
    // The token-set scan is the expensive leaf and every downstream
    // subtree re-derives it — capped mode ~6 times (df agg, anti-join,
    // hot-per-doc, sizes, both self-join sides), exact mode ≥3 (vocab
    // estimate, dictionary, keyed index). A lazy local checkpoint runs
    // the scan+tokenize ONCE and serves the rest from stored blocks;
    // arrays are stored (not the exploded stream) so the block footprint
    // stays ~text-sized. Same trade as the minhashLsh signature
    // checkpoint; cluster-scale note there applies.
    val sets = docs.select(col("doc_id"), col(blockCol).as("blk"),
      tokenSet(col("text")).as("toks"))
      .localCheckpoint(false)
    val toks = sets.select(col("doc_id"), col("blk"), explode(col("toks")).as("tok"))
    if (maxTokenDf == Int.MaxValue) {
      // exact mode: every token is indexed, so the join-group count IS the
      // exact intersection size — one self-join, one aggregation, done.
      // n_tok rides along through the explode (docs are small relative to
      // their token count) so no size-lookup joins are needed, and the
      // length filter J ≥ t ⟹ t·|a| ≤ |b| ∧ t·|b| ≤ |a| prunes pairs
      // inside the join before they ever reach the aggregation shuffle.
      val idx = sets.select(col("doc_id"), col("blk"),
        size(col("toks")).as("n_tok"), explode(col("toks")).as("tok"))
      val (a, b, keyCond) = dictKeyed(idx)
      return a.join(b,
          keyCond &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n_tok") * lit(threshold) <= col("b.n_tok") &&
          col("b.n_tok") * lit(threshold) <= col("a.n_tok"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n_tok").as("n_a"), col("b.n_tok").as("n_b"))
        .agg(count(lit(1)).as("n_shared"))
        .withColumn("jaccard",
          col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }
    // hot tokens are FEW by construction (df > cap on a heavy-tailed
    // vocabulary): aggregate with map-side combine, broadcast the tiny
    // result, anti-join — far cheaper than a window sort over every token
    val hotTokens = toks.groupBy(col("blk"), col("tok"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxTokenDf)
      .select(col("blk"), col("tok"))
    val indexed = toks.join(broadcast(hotTokens), Seq("blk", "tok"), "left_anti")
    val a = indexed.as("a")
    val b = indexed.as("b")
    // shared-RARE-token count per pair straight from the join group — the
    // pair shuffle carries (doc_a, doc_b) only, never token arrays.
    // (No dictKeyed here: with the hot tokens anti-joined away the df²
    // blowup is gone, and the dict pre-pass costs more than the int keys
    // save — measured +1.0 s on q37 at sf0.1 for a ~0.3 s join gain.)
    val counted = a.join(b,
        col("a.blk") === col("b.blk") && col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_rare"))
    val sizes = sets.select(col("doc_id"), size(col("toks")).as("n_tok"))
    val withSizes = counted
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_tok").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_tok").as("n_b")), "doc_b")
    // exact correction for capped tokens: each doc's HOT tokens are a tiny
    // array (bounded by the broadcast hot set), so shipping those per
    // candidate is cheap where full token sets would not be
    val hotPerDoc = toks.join(broadcast(hotTokens), Seq("blk", "tok"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("tok")).as("hot_toks"))
    val emptyArr = array().cast("array<string>")
    withSizes
      .join(hotPerDoc.select(col("doc_id").as("doc_a"), col("hot_toks").as("hot_a")),
        Seq("doc_a"), "left_outer")
      .join(hotPerDoc.select(col("doc_id").as("doc_b"), col("hot_toks").as("hot_b")),
        Seq("doc_b"), "left_outer")
      .withColumn("n_shared", col("n_shared_rare") +
        size(array_intersect(coalesce(col("hot_a"), emptyArr),
                             coalesce(col("hot_b"), emptyArr))))
      .withColumn("jaccard",
        col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact all-pairs token Jaccard via PREFIX FILTERING — the AllPairs /
    * PPJoin candidate scheme from the exact-similarity-join literature.
    * Each block's vocabulary gets a canonical rarest-first order (df asc,
    * token asc — any document-independent total order is sound;
    * rarest-first minimizes candidates); only each doc's first
    * n − ⌈t·n⌉ + 1 tokens are indexed; the candidate self-join adds the
    * length filter t·|a| ≤ |b| and t·|b| ≤ |a|.
    *
    * Completeness: if J(a,b) ≥ t then o = |a∩b| ≥ t·|a∪b| ≥ t·max(|a|,|b|).
    * The smallest common token (canonical order) has at least the other
    * o−1 common tokens after it in each doc, so its position in doc x is
    * ≤ |x| − o + 1 ≤ |x| − ⌈t·|x|⌉ + 1 — inside BOTH prefixes. Every
    * qualifying pair therefore surfaces as a candidate; every candidate is
    * then re-scored EXACTLY from the full token sets, so the result equals
    * the naive all-pairs join and [[jaccardPairs]] exact mode
    * (property-tested in DedupGuardSuite).
    *
    * When to choose which exact path (measured, sf0.1 local[32]): on a
    * heavy-tailed (Zipf) vocabulary the prefix index drops the hottest
    * tokens — exactly where the df² candidate blowup lives — so this
    * formulation's candidate join shrinks by orders of magnitude and wins
    * at scale. On a small/uniformly-hot vocabulary (this repo's synthetic
    * corpus: 620 distinct block-tokens, all hot) the reduction is only ~2×
    * (22.4M → 11M joined rows) and the extra stages (df rank, dedup,
    * verify rejoin) cost more than they save (7.3 s vs 4.0 s), which is
    * why the oracle-gated specs use [[jaccardPairs]] exact mode. The
    * candidate join carries only (doc_id, token); full token arrays travel
    * once per DISTINCT surviving candidate in the verify join, keyed on
    * doc_id (broadcast when small, hash join at 100 TB) — the standard
    * verification cost of every exact similarity join.
    */
  def jaccardPairsPrefix(docs: DataFrame, threshold: Double,
                         blockCol: String = "source"): DataFrame = {
    val sets = docs.select(col("doc_id"), col(blockCol).as("blk"),
      tokenSet(col("text")).as("toks"))
    val toks = sets.select(col("doc_id"), col("blk"), explode(col("toks")).as("tok"))
    // per-block document frequency = the canonical rarest-first order
    val dfs = toks.groupBy(col("blk"), col("tok")).agg(count(lit(1)).as("df"))
    val n = sets.select(col("doc_id"), size(col("toks")).as("n_tok"))
    val prefix = toks.join(dfs, Seq("blk", "tok"))
      .join(n, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .filter(col("rn") <= col("n_tok") - ceil(lit(threshold) * col("n_tok")) + 1)
      .select(col("doc_id"), col("blk"), col("tok"), col("n_tok"))
    val a = prefix.as("a")
    val b = prefix.as("b")
    val candidates = a.join(b,
        col("a.blk") === col("b.blk") && col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n_tok") * lit(threshold) <= col("b.n_tok") &&
        col("b.n_tok") * lit(threshold) <= col("a.n_tok"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), "doc_b")
      .withColumn("n_shared", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (size(col("toks_a")) + size(col("toks_b")) - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH banding

  /** `nHashes` minhash lanes in ONE pass over the shingle/token set
    * (codegen'd MinHash64 expression — the 64-separate-HOF formulation
    * cost ~95 s at sf0.1); banded into 16 bands of 4 lanes downstream.
    *
    * @param shingleK 0 → whitespace-token units (robust to reordering);
    *        k>0 → overlapping character k-grams (robust to
    *        token-boundary edits — the classic shingling pipeline).
    */
  def minhashSignature(text: Column, nHashes: Int, shingleK: Int = 0): Column = {
    val units =
      if (shingleK > 0)
        array_distinct(graft.functions.TextFunctions.char_shingles(text, shingleK))
      else tokenSet(text)
    graft.functions.HashFunctions.minhash64(units, nHashes)
  }

  /** Near-dup candidate pairs from LSH bucketing, verified by the MinHash
    * Jaccard estimate (share of equal signature components). Returns
    * (doc_a, doc_b, est_jaccard) for pairs ≥ threshold.
    *
    * Scale notes: only (doc_id, band, bucket) travels through the
    * candidate self-join — never text. Signatures rejoin by doc_id
    * afterwards. `maxBucketSize` is the standard LSH skew guard: a bucket
    * holding half the corpus generates O(n²) candidates and is useless for
    * dedup anyway, so degenerate buckets are dropped (logged cap — at
    * 100 TB this is the difference between a bounded join and a meltdown).
    */
  def minhashLsh(docs: DataFrame, threshold: Double, nHashes: Int = 64,
                 bands: Int = 16, maxBucketSize: Int = 64,
                 shingleK: Int = 0): DataFrame = {
    require(bands >= 1 && nHashes % bands == 0,
      s"nHashes ($nHashes) must divide into bands ($bands) — a remainder " +
        "would silently drop signature lanes from every bucket key")
    val rows = nHashes / bands
    // The signature scan (shingling + nHashes minhash passes per doc) is
    // the expensive leaf, and the plan below references it THREE times
    // (banding + both verify rejoins). A lazy local checkpoint computes it
    // once and serves the other two subtrees from stored blocks —
    // signatures are doc_id + nHashes longs, orders of magnitude smaller
    // than the text they replace, which is exactly why checkpointing them
    // (and never the text) is the right trade at 100 TB too.
    val sigs = docs.select(col("doc_id"),
      minhashSignature(col("text"), nHashes, shingleK).as("sig"))
      .localCheckpoint(false)
    // one row per (doc, band): bucket key = hash of the band's slice
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rows).map(r => col("sig")(b * rows + r)): _*)
      }: _*)).as(Seq("band", "bucket")))
    // Both self-join sides consume the bucketed stream; capByKey
    // checkpoints the banded (doc_id, band, bucket) rows — docs×bands
    // longs — so the banding posexplode runs once, and the skew cap is a
    // map-side count + broadcast anti-join (a degenerate bucket's rows
    // never funnel through one task's window sorter).
    val bucketed = capByKey(banded, Seq("band", "bucket"), maxBucketSize)
    val l = bucketed.as("l")
    val r = bucketed.as("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    // verify via the signature estimate — signatures rejoin by id, text
    // never shuffles. Equal-lane counting is the codegen'd EqualLanes
    // expression (r12): the aggregate(zip_with(...)) formulation is
    // CodegenFallback and paid two interpreted 64-element lambda passes
    // PER CANDIDATE PAIR — the HOF hot-loop trap, in the verify stage.
    val estJaccard = graft.functions.VectorFunctions
      .equal_lanes(col("sig_a"), col("sig_b")).cast("double") / nHashes
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard", estJaccard)
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  // ---------------------------------------------------------------------
  // SimHash (64-bit, token-level)

  /** 64-bit SimHash over the token set in one pass (codegen'd SimHash64
    * expression: sign-sum of each token hash's bits).
    */
  def simhash(text: Column): Column =
    graft.functions.HashFunctions.simhash64(tokenSet(text))

  /** Pairs within the given hamming distance of simhash fingerprints,
    * candidate-generated by 4 16-bit bands (any pair within distance ≤3
    * shares at least one exact band).
    *
    * @param maxBucketSize skew guard, same pattern as [[minhashLsh]]: a
    *        band-bucket holding n docs contributes O(n²) candidates; a
    *        bucket that collects a large fraction of the corpus means the
    *        band carries no discriminating bits there, so it is dropped.
    *        A dropped pair can still surface through any of the other 3
    *        bands; only pairs colliding SOLELY in degenerate buckets are
    *        lost.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   maxBucketSize: Int = 256): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(col("text")).as("sh"))
    // both self-join sides read this; capByKey's checkpoint = one banding
    // pass instead of two (same trade as minhashLsh's bucketed stream),
    // and the cap is a map-side count + broadcast anti-join, not a window
    val banded = capByKey(
      sigs.select(col("doc_id"), col("sh"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL)): _*))
          .as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucketSize)
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ---------------------------------------------------------------------
  // Connected components over near-dup pairs → dedup clusters

  /** Connected components over an undirected pair list: returns
    * `(id, comp)` where `comp` is the minimum node id reachable from `id`
    * (the canonical representative of its component). Nodes that appear in
    * no pair are absent from the result — callers treat them as singleton
    * components (`comp = id`).
    *
    * This is the step that turns near-dup PAIRS into dedup DECISIONS: a
    * chain a~b~c must collapse to ONE retained doc even though (a,c) was
    * never emitted as a pair, so per-pair "keep the smaller id" is wrong —
    * only the component's canonical member is retained.
    *
    * Algorithm: FRONTIER-restricted min-label propagation with SEEDED
    * INIT and POINTER DOUBLING (r19). Two independent costs own CC wall
    * time and each gets its own lever:
    *  - per-round BYTES (dense graphs — q49's jaccard graph is 445k
    *    edges on ~20k nodes): messages flow only FROM nodes whose label
    *    changed last round, so after round 1 the edge join touches
    *    frontier-incident edges, not the graph;
    *  - ROUND COUNT (deep graphs — q141's media graph has diameter ~12):
    *    init seeds `L(v) = min(v, Γ(v))` in the same shuffle that used
    *    to just list the nodes, and each round ends with a SHORTCUT
    *    `L(v) ← L(L(v))` — a NODE-sized self-join that collapses a label
    *    chain of length d in O(log d) rounds.
    *  - labels only decrease and every label is a node id present in
    *    the table, so the shortcut join always hits; at the
    *    `changed = 0` fixpoint both endpoints of every edge hold equal
    *    labels and the component minimum holds its own id, i.e.
    *    comp = component min (the argument is about the final state
    *    only: every decrease re-enters the frontier and is re-offered to
    *    its neighbors, whether a message or a shortcut caused it, so
    *    neither the seed nor the shortcut can weaken it).
    * Each round is ONE Spark job: the propagated frame and the shortcut
    * frame are lazily checkpointed and materialized by the changed-count
    * action that doubles as the convergence check. No driver-side graph
    * state — the driver sees one scalar per round. An adversarial graph
    * that still exhausts `maxIterations` falls back to
    * [[connectedComponentsAlternating]] (large-star/small-star,
    * O(log n) rounds) instead of failing.
    *
    * Scale notes (100 TB): only (id, comp) pairs ever travel — never
    * text; the edge list is materialized once and re-joined per round
    * against a shrinking frontier; lineage is truncated every round
    * (`localCheckpoint` — at cluster scale, swap for reliable
    * `checkpoint()` to a durable dir).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a",
                          bCol: String = "doc_b",
                          maxIterations: Int = 30): DataFrame = {
    // checkpoint the FORWARD list first: `pairs` is typically an expensive
    // near-dup join, and the undirected union below references it twice —
    // materializing before the union guarantees one evaluation regardless
    // of exchange-reuse. Duplicate input pairs are tolerated (min-agg is
    // idempotent), so no dedup shuffle.
    // fwd stays EAGER; edges/labels are lazy (r19). Laziness trims setup
    // jobs (round 1's changed-count materializes edges → labels → prop →
    // jumped in one job), but fwd's upstream is the expensive near-dup
    // join and a lazy fwd gets recomputed by every concurrent downstream
    // stage that runs before its blocks land — measured: q49's jaccard
    // pairs re-ran ~5× (1.0 → 5.5 s). Everything derived from fwd is
    // union/agg over its stored blocks, i.e. cheap to recompute, so the
    // same hazard is harmless for edges/labels.
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint()
    // both directions, materialized off fwd's stored blocks. The
    // checkpoint is ALSO load-bearing for attribute hygiene: the union's
    // swapped leg reuses fwd's attribute ids, and joining that raw union
    // against frames derived from it trips physical planning
    // ("key not found: src#...") — the LogicalRDD cut gives the loop a
    // clean, self-contained relation to join against every round (lazy
    // and eager checkpoints both make that cut; only materialization
    // timing differs).
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = false)
    // seeded init: the same shuffle that used to just list the nodes
    // (distinct) now also takes each node's 1-hop neighborhood min
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__nmin"))
      .select(col("id"), least(col("id"), col("__nmin")).as("comp"))
      .localCheckpoint(eager = false)
    // round-1 frontier: only nodes whose seed improved carry new
    // information — a node still labeled with its own id was already
    // incorporated into every neighbor's seed by the init aggregation
    var frontier = labels.filter(col("comp") < col("id"))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIterations) {
      // 1. propagate FROM the frontier only (the r18 sparsity lever,
      // restored in r19 after the full-edge two-hop variant re-scanned a
      // 445k-edge dense graph's whole edge list twice per round — q49
      // 1.0 → 5.1 s): messages flow only from nodes whose label changed
      // last round, so after round 1 the edge join's output is
      // frontier-incident edges, not the graph.
      val msgs = edges.join(
          frontier.select(col("id").as("src"), col("comp")), "src")
        .select(col("dst").as("id"), col("comp"))
        .groupBy("id").agg(min("comp").as("__nc"))
      val prop = labels.withColumn("old", col("comp"))
        .join(msgs, Seq("id"), "left_outer")
        .select(col("id"), col("old"),
          least(col("comp"), coalesce(col("__nc"), col("comp"))).as("comp"))
        .localCheckpoint(eager = false) // read by BOTH shortcut sides
      // 2. shortcut (pointer doubling): L(v) ← L(L(v)) — a NODE-sized
      // self-join (never edge-sized), so a label chain of length d
      // collapses in O(log d) rounds at per-round cost ∝ nodes. comp is
      // always a node id present in `prop` (ids only ever relabel to
      // smaller ids seen in the graph), so the lookup is total; coalesce
      // is belt and braces against an absent row ever appearing.
      val jumped = prop.join(
          prop.select(col("id").as("comp"), col("comp").as("__cc")),
          Seq("comp"), "left_outer")
        .select(col("id"), col("old"),
          coalesce(col("__cc"), col("comp")).as("comp"))
        .localCheckpoint(eager = false)
      // one action per round: materializes prop + jumped, checks fixpoint.
      // A shortcut-improved node re-enters the frontier exactly like a
      // message-improved one (frontier = changed-this-round), which is
      // what keeps the termination argument intact: every label decrease
      // is re-offered to the node's neighbors before the loop can stop.
      changed = jumped.filter(col("comp") < col("old")).count()
      frontier = jumped.filter(col("comp") < col("old"))
        .select(col("id"), col("comp"))
      labels = jumped.select(col("id"), col("comp"))
      iter += 1
    }
    // a non-fixpoint exit would be CONSERVATIVE for dedup (unmerged
    // components keep extra docs, never drop wrong ones) but must not
    // pass silently as converged output: a graph that exhausts
    // maxIterations (usually a too-loose pair threshold chaining half
    // the corpus) switches to the O(log n)-round star algorithm, which
    // is immune to diameter
    if (changed > 0)
      return connectedComponentsAlternating(pairs, aCol, bCol)
    labels
  }

  /** Connected components by ALTERNATING large-star/small-star rounds —
    * the diameter-immune formulation from the MapReduce-CC literature
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * each round re-points every node's larger neighbors (large-star) and
    * then its smaller neighbors (small-star) at the minimum of the
    * neighborhood, collapsing any component to a star around its minimum
    * id in O(log n) rounds REGARDLESS of graph diameter — the
    * adversarial-chain fallback of [[connectedComponents]], whose
    * frontier propagation needs diameter rounds.
    *
    * Convergence check: the canonical edge multiset is a fixpoint of the
    * small-star round (count + order-independent hash sum — a pure
    * aggregation, no driver-side edge set). Per round: two keyed
    * aggregations + two joins over the shrinking edge list; only (long,
    * long) pairs travel; lineage truncates per round (`localCheckpoint`,
    * same durable-`checkpoint()` note as the frontier variant).
    *
    * Returns (id, comp) for every node incident to ≥1 pair, comp = the
    * component's minimum node id — same contract as
    * [[connectedComponents]] (property-tested equal in
    * ConnectedComponentsSuite).
    */
  def connectedComponentsAlternating(pairs: DataFrame, aCol: String = "doc_a",
                                     bCol: String = "doc_b",
                                     maxIterations: Int = 40): DataFrame = {
    // canonical undirected edges (lo, hi), self-loops dropped
    val fwd = pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    var edges = fwd
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint()
    // every node ever seen: label emission below must cover nodes whose
    // incident edges collapse away entirely (star roots)
    val nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct().localCheckpoint()
    var iter = 0
    var prevSig: (Long, Long) = null
    var converged = false
    while (!converged && iter < maxIterations) {
      // large-star: for each node u (symmetric view), m = min(Γ(u) ∪ {u});
      // every LARGER neighbor re-points at m
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u")) // m <= u < v, so (m, v) is canonical
        .select(col("m").as("u"), col("v"))
        .distinct()
      // small-star: for each node v, its SMALLER neighbors (the u side of
      // canonical edges) plus v itself re-point at their minimum
      val smins = large.groupBy(col("v")).agg(min(col("u")).as("m"))
      val small = large.join(smins, "v")
        .select(explode(array(
          struct(col("u").as("x"), col("m")),
          struct(col("v").as("x"), col("m")))).as("e"))
        .select(col("e.x").as("x"), col("e.m").as("m"))
        .filter(col("x") =!= col("m"))
        .select(least(col("x"), col("m")).as("u"), greatest(col("x"), col("m")).as("v"))
        .distinct()
        .localCheckpoint(eager = false)
      // fixpoint detection: an order-independent (count, hash-xor)
      // signature materializes the round cheaply (xor, not sum — ANSI mode
      // would overflow a long sum; xor can't, and the edge set is distinct
      // so cancellation needs a real hash collision); a signature match is
      // then CONFIRMED with an exact set compare, so a 2^-64 collision can
      // never freeze a non-star edge set into the labels
      val sigRow = small.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      converged = sig == prevSig &&
        edges.exceptAll(small).isEmpty && small.exceptAll(edges).isEmpty
      prevSig = sig
      edges = small
      iter += 1
    }
    require(converged,
      s"connectedComponentsAlternating did not converge in $maxIterations " +
        "rounds — O(log n) bound exceeded, which indicates a bug, not a deep graph")
    // at the fixpoint every edge is (root, member): labels are the edge
    // list itself plus a self-label per root / fully-collapsed node
    val memberLabels = edges.select(col("v").as("id"), col("u").as("comp"))
    nodes.join(memberLabels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Documents annotated with their near-dup cluster: `comp` (canonical
    * doc_id of the component, = own id for singletons) and `retained`
    * (1 iff this doc is the component's canonical member). Downstream, a
    * curation pipeline filters `retained = 1`.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val comp = connectedComponents(pairs)
    docs.join(comp, docs(idCol) === comp("id"), "left_outer")
      .drop("id")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .withColumn("retained", (col("comp") === col(idCol)).cast("int"))
  }

  // ---------------------------------------------------------------------
  // Embedding-cosine near-dup

  /** All pairs (a < b) within the same block whose embedding cosine ≥
    * threshold — the exact formulation (the correctness oracle and the
    * small-block tool). Blocking (default: `label`) is the declared scale
    * lever exactly as in [[jaccardPairs]]; the all-pairs join inside one
    * block is O(block²), so the 100 TB path is [[cosinePairsLsh]].
    */
  def cosinePairs(embeddings: DataFrame, threshold: Double,
                  blockCol: String = "label"): DataFrame = {
    val v = embeddings.select(col("vec_id"), col(blockCol).as("blk"),
      col("embedding").cast("array<double>").as("v"))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", safeCosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Near-dup candidate pairs from random-hyperplane LSH buckets (shared
    * full signature in ≥1 of `tables` tables), verified by the exact
    * cosine. Same bucketed shape as [[minhashLsh]]: only (vec_id, table,
    * bucket) travels through the candidate self-join, vectors rejoin by
    * id for verification, and degenerate buckets are capped. Recall < 1
    * by design (a pair colliding in no table is missed).
    */
  def cosinePairsLsh(embeddings: DataFrame, threshold: Double,
                     tables: Int = 8, nBits: Int = 4,
                     maxBucketSize: Int = 256): DataFrame = {
    val v = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    // both self-join sides: capByKey's checkpoint = one hyperplane-
    // projection pass instead of two (same trade as minhashLsh's bucketed
    // stream); the cap is a map-side count + broadcast anti-join
    val banded = capByKey(
      v.select(col("vec_id"),
        posexplode(array((0 until tables).map(t =>
          graft.functions.HashFunctions.lsh_sign_bits(col("v"), t, nBits)): _*))
          .as(Seq("tbl", "bucket"))),
      Seq("tbl", "bucket"), maxBucketSize)
    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    candidates
      .join(v.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(v.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .withColumn("cos", safeCosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540, public): k-means-cluster the embedding space,
    * then within each cluster drop every vector whose cosine to a
    * LOWER-id cluster-mate reaches `threshold` — the cluster-then-prune
    * scale path for semantic duplicates, where [[cosinePairs]] is the
    * exact all-pairs tool and [[cosinePairsLsh]] the hash-bucketed one.
    * Clustering replaces LSH banding as the candidate generator: ONE
    * cell per vector (no multi-table replication), at the cost of
    * missing straddling pairs near cell boundaries — the paper's
    * documented trade. Keeper choice is min-id (deterministic,
    * repo-wide convention — [[graft.operators.Multimodal.curateMedia]]);
    * the paper's lowest-centroid-cosine exemplar is a per-cluster
    * ORDER BY swap on the same plan.
    *
    * Scale shape: the fit is [[Similarity.fitCentroids]] (map-side
    * argmin + one partitions×K shuffle per Lloyd iteration, K×dim model
    * on the driver); assignment is a codegen'd projection; the
    * within-cluster self-join is keyed by `cid` and bounded by
    * `maxClusterSize` — an oversized cell (the centroid failed to
    * separate; raise nClusters) is dropped from pairing PROSPECTIVELY
    * like a degenerate LSH bucket, never allowed to go O(n²). The
    * assigned frame is checkpointed so the fit's projection feeds both
    * join sides once. Exact cosine verifies every pair — vectors ride
    * only the within-cluster join, as in [[cosinePairs]].
    *
    * `nClusters = 1` degenerates to exact all-pairs over everything —
    * the oracle mode SemDeDupSuite gates the clustered mode against.
    */
  /** Fit the SemDeDup cell model — public so the STREAMING twin
    * ([[graft.streaming.StreamingCosineDedup.semDeDupStream]]) can serve
    * against the exact cells the batch operator would use (the fit/serve
    * split; seeding and Lloyd loops are [[Similarity.fitCentroids]]'s,
    * shared with IVF).
    */
  def fitSemDeDupModel(embeddings: DataFrame, nClusters: Int = 64,
                       iters: Int = 3): Array[(Int, Array[Double])] = {
    require(nClusters >= 1, s"semDeDup: nClusters must be >= 1, got $nClusters")
    Similarity.fitCentroids(
      embeddings.select(col("vec_id").as("nid"),
        Similarity.asDouble(col("embedding")).as("cv")),
      "nid", "cv", nClusters, iters)
  }

  /** The capped `(nid, cid, cv)` assignment frame — split out so the
    * plan shape is gateable (SemDeDupSuite): cell sizes come from a
    * map-side-combined groupBy over (cid) — tiny (cid, count) traffic,
    * never the embedding payload — and the over-cap cid set
    * (≤ nClusters rows) broadcasts into an anti-join applied BEFORE the
    * checkpoint/self-join. The r8 shape (a Window count partitioned by
    * cid) funneled a degenerate cell's ENTIRE vector payload onto one
    * task only to throw it away — exactly the skewed cell the cap
    * exists for (e.g. a boilerplate-embedding cluster holding 10% of a
    * 100 TB corpus). Now a capped cell's vectors never shuffle at all.
    */
  private[operators] def cappedAssignment(v: DataFrame,
                                          cents: Array[(Int, Array[Double])],
                                          maxClusterSize: Int): DataFrame = {
    // checkpoint the RAW assignment: the count aggregate and the
    // anti-join's left input would otherwise each re-run the full
    // embedding scan + K-argmin pass (the broadcast-subquery job and the
    // main job share no CSE) — the same single-pass discipline as
    // [[semDeDupIncremental]]'s probe
    val assignedRaw = Similarity.assign(v, cents, "cv")
      .select(col("nid"), col("cid"), col("cv"))
      .localCheckpoint(false)
    val overCap = assignedRaw.groupBy(col("cid"))
      .agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") > maxClusterSize)
      .select(col("cid"))
    assignedRaw
      .join(broadcast(overCap), Seq("cid"), "left_anti")
      .select(col("nid"), col("cid"), col("cv"))
  }

  def semDeDupLosers(embeddings: DataFrame, threshold: Double,
                     nClusters: Int = 64, iters: Int = 3,
                     maxClusterSize: Int = 4096): DataFrame =
    semDeDupLosersFrozen(embeddings,
      fitSemDeDupModel(embeddings, nClusters, iters), threshold, maxClusterSize)

  /** [[semDeDupLosers]] under a caller-supplied FROZEN cell model — the
    * serve half of the fit/serve split, shared by the inline operator
    * (which fits first), the streaming twin's batch-parity gate, and the
    * persisted-index incremental path (both of which must score under
    * the index's frozen cells, not a refit).
    */
  def semDeDupLosersFrozen(embeddings: DataFrame,
                           cents: Array[(Int, Array[Double])],
                           threshold: Double,
                           maxClusterSize: Int = 4096): DataFrame = {
    val v = embeddings.select(col("vec_id").as("nid"),
      Similarity.asDouble(col("embedding")).as("cv"))
    // cappedAssignment checkpoints the raw assignment; the cap anti-join
    // on top is a map-side broadcast, cheap to evaluate once per join
    // side against the stored blocks — no second cut needed
    val assigned = cappedAssignment(v, cents, maxClusterSize)
    val a = assigned.as("a")
    val b = assigned.as("b")
    a.join(b, col("a.cid") === col("b.cid") && col("a.nid") < col("b.nid"))
      .withColumn("cos", safeCosine(col("a.cv"), col("b.cv")))
      .filter(col("cos") >= threshold)
      .select(col("b.nid").as("vec_id")).distinct()
  }

  /** The surviving rows of [[semDeDupLosers]]: one representative
    * (min id) per within-cluster semantic-dup group, everything else
    * dropped. The loser set is id-only and shrinks under distinct —
    * AQE broadcasts the anti-join in practice.
    */
  def semDeDup(embeddings: DataFrame, threshold: Double,
               nClusters: Int = 64, iters: Int = 3,
               maxClusterSize: Int = 4096): DataFrame =
    embeddings.join(
      semDeDupLosers(embeddings, threshold, nClusters, iters, maxClusterSize),
      Seq("vec_id"), "left_anti")

  /** Persist the SemDeDup cell index under `dir` — the build half of the
    * batch-incremental path (the [[graft.operators.AnnIndex]] layout
    * discipline: fit nightly, probe per batch). All parquet,
    * engine-readable:
    *  - `cells/`   — (cid, cvec): the frozen k-means cell centroids
    *  - `members/` — (nid, cv) PARTITIONED BY cid: the corpus
    *    assignment, laid out so an incremental probe's touched cells
    *    read ONLY their own directories (partition pruning, never a
    *    corpus scan).
    * Capped cells are persisted like any other (the cap is pairing
    * policy, not membership policy — and tomorrow's batch may push a
    * cell over cap, which the probe must see the true size to detect).
    */
  def buildSemDeDupIndex(embeddings: DataFrame, dir: String,
                         nClusters: Int = 64, iters: Int = 3): Unit = {
    val spark = embeddings.sparkSession
    val cents = fitSemDeDupModel(embeddings, nClusters, iters)
    Similarity.centroidDf(spark, cents)
      .write.mode("overwrite").parquet(s"$dir/cells")
    val v = embeddings.select(col("vec_id").as("nid"),
      Similarity.asDouble(col("embedding")).as("cv"))
    Similarity.assign(v, cents, "cv")
      .select(col("nid"), col("cv"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/members")
  }

  /** Incremental SemDeDup: the NEW losers arising from `batch` against
    * the index at `dir` — each batch vector is assigned with the FROZEN
    * cell model and compared exact-cosine against (a) the indexed
    * members of its own cell and (b) its same-cell batch-mates. The
    * nightly-ingest counterpart of [[semDeDupLosers]], closing the
    * incremental family alongside [[jaccardPairsIncremental]] (tokens)
    * and [[graft.operators.Multimodal.imageNearDupIncremental]]
    * (images): work ∝ batch — only the touched cells' member
    * directories are read (partition pruning over `members/cid=`),
    * the corpus is never reassigned or rescanned, and indexed×indexed
    * pairs (found when they were ingested) are never recomputed.
    *
    * Losers are emitted on BOTH sides: an indexed member loses
    * retroactively when a lower-id batch near-dup arrives (min-id
    * keeper, the repo-wide convention), so
    * build-time losers ∪ incremental losers ≡
    * [[semDeDupLosersFrozen]] over the union corpus under the same
    * model, for in-cap cells (SemDeDupIndexSuite gates the identity).
    * Cells whose UNION size (members + batch) exceeds
    * `maxClusterSize` are dropped from pairing — the same retroactive
    * cap as the batch operator, now judged at the union size the full
    * run would see. Batch ids must be disjoint from indexed
    * generations (the [[jaccardPairsIncremental]] contract).
    *
    * If `append`, the batch's assignment rows are appended under
    * `members/` (the [[AnnIndex.append]] discipline) so the next
    * increment probes against them. The frozen cells drift from a
    * refit as the distribution shifts — monitor with
    * [[Similarity.embeddingDrift]], rebuild when warranted.
    */
  def semDeDupIncremental(batch: DataFrame, dir: String, threshold: Double,
                          maxClusterSize: Int = 4096,
                          append: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val cents = spark.read.parquet(s"$dir/cells").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    require(cents.nonEmpty, s"semDeDupIncremental: no cell model at $dir/cells")
    val v = batch.select(col("vec_id").as("nid"),
      Similarity.asDouble(col("embedding")).as("cv"))
    // one assignment pass feeds the counts, both joins, and the append
    val assigned = Similarity.assign(v, cents, "cv")
      .select(col("nid"), col("cid"), col("cv"))
      .localCheckpoint(false)
    // touched cells + union-cap verdicts: two (cid, count) aggregations —
    // ≤ nClusters rows each, driver-side set arithmetic
    val batchCounts = assigned.groupBy(col("cid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val touched = batchCounts.keys.toSeq
    if (touched.isEmpty) return assigned.select(col("nid").as("vec_id")).limit(0)
    val members = indexMembers(spark, dir, touched)
    val memberCounts = members.groupBy(col("cid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val inCap = touched.filter(c =>
      batchCounts(c) + memberCounts.getOrElse(c, 0L) <= maxClusterSize)
    val losers =
      if (inCap.isEmpty) assigned.select(col("nid").as("vec_id")).limit(0)
      else {
        val b = assigned.filter(col("cid").isin(inCap: _*))
        val m = members.filter(col("cid").isin(inCap: _*))
        val cross = m.as("a").join(b.as("b"), col("a.cid") === col("b.cid"))
          .withColumn("cos", safeCosine(col("a.cv"), col("b.cv")))
          .filter(col("cos") >= threshold)
          .select(greatest(col("a.nid"), col("b.nid")).as("vec_id"))
        val within = b.as("a").join(b.as("b"),
            col("a.cid") === col("b.cid") && col("a.nid") < col("b.nid"))
          .withColumn("cos", safeCosine(col("a.cv"), col("b.cv")))
          .filter(col("cos") >= threshold)
          .select(col("b.nid").as("vec_id"))
        cross.unionByName(within).distinct()
      }
    // materialize losers BEFORE the append mutates members/ underneath
    // the (lazy) probe plan
    val out = losers.localCheckpoint(true)
    if (append)
      assigned.select(col("nid"), col("cv"), col("cid"))
        .write.mode("append").partitionBy("cid").parquet(s"$dir/members")
    out
  }

  /** Build-once memo for the q134 harness query (the
    * [[AnnIndex.cachedBuild]] discipline via [[BuildOnce]]): the
    * operator's point is the nightly-build / per-batch-probe split, so
    * the verified-and-benched path is the PROBE against an index built
    * once per sf-dir per JVM. Library users call [[buildSemDeDupIndex]]
    * with their own storage.
    */
  /** Build-once memo for the q157 harness query: corpus sketches built
    * from doc_id < 250, the >= 250 generation appended — once per
    * sf-dir per JVM. Library users call [[buildSketchIndex]] /
    * [[appendSketchIndex]] with their own storage. */
  private def cachedSketchIndex(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-sketch-index", d) { dir =>
      val docs = Tables.documents(s, d)
      buildSketchIndex(docs.filter(col("doc_id") < 250), dir, k = 64)
      appendSketchIndex(docs.filter(col("doc_id") >= 250), dir, k = 64)
      dir
    }

  /** Build-once memo for the q180 drift harness: the EARLIER snapshot —
    * the corpus as it stood at the last audit (doc_id < 250), before
    * the ingest that grew [[cachedSketchIndex]] to the full corpus. */
  private def cachedSketchIndexOld(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-sketch-index-old", d) { dir =>
      buildSketchIndex(Tables.documents(s, d).filter(col("doc_id") < 250),
        dir, k = 64)
      dir
    }

  private def cachedSemDeDupIndex(s: SparkSession, d: String): String =
    BuildOnce.dir("graft-semdd-index", d) { dir =>
      buildSemDeDupIndex(
        Tables.embeddings(s, d).filter(col("vec_id") >= 250),
        dir, nClusters = 16)
      dir
    }

  /** The index-member read the probe runs: `cid` is the PARTITION
    * column, so the isin filter prunes to the touched cells'
    * directories — SemDeDupIndexSuite gates that it lands as a
    * partition filter on the scan (the "work ∝ batch" property at the
    * IO level). */
  private[operators] def indexMembers(spark: SparkSession, dir: String,
                                      touched: Seq[Int]): DataFrame =
    spark.read.parquet(s"$dir/members")
      .filter(col("cid").isin(touched: _*))
      .select(col("nid"), col("cid").cast("int").as("cid"), col("cv"))

  /** Pair cosine with the zero-norm guard: a zero embedding has no
    * direction, so it is near-dup of NOTHING — score −2.0 (below any
    * threshold) instead of tripping ANSI divide-by-zero mid-query.
    */
  private def safeCosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.{array_cosine, array_norm}
    when(array_norm(a) === 0.0 || array_norm(b) === 0.0, lit(-2.0))
      .otherwise(array_cosine(a, b))
  }

  // ---------------------------------------------------------------------
  // Incremental near-dup (batch vs persisted token index)

  /** Inverted token index of an already-ingested corpus — the artifact an
    * incremental NEAR-dup pipeline persists, exactly as [[digestIndex]]
    * is the persisted artifact of incremental EXACT dedup. One row per
    * (doc, distinct token) with the doc's block and token count riding
    * along, so probing needs no join back to the corpus text. At 100 TB
    * this lives partitioned/bucketed by (blk, tok) so each day's probe
    * co-locates with it.
    */
  def tokenIndex(docs: DataFrame, blockCol: String = "source"): DataFrame =
    docs.select(col("doc_id"), col(blockCol).as("blk"),
        tokenSet(col("text")).as("toks"))
      .select(col("doc_id"), col("blk"), size(col("toks")).as("n_tok"),
        explode(col("toks")).as("tok"))

  /** Incremental exact-Jaccard near-dup: every pair (corpus doc, batch
    * doc) and (batch doc, batch doc) with Jaccard ≥ `threshold` — the
    * daily-ingest counterpart of [[jaccardPairs]]. The already-ingested
    * corpus participates ONLY through its persisted [[tokenIndex]]; its
    * text is never rescanned, and corpus×corpus pairs (found when they
    * were ingested) are never recomputed — the work is ∝ batch activity,
    * not corpus size, which is what makes daily near-dup affordable at
    * 100 TB.
    *
    * Same candidate algebra as [[jaccardPairs]] exact mode: index join on
    * (blk, tok) with the J ≥ t length filter pushed into the join, pair
    * scoring from the group count. Within-batch pairs orient a < b;
    * corpus→batch pairs orient (corpus, batch) and appear once. The
    * production skew guard (token-df cap / prefix filtering) applies to
    * the persisted index exactly as documented on [[jaccardPairs]] /
    * [[jaccardPairsPrefix]].
    */
  def jaccardPairsIncremental(corpusIndex: DataFrame, batch: DataFrame,
                              threshold: Double,
                              blockCol: String = "source"): DataFrame = {
    val probe = tokenIndex(batch, blockCol)
    // TWO joins whose PAIR outputs union — deliberately not one join over
    // (index ∪ probe): a union upstream of the join would strip the
    // persisted index's physical layout, while here an index stored
    // bucketed on (blk, tok) feeds its join straight from its buckets and
    // only the batch-sized sides ever shuffle (gated in
    // BucketedJoinSuite). Corpus and batch doc ids must be disjoint
    // (they are distinct ingest generations by contract).
    def joinCond(a: String, b: String) =
      col(s"$a.blk") === col(s"$b.blk") && col(s"$a.tok") === col(s"$b.tok") &&
        col(s"$a.n_tok") * lit(threshold) <= col(s"$b.n_tok") &&
        col(s"$b.n_tok") * lit(threshold) <= col(s"$a.n_tok")
    def score(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("jaccard",
        col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cross = corpusIndex.as("a").join(probe.as("b"),
        joinCond("a", "b") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_tok").as("n_a"), col("b.n_tok").as("n_b"))
    val within = probe.as("a").join(probe.as("b"),
        joinCond("a", "b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_tok").as("n_a"), col("b.n_tok").as("n_b"))
    score(cross).unionByName(score(within))
  }

  // ---------------------------------------------------------------------
  // Hybrid (lexical ∧ semantic) near-dup

  /** Consensus near-dup pairs: lexically similar (token Jaccard ≥
    * `lexThreshold`, from [[jaccardPairs]]) AND semantically similar
    * (embedding cosine ≥ `semThreshold`). Lexical overlap alone flags
    * boilerplate that shares phrasing but not content; embedding cosine
    * alone flags paraphrases that share no tokens with anything — the
    * conjunction is the high-precision dedup signal a curation pipeline
    * uses when a false drop is expensive.
    *
    * Scale notes: candidate generation is entirely the lexical inverted
    * index (with its token-df skew cap — the 100 TB guard); embeddings
    * enter only for SURVIVING candidate pairs, joined by id, so the wide
    * vector column never rides the candidate self-join. The two id-joins
    * hash-partition on doc id at scale (broadcast if the pair set is
    * small); cosine verification is a per-row map.
    *
    * @param embeddings (vec_id, embedding) keyed by the same ids as
    *        `docs.doc_id`. The embedding joins are INNER: a candidate
    *        pair either of whose docs lacks an embedding is dropped (no
    *        semantic evidence → no consensus). Callers wanting
    *        lexical-only fallback for unembedded docs should union
    *        [[jaccardPairs]] filtered to those ids.
    */
  def hybridPairs(docs: DataFrame, embeddings: DataFrame,
                  lexThreshold: Double, semThreshold: Double,
                  blockCol: String = "source",
                  maxTokenDf: Int = 1000): DataFrame = {
    val lex = jaccardPairs(docs, lexThreshold, blockCol, maxTokenDf)
    val v = embeddings.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    lex
      .join(v.select(col("vec_id").as("doc_a"), col("v").as("va")), "doc_a")
      .join(v.select(col("vec_id").as("doc_b"), col("v").as("vb")), "doc_b")
      .withColumn("cos", safeCosine(col("va"), col("vb")))
      .filter(col("cos") >= semThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        round(col("cos"), 6).as("cos_sim"))
  }

  // ---------------------------------------------------------------------
  // Cross-source duplicate-rate matrix

  /** For every pair of sources, how many distinct (normalized) documents
    * they share — the contamination/provenance diagnostic a multi-source
    * corpus needs before mixing ("how much of src1 is already in src0?").
    *
    * Shape: ONE shuffle, on the content digest. Each digest group folds
    * to its distinct source set (map-side combined `collect_set` over a
    * domain bounded by the number of sources, not the corpus); source
    * pairs then expand map-side from those tiny arrays and aggregate —
    * no digest self-join, so a hot digest costs O(sources²), not
    * O(copies²).
    */
  def crossSourceOverlap(docs: DataFrame, textCol: String = "text",
                         normalize: Column => Column = identity): DataFrame = {
    val bySrc = docs
      .select(md5(normalize(col(textCol))).as("dg"), col("source"))
      .groupBy(col("dg")).agg(array_sort(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
    bySrc
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // ---------------------------------------------------------------------

  /** DuckDB mirror of [[jaccardPairs]]' capped mode: candidate pairs must
    * share a token with block-df ≤ `cap`; Jaccard over the FULL token
    * sets (the implementation's hot-token correction makes the measure
    * exact even though hot tokens never enter the candidate join).
    */
  private def cappedJaccardOracle(cap: Int): String = s"""
        WITH toksets AS (
          SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
        tok AS (SELECT doc_id, source, unnest(toks) AS tok FROM toksets),
        df AS (SELECT source, tok, COUNT(*) AS df FROM tok GROUP BY 1, 2),
        rare AS (
          SELECT t.doc_id, t.source, t.tok
          FROM tok t JOIN df USING (source, tok) WHERE df <= $cap),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM rare a JOIN rare b
            ON a.source = b.source AND a.tok = b.tok AND a.doc_id < b.doc_id)
        SELECT c.doc_a, c.doc_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        FROM cand c
          JOIN toksets a ON c.doc_a = a.doc_id
          JOIN toksets b ON c.doc_b = b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
        ORDER BY doc_a, doc_b"""

  /** Join-key SKEW diagnostic — the measurement that justifies every
    * cap/salt parameter in the candidate-generation family: per-key
    * counts of a prospective self-join key, weighted QUADRATICALLY
    * (`pair_work = cnt·(cnt−1)/2` — the pairs an equality self-join
    * would emit per bucket), with each top bucket's share of the TOTAL
    * pair work in exact integer µ units. A bucket with 1% of the rows
    * can hold 90% of the join work; row-count views (q63's df histogram,
    * q110's heavy hitters) cannot see that, which is why capByKey's
    * `maxN` and jaccardPairs' df cap are tuned against THIS number.
    *
    * Scale shape: one map-side-combined count per key, a TakeOrdered
    * top-N (never a global sort), and a 1-row global rollup broadcast
    * back — the row stream itself never reshuffles. The µ share routes
    * through DECIMAL(38,0) so it is exact for any long-sized pair_work;
    * `cnt` itself is envelope-guarded (a key would need > 3·10⁹ rows to
    * overflow pair_work — raise_error names the key instead of wrapping).
    */
  def joinKeySkewReport(rows: DataFrame, keyCols: Seq[String],
                        topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "joinKeySkewReport: need at least one key column")
    require(topN > 0, s"joinKeySkewReport: topN must be positive, got $topN")
    val cnts = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pair_work",
        when(col("cnt") > 3000000000L,
          expr("raise_error(CONCAT('joinKeySkewReport: key count ', cnt, " +
            "' overflows the long pair_work envelope'))").cast("long"))
          .otherwise(expr("(cnt * (cnt - 1)) div 2")))
    // the TOTAL sums in DECIMAL(38,0): at the documented corpus scale a
    // long total can overflow even when every per-key pair_work fits;
    // it is re-narrowed to long behind a loud guard for the output row
    val tot = cnts.agg(
      sum(col("cnt")).cast("long").as("total_rows"),
      count(lit(1)).as("n_keys"),
      sum(col("pair_work").cast("decimal(38,0)")).as("__tpw"))
    val order = col("cnt").desc +: keyCols.map(col(_).asc)
    cnts.orderBy(order: _*).limit(topN)
      .crossJoin(broadcast(tot))
      .withColumn("work_share_micro",
        when(col("__tpw") === 0, lit(0L))
          .otherwise(expr(
            "CAST(CAST(pair_work AS DECIMAL(38,0)) * 1000000 div __tpw AS BIGINT)")))
      .withColumn("total_pair_work",
        when(col("__tpw") > lit(Long.MaxValue),
          expr("raise_error(CONCAT('joinKeySkewReport: total pair work ', " +
            "__tpw, ' overflows the long output column'))").cast("long"))
          .otherwise(col("__tpw").cast("long")))
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .select((col("rank") +: keyCols.map(col)) ++
        Seq(col("cnt"), col("pair_work"), col("work_share_micro"),
          col("total_rows"), col("n_keys"), col("total_pair_work")): _*)
  }

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q30_dedup_exact",
      (s, d) => {
        import s.implicits._
        exact(Tables.documents(s, d))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_unique_docs"), sum($"n_chars").as("sum_chars"))
          .orderBy($"lang")
      },
      Some("""
        SELECT lang, COUNT(*) AS n_unique_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM (
          SELECT lang, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents)
        WHERE rn = 1
        GROUP BY lang
        ORDER BY lang""")),

    // Incremental ingest: docs < 250 stand in for the already-ingested
    // corpus (as a digest index), the rest arrive as a batch. Digests are
    // over the 100-char normalized prefix so the gate is non-vacuous on
    // this corpus (12 batch docs collide with the corpus, 7 within the
    // batch at sf0.01) — raw texts here are unique by construction.
    QuerySpec(
      "q74_dedup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val norm = (t: Column) => substring(t, 1, 100)
        val index = digestIndex(docs.filter(col("doc_id") < 250), normalize = norm)
        exactIncremental(docs.filter(col("doc_id") >= 250), index, normalize = norm)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_new"),
            sum(col("n_chars")).cast("bigint").as("sum_chars"))
          .orderBy(col("source"))
      },
      Some("""
        WITH existing AS (
          SELECT DISTINCT md5(substr(text,1,100)) AS digest
          FROM documents WHERE doc_id < 250),
        incoming AS (
          SELECT *, md5(substr(text,1,100)) AS digest
          FROM documents WHERE doc_id >= 250),
        fresh AS (
          SELECT * FROM incoming
          WHERE digest NOT IN (SELECT digest FROM existing)),
        kept AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
            FROM fresh)
          WHERE rn = 1)
        SELECT source, COUNT(*) AS n_new, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM kept GROUP BY source ORDER BY source""")),

    QuerySpec(
      "q31_jaccard_pairs",
      // exact mode (no token-df cap): this query is gated against an exact
      // all-pairs DuckDB oracle. The capped production mode is exercised
      // by q37/q96, whose oracles mirror the capped candidate rule.
      (s, d) => jaccardPairs(Tables.documents(s, d), 0.5, maxTokenDf = Int.MaxValue)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH toksets AS (
          SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        FROM toksets a JOIN toksets b ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks)) > 0
          AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Production mode of the same operator: token-df skew cap ON (the
    // 100 TB guard — one block-wide stopword must not regenerate the
    // all-pairs join). Cap 100 actually FIRES at bench scale (max block
    // df ≈ 214 at sf0.1), so the hot-token exclusion + exact correction
    // paths run for real, not vacuously. The cap's semantics are
    // deterministic — candidates must share a token with df ≤ cap,
    // Jaccard itself stays exact via the hot-token correction — so the
    // production mode is FULLY oracle-gated: the oracle mirrors the
    // candidate rule. q96 gates the same rule with a cap tight enough to
    // bite at sf0.01 too (max df there is 24 → cap=100 ≡ exact at verify
    // scale, while cap=8 prunes 4439 pairs down to 6).
    QuerySpec(
      "q37_jaccard_capped",
      (s, d) => jaccardPairs(Tables.documents(s, d), 0.5, maxTokenDf = 100)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(cappedJaccardOracle(100))),

    QuerySpec(
      "q96_jaccard_capped_tight",
      (s, d) => jaccardPairs(Tables.documents(s, d), 0.5, maxTokenDf = 8)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(cappedJaccardOracle(8))),

    QuerySpec(
      "q45_cosine_dedup",
      (s, d) => cosinePairs(Tables.embeddings(s, d), 0.35)
        .orderBy(col("vec_a"), col("vec_b")),
      Some("""
        WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             pairs AS (
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                      list_reduce(list_prepend(0.0,
                        list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y)
                      / (sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(a.v, a.v), p -> p[1] * p[2])), (x, y) -> x + y))
                       * sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(b.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y))) AS cos
               FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, round(cos, 6) AS cos_sim
        FROM pairs
        WHERE cos >= 0.35
        ORDER BY vec_a, vec_b""")),

    // LSH-bucketed variant: recall < 1 by design → rows-only check.
    // These rows-only pair specs sort WITHIN partitions, not globally: a
    // global orderBy adds a range-sampling pass that re-executes the
    // expensive verify stage end-to-end (measured 2x on q32 at sf0.1),
    // and the driver's check for oracle-less queries is row count —
    // order buys nothing but the recompute.
    QuerySpec(
      "q46_cosine_dedup_lsh",
      (s, d) => cosinePairsLsh(Tables.embeddings(s, d), 0.35)
        .sortWithinPartitions(col("vec_a"), col("vec_b")),
      None),

    // SemDeDup cluster-then-prune semantic dedup: seeded k-means defines
    // the candidate topology, so no SQL oracle can exist — spec-gated in
    // SemDeDupSuite (nClusters=1 ≡ exact all-pairs cosinePairs losers;
    // separated-fixture cluster mode ≡ exact; min-id keeper; cap guard).
    QuerySpec(
      "q128_semdedup",
      (s, d) => semDeDup(Tables.embeddings(s, d), threshold = 0.35,
          nClusters = 16)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("label")),
      None),

    // Batch-incremental SemDeDup against the persisted cell index: the
    // LAST 250 vectors stand for the indexed corpus (index built once
    // per sf-dir per JVM — the q102 memo discipline), the first 250
    // arrive as the nightly batch. append=false keeps repeated
    // verify/bench passes pure. Same no-SQL-oracle reason as q128
    // (seeded k-means topology) → spec-gated in SemDeDupIndexSuite
    // (build ∪ incremental ≡ full frozen-model run on the union;
    // partition-pruned probe; retroactive losers; union cap).
    QuerySpec(
      "q134_semdedup_incr",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val dir = cachedSemDeDupIndex(s, d)
        val losers = semDeDupIncremental(emb.filter(col("vec_id") < 250),
          dir, threshold = 0.35, append = false)
        emb.join(losers, Seq("vec_id"), "left_semi")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_losers"))
          .orderBy(col("label"))
      },
      None),

    // MinHash-LSH and SimHash use engine-specific hash fns → rows-only check.
    QuerySpec(
      "q32_minhash_lsh",
      (s, d) => minhashLsh(Tables.documents(s, d), 0.5)
        .sortWithinPartitions(col("doc_a"), col("doc_b")),
      None),

    QuerySpec(
      "q33_simhash",
      (s, d) => simhashPairs(Tables.documents(s, d), 16)
        .sortWithinPartitions(col("doc_a"), col("doc_b")),
      None),

    // character-shingle MinHash (shingle→minhash→band→bucket-join): the
    // near-dup pipeline that survives token-boundary edits
    QuerySpec(
      "q47_minhash_shingles",
      (s, d) => minhashLsh(Tables.documents(s, d), 0.5, shingleK = 5)
        .sortWithinPartitions(col("doc_a"), col("doc_b")),
      None),

    // pairs → clusters → one retained doc per cluster: exact Jaccard pairs
    // (the q31-gated operator) through connectedComponents; oracle is a
    // DuckDB recursive CTE computing min-reachable-id per node — same
    // canonicalization, independent formulation.
    QuerySpec(
      "q49_dedup_clusters",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = jaccardPairs(docs, 0.5, maxTokenDf = Int.MaxValue)
        dedupClusters(docs, pairs)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("retained")).cast("bigint").as("n_retained"),
            countDistinct(col("comp")).as("n_clusters"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH RECURSIVE toksets AS (
          SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM toksets a JOIN toksets b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.toks, b.toks)) > 0
            AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
        reach(id, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT re.id, e.dst FROM reach re JOIN edges e ON e.src = re.r),
        comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
        SELECT d.lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN COALESCE(c.comp, d.doc_id) = d.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               COUNT(DISTINCT COALESCE(c.comp, d.doc_id)) AS n_clusters
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        GROUP BY d.lang ORDER BY d.lang""")),

    // Hybrid consensus dedup: exact-mode lexical candidates (gated by the
    // same oracle construction as q31) intersected with an embedding-
    // cosine floor. Thresholds chosen non-vacuously for this corpus: at
    // sf0.01, 4439 lexical pairs, of which ~40% clear cos ≥ 0.05 — the
    // semantic gate does real work. Jaccard is an exact int ratio and the
    // pairwise dot runs in array-index order in both engines → the
    // doubles are bit-identical (q45 pattern), cosine rounded to 6dp.
    QuerySpec(
      "q77_hybrid_dedup",
      (s, d) => hybridPairs(Tables.documents(s, d), Tables.embeddings(s, d),
          lexThreshold = 0.5, semThreshold = 0.05, maxTokenDf = Int.MaxValue)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""
        WITH toksets AS (
          SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
        lex AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
          FROM toksets a JOIN toksets b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        hyb AS (
          SELECT doc_a, doc_b, jaccard,
                 list_reduce(list_prepend(0.0,
                   list_transform(list_zip(a.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y)
                 / (sqrt(list_reduce(list_prepend(0.0,
                      list_transform(list_zip(a.v, a.v), p -> p[1] * p[2])), (x, y) -> x + y))
                  * sqrt(list_reduce(list_prepend(0.0,
                      list_transform(list_zip(b.v, b.v), p -> p[1] * p[2])), (x, y) -> x + y))) AS cos
          FROM lex JOIN c a ON a.vec_id = lex.doc_a JOIN c b ON b.vec_id = lex.doc_b)
        SELECT doc_a, doc_b, jaccard, round(cos, 6) AS cos_sim
        FROM hyb WHERE cos >= 0.05
        ORDER BY doc_a, doc_b""")),

    // Production tier of q49: clusters over CAPPED pairs (maxTokenDf =
    // 100, the q37 skew guard — it fires on this corpus at sf0.1).
    // Capped candidate recall is data-dependent → rows-only; exactness
    // of the clustering itself is gated by q49 at sf0.01 and the
    // capped-⊆-exact containment by DedupGuardSuite. This is the
    // formulation the sf0.1 bench times.
    QuerySpec(
      "q91_clusters_capped",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = jaccardPairs(docs, 0.5, maxTokenDf = 100)
        dedupClusters(docs, pairs)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("retained")).cast("bigint").as("n_retained"),
            countDistinct(col("comp")).as("n_clusters"))
          .orderBy(col("lang"))
      },
      None),

    // Production tier of q77: hybrid consensus over capped lexical
    // candidates — same containment gate as q91; rows-only by design.
    QuerySpec(
      "q92_hybrid_capped",
      (s, d) => hybridPairs(Tables.documents(s, d), Tables.embeddings(s, d),
          lexThreshold = 0.5, semThreshold = 0.05, maxTokenDf = 100)
        .sortWithinPartitions(col("doc_a"), col("doc_b")), // see q46 note
      None),

    // Cross-source duplicate matrix over prefix-100 digests (raw texts
    // are unique by construction — q74 pattern; 23 shared digests across
    // source pairs at sf0.01, so the matrix is non-trivial).
    QuerySpec(
      "q79_cross_source_overlap",
      (s, d) => crossSourceOverlap(Tables.documents(s, d),
          normalize = t => substring(t, 1, 100))
        .orderBy(col("src_a"), col("src_b")),
      Some("""
        WITH h AS (
          SELECT DISTINCT md5(substr(text, 1, 100)) AS dg, source FROM documents)
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
        FROM h a JOIN h b ON a.dg = b.dg AND a.source < b.source
        GROUP BY a.source, b.source
        ORDER BY src_a, src_b""")),

    // Per-source KMV sketches (r12): bottom-64 distinct 60-bit content
    // hashes per source via the bounded typed Aggregator, with the
    // (k-1)·2^60/h_k distinct estimate — the sketch is EXACTLY
    // sortedDistinct.take(k), so the whole row (including the csv'd
    // sketch itself) hash-gates against the oracle's
    // list_sort(list(DISTINCT …))[1:k]. k=64 fills at sf0.01 (~230
    // docs/source), so the estimator branch runs for real.
    QuerySpec(
      "q155_source_sketches",
      (s, d) => sourceSketches(Tables.documents(s, d), k = 64)
        .orderBy(col("source")),
      Some("""
        WITH h AS (
          SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
          FROM documents),
        sk AS (
          SELECT source, list_sort(list(DISTINCT hv))[1:64] AS kmv
          FROM h GROUP BY source)
        SELECT source,
               CAST(len(kmv) AS BIGINT) AS n_kmv,
               CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
                    ELSE (CAST(63 AS HUGEINT) * 1152921504606846976)
                         // kmv[64] END AS BIGINT) AS est_distinct,
               array_to_string(list_transform(kmv, v -> CAST(v AS VARCHAR)),
                 ',') AS kmv_csv
        FROM sk ORDER BY source""")),

    // Incremental sketch index (r12): corpus sketches built and
    // persisted once (doc_id < 250), the batch generation appended
    // (>= 250, work ∝ batch — the index is never read by the append),
    // generations merged at read. KMV merge is LOSSLESS by algebra
    // (bottom-k of a union ≡ bottom-k of the sketches' union), so the
    // oracle is LITERALLY the full-corpus q155 construction — the
    // incremental identity is what the hash gate proves.
    QuerySpec(
      "q157_sketch_incr",
      (s, d) => readSketchIndex(s, cachedSketchIndex(s, d), k = 64)
        .orderBy(col("source")),
      Some("""
        WITH h AS (
          SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
          FROM documents),
        sk AS (
          SELECT source, list_sort(list(DISTINCT hv))[1:64] AS kmv
          FROM h GROUP BY source)
        SELECT source,
               CAST(len(kmv) AS BIGINT) AS n_kmv,
               CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
                    ELSE (CAST(63 AS HUGEINT) * 1152921504606846976)
                         // kmv[64] END AS BIGINT) AS est_distinct,
               array_to_string(list_transform(kmv, v -> CAST(v AS VARCHAR)),
                 ',') AS kmv_csv
        FROM sk ORDER BY source""")),

    // Distinct-content drift between sketch-index snapshots (r14): per
    // source, the KMV estimate at the last audit (doc_id < 250) vs the
    // grown corpus — which sources ingested genuinely new content vs
    // duplicates. Oracle = two direct q155 constructions diffed; the
    // estimates are exact-DECIMAL divisions, so even the DELTA
    // hash-gates exactly.
    QuerySpec(
      "q180_sketch_drift",
      (s, d) => sketchIndexDrift(s, cachedSketchIndexOld(s, d),
          cachedSketchIndex(s, d), k = 64)
        .orderBy(col("source")),
      Some("""
        WITH h AS (
          SELECT source, doc_id,
                 ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
          FROM documents),
        so AS (
          SELECT source, list_sort(list(DISTINCT hv))[1:64] AS kmv
          FROM h WHERE doc_id < 250 GROUP BY source),
        sn AS (
          SELECT source, list_sort(list(DISTINCT hv))[1:64] AS kmv
          FROM h GROUP BY source),
        eo AS (
          SELECT source,
                 CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
                      ELSE (CAST(63 AS HUGEINT) * 1152921504606846976)
                           // kmv[64] END AS BIGINT) AS est_old
          FROM so),
        en AS (
          SELECT source,
                 CAST(CASE WHEN len(kmv) < 64 THEN len(kmv)
                      ELSE (CAST(63 AS HUGEINT) * 1152921504606846976)
                           // kmv[64] END AS BIGINT) AS est_new
          FROM sn)
        SELECT COALESCE(eo.source, en.source) AS source,
               CAST(COALESCE(eo.est_old, 0) AS BIGINT) AS est_old,
               CAST(COALESCE(en.est_new, 0) AS BIGINT) AS est_new,
               CAST(COALESCE(en.est_new, 0) - COALESCE(eo.est_old, 0)
                 AS BIGINT) AS delta_est
        FROM eo FULL OUTER JOIN en ON eo.source = en.source
        ORDER BY source""")),

    // Sketch-estimated cross-source overlap (r12): the 100 TB tier of
    // q79's exact matrix — min-wise resemblance from the q155 KMV
    // sketches (merge, keep k smallest of the union, count those in
    // both). Deterministic sketch algebra end-to-end, so even the
    // ESTIMATE hash-gates exactly; est_jaccard_micro is an exact
    // integer div (no float rounding to disagree on).
    QuerySpec(
      "q156_sketch_overlap",
      // prefix-100 normalization (the q74/q79 fixture discipline): raw
      // texts are unique by construction, normalized digests collide
      // across sources, so the resemblance estimate is non-vacuous
      (s, d) => sketchOverlap(Tables.documents(s, d), k = 64,
          normalize = t => substring(t, 1, 100))
        .orderBy(col("src_a"), col("src_b")),
      Some("""
        WITH h AS (
          SELECT source,
                 ('0x' || substr(md5(substr(text, 1, 100)), 1, 15))::BIGINT
                   AS hv
          FROM documents),
        sk AS (
          SELECT source, list_sort(list(DISTINCT hv))[1:64] AS kmv
          FROM h GROUP BY source),
        p AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 a.kmv AS ka, b.kmv AS kb,
                 list_sort(list_distinct(a.kmv || b.kmv))[1:64] AS m
          FROM sk a JOIN sk b ON a.source < b.source),
        c AS (
          SELECT src_a, src_b, m,
                 len(list_filter(m, v -> list_contains(ka, v)
                     AND list_contains(kb, v))) AS inter
          FROM p)
        SELECT src_a, src_b,
               CAST(inter AS BIGINT) AS n_shared_sketch,
               CAST((CAST(inter AS HUGEINT) * 1000000)
                    // least(64, len(m)) AS BIGINT) AS est_jaccard_micro
        FROM c ORDER BY src_a, src_b""")),

    // Incremental near-dup: the FIRST 250 docs arrive as the batch; all
    // later ids stand in for the already-ingested corpus (as a persisted
    // token index). The batch side is the fixed-size slice ON PURPOSE —
    // at every SF the benched shape stays "small daily batch probing a
    // big corpus index", which is the workload the operator exists for
    // (the other orientation would grow the batch with the SF and
    // converge back to q31's full all-pairs cost). Pairs are
    // corpus→batch and within-batch only; corpus×corpus near-dups are
    // deliberately absent (recomputing them is exactly what incremental
    // avoids).
    QuerySpec(
      "q81_neardup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val index = tokenIndex(docs.filter(col("doc_id") >= 250))
        jaccardPairsIncremental(index, docs.filter(col("doc_id") < 250), 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH toksets AS (
          SELECT doc_id, source, doc_id < 250 AS is_new,
                 list_distinct(string_split(text, ' ')) AS toks
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        FROM toksets a JOIN toksets b
          ON a.source = b.source AND b.is_new
         AND (NOT a.is_new OR a.doc_id < b.doc_id) AND a.doc_id <> b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // Join-key skew diagnostic on the 6-gram inverted index (r12): the
    // quadratic pair-work view that tunes the df cap — the top grams by
    // self-join work with their exact µ share of the total, fully
    // hash-gated (row counts, pair work, and shares are all integers).
    QuerySpec(
      "q164_gram_skew",
      (s, d) => joinKeySkewReport(
          TextOps.explodedGrams(Tables.documents(s, d), 6, Seq.empty),
          Seq("gram"), topN = 10)
        .orderBy(col("rank")),
      Some("""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        g AS (SELECT array_to_string(t[i:i+5], ' ') AS gram
              FROM toks, UNNEST(generate_series(1, greatest(len(t) - 5, 0))) AS u(i)),
        c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY gram),
        cw AS (SELECT gram, cnt,
                      CAST(cnt * (cnt - 1) // 2 AS BIGINT) AS pair_work
               FROM c),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                       CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(SUM(pair_work) AS BIGINT) AS total_pair_work
                FROM cw)
        SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rank,
               gram, cnt, pair_work,
               CAST((pair_work * 1000000) // total_pair_work AS BIGINT)
                 AS work_share_micro,
               total_rows, n_keys, total_pair_work
        FROM cw, tot
        ORDER BY cnt DESC, gram LIMIT 10"""))
  )
}
