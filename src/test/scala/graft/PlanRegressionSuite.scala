package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression gates. Correctness is the oracle's job; these
  * pin the SHAPE properties that make each plan survive a 100× scale-up —
  * pushdown reaching the scan, small dims broadcast, partial aggregation,
  * and (globally) the absence of unbounded cartesian products. A future
  * edit that silently turns an inverted-index join into an all-pairs
  * product fails here, not in a 100 TB run.
  */
class PlanRegressionSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-regression")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: filter is pushed into the parquet scan") {
    val p = plan("q02_revenue_filter")
    assert(p.contains("PushedFilters: ["), s"no pushdown section:\n$p")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      s"PushedFilters list is empty:\n$p")
  }

  test("q01: scan is column-pruned (no l_comment in ReadSchema)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"), s"no ReadSchema:\n$p")
    assert(!p.contains("l_comment"),
      "aggregation query reads l_comment — column pruning regressed")
  }

  test("q01: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate pair:\n$p")
  }

  test("q03: dimension joins broadcast (no shuffle of the fact table per dim)") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"small dims are not broadcast:\n$p")
  }

  test("q40: query side of brute-force top-k is broadcast") {
    val p = plan("q40_cosine_topk")
    assert(p.contains("BroadcastExchange"),
      s"query vectors should broadcast, corpus should never shuffle:\n$p")
  }

  test("sessionize: both window frames share ONE Exchange + ONE Sort") {
    // the lag and the running sum use the same partitionBy/orderBy spec,
    // so Catalyst must plan a single shuffle + sort and evaluate both in
    // one Window pass — two exchanges here means the spec drifted
    val df = graft.operators.Sessionize.sessionize(
      Tables.events(spark, sfDir), "user_id", "ts", "event_id", 1800L * 1000000000L)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange".r.findAllIn(p).size
    val sorts = "(?m)Sort \\(".r.findAllIn(p).size
    assert(exchanges === 1, s"expected one shuffle, got $exchanges:\n$p")
    assert(sorts === 1, s"expected one sort, got $sorts:\n$p")
  }

  test("q31: exact jaccard stays an inverted-index hash join") {
    val p = plan("q31_jaccard_pairs")
    // keyed equi-join (broadcast at this tiny SF, shuffle-keyed at scale)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
      s"expected a keyed join on (blk, tok):\n$p")
    assert(!p.contains("CartesianProduct"),
      "jaccard pair generation degenerated to an all-pairs product")
  }

  test("q65: decontamination semi-join broadcasts the eval grams") {
    // the corpus side must stream map-side through the semi-join; a
    // shuffled semi-join here means the 100 TB corpus gets repartitioned
    // by gram just to probe a benchmark-sized eval set
    val p = plan("q65_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"eval-gram probe is not a broadcast semi-join:\n$p")
  }

  test("q67: packing cumsum is a distributed prefix sum, not a stratum window") {
    // the running sum must NOT be a per-stratum window (one giant source
    // would funnel its whole cumsum onto a single task); the kernel path
    // surfaces as an ExistingRDD scan, and the only hash exchange is the
    // downstream groupBy(source, chunk_id)
    val p = plan("q67_pack_sequences")
    assert(!p.contains("Window"),
      s"packing must not plan a per-stratum window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the prefix-sum kernel's RDD scan:\n$p")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, found $hashEx:\n$p")
  }

  test("q176: token quota is the prefix-sum kernel, not a per-source window") {
    // admission = chunk 0 of the packSequences kernel under a hash key:
    // no Window (a per-source cumsum window would funnel a giant source
    // onto one task), the kernel surfaces as an ExistingRDD scan
    val p = plan("q176_token_quota")
    assert(!p.contains("Window"),
      s"quota must not plan a per-source window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the prefix-sum kernel's RDD scan:\n$p")
  }

  test("q169: training order is the count-offset kernel, not a window or global sort") {
    // the permutation's global position must come from the two-pass
    // count-offset kernel (ExistingRDD scan), never a ROW_NUMBER window
    // (one task ranks everything) — only the presentation orderBy(pos)
    // above the kernel may sort, and it sorts kernel OUTPUT rows
    val p = plan("q169_training_order")
    assert(!p.contains("Window"),
      s"training order must not plan a ranking window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the count-offset kernel's RDD scan:\n$p")
  }

  test("q179: the serve tier is a pure projection — no joins, no hash exchange") {
    // the admission-gate contract: the eval gram set rides the plan as
    // the compiled gram_set_starts expression, so the only exchange in
    // the whole query is the PRESENTATION orderBy's range layout; a Join
    // or hash exchange would mean the serve tier regressed into the
    // batch tier's shape and can no longer run on a stream
    val p = plan("q179_decontaminate_serve")
    assert(p.contains("gram_set_starts"),
      s"expected the compiled set-membership expression:\n$p")
    assert(!p.contains("Join"), s"the serve tier may not join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"the serve tier may not hash-shuffle:\n$p")
  }

  test("q178/q180/q181: drift + graded from-index tiers never re-tokenize the corpus") {
    // the family property: every from-index screen reads pos/ (or
    // sketches/) and broadcasts the small side; the ONLY Generates are
    // eval-side gram explodes. q178 composes two q174 probes over TWO
    // tagged eval sets → ≤ 2 evals × 2 probes = 4; q181 has one eval
    // side → ≤1; q180 reads sketch rows only → 0. The corpus
    // contributes only pos/ scans — a fifth Generate would mean corpus
    // text is being re-tokenized.
    def generates(p: String) = """\(\d+\) Generate""".r.findAllIn(p).size
    val p178 = plan("q178_contamination_drift")
    assert(p178.contains("BroadcastHashJoin") && generates(p178) <= 4,
      s"q178 corpus side must not re-derive grams (${generates(p178)}):\n$p178")
    val p181 = plan("q181_contamination_rate_from_index")
    assert(p181.contains("BroadcastHashJoin") && generates(p181) <= 1,
      s"q181 corpus side must not re-derive grams (${generates(p181)}):\n$p181")
    // q181's distinct counts must partially aggregate before the doc
    // exchange (pos/ repeats grams per occurrence)
    assert(p181.contains("partial_"),
      s"q181 distinct-count must partial-aggregate map-side:\n$p181")
    val p180 = plan("q180_sketch_drift")
    assert(generates(p180) == 0 && !p180.contains("split("),
      s"q180 touches sketch rows only — no tokenize, no explode:\n$p180")
  }

  test("q182: curriculum order is the count-offset kernel — no window; band leads ONE range exchange") {
    val p = plan("q182_curriculum_order")
    assert(!p.contains("Window"),
      s"curriculum order must not plan a ranking window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the count-offset kernel's RDD scan:\n$p")
    // the pre-pass: band leads the range layout so bands are contiguous
    // while the trailing hash still spreads a band across the cluster
    val chunks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        (org.apache.spark.sql.functions.col("doc_id") % 3).as("band"))
    val pp = graft.operators.Pipeline
      .orderedByHash(chunks, seed = 7L, keyCols = Seq("doc_id"),
        prefixCols = Seq("band"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pp.contains("rangepartitioning(band"),
      s"band must lead the range exchange:\n$pp")
    assert("rangepartitioning".r.findAllIn(pp).size == 1 && !pp.contains("Window"),
      s"exactly one range exchange, no window:\n$pp")
  }

  test("q177: epoch schedule is the count-offset kernel per epoch — no window, no global sort") {
    // each epoch runs the audited q169 kernel verbatim (one range
    // exchange per epoch over the chunk table); the union of epochs may
    // not introduce a ranking window or a global sort anywhere — only
    // the presentation orderBy(epoch, pos) sorts, and it sorts kernel
    // OUTPUT rows
    val p = plan("q177_training_order_epochs")
    assert(!p.contains("Window"),
      s"epoch schedule must not plan a ranking window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the count-offset kernel's RDD scan:\n$p")
    assert(p.contains("Union"),
      s"expected the per-epoch union:\n$p")
  }

  test("q184: epoch curriculum is the kernel per epoch — band leads each range exchange, no window") {
    val p = plan("q184_curriculum_order_epochs")
    assert(!p.contains("Window"),
      s"epoch curriculum must not plan a ranking window:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the count-offset kernel's RDD scan:\n$p")
    assert(p.contains("Union"),
      s"expected the per-epoch union:\n$p")
    // each epoch's pre-pass: ONE range exchange with the band leading —
    // bands stay contiguous per epoch while the epoch-salted hash
    // spreads a band across the cluster (read off the pre-pass: the
    // registered query hides kernel internals behind ExistingRDD)
    val chunks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        (org.apache.spark.sql.functions.col("doc_id") % 3).as("band"))
    (0 to 2).foreach { e =>
      val pp = graft.operators.Pipeline
        .orderedByHash(chunks, seed = 7L ^ e.toLong, keyCols = Seq("doc_id"),
          prefixCols = Seq("band"))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(pp.contains("rangepartitioning(band"),
        s"epoch $e: band must lead the range exchange:\n$pp")
      assert("rangepartitioning".r.findAllIn(pp).size == 1,
        s"epoch $e: exactly one range exchange:\n$pp")
    }
  }

  test("q189 recompaction: one (epoch, pos) range exchange in the pre-pass, kernel output is an RDD scan, no window") {
    val sql = spark; import sql.implicits._
    val order = Seq(("a", 0L, 0L, 0L), ("b", 1L, 2L, 0L), ("c", 2L, 0L, 1L))
      .toDF("stratum", "chunk_id", "pos", "epoch")
    // the pre-pass: epoch leads the range layout (epochs contiguous for
    // the count-offset fold) with pos following inside each epoch block
    val pp = graft.operators.Pipeline.recompactLaid(order, "pos", "epoch")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(pp.contains("rangepartitioning(epoch"),
      s"epoch must lead the range exchange:\n$pp")
    assert("rangepartitioning".r.findAllIn(pp).size == 1 && !pp.contains("Window"),
      s"exactly one range exchange, no window:\n$pp")
    // the kernel output: ExistingRDD, never a ranking window or global sort
    val p = graft.operators.Pipeline.recompactPositions(order)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ExistingRDD") && !p.contains("Window") &&
        !"(?m)^\\s*\\+?-? ?Sort \\(".r.findFirstIn(p).isDefined,
      s"recompaction must be the count-offset kernel, not window/sort:\n$p")
  }

  test("q190 shard manifest: packer kernel behind ExistingRDD, one partial+final aggregate, no window") {
    val sql = spark; import sql.implicits._
    val order = (0L until 40L).map(i => (s"s${i % 3}", i / 3L, i))
      .toDF("stratum", "chunk_id", "pos")
      .dropDuplicates("stratum", "chunk_id")
      .withColumn("pos", org.apache.spark.sql.functions
        .row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("stratum", "chunk_id")).cast("long") - 1L)
    val toks = order.select(org.apache.spark.sql.functions.col("stratum"),
      org.apache.spark.sql.functions.col("chunk_id"),
      (org.apache.spark.sql.functions.col("chunk_id") % 7L + 1L).as("n_tokens"))
    val p = graft.operators.Pipeline.shardManifest(order, toks, 10)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ExistingRDD"),
      s"expected the packing kernel's RDD scan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"manifest aggregate must be partial+final:\n$p")
    assert(!p.contains("Window"),
      s"no window may appear above the kernel:\n$p")
    val exchanges = "(?m)^\\s*\\+?-? ?Exchange".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"exactly the aggregate's exchange above the kernel, got $exchanges:\n$p")
  }

  test("q169 pre-pass: RANGE exchange on the seeded hash, no hash exchange, no Window") {
    // the de-funnel property: the permutation lays out by a range
    // exchange on (__h, keys) — a single hot stratum's chunks spread
    // across the cluster in hash order; nothing shuffles by stratum
    val chunks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("source").as("stratum"),
        (org.apache.spark.sql.functions.col("doc_id") % 37).as("chunk_id"))
      .distinct()
    val p = graft.operators.Pipeline
      .orderedByHash(chunks, seed = 7L, keyCols = Seq("stratum", "chunk_id"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("rangepartitioning(__h"),
      s"expected a range exchange keyed by the seeded hash:\n$p")
    assert(!p.contains("Window"), s"no window may appear in the pre-pass:\n$p")
    // the ordering itself adds exactly ONE exchange (the range layout);
    // any exchange beyond the input's own (here: distinct's) would mean
    // the permutation is double-shuffling the chunk table
    val rangeEx = "rangepartitioning".r.findAllIn(p).size
    assert(rangeEx == 1, s"expected exactly 1 range exchange, got $rangeEx:\n$p")
  }

  test("q175: fluency band rides ONE LM pass — thresholds broadcast back onto the cut") {
    // the fitted band is ≤|langs| rows and must broadcast; the scored
    // frame is cut once (ExistingRDD) and feeds both fit and trim — a
    // second LM pass would double the dominant cost
    val p = plan("q175_fluency_band_trim")
    assert(p.contains("BroadcastHashJoin"),
      s"thresholds must broadcast onto the scored cut:\n$p")
    assert(p.contains("ExistingRDD"),
      s"expected the scored localCheckpoint cut:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing here may sort-merge:\n$p")
  }

  test("q174: matrix-from-index never re-tokenizes — no Generate on the corpus side") {
    // the whole point of the index tier: the corpus's gram stream is
    // READ from pos/, not re-derived — so the corpus-side plan may not
    // contain a single explode (Generate); eval grams (small) still
    // explode on the broadcast side, so the gate pins the SCAN shape:
    // pos/ is a parquet scan and the probe is a broadcast join
    val s = spark
    val docs = graft.Tables.documents(s, sfDir)
    val idx = java.nio.file.Files.createTempDirectory("graft-pg-contamidx").toString
    graft.operators.TextOps.buildSpanIndex(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 40),
      idx, n = 4)
    val meta = docs.filter(org.apache.spark.sql.functions.col("doc_id") >= 40)
      .select("doc_id", "source")
    val evals = Seq("e" -> docs.filter(
      org.apache.spark.sql.functions.col("doc_id") < 20))
    val probe = graft.operators.TextOps.contaminationMatrixFromIndex(
      s, idx, evals, meta, n = 4)
    val p = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // only the eval-gram union is FORCE-broadcast (bounded by
    // construction); the hits join is unhinted — its size is the
    // contamination itself, so AQE picks broadcast-vs-shuffle at runtime
    assert(p.contains("BroadcastHashJoin"),
      s"eval grams must broadcast:\n$p")
    assert(p.contains("pos"), s"expected the pos/ index scan:\n$p")
    // count Generate NODES (formatted explain lists each node twice:
    // once in the tree, once as a "(n) Generate" detail header)
    val generates = """\(\d+\) Generate""".r.findAllIn(p).size
    // exactly ONE Generate is legitimate: the eval set's gram explode
    // (eval-set-sized, feeds the broadcast); a second would mean the
    // corpus text is being re-tokenized
    assert(generates <= 1,
      s"corpus side must not re-derive grams ($generates Generates):\n$p")
  }

  test("q173: surgical decontamination probes eval grams via broadcast semi-join") {
    // the eval gram set is eval-set-sized: the corpus gram stream must
    // stream past it map-side, never sort-merge by gram
    val p = plan("q173_decontaminate_spans")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"eval-gram probe is not a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not sort-merge by gram:\n$p")
  }

  test("q171: materializeMix adds zero shuffles (broadcast plan + map-side explode)") {
    // with a literal plan the operator's own shape is isolated: one
    // BroadcastHashJoin, one Generate (the copy explode), and NO
    // exchange introduced by the mix execution itself
    val sql = spark
    import sql.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val plan = Seq(("src1", 1500000L)).toDF("source", "epochs_micro")
    val p = graft.operators.Pipeline.materializeMix(docs, plan)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"),
      s"plan table must broadcast into the corpus:\n$p")
    assert(p.contains("Generate"), s"expected the copy explode:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"mix execution must not shuffle the corpus:\n$p")
  }

  test("q67 pre-pass: a stratum spans MANY partitions (range exchange on (stratum, id))") {
    // the de-funnel property itself: the ordering exchange is a RANGE
    // partitioning on (source, doc_id) — a single hot source spreads
    // across the cluster instead of landing on one hash partition
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("n_tokens",
        graft.operators.TextOps.tokenCount(org.apache.spark.sql.functions.col("text")))
    val p = graft.operators.Pipeline.packOrdered(docs, "source", "doc_id")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("rangepartitioning(source"),
      s"expected a range exchange on (source, doc_id):\n$p")
    assert(!p.contains("hashpartitioning(source"),
      s"ordering must not hash-partition by the stratum alone:\n$p")
  }

  test("q68: repetition rollup has no shuffle before the partial aggregate") {
    val p = plan("q68_repetition_stats")
    // map-side expression → partial agg → ONE exchange on lang → final agg
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, found $hashEx:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n$p")
  }

  test("q72: mixture rates broadcast back; the corpus is never hash-shuffled pre-filter") {
    val p = plan("q72_temperature_mix")
    assert(p.contains("BroadcastHashJoin"),
      s"rates must join the corpus via broadcast:\n$p")
  }

  test("q74: incremental dedup probes the digest index via broadcast anti-join") {
    // the incoming batch must stream map-side past the corpus index; a
    // shuffled anti-join would repartition the batch by digest just to
    // probe an index that is 16 bytes/doc (broadcastable at any batch:index
    // ratio a daily ingest actually has)
    val p = plan("q74_dedup_incremental")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"digest-index probe is not a broadcast anti-join:\n$p")
  }

  test("q75: quality score is map-side; one exchange feeds the lang rollup") {
    // the score is a pure projection fused into the scan: the only
    // shuffles are the index-free partial→final aggregate on lang
    val p = plan("q75_quality_score")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected 1 hash exchange, found $hashEx:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n$p")
  }

  test("q73: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan("q73_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected distributed partial top-k:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"df/corpus stats must broadcast:\n$p")
  }

  test("q79: overlap matrix plans ZERO joins (digest-group fold, no self-join)") {
    val p = plan("q79_cross_source_overlap")
    assert(!p.contains("Join"),
      s"cross-source overlap must fold digest groups, not self-join them " +
        s"(a hot digest would cost O(copies²)):\n$p")
  }

  test("q80: anchors broadcast; the corpus is never sort-merge-joined") {
    val p = plan("q80_anchor_outliers")
    assert(p.contains("BroadcastHashJoin"), s"anchor joins should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"one-row-per-block anchors must not force a corpus shuffle:\n$p")
  }

  test("q81: incremental near-dup stays a keyed index join") {
    val p = plan("q81_neardup_incremental")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
      s"expected a keyed join on (blk, tok):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"pair scoring should partial-aggregate before the shuffle:\n$p")
  }

  test("q82: chunking is a pure per-row generate (zero exchanges)") {
    // Verify.orderBy adds the output sort; gate the OPERATOR frame itself
    val df = graft.operators.TextOps.chunkDocs(
      Tables.documents(spark, sfDir), chunkTokens = 64, stride = 32)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"),
      s"chunking must not shuffle — it is a function of each row:\n$p")
    assert(p.contains("Generate"), s"expected posexplode Generate:\n$p")
  }

  test("q83: salt is gated on broadcastability of the other side") {
    // r19 contract: at this suite's SF orders fits the broadcast
    // threshold, so the salt must be SKIPPED (replicating the build side
    // of a broadcast join N-fold fixes a reducer skew that cannot occur)
    val p = plan("q83_salted_join")
    assert(!p.contains("__salt"),
      s"broadcastable other side must plan the plain join, no salt:\n$p")
    // and with the cutoff forced to 0 the salt must come back — the
    // 100 TB shape, where neither side broadcasts
    spark.conf.set("spark.graft.saltedJoin.minOtherBytes", "0")
    try {
      val forced = plan("q83_salted_join")
      assert(forced.contains("__salt"),
        s"salted join must key on (orderkey, __salt) when forced:\n$forced")
    } finally spark.conf.unset("spark.graft.saltedJoin.minOtherBytes")
  }

  test("q85: retention is join-free — collect_set, not a cohort join-back") {
    val p = plan("q85_retention_cohorts")
    assert(!p.contains("Join"),
      s"retention must derive the cohort from the per-entity bucket set, " +
        s"not re-join the raw events against a cohort table:\n$p")
  }

  test("q86: attribution is ONE window pass, not a range self-join") {
    val p = plan("q86_last_touch")
    assert(!p.contains("Join"),
      s"last-touch must not self-join events (quadratic on active " +
        s"entities):\n$p")
    assert("Arguments: hashpartitioning".r.findAllIn(plan("q86_last_touch")).size == 1,
      s"expected the single entity-window exchange:\n$p")
    assert(p.contains("Window"), s"expected a Window operator:\n$p")
  }

  test("q87: shard assignment is map-side; one exchange feeds the rollup") {
    val p = plan("q87_train_shards")
    val hashEx = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"shard id must be a scalar projection — only the groupBy(shard) " +
        s"rollup may shuffle; found $hashEx exchanges:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate:\n$p")
  }

  test("q90: span df-count partial-aggregates; no pair explosion join shape") {
    val p = plan("q90_dup_spans")
    // gram df is a counter (HashAggregate), never an all-pairs self-join;
    // the rejoin is keyed on the gram
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"gram document-frequency must partial-aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span audit must stay keyed on the gram:\n$p")
  }

  test("q108: ratio table broadcasts; the gram stream is never sort-merge-joined") {
    val p = plan("q108_importance_reweight")
    assert(p.contains("BroadcastHashJoin"), s"ratio join didn't broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"gram stream shuffled into a sort-merge join:\n$p")
  }

  test("q109: the projection operator itself plans ZERO exchanges (map-side)") {
    val df = graft.operators.Similarity.randomProjectMicro(
      Tables.embeddings(spark, sfDir), 64, 16)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"projection introduced a shuffle:\n$p")
  }

  test("q110: candidate recount is a broadcast semi-join (no vocabulary-wide shuffle of the gram stream into a join)") {
    val p = plan("q110_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"recount isn't a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"gram stream sort-merge-joined:\n$p")
  }

  test("capByKey: skew cap is a broadcast anti-join, never a Window") {
    // the family-wide r10 regression: every near-dup operator computed its
    // prospective bucket cap with count(*).over(Window.partitionBy(key)),
    // which materializes a degenerate bucket's FULL partition on one task
    // before the filter drops it — the exact mega-bucket the cap exists to
    // neutralize. The shared kernel must plan the cappedAssignment shape:
    // map-side count + broadcast anti-join of the over-cap key set.
    val s = spark
    import s.implicits._
    val rows = (1 to 50).map(i => (i.toLong, i % 3, i % 7)).toDF("id", "band", "bucket")
    val capped = graft.operators.Dedup.capByKey(rows, Seq("band", "bucket"), 8)
    val windows = capped.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"cap must not use a Window: $windows")
    val phys = capped.queryExecution.sparkPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      s"over-cap key set must broadcast into an anti-join:\n$phys")
  }

  test("q32/q152: the cap's broadcast anti-join is visible in the final plan, no Window survives") {
    // downstream of capByKey's checkpoint each self-join side replays only
    // the broadcast anti-join — so the final plan must SHOW LeftAnti and
    // must not contain any Window (the old windowed cap hid upstream of
    // the checkpoint; the new shape is visible and gateable)
    for (name <- Seq("q32_minhash_lsh", "q152_cdc_neardup")) {
      val p = plan(name)
      assert(p.contains("LeftAnti"),
        s"$name: capByKey broadcast anti-join missing from plan:\n$p")
      assert(!p.contains("Window"),
        s"$name: a Window survives in the post-checkpoint plan:\n$p")
    }
  }

  test("q160: the trim's threshold join broadcasts; the corpus is never sort-merge-joined") {
    // the band is a ≤|sources|-row fitted model: it must ride a broadcast
    // hash join onto the single corpus scan — a sort-merge join here
    // would shuffle the whole corpus for a handful of thresholds
    val p = plan("q160_length_band_trim")
    assert(p.contains("BroadcastHashJoin"),
      s"threshold join didn't broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled into a sort-merge join:\n$p")
  }

  test("q158/q161: quantile/drift windows run over bucket rows only") {
    // the histogram family's contract: windows are legal ONLY after the
    // (source, rep) aggregation has reduced the corpus to bounded bucket
    // tables — every Window in the optimized plan must sit above an
    // Aggregate, never directly on the scan
    for (name <- Seq("q158_length_quantiles", "q161_length_drift")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val lp = df.queryExecution.optimizedPlan
      val badWindows = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.collectFirst {
              case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
            }.isEmpty => w
      }
      assert(badWindows.isEmpty,
        s"$name: a window runs below any aggregate (directly over doc rows):\n$lp")
    }
  }

  test("q164: skew top-N is TakeOrdered; the global rollup broadcasts back") {
    // the diagnostic must not pay a global sort of the key-count table
    // (TakeOrderedAndProject keeps per-partition heaps), and the 1-row
    // totals must come back as a broadcast, never a shuffle
    val p = plan("q164_gram_skew")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-N planned as a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"global rollup didn't broadcast:\n$p")
  }

  test("q167: ONE corpus gram pass serves all eval sets (broadcast union, no sort-merge)") {
    // the matrix's reason to exist: adding a benchmark must add broadcast
    // rows, never another corpus scan or a corpus-side shuffle join
    val p = plan("q167_contamination_matrix")
    assert(p.contains("BroadcastHashJoin"),
      s"tagged eval grams didn't broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus gram stream shuffled into a sort-merge join:\n$p")
  }

  test("q197: readShard's position slice is PUSHED to the order scan") {
    // the read-side contract's scale property: a reader materializes ONE
    // shard by a pos-range filter the parquet reader row-group-prunes
    // (order/ is written in pos order, so min/max stats line up) — a
    // slice that filtered post-scan would read the whole schedule per
    // reader, N× the schedule for an N-shard fleet
    val p = plan("q197_read_shard")
    assert(
      "PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(pos".r.findFirstIn(p).isDefined &&
        "PushedFilters: \\[[^\\]]*LessThanOrEqual\\(pos".r.findFirstIn(p).isDefined,
      s"the inclusive pos-range bounds must reach the order scan:\n$p")
    assert(!p.contains("Window"), s"no Window in a shard read:\n$p")
  }

  test("no declared query plans a CartesianProduct") {
    // the one shape that cannot survive any scale-up; cross joins against
    // broadcast fitted models plan as BroadcastNestedLoopJoin instead
    val offenders = SparkEntry.allSpecs.flatMap { spec =>
      val p = plan(spec.name)
      if (p.contains("CartesianProduct")) Some(spec.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
