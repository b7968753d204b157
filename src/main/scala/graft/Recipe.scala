package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** One-call RECIPE EXECUTION — the publish counterpart of
  * [[Maintain.maintain]] (compaction) and [[Forget.forget]] (deletion):
  * the mixture pipeline `plan → materialize → pack → order → audit` has
  * been four hand-sequenced operator calls plus the composite-id glue
  * since r13 (CurationPipelineDemo step 5 was the documentation), and a
  * hand-sequenced step is a forgettable step — skip the mixing audit
  * and a bad shuffle trains; forget the `copy` column in the pack key
  * and repeated docs silently merge. `run` composes the audited kernels
  * in one call, PROVES the cheap cross-step invariants before
  * returning, and persists the dataloader contract as parquet
  * artifacts:
  *
  *  - `outDir/plan` — [[Pipeline.mixPlan]]'s per-stratum allocation
  *    table (|strata| rows; the governance record of what was decided).
  *  - `outDir/assignments` — one row per materialized doc COPY with its
  *    packed chunk: `(idCol, strataCol, copy, mix_id, n_tokens,
  *    chunk_id)`. The composite `mix_id = id#copy` is built HERE, once
  *    — the glue a hand composition gets subtly wrong.
  *  - `outDir/order` — the seeded deterministic schedule over distinct
  *    `(stratum, chunk_id)` through the publish-mode KERNEL:
  *    [[Pipeline.trainingOrder]] / [[Pipeline.trainingOrderEpochs]]
  *    (per-epoch permutations from one seed, `epoch` column appended),
  *    or [[Pipeline.curriculumOrder]] / `curriculumOrderEpochs` when
  *    `curriculum` is set (band-led; the banded rows carry `band`).
  *  - `outDir/meta` — the one-row run record (budget, chunk size, seed,
  *    epochs, columns, tolerance, ORDER KERNEL + band spec — r16): the
  *    contract [[extendEpochs]] derives from and [[verify]] re-proves
  *    against.
  *  - `outDir/stats` — the per-doc token INDEX `(idCol, strataCol,
  *    n_tokens)`, one row per corpus doc (r17): the publish's single
  *    text scan, and the record that makes [[refresh]] possible — a
  *    corpus delta re-plans, re-materializes, and re-packs from this
  *    index alone, tokenizing only the delta.
  *
  * Forced gates (all bounded reads — chunk-table or |strata| scale,
  * never the corpus):
  *  - CONSERVATION: every materialized copy received a chunk assignment
  *    (assignment rows ≡ multiset rows; every non-null-token row got a
  *    non-null chunk_id).
  *  - PERMUTATION: each epoch's positions are exactly 0..n-1 over the
  *    chunk table (count, distinct count, max — the count-offset
  *    kernel's integrity, re-proved on the artifact actually written).
  *  - MIXING: [[Pipeline.orderMixingAudit]] per epoch (band-LOCAL via
  *    [[Pipeline.orderMixingAuditBands]] for a curriculum publish —
  *    within-band decorrelation is what that kernel promises); every
  *    stratum's `|same_next − share|` must sit within `mixingTolMicro`
  *    (a permutation that left one source's chunks back-to-back trains
  *    correlated batches — the audit exists to refuse that, so the
  *    one-call form REFUSES rather than logs). Curriculum publishes
  *    additionally force BAND CONTIGUITY per epoch.
  *
  * Scale shape: exactly the composed kernels' — the plan is a |strata|
  * broadcast, materialization adds zero shuffles, packing is the
  * two-pass range-exchange prefix sum, ordering is one range exchange
  * per epoch; the gates re-read only chunk-scale artifacts.
  */
object Recipe {

  /** What ran and what was proven ([[Forget.ForgetReport]] doctrine —
    * observing the report IS the proof). `maxMixDeltaMicro` is the
    * worst per-(epoch, stratum) |same_next − share| the audit saw —
    * the published schedule's measured mixing health. */
  final case class RecipeReport(
      nStrata: Long,
      multisetRows: Long,
      multisetTokens: Long,
      nChunks: Long,
      nEpochs: Int,
      maxMixDeltaMicro: Long,
      artifacts: Seq[String])

  /** CURRICULUM publish mode — the band spec [[run]] records in `meta/`
    * and [[extendEpochs]] re-derives from: a chunk's difficulty band is
    * its mean member doc length banded in exact integers,
    * `least((sum_tokens div n_docs) div bandDivisor, maxBand)` — the
    * q191 economics band, computed from the `assignments/` artifact
    * ALONE so a retraction or an extension can re-derive it without the
    * corpus (the property that makes curriculum a recordable kernel
    * parameter rather than a hand-fed column). Low-cardinality by
    * construction (`maxBand` + 1 bands). */
  final case class CurriculumSpec(bandDivisor: Long = 16L,
                                  maxBand: Long = 3L) {
    require(bandDivisor >= 1L,
      s"CurriculumSpec: bandDivisor must be >= 1, got $bandDivisor")
    require(maxBand >= 0L,
      s"CurriculumSpec: maxBand must be >= 0, got $maxBand")
  }

  /** The ONE derivation of curriculum bands over a recipe's chunk
    * table — shared by [[run]]'s publish and [[extendEpochs]]'s
    * meta-driven extension so the two cannot band differently. Input is
    * the `assignments/` frame; output one row per (stratum, chunk_id)
    * with its `band`. One chunk-scale aggregate; the corpus text is
    * never read. */
  private def bandedChunks(assigned: DataFrame, strataCol: String,
                           spec: CurriculumSpec): DataFrame =
    assigned.filter(col("chunk_id").isNotNull)
      .groupBy(col(strataCol).as("stratum"), col("chunk_id"))
      .agg(count(lit(1)).as("__nd"),
        sum(col("n_tokens")).cast("bigint").as("__st"))
      .select(col("stratum"), col("chunk_id"),
        least(expr(s"(__st div __nd) div ${spec.bandDivisor}"),
          lit(spec.maxBand)).cast("long").as("band"))

  /** @param curriculum Some(spec) publishes a CURRICULUM schedule:
    *        chunks gain difficulty bands ([[bandedChunks]] — derived
    *        from the assignments artifact, so mutations re-derive them)
    *        and the order runs through
    *        [[graft.operators.Pipeline.curriculumOrder]] (band-led
    *        within every epoch, within-band permutation re-dealt per
    *        epoch). The kernel CHOICE is persisted in `meta/`
    *        (`order_kernel` + the band spec) — the contract
    *        [[extendEpochs]] derives the matching kernel from, so a
    *        curriculum recipe can never be silently extended with
    *        non-band epochs. The mixing gate goes BAND-LOCAL
    *        ([[graft.operators.Pipeline.orderMixingAuditBands]]): the
    *        band blocks are ordered deliberately, so within-band
    *        decorrelation is what the schedule promises; a band
    *        contiguity gate (blocks tile each epoch in ascending band
    *        order) is forced alongside the permutation proof. */
  def run(docs: DataFrame, outDir: String,
          budgetTokens: Long,
          chunkTokens: Int = 2048,
          seed: Long = 42L,
          nEpochs: Int = 1,
          strataCol: String = "source",
          idCol: String = "doc_id",
          textCol: String = "text",
          mixingTolMicro: Long = 250000L,
          curriculum: Option[CurriculumSpec] = None): RecipeReport = {
    require(nEpochs >= 1, s"Recipe.run: nEpochs must be >= 1, got $nEpochs")
    require(mixingTolMicro > 0,
      s"Recipe.run: mixingTolMicro must be positive, got $mixingTolMicro")
    val spark = docs.sparkSession
    // the WHOLE publish is one staged swap on the recipe ROOT: every
    // artifact (and every gate) lands in a stage dir first, and the
    // live dir flips only after the gates passed — a re-publish over an
    // existing recipe (retract's own advice when mixing degraded) can
    // never leave a half-deleted overwrite window or a MIXED-generation
    // dir (new assignments beside the previous publish's order), the
    // cross-artifact hazard a per-file overwrite cannot close
    // a re-publish must not silently orphan a fleet's shards path: if
    // the dir being replaced carries a manifest, its persisted budget is
    // read BEFORE the swap and the manifest is re-cut INTO THE STAGE —
    // the new root arrives WITH its shards under the swap's
    // crash-recovery guarantee (a crash at any point leaves the old or
    // the new publish readable, or restorable from the aside on the
    // next touch; the swap itself is two renames, so a reader hitting
    // the in-between window may see one PATH_NOT_FOUND and should
    // retry — see Pipeline.stagedOverwrite), and the budget's persisted
    // copy is never destroyed before the re-cut exists. A LEGACY empty
    // prior manifest (pre-sidecar, zero rows — budget 0) is unknowable:
    // an empty manifest would LIE about the new non-empty schedule, so
    // refuse up front while the dir is untouched rather than guess or
    // silently drop the path. (r16+ manifests persist the budget in a
    // `_budget` sidecar that survives an emptied manifest, so this
    // refusal only fires on pre-sidecar residue.)
    healResidues(spark, outDir)
    val priorShardBudget = persistedShardBudget(spark, outDir, "Recipe.run")
    require(!priorShardBudget.contains(0),
      s"Recipe.run: $outDir/shards is a legacy EMPTY manifest (no " +
        "persisted budget to re-cut the new publish at) - either " +
        "delete shards/ and re-publish, or run Recipe.shards with an " +
        "explicit budget first (it now persists a _budget sidecar that " +
        "survives an emptied manifest) and retry")
    var staged: RecipeReport = null
    Pipeline.stagedOverwrite(spark, outDir, "publish") { stageRoot =>
      staged = buildInto(docs, stageRoot, budgetTokens, chunkTokens, seed,
        nEpochs, strataCol, idCol, textCol, mixingTolMicro, curriculum)
      priorShardBudget.foreach { budget =>
        shards(spark, stageRoot, budget, strataCol); ()
      }
    }
    staged.copy(artifacts =
      Seq(s"$outDir/plan", s"$outDir/assignments", s"$outDir/order",
        s"$outDir/meta", s"$outDir/stats") ++
        priorShardBudget.map(_ => s"$outDir/shards").toSeq)
  }

  /** [[run]]'s body, building into `outDir` (a private stage root) —
    * the gates read back the artifacts actually written there, so the
    * caller's swap publishes only a fully-proven recipe. */
  private def buildInto(docs: DataFrame, outDir: String,
                        budgetTokens: Long, chunkTokens: Int, seed: Long,
                        nEpochs: Int, strataCol: String, idCol: String,
                        textCol: String, mixingTolMicro: Long,
                        curriculum: Option[CurriculumSpec]): RecipeReport = {
    val spark = docs.sparkSession

    // 0) stats — the per-doc token INDEX `(idCol, strataCol, n_tokens)`,
    //    one row per CORPUS doc (including docs that draw zero copies):
    //    the ONE text scan of the whole publish. Everything downstream —
    //    the plan's totals, the materialization draw, the packing
    //    measure — derives from this index, so the corpus text is read
    //    exactly once here (pre-r17 it was tokenized twice: once for the
    //    plan, once for the pack), and [[refresh]] can re-run the whole
    //    chain over a corpus delta without touching base text at all
    //    (~20 B/doc: a 100 TB corpus's index is tens of GB).
    docs.select(col(idCol), col(strataCol),
        graft.operators.TextOps.tokenCount(col(textCol)).cast("bigint")
          .as("n_tokens"))
      .write.mode("overwrite").parquet(s"$outDir/stats")
    val stats = spark.read.parquet(s"$outDir/stats")

    // identity hygiene, enforced AT THE DOOR on the index just written
    // (one cheap aggregate — never the text): `mix_id = id#copy` is the
    // artifacts' composite primary key, and a duplicated doc id (even
    // across strata — the composite does not carry the stratum) or a
    // null id/stratum mints COLLIDING mix_ids that every downstream
    // consumer then trusts; discovering that later in Recipe.verify's
    // card is the wrong place for an input-data bug to surface
    val idStats = stats.agg(count(lit(1)),
      coalesce(sum(when(col(idCol).isNull || col(strataCol).isNull, 1L)
        .otherwise(0L)), lit(0L)),
      countDistinct(col(idCol))).head()
    require(idStats.getLong(1) == 0L,
      s"Recipe.run: ${idStats.getLong(1)} corpus doc(s) have a null " +
        s"'$idCol' or '$strataCol' - null identities mint colliding " +
        "mix_ids (and a null id can never be retracted); fix the corpus")
    require(idStats.getLong(0) == idStats.getLong(2),
      s"Recipe.run: '$idCol' repeats across the corpus " +
        s"(${idStats.getLong(0)} docs, ${idStats.getLong(2)} distinct " +
        "ids) - mix_id = id#copy is the artifacts' primary key and " +
        "duplicate ids collide it; dedup or disambiguate the ids")

    // 1) plan — persisted first within the stage: on a later gate's
    //    refusal the allocation decision survives for post-mortem at
    //    `outDir__publish_stage/plan` (the stage is cleared only by the
    //    NEXT publish attempt), while the live dir stays whatever it
    //    was — the staged-root discipline trades the old "refused plan
    //    lands live" behavior for never exposing a half-proven publish
    val plan = Pipeline.mixPlanFromTotals(
      stats.groupBy(col(strataCol))
        .agg(sum(col("n_tokens")).cast("long").as("n_tokens")),
      strataCol, budgetTokens)
    plan.write.mode("overwrite").parquet(s"$outDir/plan")
    val nStrata = spark.read.parquet(s"$outDir/plan").count()

    // 2) materialize + pack FROM THE INDEX, with the composite key built
    //    ONCE here — `copy` in the pack id keeps repeated docs distinct
    //    (the glue step hand compositions get wrong). Token counts are
    //    the index's — the SAME measure the plan budgeted on — threaded
    //    through packSequences' tokenCountCol (one tokenCount
    //    definition; packing on a different column than the allocation
    //    would silently divorce the chunk economics from the governance
    //    record).
    val multiset = Pipeline.materializeMix(stats,
        spark.read.parquet(s"$outDir/plan"), strataCol, idCol)
      .withColumn("mix_id",
        concat_ws("#", col(idCol).cast("string"), col("copy")))
    val packed = Pipeline.packSequences(multiset, chunkTokens, strataCol,
      idCol = "mix_id", tokenCountCol = Some("n_tokens"))
    packed.select(col(idCol), col(strataCol), col("copy"), col("mix_id"),
        col("n_tokens"), col("chunk_id"))
      .write.mode("overwrite").parquet(s"$outDir/assignments")

    // conservation gate — on the artifact actually written, against an
    // INDEPENDENT re-execution of the deterministic multiset lineage
    // (comparing the artifact against itself would prove nothing).
    // Cheap at scale: count() prunes to the join/draw columns, so the
    // recount never re-reads text bytes or re-tokenizes.
    val assigned = spark.read.parquet(s"$outDir/assignments")
    val multisetRows = multiset.count()
    val aCount = assigned.count()
    require(aCount == multisetRows,
      s"Recipe.run: $multisetRows materialized copies but $aCount " +
        "assignment rows - the packer dropped or duplicated rows")
    val unassigned = assigned
      .filter(col("n_tokens").isNotNull && col("chunk_id").isNull).count()
    require(unassigned == 0L,
      s"Recipe.run: $unassigned tokenized copies received no chunk - " +
        "the packing prefix sum is broken")
    val multisetTokens = assigned
      .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)

    // 3) order — per-epoch permutations from one seed, through the
    //    PUBLISH-MODE kernel: trainingOrder (flat decorrelation) or
    //    curriculumOrder (band-led; bands derived from the assignments
    //    artifact by the shared bandedChunks definition)
    dealOrder(assigned, strataCol, seed, nEpochs, curriculum)
      .write.mode("overwrite").parquet(s"$outDir/order")

    // 4) meta — the run's parameters as a one-row governance record:
    //    without it a published dir does not record HOW it was produced,
    //    and [[extendEpochs]] could not derive epochs k.. from the same
    //    seed (or hold new epochs to the same mixing tolerance). The
    //    ORDER KERNEL is part of the record (r16): a schedule does not
    //    say which kernel dealt it, and an extension that guessed wrong
    //    would silently append non-band epochs to a curriculum — the
    //    exact mismatched-parameter class meta/ was invented to kill.
    val sqlc = spark
    import sqlc.implicits._
    Seq((budgetTokens, chunkTokens.toLong, seed, nEpochs.toLong,
        strataCol, idCol, textCol, mixingTolMicro,
        if (curriculum.isDefined) "curriculumOrder" else "trainingOrder",
        curriculum.map(_.bandDivisor), curriculum.map(_.maxBand)))
      .toDF("budget_tokens", "chunk_tokens", "seed", "n_epochs",
        "strata_col", "id_col", "text_col", "mixing_tol_micro",
        "order_kernel", "band_divisor", "band_max")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/meta")

    // permutation + mixing gates — per epoch, on the written artifact
    val written = spark.read.parquet(s"$outDir/order")
    val nChunks = assigned.filter(col("chunk_id").isNotNull)
      .select(col(strataCol), col("chunk_id")).distinct().count()
    val maxDelta = proveOrder(written, 0 until nEpochs,
      flat = nEpochs == 1, nChunks, "Recipe.run",
      mixingTol = _ => Some(mixingTolMicro))

    RecipeReport(nStrata, multisetRows, multisetTokens, nChunks, nEpochs,
      maxDelta,
      Seq(s"$outDir/plan", s"$outDir/assignments", s"$outDir/order",
        s"$outDir/meta", s"$outDir/stats"))
  }

  /** The publish-mode ORDER kernel over a recipe's assignments — shared
    * by [[run]]'s build and [[refresh]]'s re-deal so the two cannot
    * order differently: distinct (stratum, chunk_id) through
    * trainingOrder (flat decorrelation) or curriculumOrder (band-led;
    * bands from the shared [[bandedChunks]] derivation), single-epoch
    * kernels for nEpochs == 1 (the flat artifact shape), the epoch
    * variants otherwise. */
  private def dealOrder(assigned: DataFrame, strataCol: String, seed: Long,
                        nEpochs: Int,
                        curriculum: Option[CurriculumSpec]): DataFrame = {
    val chunks = assigned.filter(col("chunk_id").isNotNull)
      .select(col(strataCol).as("stratum"), col("chunk_id")).distinct()
    curriculum match {
      case None =>
        if (nEpochs == 1)
          Pipeline.trainingOrder(chunks, seed, Seq("stratum", "chunk_id"))
        else
          Pipeline.trainingOrderEpochs(chunks, seed, nEpochs,
            Seq("stratum", "chunk_id"))
      case Some(spec) =>
        val banded = bandedChunks(assigned, strataCol, spec)
        if (nEpochs == 1)
          Pipeline.curriculumOrder(banded, seed, Seq("stratum", "chunk_id"))
        else
          Pipeline.curriculumOrderEpochs(banded, seed, nEpochs,
            Seq("stratum", "chunk_id"))
    }
  }

  /** What a refresh ingested and re-proved: `deltaDocs`/`deltaTokens`
    * are the appended corpus slice (the ONLY text the refresh read);
    * `repackedStrata` vs `passthroughStrata` splits the plan's strata
    * into those whose materialized multiset changed (re-packed from the
    * index) and those proven byte-unchanged (their packed assignment
    * rows passed through verbatim — the pack exchange skipped). */
  final case class RefreshReport(
      deltaDocs: Long,
      deltaTokens: Long,
      nStrata: Long,
      repackedStrata: Long,
      passthroughStrata: Long,
      nChunks: Long,
      nEpochs: Int,
      maxMixDeltaMicro: Long,
      artifacts: Seq[String])

  /** INCREMENTAL RE-PUBLISH from a corpus delta — the one lifecycle step
    * whose cost was corpus-scale: appending documents to a published
    * mixture used to force a full [[run]] over base ∪ delta, which at
    * 100 TB means re-tokenizing 100 TB of text a nightly pipeline cannot
    * afford. `refresh` re-runs the ENTIRE publish chain — re-plan,
    * re-materialize, re-pack, re-order, every [[run]] gate, the same
    * staged root swap — while reading text ONLY from the delta:
    *
    *  - the per-stratum totals the plan needs come from the persisted
    *    `stats/` token index plus the delta's own tokenization (the
    *    SAME arithmetic, via [[graft.operators.Pipeline.mixPlanFromTotals]]
    *    — the seam [[run]]'s plan goes through too, so the two cannot
    *    drift);
    *  - the materialization draw and the packing measure are index
    *    columns (`materializeMix` needs only (id, stratum); packing
    *    needs only per-copy `n_tokens` — both persisted at publish);
    *  - strata whose materialized multiset is CERTIFIED unchanged
    *    (per-stratum count + token sum + two independent order-free
    *    checksums over (mix_id, n_tokens) equal between the old
    *    assignments and the re-derived multiset — a PROBABILISTIC
    *    certificate: ~60 independent checksum bits per stratum, so a
    *    non-adversarial collision passing a changed stratum through is
    *    ~2⁻⁶⁰, and the count/sum legs mean any collision still
    *    conserves rows and token mass) keep their packed rows
    *    VERBATIM — sound because packing is a pure per-stratum
    *    function of the (mix_id, n_tokens) multiset (chunk ids are the
    *    stratum's own running sum divided by the recorded budget), so
    *    an identical multiset packs identically; everything else
    *    re-packs through the audited kernel. A mixture re-plan shifts
    *    most allocations on any material delta (every `epochs_micro`
    *    moves with `tot_w`), so the split's floor is honesty, not
    *    magic: the 100 TB win is the text never re-read, the
    *    passthrough is the bonus when the integer allocation arithmetic
    *    leaves a stratum's draw untouched.
    *
    * CONTRACT: `refresh(delta, dir)` publishes artifacts byte-identical
    * to `run(corpus ∪ delta, dir)` with the dir's own recorded
    * parameters (the q196 discipline — oracle-pinned end to end), where
    * `corpus` is the index's current doc set: a [[retract]] prunes the
    * index too, so a refresh after a retraction equals a fresh publish
    * over survivors ∪ delta and a forgotten doc CANNOT resurrect.
    * Append-only: a delta id already present in the index refuses (an
    * in-place text mutation is an [[upsert]], not an append);
    * duplicate ids within the delta refuse; every parameter comes from
    * `meta/` (the [[extendEpochs]] rule — a refresh with mismatched
    * parameters cannot be expressed). Pre-r17 dirs (no `stats/` index,
    * or no kernel record) refuse with the re-publish upgrade path.
    *
    * The prior publish's drift card — [[diff]]'s exact comparison,
    * computed against the stage BEFORE the swap — is persisted at
    * `recipeDir/refresh_diff` as the refresh's own governance exit
    * record (what did the re-publish change, per stratum), and the
    * shards manifest re-cuts at its persisted budget inside the stage
    * ([[run]]'s re-publish rule).
    *
    * Scale shape: text reads ∝ |delta|; everything else is index-scale
    * (~20 B/doc) or chunk-scale — one index aggregate for totals
    * (|strata| out), a map-side materialization, two |strata|-row
    * fingerprint aggregates, the two-pass pack exchange over only the
    * re-packed strata's copies, one range exchange per epoch for the
    * order, bounded-read gates. */
  def refresh(delta: DataFrame, recipeDir: String): RefreshReport =
    incrementalPublish(delta, recipeDir, "Recipe.refresh",
      replaceKnown = false)._1

  /** What an upsert replaced and re-proved: `updatedDocs` had an index
    * row before the call (their old text's contribution is gone from
    * every artifact), `insertedDocs` are net-new; the remaining fields
    * are [[RefreshReport]]'s, measured over the whole delta. */
  final case class UpsertReport(
      updatedDocs: Long,
      insertedDocs: Long,
      deltaTokens: Long,
      nStrata: Long,
      repackedStrata: Long,
      passthroughStrata: Long,
      nChunks: Long,
      nEpochs: Int,
      maxMixDeltaMicro: Long,
      artifacts: Seq[String])

  /** DOCUMENT UPDATE as ONE staged swap — the lifecycle seam [[refresh]]
    * deliberately refuses: refresh is append-only (a known id is a text
    * mutation wearing an append's clothes), so updating a doc's text
    * used to be [[retract]] + [[refresh]] — two swaps, two crash
    * windows, and a mid-state publish (the doc absent) a reading fleet
    * could legitimately consume between them. `upsert(changed, dir)`
    * composes the two inside a SINGLE [[graft.operators.Pipeline.stagedOverwrite]]:
    * ids already in the index are REPLACED (retract's prune, applied to
    * the staged index), net-new ids are APPENDED (refresh's delta
    * path), and the whole chain — re-plan, re-materialize, re-pack with
    * the passthrough certificate, re-order through the recorded kernel,
    * every run gate, the [[diff]] exit card at `refresh_diff/`, the
    * shards re-cut — runs against the staged index before the one swap.
    * A reader never sees a corpus state that was not either the old
    * publish or the new one.
    *
    * CONTRACT: `upsert(changed, dir)` publishes artifacts byte-identical
    * to `run(survivors ∪ changed, dir)` with the dir's own recorded
    * parameters, where `survivors` is the index's current doc set minus
    * `changed`'s ids (oracle-pinned end to end — q202). Unlike refresh,
    * REPLAY IS IDEMPOTENT: re-running the same upsert prunes the ids it
    * just wrote and re-adds the same rows, landing byte-identical —
    * crash-after-swap needs no refusal, just the rerun. Text is read
    * only from `changed`; the base corpus is never re-tokenized.
    *
    * Scale shape: [[refresh]]'s exactly — text ∝ |changed|, one
    * unhinted anti-join over the ~20 B/doc index for the replacement
    * prune (AQE picks the strategy; a nightly changed-set can exceed
    * broadcast capacity), everything else index- or chunk-scale. */
  def upsert(changed: DataFrame, recipeDir: String): UpsertReport = {
    val (r, updated) = incrementalPublish(changed, recipeDir,
      "Recipe.upsert", replaceKnown = true)
    UpsertReport(updated, r.deltaDocs - updated, r.deltaTokens, r.nStrata,
      r.repackedStrata, r.passthroughStrata, r.nChunks, r.nEpochs,
      r.maxMixDeltaMicro, r.artifacts)
  }

  /** The shared body of [[refresh]] (`replaceKnown = false`: a known id
    * REFUSES — append-only) and [[upsert]] (`replaceKnown = true`: known
    * ids are pruned from the staged index and replaced by the delta's
    * rows). Returns the report plus the known-id count.
    *
    * The delta is TOKENIZED EXACTLY ONCE (r18): its index rows are
    * written to a `stats_delta` scratch inside the stage FIRST, and
    * every consumer — the hygiene refusals, the report aggregates, the
    * known-id probe, the index union — reads that WRITTEN artifact
    * ([[run]]'s check-the-written-index pattern), so a
    * non-deterministic delta source (files changing between actions)
    * cannot persist an index that diverges from the counts that were
    * checked. The scratch is deleted before the swap. */
  private def incrementalPublish(delta: DataFrame, recipeDir: String,
                                 caller: String, replaceKnown: Boolean):
      (RefreshReport, Long) = {
    val spark = delta.sparkSession
    healResidues(spark, recipeDir)
    val fs = new org.apache.hadoop.fs.Path(recipeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("plan", "assignments", "order", "meta").foreach { a =>
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$recipeDir/$a")),
        s"$caller: no $a/ at $recipeDir - not a Recipe.run " +
          "output dir")
    }
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$recipeDir/stats")),
      s"$caller: no stats/ token index at $recipeDir - this " +
        "recipe predates the r17 per-doc index the incremental re-plan " +
        "derives from; re-publish once with Recipe.run (which writes " +
        "stats/) to make it refreshable")
    val meta = spark.read.parquet(s"$recipeDir/meta")
    Seq("budget_tokens", "chunk_tokens", "seed", "n_epochs", "strata_col",
        "id_col", "text_col", "mixing_tol_micro").foreach(c =>
      require(meta.columns.contains(c),
        s"$caller: meta/ at $recipeDir has no '$c' column " +
          s"(found ${meta.columns.mkString(", ")})"))
    require(meta.columns.contains("order_kernel"),
      s"$caller: meta/ at $recipeDir records no 'order_kernel' - " +
        "the refresh cannot derive the matching kernel (extendEpochs' " +
        "rule); re-publish with Recipe.run")
    val m = meta.head()
    val budgetTokens = m.getAs[Long]("budget_tokens")
    val chunkTokens = m.getAs[Long]("chunk_tokens").toInt
    val seed = m.getAs[Long]("seed")
    val nEpochs = m.getAs[Long]("n_epochs").toInt
    val strataCol = m.getAs[String]("strata_col")
    val idCol = m.getAs[String]("id_col")
    val textCol = m.getAs[String]("text_col")
    val tol = m.getAs[Long]("mixing_tol_micro")
    val curriculum = m.getAs[String]("order_kernel") match {
      case "trainingOrder" => None
      case "curriculumOrder" =>
        Seq("band_divisor", "band_max").foreach(c =>
          require(meta.columns.contains(c) && !m.isNullAt(m.fieldIndex(c)),
            s"$caller: meta/ at $recipeDir says " +
              s"order_kernel=curriculumOrder but '$c' is missing/null; " +
              "re-publish with Recipe.run(curriculum = Some(...))"))
        Some(CurriculumSpec(m.getAs[Long]("band_divisor"),
          m.getAs[Long]("band_max")))
      case other => throw new IllegalArgumentException(
        s"$caller: meta/ at $recipeDir records unknown " +
          s"order_kernel '$other' - this build cannot derive its " +
          "schedule; upgrade, or re-publish with Recipe.run")
    }
    Seq(idCol, strataCol, textCol).foreach(c =>
      require(delta.columns.contains(c),
        s"$caller: delta has no '$c' column (found " +
          s"${delta.columns.mkString(", ")}) - the recipe's meta/ " +
          s"records ($idCol, $strataCol, $textCol)"))
    // run's re-publish shards rule, verbatim: the budget is read BEFORE
    // any mutation and the manifest re-cuts INTO the stage
    val priorShardBudget = persistedShardBudget(spark, recipeDir, caller)
    require(!priorShardBudget.contains(0),
      s"$caller: $recipeDir/shards is a legacy EMPTY manifest " +
        "(no persisted budget to re-cut at) - delete shards/ or re-cut " +
        "with Recipe.shards first")

    var nStrata = 0L; var nChunks = 0L; var maxDelta = 0L
    var repacked = 0L; var passthrough = 0L
    var deltaDocs = 0L; var deltaTokens = 0L; var known = 0L
    Pipeline.stagedOverwrite(spark, recipeDir, "publish") { stage =>
      // the ONE text read of the whole call: the delta's token counts,
      // written FIRST into a stage scratch — the hygiene refusals, the
      // report aggregates, and the index union below all read this
      // WRITTEN artifact, never the caller's (possibly
      // non-deterministic) frame twice
      delta.select(col(idCol), col(strataCol),
          graft.operators.TextOps.tokenCount(col(textCol)).cast("bigint")
            .as("n_tokens"))
        .write.mode("overwrite").parquet(s"$stage/stats_delta")
      val deltaStats = spark.read.parquet(s"$stage/stats_delta")
      // delta hygiene, one aggregate over the written rows (both loud:
      // a duplicated id WITHIN the delta would mint colliding mix_ids,
      // a null identity can never be retracted)
      val dAgg = deltaStats.agg(count(lit(1)),
        coalesce(sum(col("n_tokens")), lit(0L)),
        coalesce(sum(when(col(idCol).isNull || col(strataCol).isNull, 1L)
          .otherwise(0L)), lit(0L)),
        countDistinct(col(idCol))).head()
      deltaDocs = dAgg.getLong(0); deltaTokens = dAgg.getLong(1)
      require(dAgg.getLong(2) == 0L,
        s"$caller: ${dAgg.getLong(2)} delta doc(s) have a null '$idCol' " +
          s"or '$strataCol' - null identities mint colliding mix_ids " +
          "(and a null id can never be retracted); fix the delta")
      val dupIds = deltaDocs - dAgg.getLong(3)
      require(dupIds == 0L,
        s"$caller: the delta repeats $dupIds $idCol value(s) - " +
          "ids are the corpus primary key; dedup the delta first")
      val baseStats = spark.read.parquet(s"$recipeDir/stats")
        .select(col(idCol), col(strataCol),
          col("n_tokens").cast("bigint").as("n_tokens"))
      // unhinted semi-join (AQE picks the strategy): a nightly delta's
      // id set can exceed broadcast capacity at corpus scale
      known = baseStats
        .join(deltaStats.select(col(idCol)), Seq(idCol), "left_semi")
        .count()
      if (!replaceKnown)
        require(known == 0L,
          s"Recipe.refresh: $known delta $idCol value(s) are already in " +
            s"the corpus index at $recipeDir/stats - refresh is " +
            "APPEND-ONLY (an in-place mutation changes published " +
            "history); Recipe.upsert replaces in one swap, or retract " +
            "the old rows first. (If this is a REPLAY of a refresh that " +
            "already landed, the delta is applied - run Recipe.verify " +
            "instead of retrying.)")
      // stats: base index (minus replaced ids, for upsert) ∪ delta
      // index — the refreshed corpus inventory
      val survivors =
        if (replaceKnown && known > 0L)
          baseStats.join(deltaStats.select(col(idCol)), Seq(idCol),
            "left_anti")
        else baseStats
      survivors.unionByName(deltaStats)
        .write.mode("overwrite").parquet(s"$stage/stats")
      // the scratch must not ride the swap into the live dir
      require(fs.delete(
          new org.apache.hadoop.fs.Path(s"$stage/stats_delta"), true),
        s"$caller: could not clear the stats_delta scratch at $stage")
      // the index and the prior assignments each feed several
      // downstream reads (totals, materialization, fingerprints, the
      // diff card) — cache them for the build's lifetime rather than
      // re-scanning per consumer; both unpersist before the swap
      val stats = spark.read.parquet(s"$stage/stats").persist()
      // run's door check, re-asserted on the STAGED index (r18): the
      // delta was held to the identity bar above, but the BASE index is
      // an artifact a hand edit can corrupt — a duplicated or null id
      // there would mint colliding mix_ids through this very publish
      // (the delta-only guards never see it). One aggregate over the
      // index this call is about to materialize from; refuses before
      // any artifact builds, live dir untouched.
      val stagedIdStats = stats.agg(count(lit(1)),
        coalesce(sum(when(col(idCol).isNull || col(strataCol).isNull, 1L)
          .otherwise(0L)), lit(0L)),
        countDistinct(col(idCol))).head()
      require(stagedIdStats.getLong(1) == 0L,
        s"$caller: ${stagedIdStats.getLong(1)} doc(s) in the refreshed " +
          s"index have a null '$idCol' or '$strataCol' - the base " +
          s"stats/ at $recipeDir is hand-corrupted (run refuses null " +
          "identities at the door); re-publish with Recipe.run")
      require(stagedIdStats.getLong(0) == stagedIdStats.getLong(2),
        s"$caller: '$idCol' repeats across the refreshed index " +
          s"(${stagedIdStats.getLong(0)} rows, " +
          s"${stagedIdStats.getLong(2)} distinct) - the base stats/ at " +
          s"$recipeDir is hand-corrupted (duplicate ids mint colliding " +
          "mix_ids); re-publish with Recipe.run")
      val oldAssigned = spark.read.parquet(s"$recipeDir/assignments")
        .persist()
      try {

      // plan: run's exact arithmetic over the index totals — no text
      Pipeline.mixPlanFromTotals(
          stats.groupBy(col(strataCol))
            .agg(sum(col("n_tokens")).cast("long").as("n_tokens")),
          strataCol, budgetTokens)
        .write.mode("overwrite").parquet(s"$stage/plan")
      nStrata = spark.read.parquet(s"$stage/plan").count()

      // the refreshed multiset, from the index (map-side: |strata|
      // broadcast + explode; run's composite-key glue, built once)
      val multiset = Pipeline.materializeMix(stats,
          spark.read.parquet(s"$stage/plan"), strataCol, idCol)
        .withColumn("mix_id",
          concat_ws("#", col(idCol).cast("string"), col("copy")))

      // the passthrough certificate: per-stratum count, token sum, and
      // two independent order-free checksums over (mix_id, n_tokens) —
      // equal multiset, identical pack (per-stratum purity), so the
      // stratum's packed rows pass through verbatim. Checksums ride
      // mod 2^30 primes so the ANSI-mode Long sum cannot overflow.
      // The certificate is PROBABILISTIC, not a proof: ~60 bits of
      // independent checksum per stratum puts a non-adversarial
      // collision (a changed multiset reading as unchanged, passing
      // stale packed rows through) at ~2^-60 per stratum — the
      // documented trade for never re-shuffling an unchanged stratum's
      // copies; the count and token sum must ALSO agree, so any
      // collision conserves rows and mass and every downstream gate.
      def fpOf(df: DataFrame): Map[Any, (Long, Long, Long, Long)] =
        df.groupBy(col(strataCol))
          .agg(count(lit(1)),
            coalesce(sum(col("n_tokens")), lit(0L)),
            coalesce(sum(pmod(xxhash64(col("mix_id"), col("n_tokens")),
              lit(1073741789L))), lit(0L)),
            coalesce(sum(pmod(xxhash64(col("n_tokens"), col("mix_id")),
              lit(1073741783L))), lit(0L)))
          .collect()
          .map(r => r.get(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
      val newFp = fpOf(multiset)
      val oldFp = fpOf(oldAssigned)
      val passStrata = newFp.keysIterator
        .filter(k => k != null && oldFp.get(k).contains(newFp(k)))
        .toSeq
      passthrough = passStrata.size.toLong
      repacked = newFp.size.toLong - passthrough
      val passMask =
        if (passStrata.isEmpty) lit(false)
        else coalesce(col(strataCol).isInCollection(passStrata), lit(false))
      val assignCols = Seq(col(idCol), col(strataCol), col("copy"),
        col("mix_id"), col("n_tokens"), col("chunk_id"))
      val packedNew = Pipeline.packSequences(multiset.filter(!passMask),
        chunkTokens, strataCol, idCol = "mix_id",
        tokenCountCol = Some("n_tokens"))
      oldAssigned.filter(passMask).select(assignCols: _*)
        .unionByName(packedNew.select(assignCols: _*))
        .write.mode("overwrite").parquet(s"$stage/assignments")

      // run's conservation gates, on the artifact actually written
      val assignedNew = spark.read.parquet(s"$stage/assignments")
      val msRows = multiset.count()
      val aCount = assignedNew.count()
      require(aCount == msRows,
        s"$caller: $msRows materialized copies but $aCount " +
          "assignment rows - the passthrough/re-pack split dropped or " +
          "duplicated rows")
      val unassigned = assignedNew
        .filter(col("n_tokens").isNotNull && col("chunk_id").isNull).count()
      require(unassigned == 0L,
        s"$caller: $unassigned tokenized copies received no chunk")

      // order through the RECORDED kernel; meta passes through verbatim
      // (every parameter is unchanged — that is the point)
      dealOrder(assignedNew, strataCol, seed, nEpochs, curriculum)
        .write.mode("overwrite").parquet(s"$stage/order")
      spark.read.parquet(s"$recipeDir/meta")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/meta")

      // the governance exit record: diff's exact card, prior publish vs
      // the staged one, persisted WITH the publish it describes
      diffFrames(spark.read.parquet(s"$recipeDir/plan"), oldAssigned,
          spark.read.parquet(s"$stage/plan"), assignedNew,
          strataCol, s"$recipeDir/plan", s"$stage/plan")
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/refresh_diff")

      // run's permutation + mixing gates — a refusal leaves the live
      // publish untouched (the stage never swaps)
      nChunks = assignedNew.filter(col("chunk_id").isNotNull)
        .select(col(strataCol), col("chunk_id")).distinct().count()
      maxDelta = proveOrder(spark.read.parquet(s"$stage/order"),
        0 until nEpochs, flat = nEpochs == 1, nChunks, caller,
        mixingTol = _ => Some(tol))
      priorShardBudget.foreach { budget =>
        shards(spark, stage, budget, strataCol); ()
      }
      } finally {
        stats.unpersist(); oldAssigned.unpersist(); ()
      }
    }
    (RefreshReport(deltaDocs, deltaTokens, nStrata, repacked, passthrough,
      nChunks, nEpochs, maxDelta,
      Seq(s"$recipeDir/plan", s"$recipeDir/assignments",
        s"$recipeDir/order", s"$recipeDir/meta", s"$recipeDir/stats",
        s"$recipeDir/refresh_diff") ++
        priorShardBudget.map(_ => s"$recipeDir/shards").toSeq), known)
  }

  /** The ONE definition of the per-epoch order proof [[run]],
    * [[retract]], and [[extendEpochs]] all exit through: each listed
    * epoch must hold the exact permutation 0..nChunks−1 (count,
    * distinct, max — required), and the mixing audit is folded to the
    * worst per-(epoch, [band,] stratum) |same_next − share| — REQUIRED
    * within `mixingTol(e)` when that returns Some (run gates every
    * epoch, extendEpochs only the NEW ones), measured-only on None
    * (retract's report: a deletion must not be refusable on a
    * statistical property of what remains). Returns the measured worst
    * delta.
    *
    * KERNEL-AWARE by artifact shape: a schedule carrying a `band`
    * column is a curriculum publish, so the mixing audit goes
    * BAND-LOCAL ([[graft.operators.Pipeline.orderMixingAuditBands]] —
    * the band blocks are ordered deliberately; within-band
    * decorrelation is what the kernel promises) and a STRUCTURAL band
    * contiguity gate is forced on every listed epoch (band blocks tile
    * the epoch contiguously in ascending band order — required
    * everywhere, retraction included: relative-order-preserving
    * mutations cannot break contiguity, so a violation is a kernel bug,
    * never a statistical property of what remains). */
  private def proveOrder(written: DataFrame, epochs: Seq[Int],
                         flat: Boolean, nChunks: Long,
                         caller: String, mixingTol: Int => Option[Long]): Long = {
    val banded = written.columns.contains("band")
    var maxDelta = 0L
    epochs.foreach { e =>
      val ep = if (flat) written
        else written.filter(col("epoch") === e.toLong)
      val stats = ep.agg(count(lit(1)), countDistinct(col("pos")),
        coalesce(max(col("pos")), lit(-1L))).head()
      require(stats.getLong(0) == nChunks &&
          stats.getLong(1) == nChunks &&
          stats.getLong(2) == nChunks - 1,
        s"$caller: epoch $e positions are not the exact permutation " +
          s"0..${nChunks - 1}: (count, distinct, max) = $stats")
      if (banded) proveBandContiguity(ep, e, caller)
      if (nChunks > 0L) {
        val auditDf =
          if (banded) Pipeline.orderMixingAuditBands(ep.drop("epoch"))
          else Pipeline.orderMixingAudit(ep.drop("epoch"))
        // n_pairs == 0 rows carry NO successor evidence (a stratum whose
        // only chunks close their scope; a singleton band) — their
        // same_next reads 0 by convention, so |0 − share| would "measure"
        // a delta no permutation could avoid. No evidence, no gate.
        val audit = auditDf
          .filter(col("n_pairs") > 0L)
          .select(col("stratum"),
            abs(col("same_next_micro") - col("share_micro")).as("d"))
          .collect()
        audit.foreach { r =>
          maxDelta = math.max(maxDelta, r.getLong(1))
          mixingTol(e).foreach(tol => require(r.getLong(1) <= tol,
            s"$caller: epoch $e stratum ${r.getString(0)} mixing " +
              s"|same_next - share| = ${r.getLong(1)} exceeds " +
              s"$tol micro - the schedule left this stratum's " +
              "chunks back-to-back; do not train on it (raise the seed " +
              "question, not the tolerance)"))
        }
      }
    }
    maxDelta
  }

  /** The curriculum schedule's STRUCTURAL gate: one epoch's band blocks
    * must tile positions 0..n−1 contiguously in ascending band order
    * (easy → hard, no interleaving, no gaps). |bands|-row aggregate +
    * driver check — bands are single digits by [[CurriculumSpec]]
    * construction. */
  private def proveBandContiguity(epochRows: DataFrame, epoch: Int,
                                  caller: String): Unit = {
    val blocks = epochRows.groupBy(col("band"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"),
        count(lit(1)).as("n"))
      .collect().sortBy(_.getAs[Long]("lo"))
    var expect = 0L
    var prevBand = Long.MinValue
    blocks.foreach { r =>
      val b = r.getAs[Long]("band"); val lo = r.getAs[Long]("lo")
      val hi = r.getAs[Long]("hi"); val n = r.getAs[Long]("n")
      require(b > prevBand && lo == expect && hi - lo + 1L == n,
        s"$caller: epoch $epoch band $b occupies positions [$lo, $hi] " +
          s"with $n rows - band blocks must tile the epoch contiguously " +
          s"in ascending band order (expected next block to start at " +
          s"$expect after band $prevBand); the band contract is broken")
      prevBand = b; expect = hi + 1L
    }
  }

  /** Publish the SHARD MANIFEST for a recipe's schedule — the read-side
    * contract [[graft.operators.Pipeline.shardManifest]] computes, as a
    * one-call artifact step: per-chunk token masses aggregated from
    * `assignments/`, the manifest cut at `shardTokens`, written to
    * `recipeDir/shards` (overwrite — the manifest is a pure function of
    * the other two artifacts; [[retract]] regenerates it automatically
    * when present). The budget is PERSISTED in the manifest
    * (`shard_tokens`, one constant column — the KMV `build_k`
    * discipline) so the retract-time regeneration can never silently
    * re-cut at a different budget than the fleet was configured for.
    * Returns the shard count. Gates inherited from the kernel: every
    * scheduled chunk must carry exactly one non-null token row,
    * duplicate positions refuse. Scale shape: one chunk-scale join +
    * the packing kernel + a |shards|-row aggregate; the corpus text is
    * never read.
    */
  def shards(spark: SparkSession, recipeDir: String,
             shardTokens: Int, strataCol: String = "source"): Long = {
    // self-heal every crash residue the dir can carry before any read
    healResidues(spark, recipeDir)
    val order = spark.read.parquet(s"$recipeDir/order")
    val assigned = spark.read.parquet(s"$recipeDir/assignments")
    Seq(strataCol, "n_tokens", "chunk_id").foreach { c =>
      require(assigned.columns.contains(c),
        s"Recipe.shards: assignments at $recipeDir/assignments has no " +
          s"'$c' column (found ${assigned.columns.mkString(", ")}) - is " +
          "this a Recipe.run output dir?")
    }
    val chunkTokens = assigned
      .filter(col("chunk_id").isNotNull)
      .groupBy(col(strataCol).as("stratum"), col("chunk_id"))
      .agg(sum(col("n_tokens")).cast("bigint").as("n_tokens"))
    val manifest = Pipeline.shardManifest(order, chunkTokens, shardTokens)
      .withColumn("shard_tokens", lit(shardTokens.toLong))
    // staged swap, never a bare overwrite: retract regenerates THROUGH
    // this call, and its replay idempotence claim needs a crash here to
    // leave either the old manifest or the new one readable. The
    // `_budget` sidecar (one row, underscore-prefixed so manifest reads
    // skip it) lands INSIDE the stage, so budget and rows swap as one
    // unit — and the budget survives a later retraction emptying the
    // rows (see [[persistedShardBudget]]).
    val sqlc = spark
    import sqlc.implicits._
    Pipeline.stagedOverwrite(spark, s"$recipeDir/shards", "publish") {
      stage =>
        manifest.write.mode("overwrite").parquet(stage)
        Seq(shardTokens.toLong).toDF("shard_tokens")
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/_budget")
    }
    spark.read.parquet(s"$recipeDir/shards").count()
  }

  /** READ one shard of a published schedule — the CONSUMER the manifest
    * exists for, as API: a fleet reader is handed `(epoch?, shard_id)`
    * and must materialize exactly its contiguous slice of the schedule,
    * in schedule order, with the chunk members to load. Until r16 that
    * read was left to the dataloader ("filter the order by the
    * manifest's position range, join assignments yourself") — the same
    * hand-sequenced-step hazard everywhere else in this object: an
    * off-by-one on the INCLUSIVE range bounds, or a join that forgets
    * the stratum half of the chunk key, silently trains a hole or a
    * duplicate. This call is the one definition, and it is AUDITED:
    * the slice's chunk count must equal the manifest row's `n_chunks`
    * (a mismatch means order/ and shards/ have drifted — a stale
    * manifest after a hand mutation — and the reader must not proceed).
    *
    * Returns one row per chunk MEMBER in the slice:
    * `([epoch,] pos, stratum, chunk_id, <idCol>, mix_id, n_tokens)` —
    * `idCol`/strata column come from `meta/` (the persisted record, so
    * a caller cannot read with mismatched key names). Contract: an
    * epoch-indexed manifest requires `epoch` (a flat one refuses it);
    * an absent `(epoch, shard_id)` refuses loudly, never an empty
    * frame (an empty shard read is a fleet bug, not a result).
    *
    * The suite-level contract this call makes checkable: the union of
    * every shard's slice IS the schedule, pairwise disjoint —
    * suite-pinned over a retracted AND an extended recipe (the two
    * mutations that re-tile the position space). Scale shape: the
    * manifest row is a |shards|-row pruned read; the order slice is a
    * position-range parquet filter (row-group pruned at scale); the
    * members join is slice ⋈ assignments on the chunk key, unhinted
    * (the slice side is shard-budget-bounded — AQE broadcasts it). */
  def readShard(spark: SparkSession, recipeDir: String, shardId: Long,
                epoch: Option[Long] = None): DataFrame = {
    healResidues(spark, recipeDir)
    val sPath = new org.apache.hadoop.fs.Path(s"$recipeDir/shards")
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sPath),
      s"Recipe.readShard: no shards/ manifest at $recipeDir - publish " +
        "one with Recipe.shards first")
    val manifest = spark.read.parquet(s"$recipeDir/shards")
    val hasEpoch = manifest.columns.contains("epoch")
    require(hasEpoch == epoch.isDefined,
      if (hasEpoch)
        s"Recipe.readShard: the manifest at $recipeDir/shards is " +
          "epoch-indexed - name the epoch to read"
      else
        s"Recipe.readShard: the manifest at $recipeDir/shards is flat " +
          s"but epoch ${epoch.get} was requested - omit the epoch")
    // meta names the join keys — the persisted record, not caller guesses
    val mPath = new org.apache.hadoop.fs.Path(s"$recipeDir/meta")
    require(fs.exists(mPath),
      s"Recipe.readShard: no meta/ record at $recipeDir - the read " +
        "derives its key columns from the persisted run record; " +
        "re-publish with Recipe.run")
    val meta = spark.read.parquet(s"$recipeDir/meta").head()
    val strataCol = meta.getAs[String]("strata_col")
    val idCol = meta.getAs[String]("id_col")
    val rows = manifest
      .filter(col("shard_id") === shardId &&
        epoch.map(e => col("epoch") === e).getOrElse(lit(true)))
      .select(col("first_pos"), col("last_pos"), col("n_chunks"))
      .collect()
    require(rows.length == 1,
      s"Recipe.readShard: ${rows.length} manifest rows for shard " +
        s"$shardId${epoch.map(e => s" epoch $e").getOrElse("")} at " +
        s"$recipeDir/shards - an absent or duplicated shard is a " +
        "manifest integrity failure, not an empty read")
    val (firstPos, lastPos, nChunks) =
      (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
    val slice = spark.read.parquet(s"$recipeDir/order")
      .filter(col("pos") >= firstPos && col("pos") <= lastPos &&
        epoch.map(e => col("epoch") === e).getOrElse(lit(true)))
      .select(col("stratum"), col("chunk_id"), col("pos"))
    // drift audit: the slice must hold exactly the chunks the manifest
    // row claims — order/ re-tiled (retract/extend) without a manifest
    // re-cut would hand this reader someone else's positions
    val nSlice = slice.count()
    require(nSlice == nChunks,
      s"Recipe.readShard: shard $shardId claims $nChunks chunks but the " +
        s"order slice [$firstPos, $lastPos] holds $nSlice - order/ and " +
        "shards/ have drifted; regenerate the manifest with " +
        "Recipe.shards before reading")
    val members = spark.read.parquet(s"$recipeDir/assignments")
      .filter(col("chunk_id").isNotNull)
      .select(col(strataCol).as("stratum"), col("chunk_id"),
        col(idCol), col("mix_id"), col("n_tokens"))
    val joined = slice.join(members, Seq("stratum", "chunk_id"))
    val outCols = epoch.map(e => lit(e).as("epoch")).toSeq ++
      Seq(col("pos"), col("stratum"), col("chunk_id"), col(idCol),
        col("mix_id"), col("n_tokens"))
    joined.select(outCols: _*).orderBy(col("pos"), col("mix_id"))
  }

  /** The RESUME manifest — what remains of a published schedule after a
    * training run consumed everything before the cursor: a fleet that
    * restarts mid-epoch must hand its readers the REMAINING slices, and
    * hand-deriving them ("clamp the boundary shard, keep the rest")
    * is the off-by-one factory [[readShard]]'s scaladoc names — get the
    * clamp wrong by one and the fleet re-trains (or skips) a chunk with
    * nothing downstream noticing. Returns rows in the manifest's EXACT
    * schema (so fleet code that consumes `shards/` consumes a resume
    * unchanged): shards wholly past the cursor pass through verbatim;
    * the one shard straddling it is CLAMPED — `first_pos` moves to the
    * cursor, `n_chunks` shrinks to the remaining dense range, and
    * `sum_tokens` is RE-AGGREGATED from the order slice + assignments
    * (never prorated — token masses are facts, not estimates). Shards
    * (and epochs) wholly before the cursor drop.
    *
    * Cursor semantics: `pos` is the FIRST position not yet consumed
    * (resume-at, not last-done) in `epoch` (required for epoch-indexed
    * manifests, refused for flat ones — [[readShard]]'s contract);
    * epochs after the named one remain in full. `pos` past the end of
    * the epoch simply yields no rows for it — a finished epoch is a
    * valid cursor, not an error. The boundary recomputation carries
    * [[readShard]]'s drift audit: the clamped slice's chunk count must
    * equal its dense range, or order/ and shards/ have diverged and
    * the resume refuses.
    *
    * Scale shape: |shards|-row manifest filter; at most ONE boundary
    * shard recomputes — a shard-budget-bounded order slice (pos-range
    * parquet-pruned) joined to assignments unhinted (AQE broadcasts the
    * slice). */
  def resumeShards(spark: SparkSession, recipeDir: String, pos: Long,
                   epoch: Option[Long] = None): DataFrame = {
    healResidues(spark, recipeDir)
    val sPath = new org.apache.hadoop.fs.Path(s"$recipeDir/shards")
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sPath),
      s"Recipe.resumeShards: no shards/ manifest at $recipeDir - " +
        "publish one with Recipe.shards first")
    require(pos >= 0L,
      s"Recipe.resumeShards: cursor position must be >= 0, got $pos")
    val manifest = spark.read.parquet(s"$recipeDir/shards")
    val hasEpoch = manifest.columns.contains("epoch")
    require(hasEpoch == epoch.isDefined,
      if (hasEpoch)
        s"Recipe.resumeShards: the manifest at $recipeDir/shards is " +
          "epoch-indexed - name the epoch the cursor sits in"
      else
        s"Recipe.resumeShards: the manifest at $recipeDir/shards is " +
          s"flat but epoch ${epoch.getOrElse(-1L)} was given - omit it")
    // an epoch the manifest never cut refuses (a typo'd cursor epoch
    // returning an empty "all done" would stop a fleet silently); a pos
    // past a REAL epoch's end stays valid — that epoch is finished
    epoch.foreach { e =>
      val maxE = manifest.agg(coalesce(max(col("epoch")), lit(-1L)))
        .head().getLong(0)
      require(e >= 0L && e <= maxE,
        s"Recipe.resumeShards: cursor epoch $e is outside the " +
          s"manifest's epochs [0, $maxE] at $recipeDir/shards - a " +
          "cursor in an epoch that was never cut is a fleet bug, not " +
          "a finished schedule")
    }
    val inCursorEpoch =
      epoch.map(e => col("epoch") === e).getOrElse(lit(true))
    val afterCursorEpoch =
      epoch.map(e => col("epoch") > e).getOrElse(lit(false))
    // untouched: wholly at/after the cursor; dropped: wholly before it
    val untouched = manifest.filter(
      afterCursorEpoch || (inCursorEpoch && col("first_pos") >= pos))
    val boundary = manifest.filter(inCursorEpoch &&
      col("first_pos") < pos && col("last_pos") >= pos).collect()
    require(boundary.length <= 1,
      s"Recipe.resumeShards: ${boundary.length} manifest shards straddle " +
        s"position $pos - overlapping ranges are a manifest integrity " +
        "failure; regenerate with Recipe.shards")
    val clamped = boundary.headOption.map { r =>
      val lastPos = r.getAs[Long]("last_pos")
      // the boundary shard's remaining mass, re-aggregated from facts
      val mPath = new org.apache.hadoop.fs.Path(s"$recipeDir/meta")
      require(fs.exists(mPath),
        s"Recipe.resumeShards: no meta/ record at $recipeDir - the " +
          "boundary recomputation derives its key columns from the " +
          "persisted run record; re-publish with Recipe.run")
      val strataCol = spark.read.parquet(s"$recipeDir/meta")
        .head().getAs[String]("strata_col")
      val slice = spark.read.parquet(s"$recipeDir/order")
        .filter(col("pos") >= pos && col("pos") <= lastPos &&
          epoch.map(e => col("epoch") === e).getOrElse(lit(true)))
        .select(col("stratum"), col("chunk_id"))
      val masses = spark.read.parquet(s"$recipeDir/assignments")
        .filter(col("chunk_id").isNotNull)
        .groupBy(col(strataCol).as("stratum"), col("chunk_id"))
        .agg(sum(col("n_tokens")).cast("bigint").as("__tok"))
      val agg = slice.join(masses, Seq("stratum", "chunk_id"))
        .agg(count(lit(1)), coalesce(sum(col("__tok")), lit(0L))).head()
      val nRemain = agg.getLong(0)
      require(nRemain == lastPos - pos + 1L,
        s"Recipe.resumeShards: the boundary slice [$pos, $lastPos] " +
          s"holds $nRemain chunks, expected ${lastPos - pos + 1} - " +
          "order/ and shards/ have drifted; regenerate the manifest " +
          "with Recipe.shards before resuming")
      val row = org.apache.spark.sql.Row.fromSeq(
        manifest.schema.fieldNames.toSeq.map {
          case "n_chunks"   => nRemain
          case "sum_tokens" => agg.getLong(1)
          case "first_pos"  => pos
          case other        => r.getAs[Any](other)
        })
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), manifest.schema)
    }
    val out = clamped.fold(untouched)(c => untouched.unionByName(c))
    val sortCols = (if (hasEpoch) Seq(col("epoch")) else Seq.empty) :+
      col("shard_id")
    out.orderBy(sortCols: _*)
  }

  /** The per-stratum GOVERNANCE CARD over a published recipe — the
    * reconciliation a review builds by hand today from three artifacts:
    * what the plan DECIDED (`alloc_tokens`), what materialization +
    * packing DELIVERED (`n_copies`, `packed_tokens`, `n_chunks`), how
    * fully the allocation was realized (`utilization_micro` =
    * packed·10⁶ div alloc, exact integer — an under-filled stratum
    * reads far below 10⁶ BEFORE a training run bakes the shortfall
    * in), and how healthy the published schedule is for the stratum
    * (`mix_delta_micro` = the WORST |same_next − share| across epochs
    * from the same [[graft.operators.Pipeline.orderMixingAudit]]
    * kernel the run gate used — one column that works for flat and
    * epoch schedules alike). One row per PLANNED stratum: a stratum
    * whose allocation materialized nothing still shows (zeros), which
    * is exactly the row a review needs to see.
    *
    * The card carries its own VERDICT (r16): `mixing_tol_micro` is the
    * run's persisted tolerance from `meta/`, and `within_tolerance`
    * says `within` / `degraded` per stratum (the q121 verdict
    * discipline) — the governance read needs no side lookup into meta
    * to know whether a post-retraction `mix_delta_micro` still sits
    * inside what the publish promised. The audit is KERNEL-AWARE by
    * artifact shape: a curriculum schedule (band column) audits
    * band-locally ([[graft.operators.Pipeline.orderMixingAuditBands]] —
    * the same yardstick the run gate held it to), epoch schedules per
    * epoch, flat schedules flat.
    *
    * Read-only and safe after a [[retract]] (the audit re-reads the
    * artifacts as they are). Scale shape: |strata| plan rows broadcast
    * into the joins; the assignments aggregate is one hash exchange of
    * chunk-table-scale rows; the mixing audit is the chunk-table pos
    * equi-join. Text is never read.
    */
  def report(spark: SparkSession, recipeDir: String,
             strataCol: String = "source"): DataFrame = {
    // self-heal every crash residue the dir can carry before any read
    healResidues(spark, recipeDir)
    val plan = spark.read.parquet(s"$recipeDir/plan")
    require(plan.columns.contains(strataCol) &&
        plan.columns.contains("alloc_tokens"),
      s"Recipe.report: plan at $recipeDir/plan has no '$strataCol'/" +
        s"'alloc_tokens' columns (found ${plan.columns.mkString(", ")}) " +
        "- is this a Recipe.run output dir?")
    val mPath = new org.apache.hadoop.fs.Path(s"$recipeDir/meta")
    val mfs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(mfs.exists(mPath),
      s"Recipe.report: no meta/ record at $recipeDir - the card's " +
        "verdict column needs the run's persisted mixing tolerance; " +
        "re-publish with Recipe.run (which writes meta/)")
    val metaDf = spark.read.parquet(s"$recipeDir/meta")
    require(metaDf.columns.contains("mixing_tol_micro"),
      s"Recipe.report: meta/ at $recipeDir has no 'mixing_tol_micro' " +
        s"column (found ${metaDf.columns.mkString(", ")})")
    val tol = metaDf.head().getAs[Long]("mixing_tol_micro")
    val assigned = spark.read.parquet(s"$recipeDir/assignments")
    val agg = assigned.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("bigint").as("n_copies"),
        coalesce(sum(col("n_tokens")), lit(0L)).cast("bigint")
          .as("packed_tokens"),
        countDistinct(when(col("chunk_id").isNotNull, col("chunk_id")))
          .cast("bigint").as("n_chunks"))
    val order = spark.read.parquet(s"$recipeDir/order")
    val audit =
      if (order.columns.contains("band"))
        Pipeline.orderMixingAuditBands(order)
      else if (order.columns.contains("epoch"))
        Pipeline.orderMixingAuditEpochs(order)
      else Pipeline.orderMixingAudit(order)
    // n_pairs == 0 rows carry NO successor evidence (their same_next
    // reads 0 by convention, so |0 − share| degenerates to the share) —
    // proveOrder and verify exclude them, and the card must share that
    // yardstick or a singleton band reads 'degraded' on a dir whose
    // publish gate passed
    val delta = audit.filter(col("n_pairs") > 0L)
      .groupBy(col("stratum").as(strataCol))
      .agg(max(abs(col("same_next_micro") - col("share_micro")))
        .cast("bigint").as("mix_delta_micro"))
    plan.select(col(strataCol), col("alloc_tokens"))
      .join(agg, Seq(strataCol), "left")
      .join(delta, Seq(strataCol), "left")
      .na.fill(0L,
        Seq("n_copies", "packed_tokens", "n_chunks", "mix_delta_micro"))
      .withColumn("utilization_micro",
        when(col("alloc_tokens") === 0L, 0L)
          .otherwise(expr(
            "CAST(packed_tokens AS DECIMAL(38,0)) * 1000000 div alloc_tokens"))
          .cast("long"))
      .withColumn("mixing_tol_micro", lit(tol))
      .withColumn("within_tolerance",
        when(col("mix_delta_micro") <= lit(tol), "within")
          .otherwise("degraded"))
  }

  /** One-call INTEGRITY RE-PROOF of a published recipe dir — the
    * compliance/ops sweep ([[Forget.residuals]]' doctrine applied to
    * the artifact lifecycle): every mutation in this object proves its
    * own gates at write time, but a fleet also needs to re-prove a dir
    * it did NOT just write — after a suspected hand edit, before
    * pointing a training run at it, on an audit cadence. `verify` reads
    * the artifacts as they stand and returns the CARD: one row per
    * check, `(check, status, measure)`, ordered by check name —
    * observing an all-ok card IS the proof, and a violated check names
    * itself instead of surfacing as a reader's stall three systems
    * later.
    *
    * Checks (all bounded reads — chunk-table/|strata|/|shards| scale;
    * the corpus text is never touched):
    *  - `mix_id_unique`: the assignments' composite key is a primary
    *    key (measure = row count; a duplicate means the materialize
    *    glue was hand-broken).
    *  - `tokenized_assigned`: zero tokenized copies without a chunk
    *    (measure = violations — the conservation gate's read side).
    *  - `order_chunks_match`: the schedule references EXACTLY the
    *    assignments' chunk set (measure = symmetric-difference count;
    *    a retraction that pruned one artifact but not the other shows
    *    here).
    *  - `plan_strata`: every stratum the assignments materialized was
    *    PLANNED (measure = assigned-but-unplanned strata; a vanished or
    *    orphaned stratum is the loudest hand-mutation of `plan/`). The
    *    inverse — a planned stratum that materialized nothing — is
    *    legitimate (the zeros row [[report]] exists to show) and does
    *    not fail.
    *  - `order_permutation`: every epoch is the exact permutation
    *    0..n−1, band blocks contiguous when banded (measure = epoch
    *    count) — the [[run]] gate re-run read-only.
    *  - `kernel_shape`: meta's recorded `order_kernel` agrees with the
    *    artifact's shape (a curriculum record with a band-less
    *    schedule, or the inverse, is a hand swap — measure = 0/1).
    *  - `bands_current` (curriculum only): chunks whose PERSISTED band
    *    differs from the current-economics derivation at meta's spec —
    *    status `ok`/`stale`, never `fail`: publish-time bands were
    *    correct, and a retraction legitimately shifts surviving chunks'
    *    mean lengths; staleness is the signal to re-publish for a fresh
    *    curriculum, not an integrity violation.
    *  - `mixing`: measured worst per-(epoch[, band], stratum) delta vs
    *    meta's tolerance — status `within`/`degraded`, measure = the
    *    delta (a statistical property: reported, never a `fail`).
    *  - when `stats/` exists (r17+ publishes): `stats_tokens` (the
    *    index's per-stratum totals vs plan's recorded totals —
    *    `ok`/`stale`, divergence is the retraction signature, never a
    *    failure), `stats_ids` (every ASSIGNED doc id exists in the
    *    index — `fail` on misses: the index is [[refresh]]'s
    *    materialization source, and a hand-pruned index row silently
    *    drops that doc from the next refresh, so the card asserts the
    *    coverage precondition; measure = missing ids), and
    *    `stats_unique` (the index's id primary key holds — `fail` on
    *    repeats: [[run]] refuses duplicates at the door, so a repeat
    *    is a hand edit, and the next refresh would materialize the doc
    *    twice minting colliding mix_ids; measure = repeated rows).
    *  - when `shards/` exists: `shards_tiling` (ranges tile each
    *    epoch contiguously, disjointly, chunk counts dense; an EMPTY
    *    manifest passes only when the schedule itself is empty — a
    *    hand-emptied manifest over a live schedule fails; measure =
    *    shard count), `shards_mass` (each shard's `sum_tokens` ≡ the
    *    re-aggregated order ⋈ assignments mass over its range —
    *    measure = violations), `shards_budget` (the persisted copies
    *    reconcile — `ok` positive budget, `stale` the legacy
    *    pre-sidecar empty manifest whose budget is unknowable, `fail`
    *    contradicting copies; measure = the budget). An UNREADABLE
    *    manifest (every data file deleted, only the sidecar left)
    *    fails all three at measure −1 instead of crashing the card.
    *
    * Statuses: `ok`/`fail` for structural checks, `within`/`degraded`
    * for mixing. Throws only when the dir is not a recipe dir at all
    * (missing artifacts/meta) — a verify that silently "passed" a
    * non-recipe path would be worse than a refusal.
    *
    * Execution shape (r17): the checks are independent bounded reads,
    * so they run as CONCURRENT Spark jobs over the two cached artifacts
    * — the card's wall time is its slowest check, not the sum of ~10
    * driver-synchronous job round-trips. */
  def verify(spark: SparkSession, recipeDir: String): DataFrame = {
    healResidues(spark, recipeDir)
    val fs = new org.apache.hadoop.fs.Path(recipeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("plan", "assignments", "order", "meta").foreach { a =>
      require(fs.exists(new org.apache.hadoop.fs.Path(s"$recipeDir/$a")),
        s"Recipe.verify: no $a/ at $recipeDir - not a Recipe.run " +
          "output dir (verifying the wrong path must refuse, not pass)")
    }
    val meta = spark.read.parquet(s"$recipeDir/meta").head()
    val strataCol = meta.getAs[String]("strata_col")
    val tol = meta.getAs[Long]("mixing_tol_micro")

    // the two artifacts every check below re-reads are cached for the
    // card's lifetime: the checks are deliberately independent reads
    // (each one names its own evidence), and without the cache the
    // chunk-scale assignments scan re-runs once per check
    val assigned = spark.read.parquet(s"$recipeDir/assignments").persist()
    val order = spark.read.parquet(s"$recipeDir/order").persist()
    // the checks are INDEPENDENT bounded reads, so they run as
    // CONCURRENT Spark jobs (Spark schedules jobs from multiple threads
    // in one session natively) — the card's wall time is the slowest
    // check, not the sum of ~10 driver-synchronous job round-trips. The
    // two shared scalars (chunk count, epoch extent) are their own
    // futures, submitted FIRST so a dependent group can never starve
    // them of a pool thread.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      type CardRows = Seq[(String, String, Long)]

      val aChunks = assigned.filter(col("chunk_id").isNotNull)
        .select(col(strataCol).as("stratum"), col("chunk_id")).distinct()
      val oChunks = order.select(col("stratum"), col("chunk_id")).distinct()
      val nChunksF = Future { aChunks.count() }
      val nEpochsF = Future {
        if (order.columns.contains("epoch"))
          math.max(1L, order.agg(coalesce(max(col("epoch")), lit(-1L)))
            .head().getLong(0) + 1L).toInt
        else 1
      }

      // assignments internals — every aggregate coalesced: a
      // fully-retracted recipe is a VALID dir (zero assignment rows),
      // and a bare sum() over it reads null, not 0
      val gAssigned = Future[CardRows] {
        val aStats = assigned.agg(count(lit(1)),
          countDistinct(col("mix_id")),
          coalesce(sum(when(col("n_tokens").isNotNull &&
            col("chunk_id").isNull, 1L).otherwise(0L)), lit(0L))).head()
        Seq(("mix_id_unique",
            if (aStats.getLong(0) == aStats.getLong(1)) "ok" else "fail",
            aStats.getLong(0)),
          ("tokenized_assigned",
            if (aStats.getLong(2) == 0L) "ok" else "fail",
            aStats.getLong(2)))
      }

      // the schedule vs the assignments' chunk set: ONE full-outer join
      // of the two distinct chunk sets counts the symmetric difference
      // (a two-directional exceptAll pays two wide shuffles for the
      // same set arithmetic — both inputs are already distinct)
      val gChunkSet = Future[CardRows] {
        val symDiff = aChunks.withColumn("__a", lit(1))
          .join(oChunks.withColumn("__o", lit(1)),
            Seq("stratum", "chunk_id"), "full_outer")
          .filter(col("__a").isNull || col("__o").isNull).count()
        Seq(("order_chunks_match",
          if (symDiff == 0L) "ok" else "fail", symDiff))
      }

      // plan/ coverage: every assigned stratum must be planned — a plan
      // whose stratum vanished under hand edits is the exact mutation
      // class this card exists for; the inverse (planned, nothing
      // materialized) is the legitimate zeros row report shows
      val gPlan = Future[CardRows] {
        val planStrata = spark.read.parquet(s"$recipeDir/plan")
          .select(col(strataCol).as("stratum")).distinct()
        val orphanStrata = assigned.select(col(strataCol).as("stratum"))
          .distinct().exceptAll(planStrata).count()
        Seq(("plan_strata",
          if (orphanStrata == 0L) "ok" else "fail", orphanStrata))
      }

      // the stats/ token index vs the plan's recorded totals (r17
      // publishes carry the index): per-stratum divergence is the
      // signature of a retraction since publish (stats and assignments
      // prune, plan/ is deliberately the untouched decision record) —
      // informative `stale`, never `fail`; measure = diverging strata.
      // Absent on pre-r17 dirs, and its absence is not a failure.
      // `stats_ids` is the index's COVERAGE check and it DOES fail: the
      // index is [[refresh]]'s materialization source, so an assigned
      // doc id missing from stats/ (a hand-pruned index row) silently
      // drops that doc from the NEXT refresh — no refusal, the loss
      // surfaces only as diff-card churn. The card asserts the
      // precondition instead: every assigned id must exist in the
      // index; measure = missing ids.
      val gStats = Future[CardRows] {
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$recipeDir/stats")))
          Seq.empty
        else {
          val statsDf = spark.read.parquet(s"$recipeDir/stats")
          val statsTotals = statsDf
            .groupBy(col(strataCol).as("stratum"))
            .agg(sum(col("n_tokens")).cast("long").as("__st"))
          val planTotals = spark.read.parquet(s"$recipeDir/plan")
            .select(col(strataCol).as("stratum"), col("n_tokens").as("__pt"))
          val diverged = statsTotals
            .join(planTotals, Seq("stratum"), "full_outer")
            .filter(!(col("__st") <=> col("__pt"))).count()
          // a dir carrying stats/ is an r17+ publish, whose meta records
          // id_col; the fallback only guards a hand-assembled hybrid
          val idc = if (meta.schema.fieldNames.contains("id_col"))
            meta.getAs[String]("id_col") else "doc_id"
          val missingIds = assigned.select(col(idc)).distinct()
            .join(statsDf.select(col(idc)).distinct(), Seq(idc), "left_anti")
            .count()
          // the index's own PK: run refuses duplicate ids at the door,
          // so a repeat here is a hand edit — and the NEXT refresh would
          // materialize the duplicated doc twice, minting colliding
          // mix_ids (refresh re-asserts this on its staged index too;
          // the card surfaces it on the audit cadence, before a publish
          // trips over it). measure = repeated rows.
          val sIdStats = statsDf.agg(count(lit(1)),
            countDistinct(col(idc))).head()
          val dupRows = sIdStats.getLong(0) - sIdStats.getLong(1)
          Seq(("stats_tokens",
              if (diverged == 0L) "ok" else "stale", diverged),
            ("stats_ids",
              if (missingIds == 0L) "ok" else "fail", missingIds),
            ("stats_unique",
              if (dupRows == 0L) "ok" else "fail", dupRows))
        }
      }

      // the ORDER group: permutation (+ band contiguity) per epoch
      // through the run gate's ONE proveOrder definition (refusals
      // converted to a failed check), meta's epoch record vs the
      // schedule's actual extent (vacuous on a fully-retracted
      // schedule), kernel record vs artifact shape, curriculum band
      // staleness (ok/stale — publish-time bands were correct; a
      // retraction legitimately shifts mean lengths), and the mixing
      // verdict vs the persisted tolerance — these share nChunks/nEpochs
      // and each other's intermediate state, so they stay one
      // sequential group inside their future
      val gOrder = Future[CardRows] {
        val nChunks = Await.result(nChunksF, Duration.Inf)
        val nEpochs = Await.result(nEpochsF, Duration.Inf)
        val rows = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        val measuredDelta =
          try {
            val d = proveOrder(order, 0 until nEpochs, flat = nEpochs == 1,
              nChunks, "Recipe.verify", mixingTol = _ => None)
            rows += (("order_permutation", "ok", nEpochs.toLong))
            Some(d)
          } catch {
            case _: IllegalArgumentException =>
              rows += (("order_permutation", "fail", nEpochs.toLong))
              None
          }
        val metaEpochs = meta.getAs[Long]("n_epochs")
        rows += (("epochs_recorded",
          if (nChunks == 0L || metaEpochs == nEpochs.toLong) "ok"
          else "fail", metaEpochs))
        val kernel = if (meta.schema.fieldNames.contains("order_kernel"))
          meta.getAs[String]("order_kernel") else "trainingOrder"
        val banded = order.columns.contains("band")
        rows += (("kernel_shape",
          if ((kernel == "curriculumOrder") == banded) "ok" else "fail",
          if ((kernel == "curriculumOrder") == banded) 0L else 1L))
        if (banded && kernel == "curriculumOrder") {
          val spec = CurriculumSpec(meta.getAs[Long]("band_divisor"),
            meta.getAs[Long]("band_max"))
          val expected = bandedChunks(assigned, strataCol, spec)
          val got = order
            .select(col("stratum"), col("chunk_id"), col("band")).distinct()
          val diverged = got
            .join(expected.withColumnRenamed("band", "__cb"),
              Seq("stratum", "chunk_id"))
            .filter(col("band") =!= col("__cb")).count()
          rows += (("bands_current",
            if (diverged == 0L) "ok" else "stale", diverged))
        }
        measuredDelta.foreach { d =>
          rows += (("mixing", if (d <= tol) "within" else "degraded", d))
        }
        rows.toSeq
      }

      // shards, when published
      val gShards = Future[CardRows] {
        val sPath = new org.apache.hadoop.fs.Path(s"$recipeDir/shards")
        if (!fs.exists(sPath)) Seq.empty
        else {
          val nChunks = Await.result(nChunksF, Duration.Inf)
          val nEpochs = Await.result(nEpochsF, Duration.Inf)
          val rows = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Long)]
          // an UNREADABLE manifest (every data file hand-deleted, only
          // the `_budget` sidecar left — schema inference has nothing
          // to read) is a corruption the card must NAME, not crash on:
          // report all three shard checks failed (tiling owns the
          // no-manifest-over-a-live-schedule class; budget/mass cannot
          // be computed, and an uncomputable integrity check is a
          // failure, never a silent skip)
          val manifestOpt =
            try Some(spark.read.parquet(s"$recipeDir/shards"))
            catch {
              case _: org.apache.spark.sql.AnalysisException => None
            }
          if (manifestOpt.isEmpty) {
            rows += (("shards_tiling", "fail", -1L))
            rows += (("shards_mass", "fail", -1L))
            rows += (("shards_budget", "fail", -1L))
            rows.toSeq
          } else {
          val manifest = manifestOpt.get
          val hasEpoch = manifest.columns.contains("epoch")
          val mRows = manifest.collect()
          val byEpoch = mRows.groupBy(r =>
            if (hasEpoch) r.getAs[Long]("epoch") else 0L)
          // an EMPTY manifest is excused ONLY when the schedule itself
          // is empty (a fully-retracted dir): with chunks scheduled, a
          // hand-emptied manifest (parts deleted, `_budget` sidecar
          // surviving) is the exact mutation class this card exists
          // for — the per-epoch walk below never runs on zero rows, so
          // without this gate all three shard checks read ok on it
          var tilingOk =
            if (mRows.isEmpty) nChunks == 0L
            else byEpoch.keySet == (0L until nEpochs.toLong).toSet
          byEpoch.values.foreach { es =>
            var expect = 0L
            es.sortBy(_.getAs[Long]("first_pos")).foreach { r =>
              val lo = r.getAs[Long]("first_pos")
              val hi = r.getAs[Long]("last_pos")
              if (lo != expect || hi < lo ||
                  r.getAs[Long]("n_chunks") != hi - lo + 1L) tilingOk = false
              expect = hi + 1L
            }
            if (expect != nChunks) tilingOk = false
          }
          rows += (("shards_tiling", if (tilingOk) "ok" else "fail",
            mRows.length.toLong))
          // masses: re-aggregate order ⋈ assignments over each range
          val masses = assigned.filter(col("chunk_id").isNotNull)
            .groupBy(col(strataCol).as("stratum"), col("chunk_id"))
            .agg(sum(col("n_tokens")).cast("bigint").as("__tok"))
          val epochKey = if (hasEpoch) col("epoch") else lit(0L)
          val posMass = order.join(masses, Seq("stratum", "chunk_id"))
            .select(epochKey.as("__e"), col("pos"), col("__tok"))
          val rangeDf = spark.createDataFrame(
            spark.sparkContext.parallelize(mRows.toSeq.map { r =>
              org.apache.spark.sql.Row(
                if (hasEpoch) r.getAs[Long]("epoch") else 0L,
                r.getAs[Long]("shard_id"), r.getAs[Long]("first_pos"),
                r.getAs[Long]("last_pos"), r.getAs[Long]("sum_tokens"))
            }, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("__re",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("__sid",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("__lo",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("__hi",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("__claimed",
                org.apache.spark.sql.types.LongType))))
          // group by (epoch, shard): shard ids RESTART per epoch, so a
          // shard-only key would merge epoch 0's shard k with epoch 1's
          // and "find" a 2x mass violation on a healthy manifest
          val massViolations = posMass
            .join(broadcast(rangeDf),
              col("__e") === col("__re") &&
                col("pos") >= col("__lo") && col("pos") <= col("__hi"))
            .groupBy(col("__re"), col("__sid"), col("__claimed"))
            .agg(coalesce(sum(col("__tok")), lit(0L)).as("__actual"))
            .filter(col("__actual") =!= col("__claimed")).count()
          rows += (("shards_mass",
            if (massViolations == 0L) "ok" else "fail", massViolations))
          // ok = a positive budget is recoverable; stale = unknowable
          // (the legacy pre-sidecar empty manifest — a re-publish would
          // refuse; re-cut with Recipe.shards to upgrade); fail = the
          // persisted copies contradict each other
          rows += (try {
            val b = persistedShardBudget(spark, recipeDir, "Recipe.verify")
              .getOrElse(0)
            ("shards_budget", if (b > 0) "ok" else "stale", b.toLong)
          } catch {
            case _: IllegalArgumentException => ("shards_budget", "fail", -1L)
          })
          rows.toSeq
          }
        }
      }

      val card = Await.result(
        Future.sequence(Seq(gAssigned, gChunkSet, gPlan, gStats, gOrder,
          gShards)), Duration.Inf).flatten
      val sqlc = spark
      import sqlc.implicits._
      card.toDF("check", "status", "measure").orderBy(col("check"))
    } finally {
      pool.shutdown()
      assigned.unpersist(); order.unpersist(); ()
    }
  }

  /** PUBLISH-TO-PUBLISH drift — the governance comparison of two
    * published recipes ("did the re-publish change the mix
    * materially?"): after [[retract]] degrades mixing past tolerance
    * the prescribed move is a fresh [[run]], and the review question
    * that follows is what the new publish actually changed. One row per
    * stratum in EITHER plan: the allocation each plan decided
    * (`alloc_a`/`alloc_b`, 0 when the stratum is absent — a stratum
    * appearing or vanishing is the loudest drift there is), what each
    * publish packed (`packed_a`/`packed_b`), and the materialized
    * sample's CHURN — `copies_only_a`/`copies_only_b` count `mix_id`s
    * (the `doc#copy` composite — deterministic given plan + seed, so
    * comparable ACROSS publishes, unlike chunk ids, which are packing
    * positions and mean different content in each publish) present in
    * one multiset and not the other. All exact integers.
    *
    * The strata column comes from each dir's `meta/` — the persisted
    * record, never a caller guess ([[readShard]]'s doctrine): two
    * publishes keyed on different columns are not comparable, so an A/B
    * mismatch REFUSES naming both. `strataColOverride` exists only for
    * pre-meta dirs (it is applied to both sides — the refusal semantics
    * survive the override).
    *
    * Scale shape: two |strata| plan reads broadcast into a full outer
    * join; the copy churn is one (stratum, mix_id)-keyed full outer
    * over the two assignments artifacts (chunk-table-scale rows, text
    * never read) aggregated per stratum. */
  def diff(spark: SparkSession, dirA: String, dirB: String,
           strataColOverride: Option[String] = None): DataFrame = {
    healResidues(spark, dirA)
    healResidues(spark, dirB)
    val strataCol = strataColOverride.getOrElse {
      def metaStrataOf(d: String): String = {
        val p = new org.apache.hadoop.fs.Path(s"$d/meta")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(p),
          s"Recipe.diff: no meta/ record at $d - the comparison derives " +
            "its strata column from the persisted run record; pass " +
            "strataColOverride for a pre-meta dir")
        spark.read.parquet(p.toString).head().getAs[String]("strata_col")
      }
      val (a, b) = (metaStrataOf(dirA), metaStrataOf(dirB))
      require(a == b,
        s"Recipe.diff: the two publishes are keyed on different strata " +
          s"columns ('$a' at $dirA vs '$b' at $dirB) - per-stratum drift " +
          "between them is not comparable")
      a
    }
    diffFrames(
      spark.read.parquet(s"$dirA/plan"),
      spark.read.parquet(s"$dirA/assignments"),
      spark.read.parquet(s"$dirB/plan"),
      spark.read.parquet(s"$dirB/assignments"),
      strataCol, s"$dirA/plan", s"$dirB/plan")
  }

  /** [[diff]]'s card over in-hand frames — shared with [[refresh]],
    * which persists the same comparison (prior publish vs the staged
    * one) as the refresh's own governance exit record, so the two
    * drift readings cannot diverge. */
  private def diffFrames(planA: DataFrame, assignedA: DataFrame,
                         planB: DataFrame, assignedB: DataFrame,
                         strataCol: String, labelA: String,
                         labelB: String): DataFrame = {
    def planSel(p: DataFrame, label: String): DataFrame = {
      require(p.columns.contains(strataCol) &&
          p.columns.contains("alloc_tokens"),
        s"Recipe.diff: plan at $label has no '$strataCol'/" +
          s"'alloc_tokens' columns - is this a Recipe.run output dir?")
      p.select(col(strataCol), col("alloc_tokens"))
    }
    def packedOf(a: DataFrame): DataFrame =
      a.groupBy(col(strataCol))
        .agg(coalesce(sum(col("n_tokens")), lit(0L)).cast("bigint")
          .as("packed"),
          count(lit(1)).cast("bigint").as("n_copies"))
    def copiesOf(a: DataFrame): DataFrame =
      a.select(col(strataCol), col("mix_id"))
    val churn = copiesOf(assignedA).withColumn("__a", lit(1))
      .join(copiesOf(assignedB).withColumn("__b", lit(1)),
        Seq(strataCol, "mix_id"), "full_outer")
      .groupBy(col(strataCol))
      .agg(sum(when(col("__b").isNull, 1L).otherwise(0L))
          .cast("bigint").as("copies_only_a"),
        sum(when(col("__a").isNull, 1L).otherwise(0L))
          .cast("bigint").as("copies_only_b"))
    planSel(planA, labelA).withColumnRenamed("alloc_tokens", "alloc_a")
      .join(planSel(planB, labelB).withColumnRenamed("alloc_tokens", "alloc_b"),
        Seq(strataCol), "full_outer")
      .join(packedOf(assignedA)
          .withColumnRenamed("packed", "packed_a")
          .withColumnRenamed("n_copies", "n_copies_a"),
        Seq(strataCol), "left")
      .join(packedOf(assignedB)
          .withColumnRenamed("packed", "packed_b")
          .withColumnRenamed("n_copies", "n_copies_b"),
        Seq(strataCol), "left")
      .join(churn, Seq(strataCol), "left")
      .na.fill(0L, Seq("alloc_a", "alloc_b", "packed_a", "packed_b",
        "n_copies_a", "n_copies_b", "copies_only_a", "copies_only_b"))
  }

  /** What a retraction removed and what was re-proven: `chunksDropped`
    * counts chunks whose EVERY copy was forgotten (they leave the
    * schedule entirely; a chunk that only lost some members stays, with
    * less mass), `maxMixDeltaMicro` is the re-MEASURED mixing health of
    * the pruned schedule — reported, never gated, see [[retract]]. */
  final case class RetractReport(
      nIds: Long,
      copiesRemoved: Long,
      tokensRemoved: Long,
      chunksDropped: Long,
      nChunks: Long,
      nEpochs: Int,
      maxMixDeltaMicro: Long,
      artifacts: Seq[String])

  /** Propagate a right-to-be-forgotten batch into a PUBLISHED recipe —
    * the deletion leg [[graft.Forget.forget]] cannot cover generically:
    * a recipe's `order/` artifact references forgotten docs INDIRECTLY
    * (through chunk membership), so a plain id-keyed artifact prune
    * leaves a schedule whose positions point at chunks that no longer
    * exist, and a dataloader reading "position k of n" stalls on the
    * holes. `retract` closes the whole chain in one call:
    *
    *  1. `assignments/` — staged anti-join prune of every copy of every
    *     listed id ([[graft.operators.Pipeline.pruneArtifact]]), then a
    *     ZERO-RESIDUAL audit on the rewritten artifact (the Forget
    *     doctrine: the proof is the exit, not a follow-up).
    *  2. `order/` — chunks whose every member was forgotten leave the
    *     schedule (semi-join against the surviving chunk set; AQE picks
    *     broadcast vs shuffle — survivors are chunk-scale, not
    *     human-scale), and positions recompact to the exact permutation
    *     0..n−1 per epoch with relative order PRESERVED
    *     ([[graft.operators.Pipeline.recompactPositions]]). Staged
    *     rewrite — a crash at any point leaves a readable artifact and
    *     a rerun self-heals.
    *  3. `shards/` — a published manifest tiles the OLD position space
    *     (its last shard claims positions past the recompacted end), so
    *     when present it is REGENERATED at its own persisted
    *     `shard_tokens` budget (validated before any mutation; a
    *     manifest without the budget column refuses up front).
    *
    * The permutation gate re-proves each epoch on the artifact actually
    * written. The MIXING audit is re-measured and REPORTED but never
    * gated — a deletion required by law must not be refusable on a
    * statistical property of what remains; a caller whose
    * `maxMixDeltaMicro` degraded past their tolerance re-runs [[run]]
    * for a fresh schedule (new positions — resume bookkeeping resets),
    * which is a training decision, not a compliance one. `plan/` is
    * deliberately untouched: it is the governance record of what was
    * DECIDED at publish time; `tokensRemoved` quantifies the drift.
    *
    * Idempotent: replaying a delete log re-prunes nothing and re-proves
    * the gates. Scale shape: the delete list broadcasts (GDPR batches
    * are bounded), each artifact rewrites once (work ∝ artifact size),
    * the recompaction is the two-pass count-offset kernel — the corpus
    * text is never touched.
    */
  def retract(ids: DataFrame, recipeDir: String,
              strataCol: String = "source",
              idCol: String = "doc_id"): RetractReport = {
    val spark = ids.sparkSession
    val aDir = s"$recipeDir/assignments"
    val oDir = s"$recipeDir/order"
    // heal crashed-swap residue BEFORE any read (Maintain's r15 lesson:
    // a before-read against a mid-swap dir throws PATH_NOT_FOUND where
    // a rerun should self-heal) — every tag the dir can carry, in one
    // shared place
    healResidues(spark, recipeDir)
    val before = spark.read.parquet(aDir)
    Seq(idCol, strataCol, "n_tokens", "chunk_id").foreach { c =>
      require(before.columns.contains(c),
        s"Recipe.retract: assignments at $aDir has no '$c' column " +
          s"(found ${before.columns.mkString(", ")}) - is this a " +
          "Recipe.run output dir?")
    }
    require(ids.columns.contains(idCol),
      s"Recipe.retract: ids has no '$idCol' column (found " +
        s"${ids.columns.mkString(", ")})")
    val idList = ids.select(col(idCol)).distinct()
    val nIds = idList.count()
    // before-stats for the report — column-pruned reads, never text
    val hitAgg = before.join(broadcast(idList), Seq(idCol), "left_semi")
      .agg(count(lit(1)), coalesce(sum(col("n_tokens")), lit(0L))).head()
    val copiesRemoved = hitAgg.getLong(0)
    val tokensRemoved = hitAgg.getLong(1)
    // shards/ pre-flight, BEFORE any mutation: the regeneration at the
    // end needs the manifest's persisted budget, and a manifest without
    // one must refuse while the recipe dir is still untouched
    val shardBudget = persistedShardBudget(spark, recipeDir, "Recipe.retract")
    val beforeChunks = spark.read.parquet(oDir)
    // coalesce(-1): a replayed delete log against an order/ that a prior
    // retraction emptied must re-prove the gates, not NPE on a null max
    val nEpochs = if (beforeChunks.columns.contains("epoch"))
      math.max(1L, beforeChunks
        .agg(coalesce(max(col("epoch")), lit(-1L))).head().getLong(0) + 1L)
        .toInt
    else 1
    val chunksBefore = beforeChunks
      .select(col("stratum"), col("chunk_id")).distinct().count()

    // 1) assignments: staged prune + zero-residual audit
    Pipeline.pruneArtifact(idList, aDir, idCol)
    val after = spark.read.parquet(aDir)
    val residual = after.join(broadcast(idList), Seq(idCol), "left_semi").count()
    require(residual == 0L,
      s"Recipe.retract: $residual assignment rows still hold a listed " +
        s"$idCol after the prune - the rewrite is broken; do not trust " +
        "this recipe dir")
    // 1b) the stats/ token index (r17 publishes carry it) holds one row
    //     per corpus doc — forgotten ids must leave it too, or a later
    //     [[refresh]] re-materializing from the index would RESURRECT
    //     them (the exact GDPR residue class Forget.residuals hunts)
    val stDir = s"$recipeDir/stats"
    val stPath = new org.apache.hadoop.fs.Path(stDir)
    val stFs = stPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (stFs.exists(stPath)) {
      Pipeline.pruneArtifact(idList, stDir, idCol)
      val stResidual = spark.read.parquet(stDir)
        .join(broadcast(idList), Seq(idCol), "left_semi").count()
      require(stResidual == 0L,
        s"Recipe.retract: $stResidual stats rows still hold a listed " +
          s"$idCol after the prune - the rewrite is broken; do not trust " +
          "this recipe dir")
    }
    val survivors = after.filter(col("chunk_id").isNotNull)
      .select(col(strataCol).as("stratum"), col("chunk_id")).distinct()

    // 2) order: drop fully-forgotten chunks, recompact per epoch —
    //    survivors are CHUNK-scale, so the semi-join stays unhinted
    //    (AQE decides broadcast vs shuffle, the q174 rule)
    Pipeline.stagedRewrite(spark, oDir, "retract") { df =>
      Pipeline.recompactPositions(
        df.join(survivors, Seq("stratum", "chunk_id"), "left_semi"))
    }

    // permutation re-proved per epoch on the artifact actually written;
    // mixing re-MEASURED, never gated (deletion is not refusable on a
    // statistical property of what remains — see scaladoc)
    val written = spark.read.parquet(oDir)
    val nChunks = survivors.count()
    val maxDelta = proveOrder(written, 0 until nEpochs,
      flat = nEpochs == 1, nChunks, "Recipe.retract", mixingTol = _ => None)

    // 3) a published shards/ manifest tiles the OLD position space —
    //    left in place it would hand readers slices past the recompacted
    //    end, the exact stall retract exists to prevent. The manifest is
    //    a pure function of the other artifacts, so REGENERATE it at its
    //    own persisted budget (validated up front, before any mutation)
    // budget 0 means the manifest is EMPTY (rows carry the positive
    // budget they were cut at) — an empty manifest tiles the empty
    // space correctly, so leave it in place: deleting it would break
    // replay idempotence for a monitor of the published path
    shardBudget.foreach { budget =>
      if (budget > 0) { shards(spark, recipeDir, budget, strataCol); () }
    }

    RetractReport(nIds, copiesRemoved, tokensRemoved,
      chunksBefore - nChunks, nChunks, nEpochs, maxDelta,
      Seq(aDir, oDir) ++
        (if (stFs.exists(stPath)) Seq(stDir) else Seq.empty) ++
        shardBudget.map(_ => s"$recipeDir/shards").toSeq)
  }

  /** The shards manifest's persisted budget, validated up front: Some
    * when a manifest exists, None when none was ever published; a
    * manifest without a recoverable budget refuses LOUDLY before any
    * caller mutates the recipe dir. Shared by [[run]], [[retract]], and
    * [[extendEpochs]].
    *
    * Two persisted copies, reconciled: the per-row `shard_tokens`
    * constant (the r15 `build_k` discipline) and the r16 `_budget`
    * SIDECAR — a one-row parquet INSIDE `shards/` (underscore-prefixed,
    * so the manifest read never sees it, and it rides the staged swap
    * with the rows it describes). The sidecar exists because the row
    * copy EVAPORATES with the rows: a fully-retracted schedule's
    * manifest has zero rows and its budget used to read back as 0 —
    * unknowable, forcing [[run]]'s re-publish to refuse. Rules:
    * sidecar + rows must AGREE (a hand-edited hybrid refuses); rows
    * alone must agree with THEMSELVES (min == max — mixed budgets are
    * ambiguity, never silently re-cut at the max); a legacy empty
    * manifest (no sidecar, no rows) reads 0 = unknowable. */
  private def persistedShardBudget(spark: SparkSession, recipeDir: String,
                                   caller: String): Option[Int] = {
    val sPath = new org.apache.hadoop.fs.Path(s"$recipeDir/shards")
    val fs = sPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(sPath)) None
    else {
      val m = spark.read.parquet(s"$recipeDir/shards")
      require(m.columns.contains("shard_tokens"),
        s"$caller: $recipeDir/shards exists but carries no " +
          "'shard_tokens' column, so the manifest cannot be re-cut at " +
          "its original budget - regenerate it with Recipe.shards " +
          "(which persists the budget) and retry")
      val mm = m.agg(min(col("shard_tokens")), max(col("shard_tokens"))).head()
      val rowBudget: Option[Long] =
        if (mm.isNullAt(1)) None
        else {
          require(mm.getLong(0) == mm.getLong(1),
            s"$caller: $recipeDir/shards rows disagree on their own " +
              s"budget (shard_tokens min ${mm.getLong(0)} != max " +
              s"${mm.getLong(1)}) - a mixed-budget manifest is " +
              "hand-edited or hybrid residue; refusing to re-cut at " +
              "either value - delete shards/ and regenerate with " +
              "Recipe.shards")
          Some(mm.getLong(1))
        }
      val scPath = new org.apache.hadoop.fs.Path(s"$recipeDir/shards/_budget")
      val sidecar: Option[Long] =
        if (!fs.exists(scPath)) None
        else Some(spark.read.parquet(scPath.toString).head().getLong(0))
      (sidecar, rowBudget) match {
        case (Some(sb), Some(rb)) =>
          require(sb == rb,
            s"$caller: $recipeDir/shards _budget sidecar says $sb but " +
              s"the manifest rows say $rb - the two persisted copies " +
              "disagree; delete shards/ and regenerate with Recipe.shards")
          Some(sb.toInt)
        case (Some(sb), None) => Some(sb.toInt) // emptied manifest, budget known
        case (None, Some(rb)) => Some(rb.toInt) // legacy (pre-sidecar) manifest
        case (None, None)     => Some(0)        // legacy empty: unknowable
      }
    }
  }

  /** What an extension added and re-proved: epochs `oldEpochs..nEpochs−1`
    * are NEW permutations, epochs below `oldEpochs` are byte-identical
    * to what the dataloader already consumed. */
  final case class ExtendReport(
      oldEpochs: Int,
      nEpochs: Int,
      nChunks: Long,
      maxMixDeltaMicro: Long,
      artifacts: Seq[String])

  /** EXTEND a published schedule to more epochs — "train 3 epochs, not
    * 2", decided after the publish: epoch `e` of a recipe is its
    * RECORDED order kernel at `seed XOR e` —
    * [[graft.operators.Pipeline.trainingOrder]] or
    * [[graft.operators.Pipeline.curriculumOrder]] per meta's
    * `order_kernel` (+ band spec), r16 — so epochs `oldN..nEpochs−1`
    * are DERIVABLE from the persisted `meta/` (kernel + seed + mixing
    * tolerance + epoch count — the governance record [[run]] writes)
    * without touching the epochs a resumable training run may already
    * have consumed. A meta that cannot name its kernel REFUSES: before
    * the record existed, extension hard-assumed trainingOrder, and
    * extending a curriculum-ordered schedule that way passed every
    * generic gate while silently appending non-band epochs. The existing
    * epochs' rows pass through the staged rewrite UNCHANGED (a flat
    * single-epoch schedule gains its explicit `epoch = 0` column); the
    * new epochs are fresh permutations over the CURRENT chunk table
    * (assignments as they stand — a retracted recipe extends over its
    * survivors).
    *
    * Gates BEFORE the swap ([[run]]'s rule): the extended order is
    * staged, the permutation proof re-runs over EVERY epoch ON THE
    * STAGE, and the mixing gate holds only the NEW epochs to the run's
    * own persisted tolerance (old epochs are re-measured, never
    * re-gated — a retraction may have degraded them, and extension must
    * not be refusable on history it didn't write) — a refusal leaves
    * the live schedule untouched. Crash/replay discipline: the rewrite
    * DERIVES every epoch ≥ the meta-recorded count (dropping any
    * partial prior extension before unioning), the shards manifest is
    * re-cut BEFORE the meta flip, and the meta flip comes LAST — so a
    * crash at any point leaves a rerun of the SAME call that converges
    * (meta still says oldN until everything else landed). Every
    * parameter comes from `meta/` (seed, strata column, tolerance) —
    * the record exists precisely so the extension cannot be run with
    * mismatched parameters. Pre-meta recipe dirs refuse loudly with the
    * upgrade path.
    *
    * Scale shape: the audited order kernel per NEW epoch (one range
    * exchange of chunk-table rows each), one staged rewrite of the
    * chunk-scale order artifact, |1|-row meta flip. */
  def extendEpochs(spark: SparkSession, recipeDir: String,
                   nEpochs: Int): ExtendReport = {
    val oDir = s"$recipeDir/order"
    val mDir = s"$recipeDir/meta"
    healResidues(spark, recipeDir)
    val mPath = new org.apache.hadoop.fs.Path(mDir)
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mPath),
      s"Recipe.extendEpochs: no meta/ record at $recipeDir - this " +
        "recipe predates the persisted run parameters; re-publish with " +
        "Recipe.run (which writes meta/) to make it extendable")
    val meta = spark.read.parquet(mDir)
    Seq("seed", "n_epochs", "mixing_tol_micro", "strata_col").foreach(c =>
      require(meta.columns.contains(c),
        s"Recipe.extendEpochs: meta/ at $recipeDir has no '$c' column " +
          s"(found ${meta.columns.mkString(", ")})"))
    // the kernel record is NOT optional (r16): an extension that
    // guessed trainingOrder against a schedule some other kernel dealt
    // would pass every generic gate (any permutation proves; mixing
    // gates only the new epochs) and silently append epochs that break
    // the schedule's own contract — the exact mismatched-parameter
    // class meta/ exists to kill. A meta that cannot say refuses.
    require(meta.columns.contains("order_kernel"),
      s"Recipe.extendEpochs: meta/ at $recipeDir records no " +
        "'order_kernel' - this recipe predates the r16 kernel record, " +
        "so the extension cannot derive the MATCHING kernel (extending " +
        "a curriculum-ordered schedule with trainingOrder epochs would " +
        "silently break the band contract); re-publish with Recipe.run")
    val m = meta.head()
    val seed = m.getAs[Long]("seed")
    val oldN = m.getAs[Long]("n_epochs").toInt
    val tol = m.getAs[Long]("mixing_tol_micro")
    val strataCol = m.getAs[String]("strata_col")
    val kernel = m.getAs[String]("order_kernel")
    require(nEpochs > oldN,
      s"Recipe.extendEpochs: schedule already has $oldN epoch(s); " +
        s"nEpochs must exceed it, got $nEpochs (shrinking a schedule " +
        "would orphan consumed positions - republish instead)")
    Pipeline.requireSaneEpochs(spark, nEpochs, "Recipe.extendEpochs")
    // shards pre-flight BEFORE any mutation (retract's rule)
    val shardBudget = persistedShardBudget(spark, recipeDir,
      "Recipe.extendEpochs")

    val assigned = spark.read.parquet(s"$recipeDir/assignments")
      .filter(col("chunk_id").isNotNull)
    val chunks = assigned
      .select(col(strataCol).as("stratum"), col("chunk_id")).distinct()
    val nChunks = chunks.count()
    // the MATCHING kernel, derived from the persisted record — for a
    // curriculum recipe the bands are RE-DERIVED from the assignments
    // as they stand (the shared bandedChunks definition at the
    // persisted spec): a retraction may have changed chunk membership,
    // and "fresh permutations over the CURRENT chunk table" means the
    // new epochs band on current economics, not on publish-time ghosts
    val orderKeys = Seq("stratum", "chunk_id")
    val epochRows: Int => DataFrame = kernel match {
      case "trainingOrder" =>
        e => Pipeline.trainingOrder(chunks, seed ^ e.toLong, orderKeys)
      case "curriculumOrder" =>
        Seq("band_divisor", "band_max").foreach(c =>
          require(meta.columns.contains(c) && !m.isNullAt(m.fieldIndex(c)),
            s"Recipe.extendEpochs: meta/ at $recipeDir says " +
              s"order_kernel=curriculumOrder but '$c' is missing/null - " +
              "the band spec is part of the kernel record; re-publish " +
              "with Recipe.run(curriculum = Some(...))"))
        val spec = CurriculumSpec(m.getAs[Long]("band_divisor"),
          m.getAs[Long]("band_max"))
        val banded = bandedChunks(assigned, strataCol, spec)
        e => Pipeline.curriculumOrder(banded, seed ^ e.toLong, orderKeys)
      case other => throw new IllegalArgumentException(
        s"Recipe.extendEpochs: meta/ at $recipeDir records unknown " +
          s"order_kernel '$other' - this build cannot derive its " +
          "epochs; upgrade, or re-publish with Recipe.run")
    }
    val newEpochs = (oldN until nEpochs).map { e =>
      epochRows(e).withColumn("epoch", lit(e.toLong))
    }.reduce(_ unionByName _)

    // stage → PROVE → swap: existing epochs below the meta-recorded
    // count pass through UNCHANGED (the flat schedule gains its
    // explicit epoch 0); any epoch ≥ oldN already present is a partial
    // prior extension and is RE-DERIVED, not doubled (replay
    // idempotence); the gates run on the stage, so a refusal leaves
    // the live schedule untouched
    var maxDelta = 0L
    Pipeline.stagedOverwrite(spark, oDir, "extend") { stage =>
      val live = spark.read.parquet(oDir)
      val withEpoch = if (live.columns.contains("epoch")) live
        else live.withColumn("epoch", lit(0L))
      withEpoch.filter(col("epoch") < oldN.toLong)
        .unionByName(newEpochs)
        .write.mode("overwrite").parquet(stage)
      maxDelta = proveOrder(spark.read.parquet(stage), 0 until nEpochs,
        flat = false, nChunks, "Recipe.extendEpochs",
        mixingTol = e => if (e >= oldN) Some(tol) else None)
    }

    // the manifest tiles per-epoch position ranges — the new epochs
    // need read slices too; re-cut at the persisted budget, BEFORE the
    // meta flip so a crash in between is replayable (see scaladoc)
    shardBudget.foreach { budget =>
      if (budget > 0) { shards(spark, recipeDir, budget, strataCol); () }
    }

    // meta flips to the new epoch count LAST — the commit point: only
    // once everything else landed does a rerun of the same call refuse
    val newMeta = meta.withColumn("n_epochs", lit(nEpochs.toLong))
    Pipeline.stagedOverwrite(spark, mDir, "extend") { stage =>
      newMeta.coalesce(1).write.mode("overwrite").parquet(stage)
    }

    ExtendReport(oldN, nEpochs, nChunks, maxDelta,
      Seq(oDir, mDir) ++ shardBudget.map(_ => s"$recipeDir/shards").toSeq)
  }

  /** Every crash residue a recipe dir can carry, healed in one place —
    * the publish-root swap plus each artifact's own rewrite tags. Every
    * reader/mutator of a recipe dir calls this first, so a crash in ANY
    * prior operation self-heals on the next touch instead of surfacing
    * as PATH_NOT_FOUND from whichever function happens to run next. */
  private def healResidues(spark: SparkSession, recipeDir: String): Unit = {
    Pipeline.healStagedResidue(spark, recipeDir, "publish")
    Pipeline.healStagedResidue(spark, s"$recipeDir/assignments", "prune")
    Pipeline.healStagedResidue(spark, s"$recipeDir/stats", "prune")
    Pipeline.healStagedResidue(spark, s"$recipeDir/order", "retract")
    Pipeline.healStagedResidue(spark, s"$recipeDir/order", "extend")
    Pipeline.healStagedResidue(spark, s"$recipeDir/meta", "extend")
    Pipeline.healStagedResidue(spark, s"$recipeDir/shards", "publish")
  }
}
