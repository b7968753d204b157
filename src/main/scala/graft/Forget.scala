package graft

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.state.StateStoreConf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{AnnIndex, HistogramSketch, Pipeline, TextOps}
import graft.state.{GraftStateStoreProviderBase, StateRescale}

/** One-call right-to-be-forgotten orchestration — the composition of the
  * delete surfaces this library grew one at a time:
  *
  *  - [[graft.state.StateRescale.pruneCheckpoint]] — streaming state (a
  *    stopped query's keyed state, resumable after the rewrite)
  *  - [[graft.operators.AnnIndex.prune]] — the serving ANN index (a
  *    delete that misses the index the fleet probes is not a delete)
  *  - [[graft.operators.Pipeline.pruneArtifact]] — every derived
  *    parquet artifact an id reached (token index, band index, shards)
  *  - [[graft.operators.TextOps.forgetFromSpanIndex]] — the persisted
  *    span index, which holds an id's content TWICE (its `pos/` rows
  *    and its df contributions in `grams/`), so a plain artifact prune
  *    would leave the df algebra corrupted
  *  - the CDC chunk-digest index ([[graft.operators.TextOps
  *    .buildCdcIndex]]'s `digests/`) — partition-layout-preserving
  *    prune (r12; a flat prune would destroy the ingest probe's `db`
  *    pruning)
  *  - the histogram index ([[graft.operators.HistogramSketch
  *    .buildHistogramIndex]]'s `hist/`) — id-free by construction, so
  *    its leg is ACCURACY maintenance: a negative-generation retraction
  *    of the removed docs' bucket counts (r13), plus a structural
  *    id-freedom audit in the exit gate
  *  - the KMV sketch index ([[graft.operators.Dedup.buildSketchIndex]]'s
  *    `sketches/`) — id-free AND monoid-only (a bottom-k insert cannot
  *    be undone), so deletion-accuracy maintenance is a REBUILD over
  *    the survivors: pass `kmvSurvivors` and the rebuild runs INSIDE
  *    this call (r14; guarded — a survivor frame still holding a
  *    delete-list id refuses loudly), or omit it to keep the caller's
  *    own cadence; the exit gate audits the index's id-freedom either
  *    way so the exemption is proven, not assumed
  *  - published recipe dirs ([[graft.Recipe.run]] artifacts) — the
  *    `order/` schedule references forgotten docs through CHUNK
  *    MEMBERSHIP, so each dir runs [[graft.Recipe.retract]]'s full
  *    chain (r15): assignments pruned, fully-forgotten chunks dropped,
  *    positions recompacted, permutation re-proved; the exit gate then
  *    re-proves the assignments surface independently. Recipes with
  *    HETEROGENEOUS schemas ride one call via `recipeTargets` —
  *    per-dir `(dir, idCol, strataCol)` tuples (r16)
  *
  * followed by the audits as a FORCED exit gate:
  * [[graft.operators.Pipeline.deletionAudit]] over every parquet
  * artifact (including the ANN `codes/`) and
  * [[graft.state.StateRescale.countKeys]] over the pruned state. A
  * deletion pipeline that runs the deletes but not the proof is the
  * compliance bug this object exists to prevent — until r9 the four
  * calls were hand-sequenced and nothing forced the audit to run last
  * (or at all). `forget` THROWS on any residual, so a caller cannot
  * observe success without the proof having passed.
  *
  * Idempotence: every leg ignores absent ids, so replaying a delete log
  * (same ids, new target paths) is a no-op that still passes the gate.
  *
  * Scale shape: the delete list is driver-collected (GDPR request
  * batches are bounded — thousands, not billions) and broadcasts into
  * every anti-join; each artifact is rewritten once, work ∝ artifact
  * size; state is rewritten once, work ∝ state size. Nothing here
  * touches the raw corpus.
  */
object Forget {

  /** The streaming-state leg's coordinates: everything
    * [[graft.state.StateRescale.pruneCheckpoint]] needs, plus `keyToId`
    * mapping a state KEY row to the id space of the delete list (state
    * keys are operator-shaped — a grouping key row — not bare ids).
    * The pruned checkpoint lands at `prunedCheckpoint` (a fresh path;
    * in-place rewrites are refused by the surgery tool), and the query
    * resumes THERE.
    */
  final case class StateTarget(
      makeProvider: () => GraftStateStoreProviderBase,
      checkpoint: String,
      prunedCheckpoint: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      keyToId: InternalRow => Long)

  /** What happened, per leg: `stateKeysKept` is the surviving key count
    * per state target (in call order), `artifactsPruned` lists every
    * parquet directory rewritten (ANN `codes/` included), and the gate
    * already passed — a returned report IS the zero-residual proof.
    */
  /** `recipeMixDeltasMicro` carries each recipe leg's re-measured worst
    * mixing delta (in `recipeDirs` order): [[graft.Recipe.retract]]'s
    * contract is "reported, never gated" — a deletion must not be
    * refusable on a statistical property of what remains — so the
    * one-call path must SURFACE the measurement the operator is told to
    * act on (re-run the recipe if it degraded past their tolerance),
    * not swallow it. */
  final case class ForgetReport(
      nIds: Long,
      stateKeysKept: Seq[Long],
      artifactsPruned: Seq[String],
      aggregateIndexes: Seq[String] = Seq.empty,
      recipeMixDeltasMicro: Seq[Long] = Seq.empty)

  /** Forget `ids` (column `idCol`, castable to long) everywhere:
    * streaming state (one target per stateful operator — a
    * multi-operator checkpoint chains targets through intermediate
    * pruned-checkpoint paths, the StateRescale composition rule),
    * serving ANN index (optional), and every `(dir, idCol)` parquet
    * artifact. Throws `IllegalStateException` with the per-surface
    * residual counts if ANY surface still holds a listed id after its
    * prune — the audit is the exit, not an optional follow-up.
    *
    * Span-index scope note: the GDPR claim (and the audit) covers
    * `pos/` — the surface holding the doc's CONTENT. The prune itself
    * WRITES new `grams/` accounting rows that carry the forgotten id
    * (the negative-df generation whose rider the set-algebra cancels);
    * those ids are df bookkeeping, never attributable content, but an
    * auditor reading `grams/` raw will see them — see
    * [[residuals]]' audit-scope comment for the full rationale.
    */
  def forget(ids: DataFrame, idCol: String,
             states: Seq[StateTarget] = Seq.empty,
             annDir: Option[String] = None,
             artifacts: Seq[(String, String)] = Seq.empty,
             spanIndexDirs: Seq[String] = Seq.empty,
             spanIndexHashGrams: Boolean = false,
             cdcIndexDirs: Seq[String] = Seq.empty,
             histIndexDirs: Seq[String] = Seq.empty,
             removedDocs: Option[DataFrame] = None,
             histSubBits: Int = HistogramSketch.DefaultSubBits,
             kmvIndexDirs: Seq[String] = Seq.empty,
             kmvSurvivors: Option[DataFrame] = None,
             kmvK: Int = 64,
             recipeDirs: Seq[String] = Seq.empty,
             recipeStrataCol: String = "source",
             recipeIdCol: String = "doc_id",
             recipeTargets: Seq[(String, String, String)] = Seq.empty,
             hadoopConf: Configuration = new Configuration()): ForgetReport = {
    // recipe legs come in two spellings: `recipeDirs` shares ONE
    // id/strata column pair across every dir (the common fleet case),
    // while `recipeTargets` names `(dir, idCol, strataCol)` PER DIR
    // (the compactTargets pattern, r16) so one compliance call covers
    // recipes published with different schemas — forcing a second
    // forget call per schema was exactly the forgettable-step hazard
    // this object exists to prevent
    val allRecipes = recipeDirs.map(d => (d, recipeIdCol, recipeStrataCol)) ++
      recipeTargets
    require(allRecipes.map(_._1).distinct.size == allRecipes.size,
      s"forget: duplicate recipe dirs across recipeDirs/recipeTargets " +
        s"(${allRecipes.map(_._1).diff(allRecipes.map(_._1).distinct).distinct
          .mkString(", ")}) - one retraction per dir, listed once")
    require(states.nonEmpty || annDir.nonEmpty || artifacts.nonEmpty ||
        spanIndexDirs.nonEmpty || cdcIndexDirs.nonEmpty ||
        histIndexDirs.nonEmpty || kmvIndexDirs.nonEmpty ||
        allRecipes.nonEmpty,
      "forget: nothing to forget from — no state, index, artifacts, " +
        "span, CDC, histogram, KMV indexes, or recipe dirs given")
    // The histogram index holds only (source, rep, cnt) — no doc ids —
    // so its GDPR exposure is nil (formally PROVED by the id-freedom
    // audit in the exit gate below). What a deletion batch owes it is
    // ACCURACY maintenance: the survivors' length statistics must stop
    // counting the removed docs, and counts form a group, so that is a
    // work-∝-batch negative-generation append (retractHistogramIndex),
    // never a rewrite. Retraction needs the removed docs' TEXT (to
    // recompute their bucket rows), which a deletion batch has in hand —
    // requiring it here keeps the leg from being silently skipped.
    require(histIndexDirs.isEmpty || removedDocs.nonEmpty,
      "forget: histIndexDirs given without removedDocs — histogram " +
        "retraction recomputes the removed docs' bucket rows from their " +
        "text; pass the deletion batch (doc_id, source, text)")
    // the inverse direction of the guard above: a caller passing the
    // survivor frame clearly WANTS the KMV rebuild, and silently
    // dropping it (no dirs to rebuild) would be exactly the
    // forgettable-maintenance hazard the parameter exists to close
    require(kmvSurvivors.isEmpty || kmvIndexDirs.nonEmpty,
      "forget: kmvSurvivors given without kmvIndexDirs — the survivor " +
        "rebuild has no sketch index to rebuild; pass the index dirs " +
        "or drop the survivors")
    val idList = ids.select(col(idCol).cast("long").as("__id"))
      .na.drop().distinct()
    val idSet = idList.collect().map(_.getLong(0)).toSet
    require(idSet.nonEmpty, "forget: empty id list")
    // the audit gate proves deletion of idSet — so idSet must BE the
    // caller's list: a null (or, with ANSI off, uncastable) id that
    // na.drop silently removed would make the proof narrower than the
    // delete request without anyone noticing
    val rawDistinct = ids.select(col(idCol)).distinct().count()
    require(rawDistinct == idSet.size.toLong,
      s"forget: ${rawDistinct - idSet.size} of $rawDistinct distinct delete-" +
        s"list entries in '$idCol' are null or not castable to long — " +
        "refusing to prove deletion of a narrower list than was submitted")

    // 1) streaming state: rewrite each checkpoint dropping the ids' keys
    val stateReports = states.map { st =>
      StateRescale.pruneCheckpoint(st.makeProvider, st.checkpoint,
        st.prunedCheckpoint, st.operatorId, st.numPartitions,
        st.keySchema, st.valueSchema, st.conf,
        keep = row => !idSet.contains(st.keyToId(row)), hadoopConf)
    }

    // 2) serving ANN index: rewrite codes/ (model stays frozen)
    annDir.foreach { d =>
      AnnIndex.prune(idList.select(col("__id").as("vec_id")), d)
    }

    // 3) every derived parquet artifact
    artifacts.foreach { case (dir, c) =>
      Pipeline.pruneArtifact(idList.select(col("__id").as(c)), dir, c)
    }

    // 4) span indexes: pos/ rows pruned + negative df generation rows in
    //    grams/ — until r11 this was a standalone call OUTSIDE the forced
    //    audit gate, i.e. the exact hand-sequencing bug this object exists
    //    to prevent
    spanIndexDirs.foreach { d =>
      TextOps.forgetFromSpanIndex(idList.select(col("__id").as("doc_id")),
        d, spanIndexHashGrams)
    }

    // 5) CDC chunk-digest indexes (buildCdcIndex's `digests/`): a plain
    //    artifact prune would silently FLATTEN the db partition layout
    //    (destroying the ingest probe's partition pruning), so the prune
    //    threads partitionCols. Unlike the span index there is no df
    //    algebra to patch — digest rows are per-doc facts, and the n_key
    //    rider rides the row, so dropping the doc's rows is complete.
    cdcIndexDirs.foreach { d =>
      Pipeline.pruneArtifact(idList.select(col("__id").as("doc_id")),
        s"$d/digests", "doc_id", partitionCols = Seq("db"))
    }

    // 6) histogram indexes: retract the removed docs' bucket counts.
    //    Guard first: retracting a doc OUTSIDE the delete list would
    //    corrupt the length statistics of a doc nobody deleted — the
    //    inverse of the silent-narrowing class the raw-vs-normalized
    //    check above protects against. (⊆, not =: a replayed delete
    //    log may list ids whose docs never reached this corpus, and
    //    retraction of an absent doc has no row to recompute.)
    removedDocs.filter(_ => histIndexDirs.nonEmpty).foreach { rawDocs =>
      // fail FAST, pre-write (r13 ADVICE): the id-freedom schema audit
      // used to run only in the exit gate — AFTER this leg had already
      // appended (source, rep, cnt) rows, so a drifted index gained
      // mixed-schema parquet files before the audit failed, compounding
      // the corruption the audit exists to catch. Checked here BEFORE
      // any write; the exit-gate re-check below remains the formal proof.
      histIndexDirs.foreach { d =>
        val actual = rawDocs.sparkSession.read.parquet(s"$d/hist")
          .schema.fieldNames.toSet
        require(actual == Set("source", "rep", "cnt"),
          s"forget: histogram index $d/hist schema " +
            s"${actual.toSeq.sorted.mkString("(", ",", ")")} is not the " +
            "id-free aggregate shape (cnt,rep,source) - refusing to " +
            "append retraction rows into a drifted index")
      }
      // dedup by doc_id: retraction SUBTRACTS, so a doc appearing twice
      // in the caller's frame (union of two delete manifests) would
      // double-subtract its buckets — silently, because shared buckets
      // stay net-positive and the read guard never fires
      val docs = rawDocs.dropDuplicates("doc_id")
      val extra = docs.select(col("doc_id").cast("long").as("__rid"))
        .na.drop().distinct()
        .filter(!col("__rid").isInCollection(idSet)).count()
      require(extra == 0L,
        s"forget: removedDocs holds $extra doc_ids not in the delete " +
          "list — refusing to retract histogram counts for docs nobody " +
          "asked to forget")
      // replay idempotence (the object's doctrine) for a NON-idempotent
      // append: a per-(dir, idSet) marker file records an applied
      // retraction, so re-running the same forget call — the standard
      // recovery after the exit gate throws on ANOTHER surface — skips
      // the already-landed subtraction instead of double-retracting. A
      // different delete list hashes to a different marker and retracts
      // normally. (Marker written AFTER the append: the crash window
      // between them re-retracts on replay — the same non-atomicity any
      // append-only parquet maintenance has; the marker closes the
      // COMMON replay path, the gate-threw-later rerun.)
      val setDigest = {
        val md = java.security.MessageDigest.getInstance("MD5")
        idSet.toSeq.sorted.foreach(id => md.update(id.toString.getBytes("UTF-8")))
        md.digest().map("%02x".format(_)).mkString
      }
      histIndexDirs.foreach { d =>
        val markerDir = new org.apache.hadoop.fs.Path(s"$d/hist_forget_markers")
        val marker = new org.apache.hadoop.fs.Path(markerDir, setDigest)
        val fs = markerDir.getFileSystem(hadoopConf)
        if (!fs.exists(marker)) {
          HistogramSketch.retractHistogramIndex(docs, d, histSubBits)
          fs.mkdirs(markerDir)
          fs.create(marker, true).close()
        }
      }
    }
    // KMV sketch indexes get NO subtraction leg by algebra: a bottom-k
    // set is a monoid (inserts cannot be undone), so deletion-accuracy
    // maintenance is a REBUILD over the survivors. r13 prescribed that
    // rebuild "on the caller's cadence" — the one deletion-accuracy step
    // that stayed hand-sequenced and therefore forgettable; passing
    // `kmvSurvivors` now runs it INSIDE the call (r14), so the returned
    // report covers it like every other leg. The guard is the inverse of
    // the histogram leg's: a "survivor" frame that still contains a
    // delete-list id would re-insert the deleted doc's shingle minima
    // into the fresh sketches — refused loudly before any write.
    // Like the histogram, the index stores no doc ids — hashed shingle
    // minima only — so there is nothing for a GDPR audit to find; the
    // exit gate below proves that id-freedom structurally.
    kmvSurvivors.foreach { survivors =>
      // the ghost check must compare ids in the CALL's id namespace —
      // a hardcoded column name would either throw a raw
      // unresolved-column error or, worse, pass vacuously against a
      // column that is not the delete list's namespace
      require(survivors.columns.contains(idCol),
        s"forget: kmvSurvivors has no '$idCol' column (found " +
          s"${survivors.columns.sorted.mkString("(", ",", ")")}) - the " +
          "ghost check compares survivor ids against the delete list " +
          s"in the call's id namespace; pass survivors keyed by '$idCol'")
      val ghosts = survivors.select(col(idCol).cast("long").as("__sid"))
        .na.drop().distinct()
        .filter(col("__sid").isInCollection(idSet)).count()
      require(ghosts == 0L,
        s"forget: kmvSurvivors still contains $ghosts delete-list " +
          s"'$idCol' ids - rebuilding from them would re-insert deleted " +
          "content into the sketch index; pass the corpus MINUS the " +
          "delete list")
      // staged rebuild, never a bare overwrite: a mid-job crash on the
      // GDPR path must not leave the sketch index unreadable; the
      // effective k derives from the index being replaced, so a
      // default-k call cannot silently downgrade a wider build
      kmvIndexDirs.foreach(d =>
        graft.operators.Dedup.rebuildSketchIndex(survivors, d, kmvK))
    }

    // 7) published recipe dirs (Recipe.run artifacts): a plain id-keyed
    //    prune cannot cover these — the order/ schedule references
    //    forgotten docs through CHUNK MEMBERSHIP, so the deletion must
    //    also drop fully-forgotten chunks and recompact positions, or a
    //    dataloader reading "position k of n" stalls on the holes.
    //    Recipe.retract runs the whole chain per dir (its own staged
    //    prune + zero-residual audit + permutation re-proof); the exit
    //    gate below re-proves the assignments surface independently.
    val recipeReports = allRecipes.map { case (d, idc, sc) =>
      Recipe.retract(idList.select(col("__id").as(idc)), d, sc, idc)
    }

    // 8) the exit gate — every surface must PROVE zero residuals, and
    //    the aggregate indexes must PROVE they carry no id column
    val found = residualsOf(idList, idSet, states, annDir, artifacts,
      spanIndexDirs, cdcIndexDirs, histIndexDirs, kmvIndexDirs,
      allRecipes.map(t => (t._1, t._2)), hadoopConf)
    if (found.nonEmpty)
      throw new IllegalStateException(
        s"forget: deletion audit FAILED — ${found.mkString("; ")}")
    ForgetReport(idSet.size.toLong, stateReports.map(_.keysMoved),
      artifacts.map(_._1) ++ annDir.map(d => s"$d/codes") ++
        spanIndexDirs.map(d => s"$d/pos") ++
        cdcIndexDirs.map(d => s"$d/digests") ++
        recipeReports.flatMap(_.artifacts),
      histIndexDirs.map(d => s"$d/hist") ++
        kmvIndexDirs.map(d => s"$d/sketches"),
      recipeReports.map(_.maxMixDeltaMicro)) // allRecipes order
  }

  /** The exit gate alone: one description per surface still holding a
    * listed id (empty = clean). [[forget]] runs this LAST and throws on
    * any hit; exposed so an incident review (or a scheduled compliance
    * sweep) can re-prove a past deletion without re-running the prunes.
    * Parquet surfaces go through
    * [[graft.operators.Pipeline.deletionAudit]] (delete list broadcasts,
    * artifacts never shuffle); the state surface through
    * [[graft.state.StateRescale.countKeys]] on the PRUNED checkpoint.
    */
  def residuals(ids: DataFrame, idCol: String,
                states: Seq[StateTarget] = Seq.empty,
                annDir: Option[String] = None,
                artifacts: Seq[(String, String)] = Seq.empty,
                spanIndexDirs: Seq[String] = Seq.empty,
                cdcIndexDirs: Seq[String] = Seq.empty,
                histIndexDirs: Seq[String] = Seq.empty,
                kmvIndexDirs: Seq[String] = Seq.empty,
                recipeDirs: Seq[String] = Seq.empty,
                recipeIdCol: String = "doc_id",
                recipeTargets: Seq[(String, String, String)] = Seq.empty,
                hadoopConf: Configuration = new Configuration()): Seq[String] = {
    val idList = ids.select(col(idCol).cast("long").as("__id"))
      .na.drop().distinct()
    residualsOf(idList, idList.collect().map(_.getLong(0)).toSet,
      states, annDir, artifacts, spanIndexDirs, cdcIndexDirs,
      histIndexDirs, kmvIndexDirs,
      recipeDirs.map(d => (d, recipeIdCol)) ++
        recipeTargets.map(t => (t._1, t._2)),
      hadoopConf)
  }

  /** [[residuals]] over an already-normalized id frame/set — [[forget]]
    * routes here so the gate reuses the list it collected for the
    * prunes instead of re-running the normalize/collect jobs. */
  private def residualsOf(idList: DataFrame, idSet: Set[Long],
                          states: Seq[StateTarget],
                          annDir: Option[String],
                          artifacts: Seq[(String, String)],
                          spanIndexDirs: Seq[String],
                          cdcIndexDirs: Seq[String],
                          histIndexDirs: Seq[String] = Seq.empty,
                          kmvIndexDirs: Seq[String] = Seq.empty,
                          recipeAudits: Seq[(String, String)] = Seq.empty,
                          hadoopConf: Configuration): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    // Aggregate-index id-freedom audit: the histogram ((source, rep,
    // cnt)) and KMV ((source, kmv)) indexes are EXEMPT from the row
    // residual audit because they structurally cannot hold a doc id —
    // and this check is what makes that exemption formal rather than a
    // doc comment. An exact-schema equality (not an id-name pattern):
    // ANY column beyond the declared aggregate shape fails, so a future
    // "helpful" provenance column (doc_id, uri, …) added to either
    // index turns every forget into a loud failure instead of a silent
    // compliance hole.
    val spark = idList.sparkSession
    def schemaAudit(dir: String, allowed: Seq[Set[String]],
                    kind: String): Unit = {
      val actual = spark.read.parquet(dir).schema.fieldNames.toSet
      if (!allowed.contains(actual))
        out += s"$kind $dir: schema ${actual.toSeq.sorted.mkString("(", ",", ")")} " +
          s"is not the id-free aggregate shape ${allowed.head.toSeq.sorted.mkString("(", ",", ")")}" +
          " - the no-doc-id exemption no longer holds"
    }
    histIndexDirs.foreach(d =>
      schemaAudit(s"$d/hist", Seq(Set("source", "rep", "cnt")),
        "histogram index"))
    // two allowed shapes: the r15 metadata shape (build_k is a constant
    // width, never an id) and the legacy pre-metadata shape
    kmvIndexDirs.foreach(d =>
      schemaAudit(s"$d/sketches",
        Seq(Set("source", "kmv", "build_k"), Set("source", "kmv")),
        "kmv sketch index"))
    // deletionAudit joins each artifact on ITS OWN id column name, so the
    // ids frame carries every needed column (aliased copies of __id).
    // Span indexes audit through pos/ — the surface holding the doc's
    // CONTENT. grams/ is df algebra: a forgotten doc's id remains
    // physically readable there (a stale df=1 rider in superseded
    // generation rows, plus the negative generation that r12 writes WITH
    // the forgotten id so the rider set-algebra can cancel it on a
    // 1 → 0 → 1 df history — see dupSpansIncremental). Those ids are
    // accounting, never positions or text; consumers derive the live
    // rider through the except, so the forgotten id cannot be
    // ATTRIBUTED content — but an auditor reading grams/ raw will see
    // it, which is why the audit surface (and the GDPR claim) is pos/.
    val auditTargets = artifacts ++ annDir.map(d => s"$d/codes" -> "nid") ++
      spanIndexDirs.map(d => s"$d/pos" -> "doc_id") ++
      cdcIndexDirs.map(d => s"$d/digests" -> "doc_id") ++
      // recipe audit surfaces: assignments/ (the id-keyed artifact, each
      // dir joined on ITS OWN id column) and — when the r17 publish
      // wrote one — the stats/ token index, which is the REFRESH
      // materialization source: a stats row surviving a forget is not
      // just readable residue, it re-enters the published schedule on
      // the next Recipe.refresh. order/ holds chunk keys only — its
      // correctness is Recipe.retract's permutation gate, not an
      // id-residual question
      recipeAudits.flatMap { case (d, idc) =>
        val statsPath = new org.apache.hadoop.fs.Path(s"$d/stats")
        val statsFs = statsPath.getFileSystem(hadoopConf)
        Seq(s"$d/assignments" -> idc) ++
          (if (statsFs.exists(statsPath)) Seq(s"$d/stats" -> idc)
           else Seq.empty)
      }
    if (auditTargets.nonEmpty) {
      val cols = auditTargets.map(_._2).distinct
      val auditIds = idList.select(cols.map(c => col("__id").as(c)): _*)
      Pipeline.deletionAudit(auditIds, auditTargets)
        .collect().foreach { r =>
          if (r.getLong(1) > 0)
            out += s"${r.getString(0)}: ${r.getLong(1)} residual rows " +
              s"(sample ids ${r.getSeq[String](2).mkString(",")})"
        }
    }
    states.foreach { st =>
      val n = StateRescale.countKeys(st.makeProvider,
        s"${st.prunedCheckpoint}/state", st.operatorId, st.numPartitions,
        st.keySchema, st.valueSchema, st.conf,
        pred = row => idSet.contains(st.keyToId(row)), hadoopConf)
      if (n > 0) out += s"state ${st.prunedCheckpoint}: $n residual keys"
    }
    out.toList
  }
}
