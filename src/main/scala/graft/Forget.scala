package graft

import org.apache.hadoop.conf.Configuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.state.StateStoreConf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{AnnIndex, Pipeline, TextOps}
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
  final case class ForgetReport(
      nIds: Long,
      stateKeysKept: Seq[Long],
      artifactsPruned: Seq[String])

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
             hadoopConf: Configuration = new Configuration()): ForgetReport = {
    require(states.nonEmpty || annDir.nonEmpty || artifacts.nonEmpty ||
        spanIndexDirs.nonEmpty || cdcIndexDirs.nonEmpty,
      "forget: nothing to forget from — no state, index, artifacts, " +
        "span indexes, or CDC indexes given")
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

    // 6) the exit gate — every surface must PROVE zero residuals
    val found = residualsOf(idList, idSet, states, annDir, artifacts,
      spanIndexDirs, cdcIndexDirs, hadoopConf)
    if (found.nonEmpty)
      throw new IllegalStateException(
        s"forget: deletion audit FAILED — ${found.mkString("; ")}")
    ForgetReport(idSet.size.toLong, stateReports.map(_.keysMoved),
      artifacts.map(_._1) ++ annDir.map(d => s"$d/codes") ++
        spanIndexDirs.map(d => s"$d/pos") ++
        cdcIndexDirs.map(d => s"$d/digests"))
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
                hadoopConf: Configuration = new Configuration()): Seq[String] = {
    val idList = ids.select(col(idCol).cast("long").as("__id"))
      .na.drop().distinct()
    residualsOf(idList, idList.collect().map(_.getLong(0)).toSet,
      states, annDir, artifacts, spanIndexDirs, cdcIndexDirs, hadoopConf)
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
                          hadoopConf: Configuration): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
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
      cdcIndexDirs.map(d => s"$d/digests" -> "doc_id")
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
