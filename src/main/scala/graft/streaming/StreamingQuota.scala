package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Per-source token-budget ADMISSION on an ingest stream — the online
  * counterpart of [[graft.operators.Pipeline.tokenQuota]]: a crawl
  * feed is admitted doc-by-doc until its source's running token sum
  * reaches the budget, then the source's gate closes (across ALL later
  * micro-batches — the budget lives in SPI state, not in a batch-local
  * aggregate). The two tiers answer the same governance question with
  * the order each tier actually has: the batch operator admits in
  * seeded-HASH order (a uniform, re-runnable sample over a corpus it
  * can see whole); the stream admits in ARRIVAL order (the only order
  * an admission gate at the door has) — both enforce the identical
  * hard ceiling, and the gate's decision rule is the same
  * cum-before < budget integer arithmetic.
  *
  * Admission semantics mirror the batch tier exactly where they can: a
  * doc larger than the whole remaining budget is still admitted when
  * the source's cum-before is under budget (a quota must never erase a
  * stratum — and must not silently skip-and-admit-a-later-smaller-doc,
  * which would make admission depend on what arrives AFTER the
  * decision). Within one micro-batch, docs fold in `(doc_id)` order so
  * replayed batches admit identically.
  *
  * Duplicate-id honesty (r14 — the batch tier now REFUSES duplicate
  * doc_ids, which double-spend the budget): this tier cannot — spotting
  * a cross-batch duplicate needs one state entry per ADMITTED doc_id,
  * and unbounded per-doc state is exactly what a few-longs-per-source
  * gate exists to avoid. A duplicate arriving in a later batch spends
  * the budget again, the same as any other arrival; id uniqueness at
  * the door is the upstream exactly-once delivery contract's job
  * (within one batch the doc_id-order fold makes the replay identical,
  * so checkpoint recovery never double-admits). Pipelines that cannot
  * trust upstream uniqueness should run the batch tier's hash-order
  * admission over the landed corpus, where the kernel proves the
  * contract.
  *
  * State: FOUR longs per source (the admitted cum the gate decides on,
  * plus the offered/admitted counters the report serves — r15). The
  * state VARIABLE changed in r15 (`cum`: one long → `quota`: the
  * four-counter record); since r16 the upgrade is GUARDED, not merely
  * documented: both processors register the legacy `cum` handle, and a
  * restarted query that finds legacy state under a key with no `quota`
  * state FAILS LOUDLY with the drain-or-fresh-checkpoint runbook
  * instead of silently resetting every source's spent budget to zero
  * (see [[guardLegacyState]] — the check reads legacy state only on a
  * key's first touch, so steady-state cost is zero).
  * Gate
  * emission: admitted `(doc_id, source, n_tokens)` rows, each exactly
  * once. Report emission ([[tokenQuotaReportStream]]): the source's
  * RUNNING admission report after every micro-batch that touched it —
  * q183's governance view for the live gate, with the q183/q176 rule
  * carried into state: gate and report fold the SAME transition
  * ([[foldBatch]]) over the SAME state shape, so the report can never
  * disagree with the gate about what was admitted.
  */
object StreamingQuota {

  case class DocTok(doc_id: Long, source: String, n_tokens: Long)

  /** The per-source admission state BOTH processors fold: `cum` is the
    * admitted token sum the gate's cum-before < budget rule reads; the
    * counters are the report's. */
  private[streaming] case class QuotaState(
      cum: Long, nOffered: Long, offeredTokens: Long, nAdmitted: Long)

  /** The PRE-r15 state shape (one long named `cum`), registered only to
    * DETECT it: an admission gate whose upgrade failure mode is
    * "quietly re-open a spent budget" gets the repo's loud-refusal
    * doctrine, not a doc comment — see [[guardLegacyState]]. */
  private[streaming] case class Cum(sum: Long)

  /** r16 upgrade guard: a pre-r15 checkpoint restarted on this build
    * finds no `quota` state, so every source's spent budget would
    * silently reset to zero — OVER-ADMITTING with nothing in any output
    * saying so. Both processors register the legacy `cum` handle
    * alongside `quota`; on a key's FIRST touch under the new shape
    * (current `quota` is null — the only case that costs an extra state
    * read), a non-empty legacy value fails the query loudly with the
    * runbook: drain the feed on the pre-r15 build (finish the admission
    * epoch), or deliberately restart the admission epoch from a fresh
    * checkpoint. There is no in-place migration — the legacy shape
    * never recorded offered counters, so a folded `QuotaState` would
    * serve a report whose history is silently partial. */
  private def guardLegacyState(legacy: ValueState[Cum], key: String): Unit = {
    val l = legacy.get()
    if (l != null) throw new IllegalStateException(
      s"StreamingQuota: source '$key' carries pre-r15 'cum' state " +
        s"(${l.sum} tokens already spent) and no 'quota' state - " +
        "resuming this checkpoint on the r15+ state shape would reset " +
        "every source's spent budget to zero and silently over-admit. " +
        "Runbook: drain the feed on the pre-r15 build (finish the " +
        "admission epoch there), or restart the admission epoch " +
        "deliberately from a fresh checkpoint; there is no in-place " +
        "migration (the legacy shape has no offered/admitted history " +
        "for the report)")
  }

  /** The streaming twin of q183's row shape — running per-source
    * counters as of the last micro-batch that touched the source. */
  case class QuotaReport(source: String, n_offered: Long,
      offered_tokens: Long, n_admitted: Long, admitted_tokens: Long,
      spilled_tokens: Long, utilization_micro: Long)

  /** The budget a processor resolves per source — ONE scalar for the
    * flat tier, the mix plan's per-source allocations for the plan tier
    * ([[graft.operators.Pipeline.tokenQuotaPlan]]'s twin). The plan
    * tier's contract matches the batch tier's, loud for loud: a source
    * ABSENT from the plan throws (failing the query — a feed source the
    * plan predates must be planned or filtered upstream, never silently
    * defaulted), an explicit 0 admits nothing while still counting
    * offered. */
  private[streaming] sealed trait Budget extends Serializable {
    def of(source: String): Long
  }
  private[streaming] final case class ScalarBudget(b: Long) extends Budget {
    def of(source: String): Long = b
  }
  private[streaming] final case class PlanBudget(m: Map[String, Long])
      extends Budget {
    def of(source: String): Long = m.getOrElse(source,
      throw new IllegalArgumentException(
        s"tokenQuotaStreamPlan: source '$source' has no allocation in " +
          "the plan - a feed source the plan predates must be planned " +
          "(or filtered) explicitly, never silently defaulted"))
  }

  /** ONE definition of the admission transition — the gate emits the
    * admitted docs, the report emits the counters, both from THIS fold
    * over THIS state, so the two streaming views reconcile by
    * construction (the shared-`quotaPacked` rule, in state). Docs fold
    * in doc_id order (replay determinism); every doc counts as offered;
    * a doc is admitted iff its source's cum-before is under budget. */
  private[streaming] def foldBatch(rows: Iterator[DocTok],
                                   prev: QuotaState,
                                   budgetTokens: Long): (QuotaState, Seq[DocTok]) = {
    var c = prev.cum
    var nOff = prev.nOffered
    var offTok = prev.offeredTokens
    var nAdm = prev.nAdmitted
    val out = scala.collection.mutable.ArrayBuffer.empty[DocTok]
    rows.toArray.sortBy(_.doc_id).foreach { d =>
      nOff += 1
      offTok += d.n_tokens
      if (c < budgetTokens) { out += d; c += d.n_tokens; nAdm += 1 }
    }
    (QuotaState(c, nOff, offTok, nAdm), out.toSeq)
  }

  private[streaming] def reportOf(source: String, s: QuotaState,
                                  budgetTokens: Long): QuotaReport =
    QuotaReport(source, s.nOffered, s.offeredTokens, s.nAdmitted,
      s.cum, s.offeredTokens - s.cum,
      // an explicit 0 allocation admits nothing; its utilization is 0
      // by definition (the batch plan report's rule), never a div-0.
      // BigInt before the micro product: a filled multi-T-token
      // allocation overflows a raw Long multiply SILENTLY on the JVM
      // (no ANSI guard here) — the batch tier routes the same product
      // through DECIMAL(38,0), and the two views are pinned equal
      if (budgetTokens <= 0L) 0L
      else (BigInt(s.cum) * 1000000 / budgetTokens).toLong)

  class QuotaProcessor(budget: Budget)
      extends StatefulProcessor[String, DocTok, DocTok] {
    @transient private var st: ValueState[QuotaState] = _
    @transient private var legacy: ValueState[Cum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[QuotaState]("quota",
        Encoders.product[QuotaState], TTLConfig.NONE)
      legacy = getHandle.getValueState[Cum]("cum",
        Encoders.product[Cum], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[DocTok] = {
      val cur = st.get()
      if (cur == null) guardLegacyState(legacy, key)
      val prev = Option(cur).getOrElse(QuotaState(0L, 0L, 0L, 0L))
      val (next, admitted) = foldBatch(rows, prev, budget.of(key))
      st.update(next)
      admitted.iterator
    }
  }

  class QuotaReportProcessor(budget: Budget)
      extends StatefulProcessor[String, DocTok, QuotaReport] {
    @transient private var st: ValueState[QuotaState] = _
    @transient private var legacy: ValueState[Cum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[QuotaState]("quota",
        Encoders.product[QuotaState], TTLConfig.NONE)
      legacy = getHandle.getValueState[Cum]("cum",
        Encoders.product[Cum], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[QuotaReport] = {
      val cur = st.get()
      if (cur == null) guardLegacyState(legacy, key)
      val prev = Option(cur).getOrElse(QuotaState(0L, 0L, 0L, 0L))
      val b = budget.of(key)
      val (next, _) = foldBatch(rows, prev, b)
      st.update(next)
      Iterator.single(reportOf(key, next, b))
    }
  }

  /** The shared input projection: token counts are the batch tier's
    * [[graft.operators.TextOps.tokenCount]] (one definition). Null
    * SOURCES drop — the batch kernel's strata rule, so the two tiers
    * gate the same strata. Null TEXTS also drop here, and this is a
    * DOCUMENTED divergence from the batch report: the batch kernel
    * keeps a null-text row as offered-but-never-admitted (its null
    * chunk_id can't be 0), while a stream admission gate has nothing to
    * decide about a doc with no tokens and drops it at the door — so a
    * feed containing null texts reconciles with q183 on every admitted
    * column but reports fewer offered docs. Feeds with non-null text
    * (the parity suite's case) reconcile doc-for-doc. */
  private def docToks(docs: DataFrame): Dataset[DocTok] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      .as[DocTok]
  }

  /** Admitted-doc stream of a streaming `docs` frame (columns `doc_id`,
    * `source`, `text`): each admitted doc emitted exactly once; a
    * source's gate closes for good once its budget is spent. Null-text
    * docs carry no tokens and are dropped (the histogram family's rule —
    * they would be admitted "for free" and spend nothing, but admission
    * is a TOKEN gate and they have none). */
  def tokenQuotaStream(docs: DataFrame, budgetTokens: Long): Dataset[DocTok] = {
    require(budgetTokens > 0,
      s"tokenQuotaStream: budget must be positive, got $budgetTokens")
    docTok(docs, ScalarBudget(budgetTokens))._1
  }

  /** [[tokenQuotaStream]] with a MIX PLAN's per-source allocations —
    * [[graft.operators.Pipeline.tokenQuotaPlan]]'s live twin: each
    * arriving source is admitted in arrival order until ITS OWN
    * allocation is spent. `plan` is the collected |sources|-row
    * allocation map ([[planAllocs]] collects a mixPlan frame with the
    * batch tier's validation); the per-source gate-close, the
    * oversize-first rule, and the state shape are the flat tier's —
    * only the budget resolution differs. */
  def tokenQuotaStreamPlan(docs: DataFrame,
                           plan: Map[String, Long]): Dataset[DocTok] = {
    docTok(docs, validatedPlan("tokenQuotaStreamPlan", plan))._1
  }

  /** The plan tier's running report — [[tokenQuotaReportStream]] with
    * each source's utilization measured against ITS OWN allocation
    * (the q187 view, live). */
  def tokenQuotaReportStreamPlan(docs: DataFrame,
                                 plan: Map[String, Long]): Dataset[QuotaReport] = {
    docTok(docs, validatedPlan("tokenQuotaReportStreamPlan", plan))._2
  }

  /** Collect a [[graft.operators.Pipeline.mixPlan]]-shaped frame into
    * the plan map the streaming tier takes — THE BATCH TIER'S plan
    * hygiene, literally ([[graft.operators.Pipeline.validatedPlanRows]]
    * is the one shared validator), with the streaming tier's one extra
    * constraint: stream group keys are strings, so strata are cast to
    * string before validation. */
  def planAllocs(plan: DataFrame, strataCol: String = "source",
                 allocCol: String = "alloc_tokens"): Map[String, Long] =
    graft.operators.Pipeline.validatedPlanRows(
        plan.withColumn(strataCol, col(strataCol).cast("string")),
        strataCol, allocCol, "planAllocs")
      .map { case (s, b) => s.asInstanceOf[String] -> b }.toMap

  private def validatedPlan(caller: String,
                            plan: Map[String, Long]): PlanBudget = {
    require(plan.nonEmpty, s"$caller: empty plan")
    plan.foreach { case (s, b) =>
      require(b >= 0L,
        s"$caller: source '$s' has a negative allocation ($b)")
    }
    PlanBudget(plan)
  }

  /** RUNNING admission report of a streaming `docs` frame — q183's
    * governance view for the live gate: after every micro-batch, each
    * touched source emits its counters-so-far (offered docs/tokens,
    * admitted docs/tokens, spilled tokens, utilization in exact
    * micro-units — q183's columns, q183's integer arithmetic). The
    * LATEST row per source is the current report; the append stream of
    * rows is the admission audit log. Folds the exact transition the
    * gate folds ([[foldBatch]]), so replaying the gate's feed through
    * the report reconciles doc-for-doc with aggregating the gate's own
    * admitted output (suite-pinned ×2 backends, including the
    * hash-order-arrival case where both ≡ the batch q183/q176 pair). */
  def tokenQuotaReportStream(docs: DataFrame,
                             budgetTokens: Long): Dataset[QuotaReport] = {
    require(budgetTokens > 0,
      s"tokenQuotaReportStream: budget must be positive, got $budgetTokens")
    docTok(docs, ScalarBudget(budgetTokens))._2
  }

  /** Both typed streams off one projection; only the requested one is
    * started by the caller, but building them together keeps the
    * budget/projection/grouping identical by construction. */
  private def docTok(docs: DataFrame, budget: Budget)
      : (Dataset[DocTok], Dataset[QuotaReport]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docToks(docs)
    val grouped = toks.groupByKey(_.source)
    (grouped.transformWithState(new QuotaProcessor(budget),
        TimeMode.None(), OutputMode.Append()),
      grouped.transformWithState(new QuotaReportProcessor(budget),
        TimeMode.None(), OutputMode.Append()))
  }
}
