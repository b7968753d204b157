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
  * and unbounded per-doc state is exactly what a one-long-per-source
  * gate exists to avoid. A duplicate arriving in a later batch spends
  * the budget again, the same as any other arrival; id uniqueness at
  * the door is the upstream exactly-once delivery contract's job
  * (within one batch the doc_id-order fold makes the replay identical,
  * so checkpoint recovery never double-admits). Pipelines that cannot
  * trust upstream uniqueness should run the batch tier's hash-order
  * admission over the landed corpus, where the kernel proves the
  * contract.
  *
  * State: ONE long per source. Emission: admitted `(doc_id, source,
  * n_tokens)` rows, each exactly once.
  */
object StreamingQuota {

  case class DocTok(doc_id: Long, source: String, n_tokens: Long)
  private[streaming] case class Cum(sum: Long)

  class QuotaProcessor(budgetTokens: Long)
      extends StatefulProcessor[String, DocTok, DocTok] {
    @transient private var cum: ValueState[Cum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Cum]("cum",
        Encoders.product[Cum], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocTok],
                                 timerValues: TimerValues): Iterator[DocTok] = {
      var c = Option(cum.get()).map(_.sum).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[DocTok]
      // deterministic within-batch order: replaying a batch admits the
      // identical docs regardless of shuffle delivery order
      rows.toArray.sortBy(_.doc_id).foreach { d =>
        if (c < budgetTokens) { out += d; c += d.n_tokens }
      }
      cum.update(Cum(c))
      out.iterator
    }
  }

  /** Admitted-doc stream of a streaming `docs` frame (columns `doc_id`,
    * `source`, `text`): each admitted doc emitted exactly once; a
    * source's gate closes for good once its budget is spent. Token
    * counts are the batch tier's [[graft.operators.TextOps.tokenCount]]
    * (one definition). Null-text docs carry no tokens and are dropped
    * (the histogram family's rule — they would be admitted "for free"
    * and spend nothing, but admission is a TOKEN gate and they have
    * none). */
  def tokenQuotaStream(docs: DataFrame, budgetTokens: Long): Dataset[DocTok] = {
    require(budgetTokens > 0,
      s"tokenQuotaStream: budget must be positive, got $budgetTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      .as[DocTok]
      .groupByKey(_.source)
      .transformWithState(new QuotaProcessor(budgetTokens),
        TimeMode.None(), OutputMode.Append())
  }
}
