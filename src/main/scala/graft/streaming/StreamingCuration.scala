package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Curation gates applied to a STREAMING corpus. The quality/blocklist/
  * sampling gates ([[graft.operators.TextOps.blocklistFilter]],
  * [[graft.operators.Pipeline.stratifiedSample]], ...) are pure map-side
  * filters and run on a stream unchanged; this object holds the gates
  * that need more than a projection.
  */
object StreamingCuration {

  /** Contaminated doc ids of a streaming corpus vs a STATIC eval set —
    * decontamination as an admission gate on an ingest stream, rather
    * than a batch audit after the fact.
    *
    * Shape: the stream's exploded gram rows probe the eval gram set
    * through a stream-static BROADCAST semi-join (the static side is
    * planned once and broadcast; the stream is never shuffled by gram),
    * then state-backed `dropDuplicates` collapses multi-gram hits so
    * each contaminated doc is emitted exactly once, across batches.
    * The dedup state holds only flagged doc ids — bounded by the
    * contamination rate, not the corpus.
    */
  def contaminatedIdsStream(docsStream: DataFrame, evalDocs: DataFrame,
                            n: Int = 4, textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val evalGrams = TextOps.explodedGrams(evalDocs, n, Seq.empty, textCol)
      .select(col("gram")).distinct()
    TextOps.explodedGrams(docsStream, n, Seq(idCol), textCol)
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(col(idCol))
      .dropDuplicates(idCol)
  }

  /** The q167 contamination MATRIX on an ingest stream, by COMPOSITION:
    * the batch operator's tagged-union broadcast
    * ([[graft.operators.TextOps.taggedEvalGrams]] — the SAME builder, so
    * the two tiers cannot drift on a benchmark's gram set) probed by the
    * stream's gram rows exactly as [[contaminatedIdsStream]] probes one
    * eval set, then per-(doc, eval) exactly-once via state-backed
    * `dropDuplicates` and a per-(source, eval) running count from
    * aggregation state. Emits `(source, eval_name, n_contaminated)` —
    * the matrix's count legs, continuously maintained; the batch
    * operator's rate column needs the corpus total, which an admission
    * gate doesn't own (feed the counts into the nightly matrix for
    * rates).
    *
    * Scale/state shape: the broadcast side is ALL benchmarks' grams
    * (still eval-set-sized — the batch operator's bet, unchanged);
    * dedup state holds one key per CONTAMINATED (doc, eval) pair —
    * bounded by the contamination rate, not the corpus; agg state is
    * |sources|×|evals| counters. Adding a benchmark grows the broadcast,
    * never adds a pass over the stream.
    */
  def contaminationMatrixStream(docsStream: DataFrame,
                                evals: Seq[(String, DataFrame)],
                                n: Int = 4, textCol: String = "text",
                                idCol: String = "doc_id"): DataFrame = {
    require(evals.nonEmpty, "contaminationMatrixStream: no eval sets given")
    require(evals.map(_._1).distinct.size == evals.size,
      s"contaminationMatrixStream: duplicate eval names in ${evals.map(_._1)}")
    val tagged = TextOps.taggedEvalGrams(evals, n, textCol)
    TextOps.explodedGrams(docsStream, n, Seq(idCol, "source"), textCol,
        distinctPerDoc = true)
      .join(broadcast(tagged), Seq("gram"))
      .select(col(idCol), col("source"), col("eval_name"))
      .dropDuplicates(idCol, "eval_name")
      .groupBy(col("source"), col("eval_name"))
      .agg(count(lit(1)).as("n_contaminated"))
  }
}
