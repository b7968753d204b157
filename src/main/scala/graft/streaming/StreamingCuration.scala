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
}
