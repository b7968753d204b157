package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Per-source KMV distinct-content sketches over a document STREAM —
  * the online twin of [[graft.operators.Dedup.sourceSketches]] (and the
  * streaming leg of the sketch family: batch q155, overlap q156,
  * persisted incremental index q157). A crawl monitor wants "how many
  * distinct docs has each source sent so far" continuously, without
  * ever re-aggregating the stream's history: the k-long sketch LIVES IN
  * STATE (ValueState, k longs per source — constant, like the batch
  * Aggregator's bounded buffer), each arriving doc's 60-bit content
  * hash (`Dedup.kmvHash` — ONE definition with batch) folds in through
  * the SAME [[graft.functions.BottomKAggregator]] insert, and every
  * micro-batch emits the updated summary row per touched source.
  * Consumers keep the latest row per source; a replay's final rows
  * equal the batch [[graft.operators.Dedup.sourceSketches]] exactly
  * (suite-gated), because KMV insertion is order-independent — the
  * merge-algebra property the sketch family rests on.
  *
  * Scale notes: state is k longs per source (sources are thousands, not
  * corpus-sized); only (source, hash) pairs reach the shuffle, never
  * text; emission is ∝ touched sources per batch.
  */
object StreamingSketch {

  case class DocHash(source: String, hv: Long)
  private[streaming] case class Sk(vs: Seq[Long])
  case class SketchRow(source: String, n_kmv: Long, est_distinct: Long,
                       kmv_csv: String)

  /** Per-source processor: fold the batch's hashes into the stored
    * sketch with the batch Aggregator's insert discipline, emit the
    * updated summary (integer estimator arithmetic matches
    * [[graft.operators.Dedup.sourceSketches]]' exact DECIMAL division
    * term for term). */
  class SketchProcessor(k: Int)
      extends StatefulProcessor[String, DocHash, SketchRow] {
    @transient private var sketch: ValueState[Sk] = _
    @transient private lazy val agg = new graft.functions.BottomKAggregator(k)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Sk]("kmv",
        Encoders.product[Sk], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocHash],
                                 timerValues: TimerValues): Iterator[SketchRow] = {
      val before = Option(sketch.get()).map(_.vs).getOrElse(agg.zero)
      val after = rows.foldLeft(before)((b, d) => agg.reduce(b, d.hv))
      sketch.update(Sk(after))
      val est =
        if (after.length < k) after.length.toLong
        else ((BigInt(k - 1) * (BigInt(1) << 60)) / BigInt(after(k - 1))).toLong
      Iterator.single(SketchRow(key, after.length.toLong, est,
        after.mkString(",")))
    }
  }

  /** Sketch-summary stream of a streaming `docs` frame (columns
    * `source`, `text`): one updated row per (touched source, batch).
    * `k` matches [[graft.operators.Dedup.sourceSketches]]. */
  def sourceSketchesStream(docs: DataFrame, k: Int = 64): Dataset[SketchRow] = {
    require(k >= 2, s"sourceSketchesStream: k must be >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text has no content hash — contributes nothing (the batch
    // twin's md5-null rule)
    docs.filter(col("text").isNotNull)
      .select(col("source"),
        graft.operators.Dedup.kmvHash(col("text")).as("hv"))
      .as[DocHash]
      .groupByKey(_.source)
      .transformWithState(new SketchProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
