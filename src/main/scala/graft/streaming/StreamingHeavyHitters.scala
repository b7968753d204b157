package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Continuous heavy-hitter monitoring over a token STREAM — the online
  * twin of [[graft.operators.TextOps.heavyHitters]] (q110), with the
  * Misra–Gries summaries living in the state-store SPI.
  *
  * Shape: token → `pmod(hash(token), partitions)` sketch partition →
  * `transformWithState` keyed on the partition id, each key owning ONE
  * ≤ `summaryK`-entry MG summary in ValueState. After folding a batch's
  * tokens into the summary, the processor emits the partition's current
  * summary tagged with a per-key batch version — "latest version per
  * partition" is the live sketch, and the union of the partitions'
  * summaries is the global candidate set (mergeable-summaries
  * guarantee, same as the batch operator's merge step).
  *
  * Why partitioned: a single global key would serialize every token
  * through one state row. With P sketch partitions the stream fans out
  * P-ways (each token's ENTIRE substream lands on one key, because the
  * route hashes the token itself), state is P×summaryK entries total,
  * and the per-partition MG guarantee applies to each substream: a
  * token with partition-local frequency > n_p/(summaryK+1) is
  * guaranteed present in that partition's summary — and every global
  * heavy hitter is at least that heavy in its own partition.
  *
  * Scale notes (unbounded stream): state is O(P × summaryK) entries
  * regardless of stream length or vocabulary; per-batch emission is
  * bounded the same way; no shuffle beyond the one keyed route. The
  * downstream exact-recount of candidates (batch q110's second pass)
  * becomes, in streaming form, a separate windowed count restricted to
  * candidate tokens — composable from stock streaming aggregation.
  */
object StreamingHeavyHitters {

  case class TokenRow(part: Int, token: String)
  case class Sketch(ver: Long, entries: Map[String, Long])
  case class SummaryEntry(part: Int, ver: Long, token: String, count: Long)

  class SketchProcessor(summaryK: Int)
      extends StatefulProcessor[Int, TokenRow, SummaryEntry] {
    @transient private var sketch: ValueState[Sketch] = _
    // reuse the batch aggregator's reduce step verbatim — the streaming
    // sketch IS the batch sketch, fed incrementally
    private val mg = new graft.functions.MisraGriesAggregator(summaryK)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sketch = getHandle.getValueState[Sketch]("sketch",
        Encoders.product[Sketch], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[TokenRow],
                                 timerValues: TimerValues): Iterator[SummaryEntry] = {
      val prev = if (sketch.exists()) sketch.get() else Sketch(0L, Map.empty)
      val entries = rows.foldLeft(prev.entries)((m, r) => mg.reduce(m, r.token))
      val next = Sketch(prev.ver + 1L, entries)
      sketch.update(next)
      next.entries.iterator.map { case (t, c) =>
        SummaryEntry(key, next.ver, t, c)
      }
    }
  }

  /** Per-partition MG summaries of a streaming frame with a `token`
    * column; emits each touched partition's full summary per batch,
    * tagged with that partition's batch version. */
  def heavyHittersStream(tokens: DataFrame, summaryK: Int,
                         partitions: Int = 32): Dataset[SummaryEntry] = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(
        pmod(hash(col("token")), lit(partitions)).cast("int").as("part"),
        col("token"))
      .as[TokenRow]
      .groupByKey(_.part)
      .transformWithState(new SketchProcessor(summaryK),
        TimeMode.None(), OutputMode.Append())
  }
}
