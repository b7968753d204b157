package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming token-budget admission: the per-source budget lives in
  * state and is enforced ACROSS micro-batches — a source that spends
  * its budget in batch 1 admits nothing in batch 5; an under-budget
  * source keeps admitting; an oversize first doc is admitted (a quota
  * never erases a stratum); every admitted doc is emitted exactly once.
  * ×2 SPI backends.
  */
abstract class StreamingQuotaSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-quota-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test(s"$suiteName: budget enforced across batches; oversize-first admitted; exactly once") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val admitted = StreamingQuota.tokenQuotaStream(
      input.toDS().toDF("doc_id", "source", "text"), budgetTokens = 10L)
    val query = admitted.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"squota_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-squota-$suiteName").toString)
      .start()
    def got(): Seq[(Long, String)] = spark.table(s"squota_$suiteName")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    // batch 1: source A spends 4+5=9 of 10 over two docs (in doc_id
    // order); the 20-token doc 3 still enters (cum-before 9 < 10) — and
    // closes the gate. Source B's oversize FIRST doc is admitted alone.
    input.addData((1L, "A", words(4)), (2L, "A", words(5)),
      (3L, "A", words(20)), (10L, "B", words(50)))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B")),
      s"batch 1 admissions: ${got()}")

    // batch 2: A and B are both spent — nothing admitted, even tiny
    // docs; a FRESH source admits normally
    input.addData((4L, "A", words(1)), (11L, "B", words(1)),
      (20L, "C", words(3)))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B"), (20L, "C")),
      s"spent sources must stay closed: ${got()}")

    // batch 3: C has 3 of 10 spent — still admitting; null text never
    // spends or passes
    input.addData((21L, "C", words(5)), (22L, "C", null.asInstanceOf[String]))
    query.processAllAvailable()
    assert(got() == Seq((1L, "A"), (2L, "A"), (3L, "A"), (10L, "B"),
      (20L, "C"), (21L, "C")), s"batch 3: ${got()}")
    query.stop()
  }

  test(s"$suiteName: report ≡ gate by construction; hash-order replay ≡ batch q183/q176 doc-for-doc") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._

    // a fixture where the budget genuinely bites per source: A spills,
    // B admits an oversize doc, C never fills its budget
    val fixture = Seq(
      (1L, "A", 4), (2L, "A", 5), (3L, "A", 20), (4L, "A", 2), (5L, "A", 3),
      (10L, "B", 50), (11L, "B", 1),
      (20L, "C", 3), (21L, "C", 2))
    val docsDf = fixture.map { case (id, s, n) => (id, s, words(n)) }
      .toDF("doc_id", "source", "text")
    val budget = 10

    // the batch pair (q176 gate / q183 report) on the same corpus
    val batchAdmitted = graft.operators.Pipeline.tokenQuota(docsDf, budget)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val batchReport = graft.operators.Pipeline
      .tokenQuotaReport(docsDf, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

    // the batch kernel's admission order: the seeded md5 prefix over the
    // doc_id (quotaPacked's formula, seed 42) — delivering the stream in
    // THIS order, one doc per micro-batch, makes arrival order coincide
    // with hash order, so the two tiers' admitted sets must coincide
    val hashOrdered = docsDf.withColumn("__h",
        conv(substring(md5(concat_ws(":", lit("42"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long"))
      .orderBy($"__h", $"doc_id".cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val input = MemoryStream[(Long, String, String)]
    val gate = StreamingQuota.tokenQuotaStream(
      input.toDS().toDF("doc_id", "source", "text"), budget.toLong)
    val report = StreamingQuota.tokenQuotaReportStream(
      input.toDS().toDF("doc_id", "source", "text"), budget.toLong)
    val qGate = gate.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sqparity_gate_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sqpg-$suiteName").toString)
      .start()
    val qReport = report.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sqparity_rep_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sqpr-$suiteName").toString)
      .start()
    hashOrdered.foreach { d =>
      input.addData(d)
      qGate.processAllAvailable()
      qReport.processAllAvailable()
    }
    qGate.stop(); qReport.stop()

    val streamAdmitted = spark.table(s"sqparity_gate_$suiteName")
      .collect().map(_.getLong(0)).toSet
    assert(streamAdmitted === batchAdmitted,
      s"hash-order arrival must admit the batch kernel's exact set: " +
        s"stream $streamAdmitted vs batch $batchAdmitted")

    // the report stream is an audit log (one row per touched source per
    // batch); the LATEST row per source is the current report — and it
    // must equal q183's row doc-for-doc, column-for-column
    val repRows = spark.table(s"sqparity_rep_$suiteName").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val latest = repRows.groupBy(_._1).map { case (_, rows) =>
      rows.maxBy(_._2) // n_offered grows monotonically per source
    }.toSet
    assert(latest === batchReport,
      s"replayed report must equal batch q183:\nstream $latest\nbatch  $batchReport")

    // and the audit-log rows reconcile INTERNALLY at every step:
    // spilled = offered - admitted tokens, counters never decrease
    repRows.groupBy(_._1).foreach { case (src, rows) =>
      rows.foreach { r =>
        assert(r._6 == r._3 - r._5,
          s"$src: spilled must be offered - admitted: $r")
      }
      val ordered = rows.sortBy(_._2).toSeq
      ordered.sliding(2).foreach { w =>
        if (w.size == 2) {
          val (a, b) = (w(0), w(1))
          assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5,
            s"$src: running counters must be monotone: $a -> $b")
        }
      }
    }
  }

  test(s"$suiteName: plan tier - per-source allocs live; hash-order replay ≡ batch q186/q187") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._

    val fixture = Seq(
      (1L, "A", 4), (2L, "A", 5), (3L, "A", 20), (4L, "A", 2),
      (10L, "B", 6), (11L, "B", 7), (12L, "B", 8),
      (20L, "C", 3), (21L, "C", 2))
    val docsDf = fixture.map { case (id, s, n) => (id, s, words(n)) }
      .toDF("doc_id", "source", "text")
    // per-source allocations that bite differently per source, plus an
    // explicit 0-alloc drop
    val planDf = Seq(("A", 8L), ("B", 15L), ("C", 0L))
      .toDF("source", "alloc_tokens")
    val plan = StreamingQuota.planAllocs(planDf)

    val batchAdmitted = graft.operators.Pipeline
      .tokenQuotaPlan(docsDf, planDf)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val batchReport = graft.operators.Pipeline
      .tokenQuotaPlanReport(docsDf, planDf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet

    val hashOrdered = docsDf.withColumn("__h",
        conv(substring(md5(concat_ws(":", lit("42"),
          $"doc_id".cast("string"))), 1, 8), 16, 10).cast("long"))
      .orderBy($"__h", $"doc_id".cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val input = MemoryStream[(Long, String, String)]
    val gate = StreamingQuota.tokenQuotaStreamPlan(
      input.toDS().toDF("doc_id", "source", "text"), plan)
    val report = StreamingQuota.tokenQuotaReportStreamPlan(
      input.toDS().toDF("doc_id", "source", "text"), plan)
    val qGate = gate.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sqplan_gate_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sqplg-$suiteName").toString)
      .start()
    val qReport = report.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sqplan_rep_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sqplr-$suiteName").toString)
      .start()
    hashOrdered.foreach { d =>
      input.addData(d)
      qGate.processAllAvailable()
      qReport.processAllAvailable()
    }
    qGate.stop(); qReport.stop()

    val streamAdmitted = spark.table(s"sqplan_gate_$suiteName")
      .collect().map(_.getLong(0)).toSet
    assert(streamAdmitted === batchAdmitted,
      s"plan tier, hash-order arrival: stream $streamAdmitted vs " +
        s"batch $batchAdmitted")
    assert(!streamAdmitted.exists(Set(20L, 21L)),
      "the explicit 0-alloc source must admit nothing")

    // latest report row per source ≡ the batch q187 row (the stream
    // cannot report an allocated-but-never-arrived source - compare on
    // the sources that arrived, which here is all of them)
    val latest = spark.table(s"sqplan_rep_$suiteName").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    assert(latest === batchReport,
      s"plan report must equal batch q187:\nstream $latest\nbatch  $batchReport")

    // an unplanned source fails the query loudly (the batch tier's rule)
    val input2 = MemoryStream[(Long, String, String)]
    val q2 = StreamingQuota.tokenQuotaStreamPlan(
        input2.toDS().toDF("doc_id", "source", "text"), plan)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"sqplan_gap_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sqgap-$suiteName").toString)
      .start()
    input2.addData((99L, "GHOST", words(2)))
    val eGap = intercept[Exception] { q2.processAllAvailable() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(eGap).exists(_.contains("no allocation in the plan")),
      s"an unplanned source must fail the query loudly: $eGap")
    q2.stop()
  }

  test(s"$suiteName: within-batch admission is doc_id-ordered (replay-deterministic)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, String)]
    val admitted = StreamingQuota.tokenQuotaStream(
      input.toDS().toDF("doc_id", "source", "text"), budgetTokens = 6L)
    val query = admitted.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"squotao_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-squotao-$suiteName").toString)
      .start()
    // delivered out of id order: the processor folds 5,6,7 by doc_id —
    // 5 (4 toks, cum 4) admits, 6 (4 toks, cum-before 4 < 6) admits and
    // closes, 7 never enters
    input.addData((7L, "X", words(2)), (5L, "X", words(4)), (6L, "X", words(4)))
    query.processAllAvailable()
    val ids = spark.table(s"squotao_$suiteName").collect()
      .map(_.getLong(0)).sorted.toSeq
    query.stop()
    assert(ids == Seq(5L, 6L), s"id-ordered admission: $ids")
  }

  test(s"$suiteName: a pre-r15 checkpoint never silently re-opens a spent budget") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.{Encoders => Encs}
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode,
      TimerValues, TTLConfig, ValueState, OutputMode => OM}

    // the r14 processor shape, verbatim: ONE long of state named "cum"
    class LegacyCumProcessor(budget: Long)
        extends StatefulProcessor[String, StreamingQuota.DocTok,
          StreamingQuota.DocTok] {
      @transient private var cum: ValueState[StreamingQuota.Cum] = _
      override def init(outputMode: OM, timeMode: TimeMode): Unit =
        cum = getHandle.getValueState[StreamingQuota.Cum]("cum",
          Encs.product[StreamingQuota.Cum], TTLConfig.NONE)
      override def handleInputRows(key: String,
          rows: Iterator[StreamingQuota.DocTok],
          timerValues: TimerValues): Iterator[StreamingQuota.DocTok] = {
        var c = Option(cum.get()).map(_.sum).getOrElse(0L)
        val out = rows.toArray.sortBy(_.doc_id).filter { d =>
          if (c < budget) { c += d.n_tokens; true } else false
        }
        cum.update(StreamingQuota.Cum(c))
        out.iterator
      }
    }

    val ckpt = Files.createTempDirectory(s"graft-squpgrade-$suiteName").toString
    val input = MemoryStream[(Long, String, String)]
    def docToks = {
      import org.apache.spark.sql.functions._
      input.toDS().toDF("doc_id", "source", "text")
        .filter(col("text").isNotNull && col("source").isNotNull)
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          graft.operators.TextOps.tokenCount(col("text")).cast("long")
            .as("n_tokens"))
        .as[StreamingQuota.DocTok]
    }

    // the memory sink refuses checkpoint recovery — foreachBatch (which
    // supports it) collects into buffers instead
    val legacyOut = scala.collection.mutable.ArrayBuffer.empty[Long]
    val newOut = scala.collection.mutable.ArrayBuffer.empty[Long]

    // 1) the pre-r15 build spends A's budget and checkpoints it
    val legacyQ = docToks.groupByKey(_.source)
      .transformWithState(new LegacyCumProcessor(10L),
        TimeMode.None(), OM.Append())
      .toDF().writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        legacyOut.synchronized {
          legacyOut ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation", ckpt).start()
    input.addData((1L, "A", words(9)), (2L, "A", words(9)))
    legacyQ.processAllAvailable()
    legacyQ.stop()
    assert(legacyOut.sorted.toSeq === Seq(1L, 2L),
      "fixture: A must have SPENT its budget under the legacy shape")

    // 2) the r15+ build resumes the same checkpoint: A's next doc must
    //    FAIL the query with the runbook — never admit as if unspent
    val newQ = docToks.groupByKey(_.source)
      .transformWithState(
        new StreamingQuota.QuotaProcessor(StreamingQuota.ScalarBudget(10L)),
        TimeMode.None(), OM.Append())
      .toDF().writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        newOut.synchronized {
          newOut ++= df.collect().map(_.getLong(0))
        }; ()
      }
      .option("checkpointLocation", ckpt).start()
    input.addData((3L, "A", words(1)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      newQ.processAllAvailable()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("pre-r15 'cum' state") &&
        m.contains("over-admit")),
      s"must refuse with the runbook, got: ${messages(e).mkString(" | ")}")
    assert(newOut.isEmpty, "nothing may be admitted past the guard")
    newQ.stop()
  }
}

class StreamingQuotaRocksDbSuite extends StreamingQuotaSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingQuotaInMemorySuite extends StreamingQuotaSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
