package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.AdvancedJoins

/** Streaming as-of join vs the batch operator: an in-order replay of the
  * same fixture must be row-identical to [[AdvancedJoins.asOfJoin]] —
  * including the equal-ord tie-breaks and the tolerance-expiry path —
  * across our state-store providers.
  */
abstract class StreamingAsOfJoinSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-asof-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // fixture: (key, ord, id) probes / (key, ord, bval) builds.
  // key 1: plain carry-forward + a stale gap past tolerance 5
  // key 2: build tie on ord 4 (bval 40 vs 41 — largest must win) and a
  //        probe AT the tie ord (build-before-probe at equal ord)
  // key 3: probe before any build (None even unbounded)
  // key 4: NULL-valued build rows — a newest build with NULL value
  //        answers with NULL (never falls back to an older value), and
  //        a NULL loses an equal-ord tie to any non-null (batch's
  //        nulls-first sort)
  private val builds = Seq(
    (1L, 2L, Some(20L)), (1L, 6L, Some(21L)),
    (2L, 4L, Some(40L)), (2L, 4L, Some(41L)), (2L, 15L, Some(42L)),
    (3L, 30L, Some(60L)),
    (4L, 2L, Some(70L)), (4L, 6L, None), (4L, 8L, None), (4L, 8L, Some(71L)))
  private val probes = Seq(
    (1L, 3L, 101L), (1L, 7L, 102L), (1L, 25L, 103L),
    (2L, 4L, 201L), (2L, 5L, 202L), (2L, 22L, 203L),
    (3L, 1L, 301L), (3L, 31L, 302L),
    (4L, 3L, 401L), (4L, 7L, 402L), (4L, 9L, 403L))

  private def runStream(tolerance: Option[Long]): Set[(Long, Long, Long, Option[Long])] = {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val probeIn = MemoryStream[(Long, Long, Long)]
    val buildIn = MemoryStream[(Long, Long, Option[Long])]
    val out = StreamingAsOfJoin.asOfJoinStream(
      probeIn.toDS().toDF("key", "ord", "id"),
      buildIn.toDS().toDF("key", "ord", "bval"),
      "key", "ord", "id", "bval", tolerance)

    val name = s"sasof_${suiteName}_${tolerance.map(t => s"t$t").getOrElse("unbounded")}"
    val query = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-sasof-$suiteName").toString)
      .start()

    // in-order replay split at ord boundaries: <5, 5-19, >=20 — three
    // micro-batches so carry-forward crosses batch AND state boundaries
    val cuts = Seq[Long => Boolean](_ < 5, o => o >= 5 && o < 20, _ >= 20)
    cuts.foreach { in =>
      buildIn.addData(builds.filter(b => in(b._2)): _*)
      probeIn.addData(probes.filter(p => in(p._2)): _*)
      query.processAllAvailable()
    }
    query.stop()

    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
  }

  private def runBatch(tolerance: Option[Long]): Set[(Long, Long, Long, Option[Long])] = {
    val sql = spark
    import sql.implicits._
    AdvancedJoins.asOfJoin(
        probes.toDF("key", "ord", "id"),
        builds.toDF("key", "ord", "bval"),
        "key", "ord", "bval", tolerance)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
  }

  test(s"$suiteName: unbounded replay == batch asOfJoin (ties, gaps, unmatched)") {
    val stream = runStream(None)
    val batch = runBatch(None)
    assert(stream === batch, s"\n stream=$stream\n batch=$batch")
    // spot-check the fixture's own truth, so both impls can't be wrong together
    assert(batch.contains((2L, 4L, 201L, Some(41L))),
      "equal-ord probe must see the equal-ord build, largest bval")
    assert(batch.contains((3L, 1L, 301L, None)), "probe before any build is None")
    assert(batch.contains((1L, 25L, 103L, Some(21L))), "unbounded carries forever")
    assert(batch.contains((4L, 7L, 402L, None)),
      "a newest NULL-valued build answers NULL, not an older value")
    assert(batch.contains((4L, 9L, 403L, Some(71L))),
      "NULL loses the equal-ord tie to a non-null value")
  }

  test(s"$suiteName: pseudo-random interleaving (ties, dense keys) == batch, both bounds") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic pseudo-random mix: 8 keys, ord ties everywhere
    // (ord = i/3), probe/build interleaved by residue, duplicate bvals
    val evs = (0 until 90).map { i =>
      (i % 8 + 1L, (i / 3).toLong, i % 5 < 2, i.toLong, (i * 13 % 50).toLong)
    }
    val probesR = evs.filter(_._3).map(e => (e._1, e._2, e._4))
    val buildsR = evs.filterNot(_._3).map(e => (e._1, e._2, e._5))

    Seq(None, Some(4L)).foreach { tol =>
      val probeIn = MemoryStream[(Long, Long, Long)]
      val buildIn = MemoryStream[(Long, Long, Long)]
      val out = StreamingAsOfJoin.asOfJoinStream(
        probeIn.toDS().toDF("key", "ord", "id"),
        buildIn.toDS().toDF("key", "ord", "bval"),
        "key", "ord", "id", "bval", tol)
      val name = s"sasofr_${suiteName}_${tol.map(t => s"t$t").getOrElse("u")}"
      val query = out.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-sasofr-$suiteName").toString)
        .start()
      // one epoch per ord value, builds before probes: per-key event
      // order then holds across EVERY possible micro-batch boundary (a
      // split within an epoch leaves only equal-ord build-before-probe,
      // which the state's ≤ comparison answers). Wider epochs would race
      // the continuous trigger: a boundary between an epoch's builds and
      // probes lets a NEWER build reach state before an older probe —
      // exactly the out-of-order replay the operator's contract excludes.
      (0L to evs.map(_._2).max).foreach { o =>
        buildIn.addData(buildsR.filter(_._2 == o): _*)
        probeIn.addData(probesR.filter(_._2 == o): _*)
        query.processAllAvailable()
      }
      query.stop()
      val stream = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val batch = AdvancedJoins.asOfJoin(
          probesR.toDF("key", "ord", "id"), buildsR.toDF("key", "ord", "bval"),
          "key", "ord", "bval", tol)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      assert(stream === batch,
        s"tol=$tol diverged:\n only-stream=${stream -- batch}\n only-batch=${batch -- stream}")
      assert(stream.size === probesR.size, "one output row per probe")
    }
  }

  test(s"$suiteName: tolerance-bounded replay == batch; stale matches expire to None") {
    val stream = runStream(Some(5L))
    val batch = runBatch(Some(5L))
    assert(stream === batch, s"\n stream=$stream\n batch=$batch")
    assert(batch.contains((1L, 25L, 103L, None)),
      "a build 19 ord units stale must expire under tolerance 5")
    assert(batch.contains((2L, 5L, 202L, Some(41L))),
      "a fresh match inside tolerance still carries")
  }
}

class StreamingAsOfJoinInMemorySuite extends StreamingAsOfJoinSuiteBase {
  override def providerClass: String =
    classOf[graft.state.InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}

class StreamingAsOfJoinRocksDbSuite extends StreamingAsOfJoinSuiteBase {
  override def providerClass: String =
    classOf[graft.state.RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}
