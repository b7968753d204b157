package graft.streaming

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.state.{InMemoryStateStoreProvider, RocksDbStateStoreProvider}

/** Streaming Misra–Gries heavy hitters over our state providers: the
  * sketch accumulates ACROSS batches, the per-partition superset
  * guarantee and count bound hold on the latest snapshot, and a token's
  * whole substream routes to one partition.
  */
abstract class StreamingHeavyHittersSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-stream-hh-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: summaries accumulate across batches; guarantees hold per partition") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val k = 4
    val parts = 2
    // "hot" becomes heavy only ACROSS the two batches; the noise tail
    // (30 distinct singletons) overflows the 4-entry summaries
    val batch1 = Seq.fill(20)("hot") ++ (1 to 15).map(i => s"n$i")
    val batch2 = Seq.fill(25)("hot") ++ Seq.fill(18)("warm") ++ (16 to 30).map(i => s"n$i")

    val input = MemoryStream[String]
    val out = StreamingHeavyHitters.heavyHittersStream(
      input.toDS().toDF("token"), summaryK = k, partitions = parts)

    val query = out.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(s"shh_$suiteName")
      .option("checkpointLocation",
        Files.createTempDirectory(s"graft-shh-$suiteName").toString)
      .start()

    input.addData(batch1: _*)
    query.processAllAvailable()
    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()

    val rows = spark.table(s"shh_$suiteName")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))

    // latest snapshot per partition
    val latestVer = rows.groupBy(_._1).map { case (p, rs) => p -> rs.map(_._2).max }
    val latest = rows.filter { case (p, v, _, _) => latestVer(p) == v }
    val latestByToken = latest.map { case (_, _, t, c) => t -> c }.toMap

    // per-partition truth: route tokens exactly like the operator does
    // (one job over all distinct tokens, not a job per token)
    val all = batch1 ++ batch2
    val route = all.distinct.toDF("token")
      .select($"token", pmod(hash($"token"), lit(parts)).cast("int").as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val byPart = all.groupBy(route)
    byPart.foreach { case (p, toks) =>
      val np = toks.size
      val freq = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      freq.foreach { case (t, f) =>
        if (f > np.toLong / (k + 1)) {
          // superset guarantee on the partition's substream
          assert(latest.exists { case (lp, _, lt, _) => lp == p && lt == t },
            s"heavy '$t' (freq $f of $np in part $p) missing from latest snapshot")
        }
      }
      // count bound on every kept entry of this partition
      latest.filter(_._1 == p).foreach { case (_, _, t, c) =>
        assert(c <= freq(t), s"'$t' overestimated: $c > ${freq(t)}")
        assert(freq(t) - c <= np.toLong / (k + 1),
          s"'$t' error ${freq(t) - c} exceeds ${np / (k + 1)}")
      }
    }

    // the cross-batch heavy hitter surfaced with a cross-batch count
    assert(latestByToken.contains("hot"), "cross-batch heavy hitter lost")
    assert(latestByToken("hot") > 20L,
      s"'hot' count ${latestByToken("hot")} should exceed any single batch's 20")
  }
}

class StreamingHeavyHittersRocksDbSuite extends StreamingHeavyHittersSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName: String = "rocksdb"
}

class StreamingHeavyHittersInMemorySuite extends StreamingHeavyHittersSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName: String = "inmemory"
}
