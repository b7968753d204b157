package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.state.implicits._

/** End-to-end TTL through a real streaming query: the reference's
  * `stateTimeout` usage (README.md:74-102) — state accumulated by
  * mapGroupsWithState silently evaporates once the per-query TTL elapses
  * between micro-batches. Clock injected via the provider test seam
  * (local mode shares the JVM, so executors see the fake clock too).
  */
object TtlStreamingFns extends Serializable {
  def tally(id: Int, rows: Iterator[Int], st: GroupState[Int]): (Int, Int) = {
    val n = st.getOption.getOrElse(0) + rows.size
    st.update(n)
    (id, n)
  }
}

class TtlStreamingSuite extends AnyFunSuite with BeforeAndAfterEach {

  private var clock: FakeTtlClock = _

  override def beforeEach(): Unit = {
    clock = new FakeTtlClock
    GraftStateStoreProviderBase.clockOverride = Some(clock)
  }
  override def afterEach(): Unit =
    GraftStateStoreProviderBase.clockOverride = None

  test("state expires between micro-batches once the query TTL elapses") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ttl-stream")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .useInMemoryStateStore()
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      val ckpt = Files.createTempDirectory("graft-ttl-stream").toString
      val input = MemoryStream[Int]
      val counts = input.toDS().groupByKey(identity)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout())(TtlStreamingFns.tally)

      val query = counts.toDF("id", "n").writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .stateTimeout(spark, queryName = "ttlq", expirySecs = 30,
          checkpointLocation = ckpt)
        .start()

      input.addData(1, 1, 2)
      query.processAllAvailable()
      // within TTL: batch 2 still sees batch 1's counts
      clock.advanceSecs(5)
      input.addData(1)
      query.processAllAvailable()
      // beyond TTL: all per-key state evaporates before batch 3
      clock.advanceSecs(120)
      input.addData(1, 2)
      query.processAllAvailable()

      val rows = spark.sql("select id, n from ttlq").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toList
      // batch1: (1,2),(2,1); batch2: (1,3) [state alive]; batch3: (1,1),(2,1) [state expired]
      assert(rows.count(_ == ((1, 3))) === 1, rows)
      assert(rows.count(_ == ((1, 1))) === 1, rows)
      assert(rows.count(_ == ((2, 1))) === 2, rows)
      query.stop()
    } finally spark.stop()
  }
}
