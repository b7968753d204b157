package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.state.implicits._

/** Usage demo of the library's public surface: a session wired to our
  * RocksDB state-store provider via `useRocksDbStateStore()`, a TTL set
  * through the `stateTimeout` writer helper, and an arbitrary-state
  * streaming pipeline (the reference's RedistateTest.scala:17-65 shape).
  *
  * Run: `sbt "runMain graft.examples.StreamingDemo"`
  */
object StreamingDemo {

  case class Visit(userId: Int, url: String)
  case class Stats(userId: Int, totalVisits: Int)

  def accumulate(id: Int, rows: Iterator[Visit], st: GroupState[Stats]): Stats = {
    val cur = st.getOption.getOrElse(Stats(id, 0))
    val upd = cur.copy(totalVisits = cur.totalVisits + rows.size)
    st.update(upd)
    upd
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .useRocksDbStateStore() // ← our provider
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val checkpoint = Files.createTempDirectory("graft-demo").toString
    val input = MemoryStream[Visit]

    val stats = input.toDS()
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(accumulate)

    val query = stats.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .stateTimeout(spark, queryName = "visits", expirySecs = 3600,
        checkpointLocation = checkpoint) // ← TTL helper (names + checkpoints the query)
      .start()

    input.addData(Visit(1, "/a"), Visit(2, "/b"), Visit(3, "/c"))
    query.processAllAvailable()
    input.addData(Visit(3, "/d"), Visit(3, "/e"), Visit(4, "/f"))
    query.processAllAvailable()

    println("=== per-user visit totals (state accumulated across 2 batches) ===")
    spark.sql("select userId, max(totalVisits) as totalVisits from visits group by userId order by userId")
      .show()
    query.stop()
    spark.stop()
  }
}
