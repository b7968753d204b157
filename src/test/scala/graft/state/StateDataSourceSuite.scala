package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Spark's state data source (`spark.read.format("statestore")`) must be
  * able to read a checkpoint written by OUR provider — the
  * debugging/migration workflow users rely on (inspect live state as a
  * DataFrame).
  */
class StateDataSourceSuite extends AnyFunSuite {

  test("statestore reader reads state written by the RocksDB provider") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-state-source")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val sql = spark
      import sql.implicits._
      implicit val sqlCtx = spark.sqlContext

      val input = MemoryStream[(Int, Int)]
      val ckpt = Files.createTempDirectory("graft-statesource").toString
      val out = input.toDS().groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (k: Int, rows: Iterator[(Int, Int)], st: GroupState[Long]) =>
            val n = st.getOption.getOrElse(0L) + rows.map(_._2).sum
            st.update(n)
            (k, n)
        }
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .format("memory").queryName("statesource")
        .option("checkpointLocation", ckpt)
        .start()
      input.addData((1, 10), (2, 20))
      query.processAllAvailable()
      input.addData((1, 5))
      query.processAllAvailable()
      query.stop()

      val state = spark.read.format("statestore")
        .option("path", ckpt)
        .load()
      val rows = state
        .selectExpr("key.value AS k", "value.groupState.value AS v")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows === Map(1 -> 15L, 2 -> 20L))
    } finally spark.stop()
  }
}
