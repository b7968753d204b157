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

  test("snapshotStartBatchId replay and readChangeFeed against our checkpoints") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-state-source-replay")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      // a zip snapshot per version, so batch 0's snapshot exists as a
      // pinned replay base
      .config("spark.sql.streaming.stateStore.rocksdb.snapshotIntervalBatches", "1")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val sql = spark
      import sql.implicits._
      implicit val sqlCtx = spark.sqlContext

      val input = MemoryStream[(Int, Int)]
      val ckpt = Files.createTempDirectory("graft-statereplay").toString
      val out = input.toDS().groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (k: Int, rows: Iterator[(Int, Int)], st: GroupState[Long]) =>
            val vals = rows.map(_._2).toSeq
            if (vals.contains(Int.MinValue)) { st.remove(); (k, -1L) }
            else {
              val n = st.getOption.getOrElse(0L) + vals.sum
              st.update(n)
              (k, n)
            }
        }
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .format("memory").queryName("statereplay")
        .option("checkpointLocation", ckpt)
        .start()
      input.addData((1, 10), (2, 20))
      query.processAllAvailable()
      input.addData((1, 5))
      query.processAllAvailable()
      input.addData((3, 7), (2, Int.MinValue)) // key 2's state is removed
      query.processAllAvailable()
      query.stop()

      // fine-grained replay: state at batch 2 reconstructed from EXACTLY
      // batch 0's snapshot + the two changelogs — SupportsFineGrainedReplay
      val replayed = spark.read.format("statestore")
        .option("path", ckpt)
        .option("snapshotStartBatchId", 0)
        .option("snapshotPartitionId", 0)
        .option("batchId", 2)
        .load()
        .selectExpr("key.value AS k", "value.groupState.value AS v")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(replayed === Map(1 -> 15L, 3 -> 7L))

      // change feed: every put AND the delete, each with its batch id
      val changes = spark.read.format("statestore")
        .option("path", ckpt)
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", 0)
        .load()
        .selectExpr("batch_id", "change_type",
          "key.value AS k", "value.groupState.value AS v")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      assert(changes === Set(
        (0L, "update", 1, Some(10L)),
        (0L, "update", 2, Some(20L)),
        (1L, "update", 1, Some(15L)),
        (2L, "update", 3, Some(7L)),
        (2L, "delete", 2, None)))
    } finally spark.stop()
  }
}
