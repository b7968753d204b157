package graft.state

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.execution.streaming.state.GraftCoordinatorBridge
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The provider must report zip-snapshot uploads to the
  * StateStoreCoordinator so its snapshot-lag detector sees this store as
  * current (the built-in RocksDB provider does the same after uploads).
  */
class SnapshotUploadReportSuite extends AnyFunSuite {

  test("rocksdb provider reports cadence snapshots to the coordinator") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-snapshot-report")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .config("spark.sql.streaming.stateStore.rocksdb.snapshotIntervalBatches", "1")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val sql = spark
      import sql.implicits._
      implicit val sqlCtx = spark.sqlContext

      val input = MemoryStream[(Int, Int)]
      val ckpt = Files.createTempDirectory("graft-snapreport").toString
      val out = input.toDS().groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (k: Int, rows: Iterator[(Int, Int)], st: GroupState[Int]) =>
            val n = st.getOption.getOrElse(0) + rows.size
            st.update(n)
            (k, n)
        }
      val query = out.writeStream
        .outputMode(OutputMode.Update())
        .format("memory").queryName("snapreport")
        .option("checkpointLocation", ckpt)
        .start()
      input.addData((1, 1), (2, 1))
      query.processAllAvailable()
      input.addData((1, 2))
      query.processAllAvailable()

      // the provider's report must have fired with this query's run id...
      val report = GraftStateStoreProviderBase.lastSnapshotReport
      assert(report.exists { case (_, runId, v) => runId == query.runId && v >= 1L },
        s"no snapshot-upload report fired for this run: $report")
      // ...and the coordinator must have recorded it for that store
      val (reportedStoreId, runId, _) = report.get
      val latest = GraftCoordinatorBridge
        .latestUploadedSnapshotForTesting(reportedStoreId, runId)
      assert(latest.exists(_ >= 1L),
        s"coordinator has no snapshot-upload report for this store: $latest")
      query.stop()
    } finally spark.stop()
  }
}
