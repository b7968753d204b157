package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** The state census: per-(operator, partition) key counts read through
  * the state data source — what a resumed query would actually load —
  * including explicit zeros for drained partitions, and agreement with
  * the surgery toolkit (a pruned checkpoint's census reflects the drop).
  */
class StateInventorySuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-state-inventory")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("census counts per partition; zeros explicit; prune surgery reflected") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt1 = Files.createTempDirectory("graft-inv-src")
    val ckpt2 = Files.createTempDirectory("graft-inv-dst")
    val input = MemoryStream[(Int, Int)]
    val q = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCounts)
      .toDF("id", "total")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("inv_sink")
      .option("checkpointLocation", ckpt1.toString)
      .start()
    input.addData((1, 10), (2, 20), (3, 30), (4, 40))
    q.processAllAvailable()
    q.stop()

    val inv = StateInventory.inventory(spark, ckpt1.toString)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(inv.keySet.map(_._1) === Set(0L), s"one operator: $inv")
    assert(inv.keySet.map(_._2) === Set("default"),
      s"classic operator reports the implicit store: $inv")
    assert(inv.keySet.map(_._3) === Set(0, 1), "both shuffle partitions present")
    assert(inv.values.sum === 4L, s"4 keys total: $inv")

    // prune two entities; the destination census must reflect exactly that,
    // keeping zero rows where a partition drained completely
    val keySchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    StateRescale.pruneCheckpoint(() => new RocksDbStateStoreProvider,
      ckpt1.toString, ckpt2.toString, operatorId = 0, numPartitions = 2,
      keySchema, keySchema, StateTestHelper.storeConf(),
      keep = row => row.getInt(0) <= 2)
    val after = StateInventory.inventory(spark, ckpt2.toString)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
    assert(after.values.sum === 2L, s"2 keys survive the prune: $after")
    assert(after.keySet.map(_._2) === Set(0, 1),
      s"drained partitions must still appear (as zeros): $after")

    intercept[IllegalArgumentException] {
      StateInventory.inventory(spark,
        Files.createTempDirectory("graft-inv-empty").toString)
    }
  }

  test("census of a transformWithState checkpoint (per state variable)") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the r8 gap: our own transformWithState operators produce checkpoints
    // the census errored on (the state reader needs stateVarName there)
    val ckpt = Files.createTempDirectory("graft-inv-tws")
    val input = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamingCosineDedup.cosinePairsStream(
        input.toDS().toDF("vec_id", "embedding"), threshold = 0.95)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("inv_tws_sink")
      .option("checkpointLocation", ckpt.toString)
      .start()
    // vectors 1 and 2 share an IDENTICAL embedding, so they land in the
    // same LSH bucket in every table — every "members" list holds BOTH,
    // making reader rows (elements) strictly exceed grouping keys
    input.addData(
      (1L, Seq(1.0, 0.2, 0.1, 0.05, 0.3, 0.0, 0.0, 0.7)),
      (2L, Seq(1.0, 0.2, 0.1, 0.05, 0.3, 0.0, 0.0, 0.7)))
    q.processAllAvailable()
    q.stop()

    val inv = StateInventory.inventory(spark, ckpt.toString).collect()
    val vars = inv.map(_.getString(1)).toSet
    assert(vars === Set("members"),
      s"the processor's declared state variable must be discovered: $vars")
    assert(inv.map(_.getLong(3)).sum > 0L, s"non-empty census: ${inv.toSeq}")
    assert(inv.map(_.getInt(2)).toSet === Set(0, 1),
      s"both partitions present (zeros explicit): ${inv.toSeq}")

    // the r9 bug: list-state rows are per ELEMENT, so a raw row count
    // overstates the census — n_keys must equal DISTINCT grouping keys
    val direct = spark.read.format("statestore")
      .option("path", ckpt.toString)
      .option("operatorId", 0L)
      .option("stateVarName", "members").load()
    val distinctKeys = direct.select(col("key")).distinct().count()
    val elementRows = direct.count()
    assert(elementRows > distinctKeys,
      s"fixture degenerate: $elementRows rows vs $distinctKeys keys — " +
        "lists must hold >1 element for this gate to bite")
    assert(inv.map(_.getLong(3)).sum === distinctKeys,
      s"census must count grouping keys ($distinctKeys), not list " +
        s"elements ($elementRows): ${inv.toSeq}")
  }
}
