package graft.state

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** The full rescale story: a stateful query runs at 2 shuffle
  * partitions, its checkpoint is rescaled offline to 4, and the query
  * RESUMES at 4 partitions with every key's state intact — the
  * operation stock Spark cannot perform (shuffle.partitions is pinned
  * by the offsets log from the first micro-batch forever).
  *
  * Mechanics under test beyond StateRescaleSuite's SPI layer:
  *  - the rescaled stores are committed at the checkpoint's batch
  *    version, so batch v+1 opens them;
  *  - keys land where the restarted query's OWN exchange routes them
  *    (HashPartitioning parity, proven by correct resumed aggregates);
  *  - the offsets-log conf rewrite (the one driver-side edit rescaling
  *    needs) is sufficient for Spark to re-plan at the new parallelism.
  */
object RescaleCounterFns extends Serializable {
  def addCounts(id: Int, rows: Iterator[(Int, Int)],
                state: GroupState[Int]): (Int, Int) = {
    val total = state.getOption.getOrElse(0) + rows.map(_._2).sum
    state.update(total)
    (id, total)
  }

  /** Evolved state class for the migration test: the Int total grew a
    * second field. */
  case class CounterV2(total: Int, batches: Int)
  def addCountsV2(id: Int, rows: Iterator[(Int, Int)],
                  state: GroupState[CounterV2]): (Int, Int, Int) = {
    val prev = state.getOption.getOrElse(CounterV2(0, 0))
    val next = CounterV2(prev.total + rows.map(_._2).sum, prev.batches + 1)
    state.update(next)
    (id, next.total, next.batches)
  }
}

class StateRescaleResumeSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rescale-resume")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("resume a mapGroupsWithState query from a 2 -> 4 rescaled checkpoint") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt1 = Files.createTempDirectory("graft-rescale-src")
    val ckpt2 = Files.createTempDirectory("graft-rescale-dst")

    val input = MemoryStream[(Int, Int)]
    // foreachBatch, not the memory sink: memory refuses checkpoint
    // recovery, and the resumed query must restart from the copied log.
    // Updates land last-wins per key in a shared map.
    val latest = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    def start(ckpt: String) = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCounts)
      .toDF("id", "total")
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => latest.put(r.getInt(0), r.getInt(1)))
      }
      .option("checkpointLocation", ckpt)
      .start()

    // ---- phase 1: two batches at 2 partitions
    val q1 = start(ckpt1.toString)
    input.addData((1, 10), (2, 20), (3, 30), (4, 40))
    q1.processAllAvailable()
    input.addData((1, 1), (3, 3))
    q1.processAllAvailable()
    q1.stop()
    val before = latest.asScala.toMap
    assert(before == Map(1 -> 11, 2 -> 20, 3 -> 33, 4 -> 40), s"phase 1: $before")

    // ---- phase 2: offline rescale — the SHIPPED one-call orchestration
    // (log copy + state rewrite + offsets-conf rewrite).
    // groupByKey(Int) keys encode as a single int field; the value row is
    // opaque to the tool (only the KEY layout matters — it drives routing)
    val keySchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    val valueSchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    val report = StateRescale.rescaleCheckpoint(() => new RocksDbStateStoreProvider,
      ckpt1.toString, ckpt2.toString,
      operatorId = 0, oldN = 2, newN = 4,
      keySchema, valueSchema, StateTestHelper.storeConf())
    assert(report.keysMoved == 4 && report.version == 2, s"report: $report")

    // the rescaled checkpoint must also serve SECONDARY consumers before
    // any resume: the state data source takes its partition count from
    // the operator metadata (rewritten to 4) and the value schema from
    // the preserved partition-0 schema file — a stale metadata would
    // silently scan only the first 2 partition dirs
    val viaDataSource = spark.read.format("statestore")
      .option("path", ckpt2.toString).load()
      .selectExpr("key.value AS k", "value.groupState.value AS v")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(viaDataSource == Map(1 -> 11, 2 -> 20, 3 -> 33, 4 -> 40),
      s"state data source after rescale: $viaDataSource")

    // ---- phase 3: resume at 4 partitions; old state must be visible
    latest.clear()
    val q2 = start(ckpt2.toString)
    input.addData((1, 100), (2, 200), (5, 500))
    q2.processAllAvailable()
    val after = latest.asScala.toMap
    q2.stop()
    assert(after == Map(1 -> 111, 2 -> 220, 5 -> 500),
      s"resumed state wrong (carried totals must include pre-rescale batches): $after")

    // and the resumed run really did run 4 state partitions: all four
    // partition dirs advanced past the rescaled version
    (0 until 4).foreach { p =>
      val dir = ckpt2.resolve(s"state/0/$p")
      assert(Files.exists(dir), s"partition dir $p missing")
      val files = Files.walk(dir).iterator().asScala.map(_.toString).toSeq
      // version 3 lands as a snapshot or (under snapshot cadence) a changelog
      assert(files.exists(f => f.endsWith("state.snapshot.3") ||
          f.endsWith("state.changelog.3")),
        s"partition $p did not commit batch 3: $files")
    }
  }

  test("resume after pruning one entity: it starts fresh, others carry state") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt1 = Files.createTempDirectory("graft-prune-src")
    val ckpt2 = Files.createTempDirectory("graft-prune-dst")
    val input = MemoryStream[(Int, Int)]
    val latest = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    def start(ckpt: String) = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCounts)
      .toDF("id", "total")
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => latest.put(r.getInt(0), r.getInt(1)))
      }
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start(ckpt1.toString)
    input.addData((1, 10), (2, 20), (3, 30))
    q1.processAllAvailable()
    q1.stop()

    // forget entity 2 (the right-to-be-forgotten request)
    val keySchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    val report = StateRescale.pruneCheckpoint(() => new RocksDbStateStoreProvider,
      ckpt1.toString, ckpt2.toString, operatorId = 0, numPartitions = 2,
      keySchema, keySchema, StateTestHelper.storeConf(),
      keep = row => row.getInt(0) != 2)
    assert(report.keysMoved == 2, s"$report")

    latest.clear()
    val q2 = start(ckpt2.toString)
    input.addData((1, 1), (2, 2), (3, 3))
    q2.processAllAvailable()
    q2.stop()
    val after = latest.asScala.toMap
    // 1 and 3 carry their totals; 2 restarts from zero
    assert(after == Map(1 -> 11, 2 -> 2, 3 -> 33),
      s"prune must forget ONLY entity 2's history: $after")
  }

  test("resume with an EVOLVED state class after value-schema migration") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    import RescaleCounterFns.CounterV2

    val ckpt1 = Files.createTempDirectory("graft-migrate-src")
    val ckpt2 = Files.createTempDirectory("graft-migrate-dst")
    val input = MemoryStream[(Int, Int)]

    // ---- v1 query: Int state
    val latestV1 = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val q1 = input.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCounts)
      .toDF("id", "total")
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => latestV1.put(r.getInt(0), r.getInt(1)))
      }
      .option("checkpointLocation", ckpt1.toString).start()
    input.addData((1, 10), (2, 20))
    q1.processAllAvailable()
    q1.stop()
    assert(latestV1.asScala.toMap == Map(1 -> 10, 2 -> 20))

    // ---- migrate: struct<value:int> grows to struct<total:int,batches:int>
    // (the stored value row wraps the state in a `groupState` struct)
    val keySchema = StructType(Seq(StructField("value", IntegerType, nullable = false)))
    val oldValue = StructType(Seq(StructField("groupState",
      StructType(Seq(StructField("value", IntegerType, nullable = false))),
      nullable = true)))
    val newValue = StructType(Seq(StructField("groupState",
      org.apache.spark.sql.Encoders.product[CounterV2].schema, nullable = true)))
    val report = StateRescale.migrateCheckpoint(() => new RocksDbStateStoreProvider,
      ckpt1.toString, ckpt2.toString, operatorId = 0, numPartitions = 2,
      keySchema, oldValue, newValue, StateTestHelper.storeConf(),
      transformValue = { old =>
        val total = old.getStruct(0, 1).getInt(0)
        // v1 ran exactly one batch for these keys
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](total, 1))))
      })
    assert(report.keysMoved == 2, s"$report")

    // ---- v2 query over the migrated checkpoint: evolved case class
    val latestV2 = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Int)]()
    val q2 = input.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(RescaleCounterFns.addCountsV2)
      .toDF("id", "total", "batches")
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r =>
          latestV2.put(r.getInt(0), (r.getInt(1), r.getInt(2))))
      }
      .option("checkpointLocation", ckpt2.toString).start()
    input.addData((1, 1), (3, 3))
    q2.processAllAvailable()
    q2.stop()
    // 1: total carried 10+1, batches 1(migrated)+1; 3: brand new
    assert(latestV2.asScala.toMap == Map(1 -> ((11, 2)), 3 -> ((3, 1))),
      s"migrated state must carry into the evolved class: ${latestV2.asScala}")
  }
}
