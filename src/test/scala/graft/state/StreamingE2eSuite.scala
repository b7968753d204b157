package graft.state

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** End-to-end arbitrary-state pipeline — the reference's only full demo
  * (reference RedistateTest.scala:17-65: MemoryStream[PageVisit] →
  * groupByKey(id) → mapGroupsWithState(updateUserStatistics) → memory
  * sink), with the assertions the reference lacks, run against BOTH of our
  * providers. State value type intentionally nests array-of-struct +
  * timestamp-bearing fields (reference test/redis/package.scala:13-20).
  */
case class PageVisit(id: Int, url: String, tsMillis: Long)
case class UserStatistics(userId: Int, visits: Seq[PageVisit], totalVisits: Int)

/** Standalone (serializable) state-update fn — the reference's
  * `updateUserStatistics` (test/redis/package.scala:33-45). */
object VisitStateFns extends Serializable {
  def updateUserStatistics(
      id: Int, visits: Iterator[PageVisit],
      state: GroupState[UserStatistics]): UserStatistics = {
    val current = state.getOption.getOrElse(UserStatistics(id, Seq.empty, 0))
    val newVisits = visits.toSeq
    val updated = current.copy(
      visits = current.visits ++ newVisits,
      totalVisits = current.totalVisits + newVisits.size)
    state.update(updated)
    updated
  }
}

abstract class StreamingE2eSuiteBase extends AnyFunSuite with BeforeAndAfterAll {

  def providerClass: String
  def suiteName: String

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-e2e-$suiteName")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test(s"$suiteName: mapGroupsWithState accumulates per-user state across batches") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[PageVisit]
    val checkpoint = Files.createTempDirectory(s"graft-e2e-$suiteName").toString

    val stats = input.toDS()
      .groupByKey(_.id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(VisitStateFns.updateUserStatistics)

    val query = stats.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(s"visits_$suiteName")
      .option("checkpointLocation", checkpoint)
      .start()

    def visit(id: Int): PageVisit = PageVisit(id, s"https://example.org/$id", 1700000000000L + id)

    // batch 1: ids 1,2,3 — batch 2: ids 3,3,4 (reference RedistateTest:42-59)
    input.addData(visit(1), visit(2), visit(3))
    query.processAllAvailable()
    input.addData(visit(3), visit(3), visit(4))
    query.processAllAvailable()

    val byUser = spark.sql(s"select userId, max(totalVisits) as tv from visits_$suiteName group by userId")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(byUser === Map(1 -> 1, 2 -> 1, 3 -> 3, 4 -> 1))

    // nested array-of-struct state round-trips intact
    val user3visits = spark.sql(
      s"select visits from visits_$suiteName where userId = 3 and totalVisits = 3")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(user3visits.length === 3)
    assert(user3visits.forall(_.getString(1) === "https://example.org/3"))

    query.stop()
  }

  test(s"$suiteName: streaming aggregation with watermarked window") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val checkpoint = Files.createTempDirectory(s"graft-agg-$suiteName").toString

    val agg = input.toDF().toDF("ts", "kind", "value")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

    val query = agg.writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(s"winagg_$suiteName")
      .option("checkpointLocation", checkpoint)
      .start()

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2024-01-01 00:00:10"), "a", 1.0), (ts("2024-01-01 00:00:20"), "a", 2.0),
                  (ts("2024-01-01 00:00:30"), "b", 5.0))
    query.processAllAvailable()
    input.addData((ts("2024-01-01 00:00:40"), "a", 3.0))
    query.processAllAvailable()

    val rows = spark.sql(
      s"select kind, max(n) as n, max(total) as total from winagg_$suiteName group by kind")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows("a") === ((3L, 6.0)))
    assert(rows("b") === ((1L, 5.0)))
    query.stop()
  }

  test(s"$suiteName: streaming dropDuplicates holds dedup state") {
    val sql = spark
    import sql.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val checkpoint = Files.createTempDirectory(s"graft-dedup-$suiteName").toString

    val deduped = input.toDF().toDF("event_id", "payload")
      .dropDuplicates("event_id")

    val query = deduped.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(s"dedup_$suiteName")
      .option("checkpointLocation", checkpoint)
      .start()

    input.addData((1L, "x"), (2L, "y"), (1L, "dup-in-batch"))
    query.processAllAvailable()
    input.addData((2L, "dup-across-batch"), (3L, "z"))
    query.processAllAvailable()

    val n = spark.sql(s"select count(*) from dedup_$suiteName").collect().head.getLong(0)
    assert(n === 3L) // 1, 2, 3 — each exactly once
    query.stop()
  }
}

class InMemoryStreamingE2eSuite extends StreamingE2eSuiteBase {
  override def providerClass: String = classOf[InMemoryStateStoreProvider].getName
  override def suiteName = "inmemory"
}

class RocksDbStreamingE2eSuite extends StreamingE2eSuiteBase {
  override def providerClass: String = classOf[RocksDbStateStoreProvider].getName
  override def suiteName = "rocksdb"
}

class KvStreamingE2eSuite extends StreamingE2eSuiteBase {
  override def providerClass: String = classOf[KvStateStoreProvider].getName
  override def suiteName = "kv"
}
