package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** State-store throughput benchmark (BASELINE.md): events/sec through the
  * reference's demo pipeline shape — MemoryStream → groupByKey →
  * mapGroupsWithState → memory sink — for each provider: ours (in-memory,
  * RocksDB) and Spark's built-ins (HDFSBacked, RocksDB).
  *
  * Prints one JSON line:
  * {"metric":"state_events_per_sec","providers":{name:evps,...}}
  */
object StateBench {

  case class Event(key: Int, payload: Long)
  case class Tally(key: Int, n: Long, sum: Long)

  def update(key: Int, rows: Iterator[Event], st: GroupState[Tally]): Tally = {
    var n = 0L
    var sum = 0L
    rows.foreach { e => n += 1; sum += e.payload }
    val cur = st.getOption.getOrElse(Tally(key, 0, 0))
    val upd = Tally(key, cur.n + n, cur.sum + sum)
    st.update(upd)
    upd
  }

  private val providers = Seq(
    "graft-inmemory" -> classOf[graft.state.InMemoryStateStoreProvider].getName,
    "graft-rocksdb" -> classOf[graft.state.RocksDbStateStoreProvider].getName,
    "graft-kv" -> classOf[graft.state.KvStateStoreProvider].getName,
    "spark-hdfsbacked" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "spark-rocksdb" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** (events/sec, avg commit-duration ms/batch, avg snapshot-durability
    * ms/batch from our custom metric when the provider reports it). */
  def run(providerClass: String, nBatches: Int, eventsPerBatch: Int,
          nKeys: Int): (Double, Double, Double) = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-state-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val out = input.toDS().groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
    val name = s"sb_${System.nanoTime()}"
    val query = out.writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("graft-sb").toString)
      .start()

    // warmup batch (state init, codegen)
    input.addData((0 until eventsPerBatch).map(i => Event(i % nKeys, i.toLong)))
    query.processAllAvailable()

    val t0 = System.nanoTime()
    val commitMs = Seq.newBuilder[Long]
    val durabilityMs = Seq.newBuilder[Long]
    (1 to nBatches).foreach { b =>
      input.addData((0 until eventsPerBatch).map(i => Event(i % nKeys, (b + i).toLong)))
      query.processAllAvailable()
      Option(query.lastProgress).flatMap(_.stateOperators.headOption).foreach { so =>
        commitMs += so.allUpdatesTimeMs + so.commitTimeMs
        Option(so.customMetrics.get("snapshotDurabilityMs")).foreach(durabilityMs += _.longValue)
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    query.stop()
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    def avg(xs: Seq[Long]): Double = if (xs.isEmpty) -1.0 else xs.sum.toDouble / xs.size
    (nBatches.toLong * eventsPerBatch / secs, avg(commitMs.result()), avg(durabilityMs.result()))
  }

  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.getOrElse("SB_BATCHES", "20").toInt
    val eventsPerBatch = sys.env.getOrElse("SB_EVENTS", "20000").toInt
    val nKeys = sys.env.getOrElse("SB_KEYS", "2000").toInt
    val results = providers.map { case (name, cls) =>
      val r = try run(cls, nBatches, eventsPerBatch, nKeys)
              catch { case e: Throwable =>
                System.err.println(s"[statebench] $name failed: $e"); (-1.0, -1.0, -1.0) }
      name -> r
    }
    val js = results.map { case (k, (evps, commit, dur)) =>
      s""""$k":{"events_per_sec":${evps.toLong},"avg_commit_ms":${commit.round},"avg_snapshot_durability_ms":${dur.round}}"""
    }.mkString(",")
    // date stamp: the pin must say WHEN it was taken (r13 — the r10-era
    // numbers sat unrefreshed for three rounds with no way to tell)
    val json = s"""{"metric":"state_store_bench","date":"${java.time.LocalDate.now}","batches":$nBatches,"events_per_batch":$eventsPerBatch,"keys":$nKeys,"providers":{$js}}"""
    println(json)
    // committed into the repo so every round's artifacts carry the
    // state-throughput numbers (BASELINE.md state-store target)
    Files.writeString(java.nio.file.Paths.get("STATEBENCH.json"), json + "\n")
  }
}
