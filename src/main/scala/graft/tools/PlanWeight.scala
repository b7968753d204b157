package graft.tools

import org.apache.spark.SparkEnv
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the serve tier's compiled-literal PLAN WEIGHT — the one
  * resource [[graft.operators.TextOps.decontaminateSpansServe]]'s gram
  * cap exists to budget. The gram set compiles into the projection
  * ([[graft.functions.GramSetStarts]]'s `grams` field), so it rides the
  * TASK BINARY: the broadcast every executor fetches before running the
  * stage (Spark warns at 1000 KiB — `TaskSetManager
  * .TASK_SIZE_TO_WARN_KIB`). This main runs the serve kernel at a
  * ladder of panel sizes and reports the actual serialized task-binary
  * bytes per rung, measured from the block manager's broadcast pieces
  * (the serialized form executors download) — the evidence behind the
  * cap's value, pinned in PLANS.md.
  *
  * Usage: `runMain graft.tools.PlanWeight <sfDir> [sizes-csv]`
  */
object PlanWeight {

  /** The stage's task-binary payload, reproduced: the scheduler
    * broadcasts `closureSerializer.serialize((rdd, func))` per stage
    * (DAGScheduler.submitMissingTasks), so serializing the query's
    * executed RDD with the same serializer measures the bytes every
    * executor fetches before its first task — the compiled gram set
    * rides here (GramSetStarts's `grams` field inside the codegen'd
    * projection's references). */
  private def taskBinaryBytes(df: org.apache.spark.sql.DataFrame): Long = {
    val rdd = df.queryExecution.toRdd
    SparkEnv.get.closureSerializer.newInstance()
      .serialize(rdd: AnyRef).limit().toLong
  }

  /** Deterministic 4-token grams shaped like real eval shingles
    * (~25 UTF-8 bytes each — four words + three spaces). */
  def syntheticGrams(count: Int): Seq[String] =
    (0 until count).map(i =>
      s"evalw${i % 997} tok${i / 997} span${i % 31} g$i")

  /** Rank every registered query by its plan's task-binary weight —
    * pins WHICH query a driver-log "Broadcasting large task binary"
    * WARN belongs to (the log line itself names no query). */
  private def rankQueries(spark: SparkSession, sfDir: String,
                          top: Int): Unit = {
    val sizes = graft.SparkEntry.queries.toSeq.map { case (name, q) =>
      val bytes =
        try taskBinaryBytes(q(spark, sfDir))
        catch { case e: Throwable => -1L }
      name -> bytes
    }
    println(f"${"query"}%-32s ${"task_binary"}%12s")
    sizes.sortBy(-_._2).take(top).foreach { case (n, b) =>
      println(f"$n%-32s $b%12d")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--queries")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
        .appName("graft-plan-weight")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      rankQueries(spark, sfDir, top = 15)
      spark.stop()
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sizes = args.lift(1).getOrElse("1000,10000,100000,500000")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-plan-weight")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    docs.count() // warm the scan so its own task binary is not counted

    println(f"${"grams"}%9s ${"gram_bytes"}%12s ${"task_binary"}%12s ${"per_gram"}%9s")
    sizes.foreach { nGrams =>
      val grams = syntheticGrams(nGrams)
      val gramBytes = grams.map(_.getBytes("UTF-8").length.toLong).sum
      val df = graft.operators.TextOps
        .decontaminateSpansServe(docs, grams, n = 4)
      val taskBytes = taskBinaryBytes(df)
      df.count() // and actually run it: the measurement must be of a plan that executes
      println(f"$nGrams%9d $gramBytes%12d $taskBytes%12d " +
        f"${taskBytes.toDouble / nGrams}%9.1f")
    }
    spark.stop()
  }
}
