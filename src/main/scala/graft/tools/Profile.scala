package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkEntry

/** Dev tool: `runMain graft.tools.Profile <sfDir> <q1,q2,...>` — run each
  * named query (toRdd.count, the bench's materialization) and print the
  * EXECUTED plan tree with its SQL metrics (times, rows, shuffle bytes),
  * so per-operator cost is attributable without the Spark UI. r18
  * optimization-round instrument.
  */
object Profile {
  private def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
    val interesting = p.metrics.toSeq
      .filter { case (_, m) => m.value > 0 }
      .sortBy(_._1)
      .map { case (k, m) =>
        val v = m.metricType match {
          case "timing" => s"${m.value} ms"
          case "nsTiming" => f"${m.value / 1e6}%.1f ms"
          case "size" => s"${m.value} B"
          case _ => m.value.toString
        }
        s"$k=$v"
      }
    out.append("  " * depth).append(p.nodeName)
      .append("  [").append(interesting.mkString(", ")).append("]\n")
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
      case _ => p.children ++ p.subqueries
    }
    kids.foreach(walk(_, depth + 1, out))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // warm pass (JIT/codegen/footers), then the measured pass
      spark.sharedState.cacheManager.clearCache()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val out = new StringBuilder
      out.append(f"\n########## $name  $sec%.3f s\n")
      walk(df.queryExecution.executedPlan, 0, out)
      println(out.toString)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
