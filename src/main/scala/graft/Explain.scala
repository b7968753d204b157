package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: `runMain graft.Explain <sfDir> <q1,q2,...>` — times each named
  * query and dumps its formatted physical plan, for shuffle/pushdown/WSCG
  * review (the "explain every operator and iterate" loop).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"\n########## $name rows=$n time=${secs}%.2f".replace("%.2f", f"$secs%.2f"))
      df.explain("formatted")
    }
    spark.stop()
  }
}
