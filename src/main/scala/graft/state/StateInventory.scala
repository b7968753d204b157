package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State census of a streaming checkpoint — the OBSERVABILITY half of the
  * offline surgery toolkit ([[StateRescale]] rescale/prune/migrate are
  * the write half; you size a rescale, verify a prune, and capacity-plan
  * retention from this census). Reads through Spark's own state data
  * source, so the numbers are exactly what a resumed query would load —
  * not a guess from file sizes.
  */
object StateInventory {

  /** One row per (operator, partition) with a key count:
    * `(operator_id, partition_id, n_keys)`. Operators are discovered
    * from the checkpoint's `state/` directory; partitions with zero
    * keys carry an explicit 0 row (a silent absence would make a
    * drained partition indistinguishable from a never-used one —
    * which is exactly what a post-prune audit needs to tell apart).
    *
    * Scale shape: the state source reads each partition's store in
    * place; the census is a partition-keyed count — no state VALUES
    * ever reach the driver, only the |operators|×|partitions| counts.
    */
  def inventory(spark: SparkSession, checkpoint: String): DataFrame = {
    import spark.implicits._
    val statePath = new org.apache.hadoop.fs.Path(s"$checkpoint/state")
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(statePath),
      s"stateInventory: no state/ under checkpoint $checkpoint")
    val ops = fs.listStatus(statePath)
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).sorted
    require(ops.nonEmpty,
      s"stateInventory: no operator directories under $statePath")
    val counted = ops.map { op =>
      spark.read.format("statestore")
        .option("path", checkpoint)
        .option("operatorId", op)
        .load()
        .groupBy(col("partition_id"))
        .agg(count(lit(1)).as("n_keys"))
        .select(lit(op).as("operator_id"),
          col("partition_id").cast("int").as("partition_id"),
          col("n_keys"))
    }.reduce(_ unionByName _)
    // explicit zero rows for drained/never-used partitions: enumerate
    // partition dirs per operator from the checkpoint layout
    val allParts = ops.flatMap { op =>
      val opPath = new org.apache.hadoop.fs.Path(statePath, op.toString)
      fs.listStatus(opPath).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.forall(_.isDigit)).map(p => (op, p.toInt))
    }.toSeq.toDF("operator_id", "partition_id")
    allParts.join(counted, Seq("operator_id", "partition_id"), "left")
      .select(col("operator_id"), col("partition_id"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"))
      .orderBy(col("operator_id"), col("partition_id"))
  }
}
