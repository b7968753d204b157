package graft.state

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

/** State census of a streaming checkpoint — the OBSERVABILITY half of the
  * offline surgery toolkit ([[StateRescale]] rescale/prune/migrate are
  * the write half; you size a rescale, verify a prune, and capacity-plan
  * retention from this census). Reads through Spark's own state data
  * source, so the numbers are exactly what a resumed query would load —
  * not a guess from file sizes.
  */
object StateInventory {

  /** One row per (operator, state variable, partition) with a key count:
    * `(operator_id, state_var, partition_id, n_keys)` — n_keys counts
    * DISTINCT GROUPING KEYS holding state, for every variable type: the
    * state source flattens list/map state to one row per element/entry,
    * so a raw row count would report a 1-key, 1000-element ListState as
    * 1000 "keys" (the r9 census did). Operators are
    * discovered from the checkpoint's `state/` directory; a
    * transformWithState operator's state VARIABLES are discovered from
    * the checkpoint's own operator metadata (Spark's state reader
    * requires `stateVarName` there — r8's census errored on exactly the
    * checkpoints this repo's own transformWithState operators produce);
    * classic stateful operators have a single implicit store, reported
    * as `state_var = "default"`. Partitions with zero keys carry an
    * explicit 0 row (a silent absence would make a drained partition
    * indistinguishable from a never-used one — which is exactly what a
    * post-prune audit needs to tell apart).
    *
    * Scale shape: the state source reads each partition's store in
    * place; the census is a partition-keyed count — no state VALUES
    * ever reach the driver, only |operators|×|vars|×|partitions| counts.
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
    val varsByOp = stateVarsByOp(spark, checkpoint)
    def opVars(op: Long): Seq[String] =
      varsByOp.getOrElse(op, Seq.empty) match {
        case vs if vs.isEmpty => Seq("default")
        case vs               => vs
      }
    def reader(op: Long): DataFrameReader = spark.read.format("statestore")
      .option("path", checkpoint)
      .option("operatorId", op)
    val counted = ops.toSeq.flatMap { op =>
      opVars(op).map { vn =>
        val base = reader(op)
        val df = (if (varsByOp.getOrElse(op, Seq.empty).isEmpty) base
                  else base.option("stateVarName", vn)).load()
        // count DISTINCT grouping keys, not reader rows: for list-state
        // (and map-state) variables the state source flattens collection
        // types to one row per ELEMENT/entry, which would overstate a
        // key census — n_keys must mean "grouping keys holding state"
        // uniformly across variable types
        df.groupBy(col("partition_id"))
          .agg(countDistinct(col("key")).as("n_keys"))
          .select(lit(op).as("operator_id"), lit(vn).as("state_var"),
            col("partition_id").cast("int").as("partition_id"),
            col("n_keys"))
      }
    }.reduce(_ unionByName _)
    // explicit zero rows for drained/never-used partitions: enumerate
    // partition dirs per operator from the checkpoint layout
    val allParts = ops.toSeq.flatMap { op =>
      val opPath = new org.apache.hadoop.fs.Path(statePath, op.toString)
      val parts = fs.listStatus(opPath).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toInt).toSeq
      for (vn <- opVars(op); p <- parts) yield (op, vn, p)
    }.toDF("operator_id", "state_var", "partition_id")
    allParts.join(counted, Seq("operator_id", "state_var", "partition_id"), "left")
      .select(col("operator_id"), col("state_var"), col("partition_id"),
        coalesce(col("n_keys"), lit(0L)).as("n_keys"))
      .orderBy(col("operator_id"), col("state_var"), col("partition_id"))
  }

  /** State variable names per operator id, from the checkpoint's operator
    * metadata (the `state-metadata` source; transformWithState operators
    * list their variables in `operatorProperties`). Empty seq = classic
    * operator (single implicit store). Falls back to empty on checkpoints
    * predating operator metadata.
    */
  private def stateVarsByOp(spark: SparkSession,
                            checkpoint: String): Map[Long, Seq[String]] =
    try {
      val nameRe = "\"stateName\"\\s*:\\s*\"([^\"]+)\"".r
      spark.read.format("state-metadata").load(checkpoint)
        .select(col("operatorId").cast("long"), col("operatorProperties"))
        .collect()
        .map { r =>
          val props = Option(r.getString(1)).getOrElse("")
          r.getLong(0) -> nameRe.findAllMatchIn(props).map(_.group(1)).toSeq.distinct
        }.toMap
    } catch {
      case scala.util.control.NonFatal(_) => Map.empty
    }
}
