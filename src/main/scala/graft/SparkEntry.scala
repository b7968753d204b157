package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AdvancedJoins, Dedup, HistogramSketch, Multimodal, Pipeline, Sessionize, Similarity, TextOps}
import graft.queries.{BatchQueries, QuerySpec}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 surfaces here as a named
  * query; SQL-expressible ones carry a DuckDB oracle for the driver's
  * hash-compare. The specs live next to their operators
  * (graft.queries.BatchQueries, graft.operators.*) so the Spark plan and
  * the oracle SQL can't drift apart.
  */
object SparkEntry {

  val allSpecs: Seq[QuerySpec] =
    BatchQueries.specs ++ TextOps.specs ++ Dedup.specs ++
      Similarity.specs ++ Multimodal.specs ++ AdvancedJoins.specs ++
      Pipeline.specs ++ Sessionize.specs ++ HistogramSketch.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
