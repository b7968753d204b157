package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  private def q(s: String): String = JsonEscape.quote(s)

  /** Placeholder an oracle SQL string may embed wherever it needs the
    * dataset directory's tag (e.g. q124's side-dumped BPE counts path).
    * [[renderedOracleSql]] substitutes the ACTUAL tag at dump time, so
    * the same static `oracleSql` map serves every sf-dir without a
    * sf0.1 bench run leaving artifacts a later sf0.01 verify would
    * silently compare against. OracleHygieneSuite gates that no
    * placeholder ever survives into oracle_sql.json. */
  val SfTagToken = "__SF_TAG__"

  /** `SparkEntry.oracleSql` with every [[SfTagToken]] rendered for the
    * given dataset dir — THE map that must reach oracle_sql.json (r8
    * dumped the raw map verbatim and DuckDB globbed a literal
    * `__SF_TAG__` path; this is the one substitution point). */
  def renderedOracleSql(sfDir: String): Map[String, String] = {
    val tag = graft.operators.TextOps.sfTag(sfDir)
    SparkEntry.oracleSql.map { case (k, v) => k -> v.replace(SfTagToken, tag) }
  }

  /** Run each (filtered) query, dumping results under `outDir/<name>`.
    * A failed query must be LOUD: r06 shipped two analysis-broken queries
    * that wrote no output dir and so vanished from the driver's
    * correctness record entirely (read as "not run" instead of "broken").
    * Every failure is persisted to `outDir/_failures.json` (name → error)
    * so the round's artifacts carry the breakage explicitly. Returns the
    * failure map (empty = all queries produced output).
    */
  def runQueries(spark: SparkSession, sfDir: String, outDir: String,
                 only: Option[Set[String]] = None): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // NonFatal only: after an OOM/StackOverflow the JVM is corrupted
      // and every later query's result is suspect — abort instead
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failures(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(500)}"
      }
      // several operators pin localCheckpoint blocks; 100 queries in one
      // JVM would otherwise accumulate them until storage memory squeezes
      // execution (same hygiene as Bench.dropLeftoverBlocks)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
    failures.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (dev iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harmless when events.parquet carries TIMESTAMP_MICROS (the current
      // generator); required when it carries TIMESTAMP(NANOS), which
      // Spark 4 otherwise rejects. Tables.events normalizes either
      // physical type to a nanos-since-epoch long.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    runQueries(spark, sfDir, outDir, only)
    val json = renderedOracleSql(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // exit 0 even on per-query failures: the driver must still run the
    // DuckDB compare over the queries that DID produce output — the
    // breakage is recorded in _failures.json + stderr, not by aborting.
    spark.stop()
  }
}
