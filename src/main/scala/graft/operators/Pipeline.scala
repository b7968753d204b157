package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.queries.QuerySpec

/** The composed training-data curation pipeline — the flow a 100 TB
  * corpus actually runs, end to end, as ONE declarative plan:
  *
  *   1. quality gate   (length + lexical-diversity band, map-side)
  *   2. exact dedup    (content digest, keep lowest doc_id)
  *   3. near-dup prune (exact Jaccard within source blocks; a doc with a
  *                      near-dup of smaller doc_id is dropped — greedy,
  *                      deterministic)
  *   4. budget report  (surviving docs + token budget per source)
  *
  * Every stage reuses the standalone operators (TextOps, Dedup) so the
  * pipeline is exactly what a library user would compose; Catalyst fuses
  * the stages (the quality gate reaches the scan, dedup and near-dup each
  * cost one keyed shuffle).
  */
object Pipeline {

  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** @param maxTokenDf near-dup skew guard, threaded to
    *        [[Dedup.jaccardPairs]]. Production runs cap it (default);
    *        the oracle-gated spec passes Int.MaxValue because its DuckDB
    *        oracle is the exact all-pairs Jaccard and capped recall is
    *        data-dependent.
    */
  def curate(docs: DataFrame, minTokens: Int, maxTokens: Int,
             minTtr: Double, nearDupThreshold: Double,
             maxTokenDf: Int = 1000): DataFrame = {
    val quality = docs
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("ttr", TextOps.typeTokenRatio(col("text")))
      .filter(col("n_tokens").between(minTokens, maxTokens) && col("ttr") > minTtr)

    val exactDeduped = Dedup.exact(quality)

    val nearDupLosers = Dedup.jaccardPairs(exactDeduped, nearDupThreshold,
        maxTokenDf = maxTokenDf)
      .select(col("doc_b").as("doc_id")).distinct()

    exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
  }

  /** [[curate]] plus an [[org.apache.spark.sql.Observation]] that reports
    * surviving-doc and token-budget totals as the job runs — the
    * zero-extra-pass monitoring hook a production curation run needs
    * (`observe` metrics ride the existing plan as accumulators; a separate
    * `count()` would re-execute the whole pipeline). Read the metrics from
    * the returned Observation after the DataFrame is materialized.
    *
    * @param tag caller-supplied suffix distinguishing this curation's
    *        metrics; by default a per-JVM counter keeps concurrent
    *        curations' Observations from colliding on one name.
    */
  def curateWithMetrics(docs: DataFrame, minTokens: Int, maxTokens: Int,
                        minTtr: Double, nearDupThreshold: Double,
                        maxTokenDf: Int = 1000,
                        tag: String = ""): (DataFrame, org.apache.spark.sql.Observation) = {
    val suffix = if (tag.nonEmpty) tag else obsCounter.incrementAndGet().toString
    val obs = org.apache.spark.sql.Observation(s"graft_curation_$suffix")
    val out = curate(docs, minTokens, maxTokens, minTtr, nearDupThreshold, maxTokenDf)
      .observe(obs, count(lit(1)).as("docs_kept"),
        sum(col("n_tokens")).as("token_budget"))
    (out, obs)
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of
    * rows, selected by a multiplicative hash of the row id — the mixture-
    * weighting step of a training-data pipeline ("40% web, 25% code, …").
    *
    * Why hash-based and not `sample()`: the decision is a pure function of
    * (id, rate), so it is reproducible across runs/engines/retries,
    * stable under repartitioning, and monotone in the rate (raising a
    * stratum's rate only ADDS docs — a mixture re-weight never churns the
    * previously sampled set). Spark's `sample()` is per-partition RNG:
    * renumbering partitions reshuffles the selection.
    *
    * Scale notes: selection is a map-side filter fused into the scan
    * (zero shuffle, no pre-pass); the integer hash arithmetic is exact in
    * any engine, which is what makes the DuckDB oracle bit-reproducible.
    *
    * @param perMille stratum → keep-rate in 1/1000ths; strata absent from
    *        the map use `defaultPerMille`.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       perMille: Map[String, Int], defaultPerMille: Int,
                       idCol: String = "doc_id"): DataFrame = {
    // Knuth multiplicative hash, exact in 64-bit: ids are dense/sequential,
    // multiplication by a large odd constant decorrelates id ranges from
    // the keep decision; mod 1000 = the rate granularity. The id is
    // first reduced mod a prime so the product stays ≤ ~2.7e15 — a raw
    // doc_id × 2654435761 overflows a long past id ≈ 3.5e9, which ANSI
    // mode (Spark 4 default) turns into a query-aborting
    // ARITHMETIC_OVERFLOW at exactly the multi-billion-doc scale this
    // operator is for.
    val bucket = pmod(pmod(col(idCol).cast("long"), lit(1000003L)) * lit(2654435761L),
      lit(1000L))
    val rate = perMille.foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    docs.filter(bucket < rate)
  }

  /** Sequence packing: assign each doc to a training chunk of
    * ~`budgetTokens` tokens by CONTIGUOUS concatenation order — the way
    * pretraining actually fills context windows (docs are laid end to end
    * in a deterministic order and cut every `budgetTokens`; a doc belongs
    * to the chunk its first token lands in). Deterministic given
    * (strataCol, idCol), so shard assignment is reproducible across runs
    * and engines — no bin-packing heuristic whose output depends on
    * partition order.
    *
    * Scale notes: one running-sum window per stratum (a single shuffle on
    * `strataCol`, the same partitioning the downstream per-stratum shard
    * write wants); no driver-side state. Strata are independent, so skew
    * is bounded by the largest stratum, which a 100 TB pipeline already
    * shards (source × date).
    */
  def packSequences(docs: DataFrame, budgetTokens: Int,
                    strataCol: String = "source",
                    idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0,
      s"chunk budget must be positive, got $budgetTokens") // div-by-zero aborts under ANSI
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // integer `div`, not floor(double /): a corpus-scale running token
      // sum can pass 2^53, where double division starts mis-assigning
      // chunk boundaries
      .withColumn("chunk_id",
        expr(s"(__cum - n_tokens) div $budgetTokens").cast("bigint"))
      .drop("__cum")
  }

  /** Publish a curated corpus for training consumption: one directory
    * per `partitionCol` value (consumers read a language/source slice
    * without touching the rest), rows sorted by `sortCol` inside each
    * file (reproducible shard contents + parquet min/max stats that
    * enable row-group skipping on the id axis), and `maxRecordsPerFile`
    * bounding shard size (training loaders want many same-sized shards,
    * not one giant file per partition).
    *
    * Scale notes: the sort is WITHIN partitions (no global ordering
    * shuffle); `repartition(partitionCol)` keeps one writer task per
    * directory instead of every task writing every directory (the
    * small-files explosion); file-count growth is then
    * |partitions| × ⌈rows/maxRecordsPerFile⌉.
    */
  def writeCurated(docs: DataFrame, path: String,
                   partitionCol: String = "lang", sortCol: String = "doc_id",
                   maxRecordsPerFile: Int = 1000000): Unit = {
    docs.repartition(col(partitionCol))
      .sortWithinPartitions(col(sortCol))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)
  }

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q55_stratified_sample",
      (s, d) => {
        stratifiedSample(Tables.documents(s, d), "source",
            perMille = Map("src0" -> 50, "src1" -> 250, "src2" -> 1000),
            defaultPerMille = 100)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).cast("bigint").as("sum_chars"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""
        SELECT source, lang, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE ((doc_id % 1000003) * 2654435761) % 1000 <
              CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 250
                          WHEN 'src2' THEN 1000 ELSE 100 END
        GROUP BY source, lang
        ORDER BY source, lang""")),

    QuerySpec(
      "q67_pack_sequences",
      (s, d) => {
        packSequences(Tables.documents(s, d), budgetTokens = 256)
          .groupBy(col("source"), col("chunk_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("bigint").as("sum_tokens"))
          .orderBy(col("source"), col("chunk_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, source, len(string_split(text,' ')) AS n_tokens,
                 SUM(len(string_split(text,' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM documents)
        SELECT source, CAST((cum - n_tokens) // 256 AS BIGINT) AS chunk_id,
               COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM t GROUP BY source, chunk_id
        ORDER BY source, chunk_id""")),

    QuerySpec(
      "q70_curation_pipeline",
      (s, d) => {
        curate(Tables.documents(s, d),
            minTokens = 10, maxTokens = 100, minTtr = 0.3, nearDupThreshold = 0.8,
            maxTokenDf = Int.MaxValue) // exact: gated vs exact oracle
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
               sum(col("n_tokens")).as("token_budget"))
          .orderBy(col("source"))
      },
      Some("""
        WITH quality AS (
          SELECT doc_id, source, text,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents
          WHERE len(string_split(text, ' ')) BETWEEN 10 AND 100
            AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                  / len(string_split(text, ' ')) > 0.3),
        exact_deduped AS (
          SELECT doc_id, source, text, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM quality)
          WHERE rn = 1),
        toksets AS (
          SELECT doc_id, source, n_tokens,
                 list_distinct(string_split(text, ' ')) AS toks
          FROM exact_deduped),
        losers AS (
          SELECT DISTINCT b.doc_id
          FROM toksets a JOIN toksets b
            ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE len(list_intersect(a.toks, b.toks)) > 0
            AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                  / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8)
        SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_tokens) AS BIGINT) AS token_budget
        FROM exact_deduped
        WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        GROUP BY source
        ORDER BY source"""))
  )
}
