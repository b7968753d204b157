package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index: fit ONCE over the corpus, write the artifacts
  * to storage, search MANY times without refitting — the build/serve
  * split every production ANN deployment runs (nightly index build,
  * online probe), where [[Similarity.ivfPqTopK]] is the inline
  * fit-and-search convenience.
  *
  * On-disk layout under `dir` (all parquet, all engine-readable):
  *  - `coarse/`  — (cid, cvec): the nClusters coarse centroids
  *  - `books/`   — (m, code, cvec): all numSub × codebookK PQ codebook
  *    entries (sub-vectors of the residual space)
  *  - `codes/`   — (nid, cid, codes): one row per corpus vector — the
  *    cell assignment and the numSub PQ codes. THIS is the index: a
  *    d-dim float vector compressed to numSub small ints, the reason the
  *    100 TB corpus's index fits where raw vectors never could.
  *
  * Shapes are self-describing (numSub/codebookK/dim recovered from the
  * data), so there is no side metadata file to version.
  *
  * Search reuses [[Similarity.pqSearch]] — the SAME code path the inline
  * operator runs — so a loaded index returns bit-identical results to
  * fitting in place with the same parameters (AnnIndexSuite gates this).
  * Exact re-rank joins the caller-supplied corpus by id: originals stay
  * in the lake, only the shortlist (|Q|·shortlist rows) ever rejoins
  * full vectors.
  */
object AnnIndex {

  /** Fit the IVF-PQ model over `corpus` (`vec_id`, `embedding`) and
    * persist it under `dir`. Training is identical to
    * [[Similarity.ivfPqTopK]]'s (same seeding, same Lloyd loops), so the
    * fitted model matches the inline operator's parameter-for-parameter.
    */
  def build(corpus: DataFrame, dir: String,
            nClusters: Int = 16, iters: Int = 3,
            numSub: Int = 8, codebookK: Int = 16, subIters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    import Similarity.{asDouble, assign, centroidDf, fitCentroids, fitSubCodebooks}
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val coarse = fitCentroids(c, "nid", "cv", nClusters, iters)
      val dim = coarse(0)._2.length
      require(dim % numSub == 0, s"dim $dim not divisible into $numSub subspaces")
      val subDim = dim / numSub

      val withRes = assign(c, coarse, "cv")
        .join(broadcast(centroidDf(spark, coarse)), "cid")
        .withColumn("r", zip_with(col("cv"), col("cvec"), (a, b) => a - b))
        .select(col("nid"), col("cid"), col("r"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val codebooks = fitSubCodebooks(withRes, numSub, subDim, codebookK, subIters)

        centroidDf(spark, coarse)
          .write.mode("overwrite").parquet(s"$dir/coarse")
        locally {
          import spark.implicits._
          codebooks.zipWithIndex.flatMap { case (book, m) =>
            book.zipWithIndex.map { case (v, code) => (m, code, v.toSeq) }
          }.toSeq.toDF("m", "code", "cvec")
            .write.mode("overwrite").parquet(s"$dir/books")
        }
        withRes.withColumn("codes",
            array((0 until numSub).map(m =>
              graft.functions.VectorFunctions.nearest_centroid(
                slice(col("r"), m * subDim + 1, subDim), codebooks(m))): _*))
          .select(col("nid"), col("cid"), col("codes"))
          .write.mode("overwrite").parquet(s"$dir/codes")
      } finally withRes.unpersist(blocking = false)
    } finally c.unpersist(blocking = false)
  }

  /** Build-once memo for harness use (q102): the operator's POINT is the
    * build/serve split, so the benched path is search against an index
    * built once per (scale-dir) per JVM ([[BuildOnce]]). Library users
    * call [[build]]/[[search]] directly with their own storage paths.
    */
  def cachedBuild(corpus: DataFrame, key: String): String =
    BuildOnce.dir("graft-ann-index", key) { dir =>
      build(corpus, dir); dir
    }

  /** Load the fitted model artifacts (coarse centroids + PQ codebooks)
    * from `dir`. Both are K×dim-scale — driver-side by design, the same
    * bounded-model exception every fitted operator here makes.
    */
  private def loadModel(spark: SparkSession, dir: String)
      : (Array[(Int, Array[Double])], Array[Array[Array[Double]]]) = {
    val coarse = spark.read.parquet(s"$dir/coarse").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val bookRows = spark.read.parquet(s"$dir/books").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
    val numSub = bookRows.keys.map(_._1).max + 1
    val fittedK = bookRows.keys.map(_._2).max + 1
    (coarse, Array.tabulate(numSub, fittedK)((m, code) => bookRows((m, code))))
  }

  /** Encode `c` (`nid`, `cv`) with a FROZEN model: coarse cell argmin,
    * residual, per-subspace PQ codes — the exact build-time projection,
    * shared by [[build]] and [[append]].
    */
  private def encode(c: DataFrame,
                     coarse: Array[(Int, Array[Double])],
                     codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import Similarity.{assign, centroidDf}
    val spark = c.sparkSession
    val numSub = codebooks.length
    val subDim = coarse(0)._2.length / numSub
    assign(c, coarse, "cv")
      .join(broadcast(centroidDf(spark, coarse)), "cid")
      .withColumn("r", zip_with(col("cv"), col("cvec"), (a, b) => a - b))
      .withColumn("codes",
        array((0 until numSub).map(m =>
          graft.functions.VectorFunctions.nearest_centroid(
            slice(col("r"), m * subDim + 1, subDim), codebooks(m))): _*))
      .select(col("nid"), col("cid"), col("codes"))
  }

  /** Incrementally index a new-vector batch WITHOUT refitting: encode
    * `batch` under the frozen model at `dir` and append the codes — the
    * ANN analogue of the q74/q81 persisted-index pattern (nightly work ∝
    * batch, the corpus codes are never recomputed). Batch ids must be
    * disjoint from the indexed generation's (same contract as
    * [[graft.operators.Dedup.jaccardPairsIncremental]]). Freezing the
    * model is the standard serving trade-off: cells/codebooks drift from
    * optimal as the distribution shifts — monitor with
    * [[Similarity.embeddingDrift]] and schedule a full [[build]] when
    * the changed/added share warrants it.
    */
  def append(batch: DataFrame, dir: String): Unit = {
    val spark = batch.sparkSession
    val (coarse, codebooks) = loadModel(spark, dir)
    val dim = coarse(0)._2.length
    // Loud dim guard: a batch vector whose length differs from the frozen
    // model would otherwise zip_with into null-padded residuals and write
    // CORRUPT codes silently. assert_true returns null for every passing
    // row (the filter keeps them all) and fails the write job otherwise.
    val checked = batch
      .select(col("vec_id").as("nid"),
        Similarity.asDouble(col("embedding")).as("cv"))
      .filter(assert_true(size(col("cv")) === lit(dim),
        concat(lit(s"AnnIndex.append: batch vector dim "), size(col("cv")),
          lit(s" != frozen model dim $dim (vec_id "), col("nid"),
          lit(") — rebuild the index for a new embedding space"))).isNull)
    encode(checked, coarse, codebooks)
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** Remove `ids` (`vec_id`) from the SERVING index — the
    * right-to-be-forgotten path for the online artifact, completing what
    * [[graft.state.StateRescale.prune]] does for checkpointed state: a
    * delete that reaches state but not the index the fleet actually
    * probes is not a delete. Rewrites `codes/` through a staged anti-join
    * (the delete list is broadcast — zero shuffle of the codes) and swaps
    * it in; `coarse/` and `books/` stay frozen, so search over the pruned
    * index is EXACTLY search over a same-model index of the survivors
    * (AnnIndexSuite gates this), and [[append]] composes before and after.
    *
    * Cost is one scan+rewrite of the compressed codes (nid + cid + numSub
    * small ints per vector — the artifact that fits where raw vectors
    * never could), not of the corpus. Ids absent from the index are
    * ignored, so replaying a delete log is idempotent.
    */
  def prune(ids: DataFrame, dir: String): Unit =
    Pipeline.pruneArtifact(ids.select(col("vec_id").as("nid")),
      s"$dir/codes", "nid")

  /** Top-k cosine neighbors for `queries` against the index at `dir`.
    * `corpus` supplies the original vectors for the exact re-rank of the
    * approx shortlist (joined by `vec_id` — only shortlisted ids are
    * ever read back as full vectors).
    */
  def search(corpus: DataFrame, dir: String, queries: DataFrame, k: Int,
             nProbe: Int = 4, shortlist: Int = 50): DataFrame = {
    val spark = queries.sparkSession
    val (coarse, codebooks) = loadModel(spark, dir)
    val encoded = spark.read.parquet(s"$dir/codes")
    Similarity.pqSearch(coarse, codebooks, encoded,
      corpus.select(col("vec_id").as("nid"),
        Similarity.asDouble(col("embedding")).as("cv")),
      queries, k, nProbe, shortlist)
  }

  /** [[search]] restricted to a permitted-id subset (`vec_id`) — the
    * filtered-ANN serving path (tenant scoping, source allow-lists,
    * post-GDPR serving before the nightly [[prune]] lands). The filter
    * is a PRE-shortlist semi-join on the compressed codes, so the k
    * results are the best of the PERMITTED set — not a post-filter of
    * the global top-k, which under-fills whenever the global shortlist
    * is dominated by out-of-scope vectors (the classic filtered-ANN
    * bug). Gated in AnnIndexSuite: identical to searching a same-model
    * index that only ever contained the permitted ids.
    *
    * Scale shape: the allow-list is ids only and broadcasts; the codes
    * never shuffle for the filter. A filter too selective for the probed
    * cells returns fewer than k — raise `nProbe` for narrow scopes.
    */
  def searchWithin(corpus: DataFrame, dir: String, queries: DataFrame,
                   allowedIds: DataFrame, k: Int,
                   nProbe: Int = 4, shortlist: Int = 50): DataFrame = {
    val spark = queries.sparkSession
    val (coarse, codebooks) = loadModel(spark, dir)
    val encoded = spark.read.parquet(s"$dir/codes")
      .join(broadcast(allowedIds.select(col("vec_id").as("nid"))),
        Seq("nid"), "left_semi")
    Similarity.pqSearch(coarse, codebooks, encoded,
      corpus.select(col("vec_id").as("nid"),
        Similarity.asDouble(col("embedding")).as("cv")),
      queries, k, nProbe, shortlist)
  }

  /** Measure the index's recall@k against exact brute-force cosine on a
    * query sample — the serving-quality audit an ANN deployment runs
    * beside [[Similarity.embeddingDrift]]: drift says the DATA moved,
    * recall says whether the frozen model still SERVES it. Returns one
    * row per query (`query_id`, `n_hits`, `recall`) plus the macro
    * average under query_id NULL.
    *
    * Cost: brute force over |sample|×|corpus| — size the sample, not the
    * corpus; the audit is a sampled measurement by design.
    */
  def recallAudit(corpus: DataFrame, dir: String, sampleQueries: DataFrame,
                  k: Int, nProbe: Int = 4, shortlist: Int = 50): DataFrame = {
    // checkpoint the |sample|·k id lists and the per-query rows: `exact`
    // feeds two consumers and `perQuery` feeds the union's both sides —
    // without the cut each plan reference re-runs the brute-force cross
    // join / PQ search (the q116 multi-reference lesson; the stored form
    // is tiny relative to what it replaces)
    val approx = search(corpus, dir, sampleQueries, k, nProbe, shortlist)
      .select(col("qid"), col("nid")).localCheckpoint(false)
    val exact = Similarity.bruteForceTopK(corpus, sampleQueries, k)
      .select(col("qid"), col("nid")).localCheckpoint(false)
    val hits = exact.join(approx, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
    val perQuery = exact.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"))
      .localCheckpoint(false)
    perQuery.unionByName(
      perQuery.agg(lit(null).cast("long").as("qid"),
        sum(col("n_hits")).as("n_hits"), avg(col("recall")).as("recall")))
  }
}
