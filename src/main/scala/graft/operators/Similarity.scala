package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.queries.QuerySpec

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`Array[Float]`), north-star operator set.
  *
  * Scale design (100 TB):
  *  - The brute-force path broadcasts the (small) query set and computes
  *    dot products map-side over the corpus scan — no corpus shuffle at
  *    all; the only shuffle is the final top-k per query (a tiny
  *    `Window`/`row_number` over |Q|·k rows after per-partition pruning).
  *  - The scale path is LSH bucketing (random-hyperplane signs): corpus and
  *    queries hash to (table, bucket) keys, the join touches only matching
  *    buckets, turning O(|Q|·|C|) into O(|Q|·bucket_size·tables).
  *  - An IVF variant would k-means the corpus and probe nearest centroids;
  *    the bucketed-join shape below is identical, with centroid-id as the
  *    bucket key.
  *  - All vector math is `zip_with`/`aggregate` higher-order column
  *    expressions over double-cast arrays — codegen'd, deterministic
  *    left-to-right summation (bit-identical to the sequential oracle).
  */
object Similarity {
  import graft.functions.VectorFunctions

  /** Sequential-fold dot product via the codegen'd ArrayDot expression
    * (same left-to-right order as the HOF/oracle formulation, so results
    * are bit-identical — see graft.functions.VectorExpressions).
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.array_dot(a, b)

  /** HOF reference formulation of the same fold (kept for parity tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = VectorFunctions.array_norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // array-level cast, NOT transform(_.cast) — the HOF lambda is interpreted
  // (no codegen) and allocation-heavy; measured 50-95 s/query at sf0.1
  private[operators] def asDouble(a: Column): Column = a.cast("array<double>")

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * Queries are broadcast; corpus is scanned once map-side.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv")))
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Random-hyperplane LSH: `nBits`-bit sign signature per table, computed
    * by the codegen'd LshSignBits expression. Planes are deterministic
    * pseudo-random vectors derived from (table, bit, dim) hashes so both
    * sides bucket identically without shipping plane matrices.
    */
  def lshSignature(vec: Column, table: Int, nBits: Int, dim: Int): Column =
    graft.functions.HashFunctions.lsh_sign_bits(vec, table, nBits)

  /** ANN via LSH bucket join: candidates share a full signature in ≥1 of
    * `tables` hash tables; exact cosine re-ranks within candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, nBits: Int = 4, dim: Int = 64): DataFrame = {
    // nBits trades candidate-set size against recall: P(all bits agree) ≈
    // (1 − θ/π)^nBits per table. Random 64-dim embeddings put even true
    // neighbors at θ ≈ 60-70°, so long signatures kill recall (12 bits
    // measured 0.04 on the test corpus; 4 bits × 8 tables ≈ 0.7+ while
    // still pruning most of each table).
    def bucketed(df: DataFrame, idName: String): DataFrame =
      df.select(col("vec_id").as(idName), asDouble(col("embedding")).as(s"${idName}_v"))
        .select(col(idName), col(s"${idName}_v"),
          posexplode(array((0 until tables).map(t =>
            lshSignature(col(s"${idName}_v"), t, nBits, dim)): _*)).as(Seq("tbl", "bucket")))
    val c = bucketed(corpus, "nid")
    val q = broadcast(bucketed(queries, "qid"))
    val cands = c.join(q, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qid_v"), col("nid"), col("nid_v"))
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cands.withColumn("cos", cosine(col("qid_v"), col("nid_v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** ±1 sign matrix for [[randomProjectMicro]], derived per (i, j) from
    * the parity of an md5 prefix — the same engine-portable hash the
    * shard router uses (Pipeline.shardAssign), so an oracle can rebuild
    * the identical matrix from SQL `md5(i || ',' || j)`. md5 rather than
    * a cheap multiplicative mix because one extracted bit of a
    * multiplicative hash left adjacent output dims ~85% correlated
    * (measured); the matrix is built ONCE on the driver and ships as a
    * literal, so hash cost is irrelevant. */
  private[operators] def rpSignMatrix(inDim: Int, outDim: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(inDim * outDim) { idx =>
      val i = idx / outDim; val j = idx % outDim
      val hex = md.digest(s"$i,$j".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
  }

  /** Johnson–Lindenstrauss random projection (Achlioptas ±1 variant) of
    * an embedding column, in exact integer micro-units:
    * `proj[j] = Σ_i s(i,j) · round(v[i]·1e6)`. Dimensionality reduction
    * is the standard compression step in front of similarity search —
    * distances are preserved within (1±ε) for outDim = O(log n / ε²) —
    * and the INTEGER formulation makes it bit-reproducible on any
    * engine (the q109 oracle recomputes the same projection in SQL,
    * including the sign matrix from md5 parity).
    *
    * Scale notes: entirely map-side — the sign matrix is an
    * inDim×outDim literal baked into the plan (no broadcast join, no
    * shuffle), the µ-unit vector is materialized once per row in its
    * own projection (lambda-capture rule, see PLANS.md), and each
    * output dim is a fixed-order integer fold. A 100 TB corpus projects
    * in one pass and stores outDim/inDim of the original bytes.
    */
  def randomProjectMicro(emb: DataFrame, inDim: Int, outDim: Int,
                         vecCol: String = "embedding",
                         idCol: String = "vec_id"): DataFrame = {
    require(inDim > 0 && outDim > 0, s"bad dims: $inDim -> $outDim")
    val m = rpSignMatrix(inDim, outDim)
    // The µ-unit quantization keeps Spark's own `round` (bit-identical to
    // the oracle by construction); the 16×64 multiply-add fold runs in the
    // codegen'd SignedFoldMicro kernel — the previous
    // `array(outDim × aggregate(zip_with(...)))` shape paid 16 interpreted
    // lambda folds per row (r18 measurement: 2.4 s → the kernel's one
    // generated loop; same integer arithmetic, bit-equal output, and the
    // operator still plans ZERO exchanges).
    emb.select(col(idCol),
        transform(asDouble(col(vecCol)), x => round(x * 1e6).cast("long")).as("__q"))
      .select(col(idCol),
        graft.functions.VectorFunctions.signed_fold_micro(col("__q"), m, outDim)
          .as("proj_micro"))
  }

  /** ANN via random projection: candidate top-`shortlist` by cosine in
    * the reduced `outDim`-d space, exact re-rank in the original space.
    * The third ANN architecture next to LSH (q41) and IVF (q44): no
    * training step, no bucketing — the corpus scan itself shrinks by
    * outDim/inDim, which at 100 TB is the difference between scanning
    * 100 TB and 25 TB of vectors per query batch. Recall gated in
    * AnnRecallSuite (≥ 0.5); this corpus's random embeddings have weak
    * neighbor structure (the lshTopK note), so the default shortlist is
    * generous — 40 measured 0.44, 100 clears the gate. */
  def rpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             inDim: Int = 64, outDim: Int = 16, shortlist: Int = 100): DataFrame = {
    def proj(df: DataFrame, idName: String): DataFrame =
      randomProjectMicro(df, inDim, outDim)
        .select(col("vec_id").as(idName),
          asDouble(col("proj_micro")).as(s"${idName}_p"))
    val c = proj(corpus, "nid")
    val q = broadcast(proj(queries, "qid"))
    val w0 = Window.partitionBy(col("qid")).orderBy(col("rcos").desc, col("nid").asc)
    // cancellation can zero a projected vector even for a nonzero input:
    // score it -2.0 (below any real cosine) instead of tripping ANSI
    // divide-by-zero — same sentinel as the other re-rank paths
    val cands = c.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      .withColumn("rcos",
        when(norm(col("qid_p")) === 0.0 || norm(col("nid_p")) === 0.0, lit(-2.0))
          .otherwise(cosine(col("qid_p"), col("nid_p"))))
      .withColumn("rnk0", row_number().over(w0)).filter(col("rnk0") <= shortlist)
      .select(col("qid"), col("nid"))
    val cv = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("nid_v"))
    val qv = broadcast(queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qid_v")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cands.join(cv, "nid").join(qv, "qid")
      .withColumn("cos", cosine(col("qid_v"), col("nid_v")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Shared oracle for the exact top-5 searches (q40 window formulation
    * and q43 aggregator formulation produce identical results). */
  private val specsOracleTopK: Option[String] = Some("""
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 5),
             scored AS (
               SELECT q.qid, c.vec_id AS nid,
                      list_reduce(list_prepend(0.0,
                        list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2])),
                        (a, b) -> a + b)
                      / (sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(q.qv, q.qv), p -> p[1] * p[2])), (a,b) -> a+b))
                       * sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(c.v, c.v), p -> p[1] * p[2])), (a,b) -> a+b)))
                        AS cos
               FROM c CROSS JOIN q
               WHERE c.vec_id <> q.qid)
        SELECT qid, rnk, nid, round(cos, 6) AS cos_sim FROM (
          SELECT qid, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
          FROM scored)
        WHERE rnk <= 5
        ORDER BY qid, rnk""")

  /** Semantic decontamination — the EMBEDDING analogue of the n-gram
    * eval-set decontamination (q65): drop every training vector whose
    * cosine to ANY eval vector reaches `tau`. Lexical decontamination
    * misses paraphrases; an embedding-space screen catches a reworded
    * eval item that shares no 8-gram with its source. Returns the
    * surviving training rows.
    *
    * Scale shape mirrors q65 exactly: the eval set is SMALL by nature
    * and broadcasts; scoring is a map-side broadcast nested-loop over
    * the training corpus (|train|·|eval| dot products, codegen'd
    * ArrayDot) followed by one id-keyed anti-join of flagged ids — the
    * training corpus never shuffles by anything but its own id. For an
    * eval set too big to broadcast, pre-bucket both sides with
    * [[graft.operators.Dedup.cosinePairsLsh]]'s banding instead.
    */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
                            tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    val t = train.select(col("vec_id"), asDouble(col("embedding")).as("tv"))
    val e = broadcast(evalSet.select(asDouble(col("embedding")).as("ev")))
    val flagged = t.crossJoin(e)
      .filter(guardedCosine(col("tv"), col("ev")) >= tau)
      .select(col("vec_id")).distinct()
    train.join(flagged, Seq("vec_id"), "left_anti")
  }

  /** Zero-norm-guarded pair cosine for the screening operators: a zero
    * vector has no direction — score −2.0 (below any threshold) instead
    * of NaN. Unguarded NaN is catastrophic here: Spark orders NaN above
    * everything, so `NaN >= tau` is TRUE and one all-zeros eval vector
    * would silently flag the ENTIRE training corpus ([[graft.operators
    * .Dedup]]'s safeCosine precedent, applied to this family).
    */
  private def guardedCosine(a: Column, b: Column): Column =
    when(norm(a) === 0.0 || norm(b) === 0.0, lit(-2.0))
      .otherwise(cosine(a, b))

  /** Serve tier of [[semanticDecontaminate]]: the eval vectors ride the
    * plan as ONE ARRAY LITERAL and the screen becomes a pure projection
    * (`exists(evalLit, e → cos(v,e) ≥ tau)` — zero joins, zero state,
    * zero shuffle), so the SAME call runs UNCHANGED on a streaming
    * ingest frame (the ImportanceModel / OutlierModel literal-serving
    * pattern; parity gated in StreamingCurationSuite). Use when the
    * eval set is literal-sized (≤ a few thousand vectors); the batch
    * tier's broadcast join covers the rest.
    */
  def semanticDecontaminateServe(train: DataFrame,
                                 evalVectors: Seq[Seq[Double]],
                                 tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0,1], got $tau")
    require(evalVectors.nonEmpty, "semanticDecontaminateServe: empty eval set")
    val evalLit = typedlit(evalVectors)
    val v = asDouble(col("embedding"))
    train.filter(!exists(evalLit,
      e => guardedCosine(v, e) >= lit(tau)))
  }

  /** Hard-negative mining for contrastive training: per anchor, the
    * `k` highest-cosine candidates BELOW `maxCos` — similar enough to
    * be informative negatives, dissimilar enough not to be latent
    * positives/duplicates (the near-dup band a naive top-k would
    * surface is excluded; same anchor excluded by id). The standard
    * pair-construction step for embedding-model training.
    *
    * Exact formulation (this is the oracle tier, |anchors| broadcast):
    * for corpus-scale anchor sets run the same band filter over an ANN
    * shortlist ([[ivfPqTopK]] with k ≫ target, then filter) — recall
    * bounded by the ANN recall the AnnRecallSuite gates.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    maxCos: Double): DataFrame = {
    require(k > 0, s"top-k must be positive, got $k")
    require(maxCos > -1.0 && maxCos <= 1.0, s"maxCos must be in (-1,1], got $maxCos")
    val q = broadcast(anchors.select(col("vec_id").as("qid"),
      asDouble(col("embedding")).as("qv")))
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      // guarded: a zero anchor/candidate scores -2.0 (surfaces last /
      // never) instead of NaN, which Spark orders ABOVE every real cosine
      .withColumn("cos", guardedCosine(col("qv"), col("cv")))
      // the -2.0 zero-vector sentinel is excluded entirely: a direction-
      // less vector is not an informative negative at any rank
      .filter(col("cos") < maxCos && col("cos") >= -1.0)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF (inverted-file) ANN: k-means the corpus into `nClusters` cells,
    * search only the `nProbe` cells nearest each query. The coarse
    * quantizer is trained with Lloyd iterations expressed as DataFrame
    * ops (assign = broadcast-centroid argmin map-side; update =
    * explode-to-(cluster, dim) mean — one shuffle of K×dim rows); the
    * centroid table (K×dim doubles) collects to the driver like any
    * fitted model and broadcasts back.
    *
    * At scale this is the standard ANN architecture: the corpus
    * partitions by cell id, a query touches nProbe/nClusters of the data,
    * and the exact re-rank runs only inside probed cells.
    */
  /** Centroids as a broadcastable DataFrame, NOT a literal expression
    * tree — K×dim lit() nodes made every Lloyd iteration recompile a
    * 1000-node plan (measured 48 s at sf0.1; ~3 s this way). Used only for
    * the per-query top-nProbe ranking; assign uses the codegen'd argmin.
    */
  private[operators] def centroidDf(spark: SparkSession,
                         cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cents.toSeq.map { case (cid, v) => (cid, v.toSeq) }.toDF("cid", "cvec")
  }

  /** Map-side argmin over the fitted centroid matrix: a single projection,
    * zero shuffle (the old crossJoin+groupBy-on-full-row shuffled
    * |corpus|×K rows carrying the vector, once per Lloyd iteration).
    */
  private[operators] def assign(df: DataFrame, cents: Array[(Int, Array[Double])],
                     vecCol: String, as: String = "cid"): DataFrame = {
    val matrix = cents.sortBy(_._1).map(_._2)
    df.withColumn(as,
      graft.functions.VectorFunctions.nearest_centroid(col(vecCol), matrix))
  }

  /** Map-side-combining vector mean (see [[graft.functions.VecMeanAggregator]]):
    * the centroid-update shuffle carries `partitions × K` array rows,
    * independent of corpus size. */
  private lazy val vecMean = udaf(new graft.functions.VecMeanAggregator,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())

  /** Lloyd k-means over `vecCol`, deterministic init (the k lowest
    * `idCol` rows). Assign is the codegen'd map-side argmin (zero
    * shuffle); update is ONE partial-aggregated shuffle of ≤ partitions×K
    * (sum, count) buffers per iteration ([[vecMean]] — the old
    * posexplode/avg/re-assemble formulation shuffled N×dim scalar rows
    * twice per iteration); the fitted K×dim model collects to the driver.
    * Shared by IVF and IVF-PQ.
    */
  private[operators] def fitCentroids(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int): Array[(Int, Array[Double])] = {
    var centroids: Array[(Int, Array[Double])] =
      df.select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(k).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    (1 to iters).foreach { _ =>
      val updated = assign(df, centroids, vecCol, "__cid")
        .groupBy(col("__cid").as("cid"))
        .agg(vecMean(col(vecCol)).as("cvec"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      // empty clusters keep their previous centroid
      val byId = updated.toMap
      centroids = centroids.map { case (cid, v) => (cid, byId.getOrElse(cid, v)) }
    }
    centroids
  }

  /** Fit all `numSub` PQ codebooks in ONE Lloyd loop. Per iteration a
    * single projection computes every subspace's argmin code (numSub
    * codegen'd nearest_centroid calls side by side), then one
    * partial-aggregated shuffle over (subspace, code) groups updates every
    * codebook at once ([[vecMean]] again: ≤ partitions × numSub × k
    * buffer rows, never N×numSub×subDim scalars). The per-subspace
    * alternative (fitCentroids × numSub) runs numSub seeding sorts plus
    * numSub×iters update passes over the residuals — at 100 TB that's
    * numSub full scans per iteration where this does one. Seeding and
    * per-subspace means are identical to the per-subspace formulation
    * (subspaces never interact), so the fitted codebooks match.
    */
  private[operators] def fitSubCodebooks(withRes: DataFrame, numSub: Int, subDim: Int,
                              k: Int, iters: Int): Array[Array[Array[Double]]] = {
    // deterministic seed: the k lowest-id residuals, sliced into every subspace
    val seedRows = withRes.select(col("nid"), col("r"))
      .orderBy(col("nid")).limit(k).collect()
    var books: Array[Array[Array[Double]]] = (0 until numSub).map { m =>
      seedRows.map(r => r.getSeq[Double](1).slice(m * subDim, (m + 1) * subDim).toArray)
    }.toArray
    (1 to iters).foreach { _ =>
      val updated = withRes.select(posexplode(array((0 until numSub).map(m =>
          struct(lit(m).as("m"),
            graft.functions.VectorFunctions.nearest_centroid(
              slice(col("r"), m * subDim + 1, subDim), books(m)).as("code"),
            slice(col("r"), m * subDim + 1, subDim).as("sv"))): _*)).as(Seq("__i", "e")))
        .groupBy(col("e.m").as("m"), col("e.code").as("code"))
        .agg(vecMean(col("e.sv")).as("cvec"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray)).toMap
      // empty codes keep their previous entry
      books = books.zipWithIndex.map { case (book, m) =>
        book.zipWithIndex.map { case (v, code) => updated.getOrElse((m, code), v) }
      }
    }
    books
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nClusters: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    // cached: the Lloyd loop takes `iters` passes plus one for the final
    // index — without this every pass re-reads (and re-casts) the parquet
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val centroids = fitCentroids(c, "nid", "cv", nClusters, iters)
    // training done (centroids are driver-side); drop the cache NOW rather
    // than leak one cached plan per invocation for the session's lifetime.
    // The final index/re-rank below is a single pass, so recomputing the
    // scan+cast once costs less than an unbounded cache.
    c.unpersist(blocking = false)

    // index: corpus tagged with its cell
    val indexed = assign(c, centroids, "cv")
    // probe: nProbe nearest cells per query
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val probes = q.crossJoin(broadcast(centroidDf(spark, centroids)))
      .withColumn("d2",
        dot(col("qv"), col("cvec")) * lit(-2.0) + dot(col("cvec"), col("cvec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rnk") <= nProbe)
      .select(col("qid"), col("qv"), col("cid"))
    // exact re-rank inside probed cells only
    val scored = broadcast(probes).join(indexed, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** K-means clustering as an END PRODUCT (not just the IVF training
    * step): cluster assignments rolled up to per-cluster size, inertia,
    * and a deterministic exemplar — the corpus-structure audit
    * (domain/topic balance, mode collapse in synthetic data) and the
    * input to cluster-balanced sampling.
    *
    * Determinism: init = the k lowest-id vectors, assignment =
    * codegen'd argmin with index tie-break, and the inertia rollup
    * routes through DECIMAL(25,10) — exact given the assignments. The
    * Lloyd mean itself is a float sum whose partition order can drift
    * centroids by ulps; that flips an argmin only for points essentially
    * equidistant to two centroids, so in practice the clustering is
    * stable under repartitioning (suite-gated on the test corpus) but
    * that is a property of the data margin, not a bit-level guarantee.
    *
    * Scale design: the Lloyd loop is [[fitCentroids]] — map-side argmin
    * assign (zero shuffle), one partitions×K-buffer mean shuffle per
    * iteration, K×dim model on the driver; the final pass joins the
    * broadcast centroid table back only to compute distances. The
    * per-cluster rollup is one partial-aggregated exchange of K rows.
    */
  def kmeansClusters(embeddings: DataFrame, k: Int = 8,
                     iters: Int = 5): DataFrame = {
    require(k >= 1 && iters >= 1,
      s"kmeansClusters: need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val spark = embeddings.sparkSession
    val c = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = fitCentroids(c, "vec_id", "v", k, iters)
    c.unpersist(blocking = false) // same trade as ivfTopK: final pass recomputes once
    val d2 = aggregate(
      zip_with(col("v"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    assign(c, cents, "v", "cid")
      .join(broadcast(centroidDf(spark, cents)), Seq("cid"))
      .select(col("cid"), col("vec_id"), d2.as("d2"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("d2").cast("decimal(25,10)")).cast("double"), 6).as("inertia"),
        min(col("vec_id")).as("exemplar_vec_id"))
  }

  /** IVF-PQ: the standard billion-scale ANN architecture (inverted file +
    * product quantization). On top of [[ivfTopK]]'s coarse quantizer, each
    * vector's RESIDUAL (v − centroid) is split into `numSub` subspaces,
    * each quantized against its own `codebookK`-entry codebook, so a
    * d-dim float vector compresses to `numSub` small ints — at 100 TB the
    * index fits in memory where raw vectors never could, and candidate
    * scoring touches no vector math at all:
    *
    *  1. probes: nProbe nearest cells per query (as IVF),
    *  2. per (query, cell): one ADC lookup table (codegen'd
    *     `pq_dist_table` over the query residual),
    *  3. per candidate: approx distance = `numSub` array lookups
    *     (codegen'd `pq_adc_score` — the hot path),
    *  4. top-`shortlist` by approx distance, then EXACT cosine re-rank of
    *     the shortlist only (vectors rejoined by id — the only place full
    *     vectors travel).
    *
    * All training runs as DataFrame Lloyd iterations ([[fitCentroids]]);
    * only K×dim fitted models ever collect to the driver.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nClusters: Int = 16, nProbe: Int = 4, iters: Int = 3,
                numSub: Int = 8, codebookK: Int = 16, subIters: Int = 2,
                shortlist: Int = 50): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // coarse quantizer (shared shape with ivfTopK)
    val coarse = fitCentroids(c, "nid", "cv", nClusters, iters)
    val dim = coarse(0)._2.length
    require(dim % numSub == 0, s"dim $dim not divisible into $numSub subspaces")
    val subDim = dim / numSub

    // residuals r = v − coarse[cid]: the quantity PQ actually encodes
    // (residuals cluster far tighter than raw vectors). One zip_with per
    // row during one-time training/encode — off the per-candidate hot path.
    val withRes = assign(c, coarse, "cv")
      .join(broadcast(centroidDf(spark, coarse)), "cid")
      .withColumn("r", zip_with(col("cv"), col("cvec"), (a, b) => a - b))
      .select(col("nid"), col("cid"), col("cv"), col("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // all numSub codebooks fit jointly — one residual pass per iteration
    val codebooks: Array[Array[Array[Double]]] =
      fitSubCodebooks(withRes, numSub, subDim, codebookK, subIters)
    // fitCentroids seeds from limit(codebookK): a corpus smaller than
    // codebookK yields fewer centroids. The ADC table strides by the
    // FITTED size (PqDistTable uses codebooks(0).length), so scoring must
    // index with the same k or distances land in the wrong subspace row.
    val fittedK = codebooks(0).length

    // encode: numSub codegen'd argmins over residual slices → tiny codes
    val encoded = withRes.withColumn("codes",
        array((0 until numSub).map(m =>
          graft.functions.VectorFunctions.nearest_centroid(
            slice(col("r"), m * subDim + 1, subDim), codebooks(m))): _*))
      .select(col("nid"), col("cid"), col("codes"))

    val result = pqSearch(coarse, codebooks, encoded,
      withRes.select(col("nid"), col("cv")), queries, k, nProbe, shortlist)

    withRes.unpersist(blocking = false)
    c.unpersist(blocking = false)
    result
  }

  /** The IVF-PQ QUERY half, shared by [[ivfPqTopK]] (fit-and-search) and
    * [[AnnIndex.search]] (search against a persisted index): probes →
    * per-(query, cell) ADC table → approx shortlist → exact re-rank
    * against `vectorsById` (nid, cv). One code path, so an index searched
    * from disk returns EXACTLY what the inline fit would.
    */
  private[operators] def pqSearch(coarse: Array[(Int, Array[Double])],
                                  codebooks: Array[Array[Array[Double]]],
                                  encoded: DataFrame, vectorsById: DataFrame,
                                  queries: DataFrame, k: Int, nProbe: Int,
                                  shortlist: Int): DataFrame = {
    val spark = queries.sparkSession
    val fittedK = codebooks(0).length
    // probes + per-(query, cell) ADC table from the QUERY residual
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val probes = q.crossJoin(broadcast(centroidDf(spark, coarse)))
      .withColumn("d2",
        dot(col("qv"), col("cvec")) * lit(-2.0) + dot(col("cvec"), col("cvec")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("rnk") <= nProbe)
      .withColumn("qr", zip_with(col("qv"), col("cvec"), (a, b) => a - b))
      .withColumn("adc",
        graft.functions.VectorFunctions.pq_dist_table(col("qr"), codebooks))
      .select(col("qid"), col("qv"), col("cid"), col("adc"))

    // approx scoring: numSub array lookups per candidate, zero vector math
    val approx = broadcast(probes).join(encoded, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("approx",
        graft.functions.VectorFunctions.pq_adc_score(col("adc"), col("codes"), fittedK))
      .withColumn("srnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("approx").asc, col("nid").asc)))
      .filter(col("srnk") <= shortlist)
      .select(col("qid"), col("qv"), col("nid"))

    // exact re-rank of the shortlist only — the single place full corpus
    // vectors travel, |Q|·shortlist rows
    approx
      .join(vectorsById, "nid")
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  // -------------------------------------------------------------------
  // SQ8: int8 scalar quantization

  /** Int8 scalar quantization: each vector stored as `array<tinyint>` plus
    * one per-vector `double` scale — a 4× index compression (float32 →
    * int8) with reconstruction error ≤ scale/2 per component. The simple,
    * robust sibling of PQ: no training pass at all, decode is one
    * multiply, and at 100 TB it is frequently the difference between an
    * in-memory ANN index and a disk-bound one.
    *
    * Encode runs ONCE over the corpus (HOF `transform` is fine off the
    * per-candidate hot path); zero-vectors get scale 0 and all-zero codes.
    */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val maxAbs = greatest(array_max(v), -array_min(v))
    val qscale = (maxAbs / lit(127.0)).as("qscale")
    df.select(col(idCol), v.as("__v"), qscale)
      .withColumn("qv", when(col("qscale") === 0.0,
          transform(col("__v"), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col("__v"),
          x => round(x / col("qscale")).cast("tinyint"))))
      .select(col(idCol), col("qv"), col("qscale"))
  }

  /** ANN over the SQ8-compressed corpus: asymmetric scoring (full-precision
    * query against dequantized candidates — dot(q, c̃)·scale_c via the
    * codegen'd ArrayDot), top-`shortlist` approx candidates per query, then
    * EXACT cosine re-rank of the shortlist only. Full-precision corpus
    * vectors travel solely in the |Q|·shortlist re-rank join — the scan
    * side of the scoring pass touches nothing but int8 codes + one scale.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              shortlist: Int = 50): DataFrame = {
    val enc = quantizeInt8(corpus)
      .select(col("vec_id").as("nid"), col("qv"), col("qscale"))
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      asDouble(col("embedding")).as("qv_full")))
    // dequantized candidate norm: ‖c̃‖·scale; approx cos needs no corpus
    // vector math beyond one int8→double dot per (query, candidate)
    val dq = dot(col("qv_full"), col("qv").cast("array<double>")) * col("qscale")
    val cnorm = norm(col("qv").cast("array<double>")) * col("qscale")
    // the shortlist shuffle carries ONLY (qid, nid, acos): projecting the
    // query vector through the per-qid window would duplicate dim doubles
    // onto every scored row of the |C|×|Q| exchange; it rejoins from the
    // broadcast query table after the cut instead
    val approx = enc.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      // zero-norm on EITHER side has no defined cosine — rank last
      .withColumn("acos",
        when(col("qscale") === 0.0 || norm(col("qv_full")) === 0.0, lit(-2.0))
        .otherwise(dq / (norm(col("qv_full")) * cnorm)))
      .select(col("qid"), col("nid"), col("acos"))
      .withColumn("srnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("nid").asc)))
      .filter(col("srnk") <= shortlist)
      .select(col("qid"), col("nid"))
    val full = corpus.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
    approx.join(full, "nid")
      .join(q, "qid")
      // zero-norm on EITHER side again: rank last instead of tripping
      // ANSI divide-by-zero in the exact re-rank
      .withColumn("cos",
        when(norm(col("cv")) === 0.0 || norm(col("qv_full")) === 0.0, lit(-2.0))
        .otherwise(cosine(col("qv_full"), col("cv"))))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding outliers by anchor distance: within each block (label),
    * the anchor is the lowest-id vector; every other vector scores its
    * cosine to that anchor and rows under `threshold` are flagged — the
    * garbage-embedding screen of an ingest pipeline (truncated docs,
    * encoder failures, wrong-modality rows land far from everything).
    *
    * The anchor — rather than the centroid — makes the score a pure
    * per-row pairwise computation (deterministic array-order fold, so an
    * exact cross-engine oracle holds); a centroid is a cross-row float
    * sum whose value depends on partition order. For a drift-robust
    * production screen, swap the anchor for a fitted centroid
    * ([[graft.functions.VecMeanAggregator]]) and keep the identical plan
    * shape.
    *
    * Shape: anchor ids are a per-block `min` (map-side-combined shuffle
    * of block ids only); anchor VECTORS are fetched by an id equi-join
    * and broadcast back (one row per block), so the corpus itself never
    * shuffles — the scoring pass is a map over the scan.
    */
  def anchorOutliers(embeddings: DataFrame, threshold: Double,
                     blockCol: String = "label"): DataFrame = {
    val v = embeddings.select(col("vec_id"), col(blockCol).as("blk"),
      asDouble(col("embedding")).as("v"))
    val anchorIds = v.groupBy(col("blk")).agg(min(col("vec_id")).as("aid"))
    // anchors/v share lineage (two self-joins) — alias-qualify throughout
    val anchors = v.as("s").join(broadcast(anchorIds.as("i")),
        col("s.vec_id") === col("i.aid"))
      .select(col("i.blk").as("ablk"), col("i.aid").as("aid"), col("s.v").as("av"))
    // zero-norm on either side: a zero embedding IS a broken row — score
    // it −2.0 (below any real cosine) so it always flags as an outlier
    // instead of tripping ANSI divide-by-zero mid-query (same sentinel
    // as the top-k re-rank paths)
    v.as("x").join(broadcast(anchors), col("x.blk") === col("ablk"))
      .filter(col("x.vec_id") =!= col("aid"))
      .withColumn("cos",
        when(norm(col("x.v")) === 0.0 || norm(col("av")) === 0.0, lit(-2.0))
          .otherwise(cosine(col("x.v"), col("av"))))
      .filter(col("cos") < threshold)
      .select(col("x.vec_id").as("vec_id"), col("x.blk").as(blockCol),
        round(col("cos"), 6).as("cos_anchor"))
  }

  /** Embedding snapshot drift — the vector-store twin of
    * [[graft.operators.Pipeline.corpusDiff]] (q107): before re-serving
    * an ANN index or retraining on "the same" embeddings, classify every
    * vector as added / removed / changed / unchanged between two
    * snapshots and roll the counts up per label. "Changed" compares an
    * md5 digest of the integer MICRO-UNIT rendering of the vector
    * (`round(x·1e6)` per dim, comma-joined) — float-exact drift would
    * false-positive on encode jitter below 1e-6, and a raw float compare
    * isn't portable across engines; the micro digest is both.
    *
    * Scale shape: ONE full-outer join on `vec_id` carrying
    * (id, label, 16-byte digest) — the vectors themselves never ride the
    * join (q107's digest posture); then one |labels|-row rollup.
    */
  def embeddingDrift(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    def digested(df: DataFrame, side: String): DataFrame =
      df.select(col("vec_id"), col("label").as(s"${side}_label"),
        md5(concat_ws(",", transform(asDouble(col("embedding")),
          x => round(x * lit(1e6)).cast("long").cast("string"))))
          .as(s"${side}_dig"))
    digested(oldSnap, "o")
      .join(digested(newSnap, "n"), Seq("vec_id"), "full_outer")
      .select(coalesce(col("n_label"), col("o_label")).as("label"),
        when(col("o_dig").isNull, "added")
          .when(col("n_dig").isNull, "removed")
          .when(col("o_dig") =!= col("n_dig"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy(col("label"))
      .agg(sum(when(col("change") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("change") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("change") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("change") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
  }

  /** Per-label quantiles of embedding NORMS — the encoder-health check a
    * vector pipeline runs nightly (a collapsed or exploding norm
    * distribution flags a broken encoder or an un-normalized snapshot
    * long before recall metrics move). Norms enter the q109 µ-unit
    * discipline — `norm²_micro = Σ round(x·10⁶)²`, exact integer on any
    * engine — then the q158 bounded-bucket CDF walk
    * ([[HistogramSketch.valueQuantiles]]), so the whole report
    * hash-gates including the quantile estimates.
    *
    * Scale shape: one map-side projection per vector (µ-quantize +
    * square-sum fold — no shuffle), then bucket counts; every later
    * operator runs over ≤1920-row-per-label bucket tables. */
  def normQuantiles(emb: DataFrame, labelCol: String = "label",
                    vecCol: String = "embedding", subBits: Int = 5,
                    pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    // Envelope guard: |q| ≤ 10⁸ (|x| ≤ 100) keeps Σq² inside long for
    // any dim ≤ 900 — and an encoder broken past that envelope is
    // exactly what this report must surface, not die on (ANSI) or
    // silently drop (non-ANSI wrap → null bucket). The named
    // raise_error is the joinKeySkewReport envelope discipline.
    val rows = emb.select(col(labelCol),
        transform(asDouble(col(vecCol)),
          x => round(x * lit(1e6)).cast("long")).as("__q"))
      .select(col(labelCol),
        when(exists(col("__q"), q => abs(q) > lit(100000000L)),
          expr("raise_error('normQuantiles: a coordinate exceeds the " +
            "|x| <= 100 envelope - the sum-of-squares fold would " +
            "overflow long')").cast("long"))
          .otherwise(
            aggregate(col("__q"), lit(0L), (acc, q) => acc + q * q))
          .as("__n2"))
    HistogramSketch.valueQuantiles(rows, labelCol, col("__n2"), subBits,
      pcts, nName = "n_vecs")
  }

  val specs: Seq[QuerySpec] = Seq(

    // Embedding-norm distribution per label (r12): the encoder-health
    // twin of the length quantiles — integer µ-norms through the
    // bounded-bucket CDF walk, every number (estimates included)
    // hash-gated against the SQL replay. The corpus is unit-normalized
    // (healthy = ONE bucket per label), so the fixture injects the
    // q126-style anomaly the check exists to catch: every 3rd vector
    // halved, every 7th doubled (float ×0.5/×2 is exact) — the report
    // must surface them as distinct buckets and a spread p50/p99.
    QuerySpec(
      "q165_norm_quantiles",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val broken = emb.withColumn("embedding",
          when(col("vec_id") % 3 === 0,
            transform(asDouble(col("embedding")), x => x * lit(0.5)))
          .when(col("vec_id") % 7 === 0,
            transform(asDouble(col("embedding")), x => x * lit(2.0)))
          .otherwise(asDouble(col("embedding"))))
        normQuantiles(broken).orderBy(col("label"))
      },
      Some("""
        WITH q AS (
          SELECT label,
                 list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(
                     (CASE WHEN vec_id % 3 = 0 THEN x * 0.5
                           WHEN vec_id % 7 = 0 THEN x * 2.0
                           ELSE x END) * 1e6) AS BIGINT)) AS qv
          FROM embeddings),
        n AS (
          SELECT label,
                 CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS v
          FROM q),
        b AS (
          SELECT label,
                 (v >> greatest(0, length(bin(v)) - 1 - 5))
                   << greatest(0, length(bin(v)) - 1 - 5) AS rep
          FROM n),
        g AS (SELECT label, rep, COUNT(*) AS cnt FROM b GROUP BY label, rep),
        c AS (
          SELECT label, rep,
                 SUM(cnt) OVER (PARTITION BY label ORDER BY rep) AS cum,
                 SUM(cnt) OVER (PARTITION BY label) AS nn
          FROM g)
        SELECT label,
               CAST(MAX(nn) AS BIGINT) AS n_vecs,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MIN(CASE WHEN cum >= (nn * 50 + 99) // 100 THEN rep END) AS BIGINT) AS p50,
               CAST(MIN(CASE WHEN cum >= (nn * 90 + 99) // 100 THEN rep END) AS BIGINT) AS p90,
               CAST(MIN(CASE WHEN cum >= (nn * 99 + 99) // 100 THEN rep END) AS BIGINT) AS p99
        FROM c GROUP BY label ORDER BY label""")),

    QuerySpec(
      "q40_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      specsOracleTopK),

    // Semantic decontamination: eval = vec_id < 20, tau matches the q46
    // near-dup threshold so drops are non-vacuous on this corpus.
    QuerySpec(
      "q131_semantic_decontaminate",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        semanticDecontaminate(emb.filter(col("vec_id") >= 20),
            emb.filter(col("vec_id") < 20), tau = 0.35)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy(col("label"))
      },
      Some("""
        WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        t AS (SELECT * FROM c WHERE vec_id >= 20),
        e AS (SELECT v AS ev FROM c WHERE vec_id < 20),
        flagged AS (
          SELECT DISTINCT t.vec_id
          FROM t CROSS JOIN e
          WHERE list_reduce(list_prepend(0.0,
                  list_transform(list_zip(t.v, e.ev), p -> p[1] * p[2])),
                  (a, b) -> a + b)
                / (sqrt(list_reduce(list_prepend(0.0,
                     list_transform(list_zip(t.v, t.v), p -> p[1] * p[2])), (a,b) -> a+b))
                 * sqrt(list_reduce(list_prepend(0.0,
                     list_transform(list_zip(e.ev, e.ev), p -> p[1] * p[2])), (a,b) -> a+b)))
                >= 0.35)
        SELECT label, COUNT(*) AS n_kept
        FROM t ANTI JOIN flagged USING (vec_id)
        GROUP BY label ORDER BY label""")),

    // Hard negatives: per anchor, top-5 by cosine BELOW the 0.5
    // latent-positive band — q40's algebra plus the band filter.
    QuerySpec(
      "q132_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        hardNegatives(emb, emb.filter(col("vec_id") < 5), k = 5, maxCos = 0.5)
          .orderBy(col("qid"), col("rnk"))
      },
      Some("""
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id < 5),
             scored AS (
               SELECT q.qid, c.vec_id AS nid,
                      list_reduce(list_prepend(0.0,
                        list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2])),
                        (a, b) -> a + b)
                      / (sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(q.qv, q.qv), p -> p[1] * p[2])), (a,b) -> a+b))
                       * sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(c.v, c.v), p -> p[1] * p[2])), (a,b) -> a+b)))
                        AS cos
               FROM c CROSS JOIN q
               WHERE c.vec_id <> q.qid)
        SELECT qid, rnk, nid, round(cos, 6) AS cos_sim FROM (
          SELECT qid, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
          FROM scored WHERE cos < 0.5)
        WHERE rnk <= 5
        ORDER BY qid, rnk""")),

    // LSH path: recall < 1 by design → rows-only check; judged on plan shape.
    QuerySpec(
      "q41_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        lshTopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // JL random projection in integer micro-units — bit-exact oracle,
    // including the md5-parity sign matrix recomputed from SQL.
    QuerySpec(
      "q109_random_projection",
      (s, d) => randomProjectMicro(Tables.embeddings(s, d), 64, 16)
        .select(col("vec_id"),
          posexplode(col("proj_micro")).as(Seq("dim", "proj_micro")))
        .select(col("vec_id"), col("dim").cast("bigint").as("dim"),
          col("proj_micro"))
        .orderBy(col("vec_id"), col("dim")),
      Some("""
        WITH q AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x * 1e6) AS BIGINT)) AS qv
          FROM embeddings),
        e AS (SELECT vec_id, unnest(qv) AS qval, unnest(range(len(qv))) AS i FROM q),
        d AS (SELECT i.range AS i, j.range AS j,
                     CASE WHEN ('0x' || substr(md5(i.range || ',' || j.range), 1, 8))::BIGINT % 2 = 0
                          THEN 1 ELSE -1 END AS s
              FROM range(0, 64) i CROSS JOIN range(0, 16) j),
        p AS (SELECT e.vec_id, d.j AS dim, SUM(d.s * e.qval) AS pm
              FROM e JOIN d USING (i) GROUP BY 1, 2)
        SELECT vec_id, CAST(dim AS BIGINT) AS dim, CAST(pm AS BIGINT) AS proj_micro
        FROM p ORDER BY vec_id, dim""")),

    // Embedding snapshot drift: "old" drops every 7th vector (→ added),
    // "new" drops every 11th (→ removed) and NEGATES every 5th (float
    // negation is exact, so the micro digest flips deterministically →
    // changed). The oracle rebuilds both digests and the same
    // full-outer classification.
    QuerySpec(
      "q126_embedding_drift",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val oldSnap = emb.filter(col("vec_id") % 7 =!= 0)
        val newSnap = emb.filter(col("vec_id") % 11 =!= 0)
          .withColumn("embedding",
            when(col("vec_id") % 5 === 0,
              transform(asDouble(col("embedding")), x => -x))
            .otherwise(asDouble(col("embedding"))))
        embeddingDrift(oldSnap, newSnap).orderBy(col("label"))
      },
      Some("""
        WITH base AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        o AS (
          SELECT vec_id, label,
                 md5(array_to_string(list_transform(v,
                   x -> CAST(round(x*1e6) AS BIGINT)), ',')) AS dig
          FROM base WHERE vec_id % 7 <> 0),
        n AS (
          SELECT vec_id, label,
                 md5(array_to_string(list_transform(
                   CASE WHEN vec_id % 5 = 0
                        THEN list_transform(v, x -> -x) ELSE v END,
                   x -> CAST(round(x*1e6) AS BIGINT)), ',')) AS dig
          FROM base WHERE vec_id % 11 <> 0),
        j AS (
          SELECT COALESCE(n.label, o.label) AS label,
                 CASE WHEN o.dig IS NULL THEN 'added'
                      WHEN n.dig IS NULL THEN 'removed'
                      WHEN o.dig <> n.dig THEN 'changed'
                      ELSE 'unchanged' END AS change
          FROM o FULL OUTER JOIN n USING (vec_id))
        SELECT label,
               CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN change = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN change = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        FROM j GROUP BY label ORDER BY label""")),

    // Reduced-space ANN over the projection (recall < 1 → rows-only;
    // recall gated in AnnRecallSuite).
    QuerySpec(
      "q111_ann_rp",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        rpTopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // IVF path: k-means cells + nProbe probing (recall < 1 → rows-only).
    QuerySpec(
      "q44_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        ivfTopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // K-means corpus clustering as an end product. No SQL oracle —
    // iterative training isn't expressible in one DuckDB query — but the
    // output is deterministic (fixed init, tie-broken argmin, decimal
    // inertia sums); KmeansClustersSuite gates separation, determinism
    // under repartitioning, and totals.
    QuerySpec(
      "q106_kmeans_clusters",
      (s, d) => kmeansClusters(Tables.embeddings(s, d), k = 8, iters = 5)
        .orderBy(col("cid")),
      None),

    // IVF-PQ: compressed-index ANN (codes instead of vectors in the
    // candidate path) + exact shortlist re-rank. Approximate by design →
    // rows-only; recall gated in AnnRecallSuite.
    QuerySpec(
      "q48_ann_ivfpq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        ivfPqTopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // Persisted IVF-PQ index: build to parquet, search from the
    // artifacts — the nightly-build / online-probe split. Search is the
    // same code path as q48 (Similarity.pqSearch) and AnnIndexSuite
    // gates build→search ≡ inline bit-for-bit, so the spec's value is
    // the END-TO-END persistence round-trip under the driver harness.
    // The build is memoized per (sf-dir) per JVM: the benched/verified
    // path is SEARCH against persisted artifacts (the serve side of the
    // split); the build runs once, in the warmup pass.
    // Approximate by design → rows-only, like its q48 sibling.
    QuerySpec(
      "q102_ann_index_persist",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val dir = AnnIndex.cachedBuild(emb, d)
        AnnIndex.search(emb, dir, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // SQ8: int8-compressed scoring pass + exact shortlist re-rank.
    // Shortlist re-rank makes the top-k usually exact, but the guarantee
    // is approximate → rows-only; recall + error bound gated in
    // AnnRecallSuite / Sq8QuantizationSuite.
    QuerySpec(
      "q57_ann_sq8",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        sq8TopK(emb, emb.filter(col("vec_id") < 5), 5)
          .orderBy(col("qid"), col("rnk"))
      },
      None),

    // same exact top-k via the typed Aggregator (map-side partial top-k:
    // the shuffle carries partitions×k rows, not all |Q|·|C| scored pairs)
    QuerySpec(
      "q43_topk_aggregator",
      (s, d) => {
        import org.apache.spark.sql.functions.udaf
        val topk = udaf(new graft.functions.TopKAggregator(5))
        val emb = Tables.embeddings(s, d)
        val q = broadcast(emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv")))
        val c = emb.select(col("vec_id").as("nid"), asDouble(col("embedding")).as("cv"))
        c.crossJoin(q)
          .filter(col("qid") =!= col("nid"))
          .select(col("qid"), cosine(col("qv"), col("cv")).as("cos"), col("nid"))
          .groupBy(col("qid"))
          .agg(topk(col("cos"), col("nid")).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("idx", "entry")))
          .select(col("qid"), (col("idx") + 1).as("rnk"),
            col("entry._2").as("nid"), round(col("entry._1"), 6).as("cos_sim"))
          .orderBy(col("qid"), col("rnk"))
      },
      // identical semantics to q40 → same oracle
      specsOracleTopK),

    // label-constrained search: pre-filter + exact top-k (hybrid search shape)
    QuerySpec(
      "q42_filtered_search",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        bruteForceTopK(emb.filter(col("label") === 3), emb.filter(col("vec_id") < 3), 3)
          .orderBy(col("qid"), col("rnk"))
      },
      Some("""
        WITH all_v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             c AS (SELECT vec_id, v FROM all_v WHERE label = 3),
             q AS (SELECT vec_id AS qid, v AS qv FROM all_v WHERE vec_id < 3),
             scored AS (
               SELECT q.qid, c.vec_id AS nid,
                      list_reduce(list_prepend(0.0,
                        list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2])),
                        (a, b) -> a + b)
                      / (sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(q.qv, q.qv), p -> p[1] * p[2])), (a,b) -> a+b))
                       * sqrt(list_reduce(list_prepend(0.0,
                           list_transform(list_zip(c.v, c.v), p -> p[1] * p[2])), (a,b) -> a+b)))
                        AS cos
               FROM c CROSS JOIN q
               WHERE c.vec_id <> q.qid)
        SELECT qid, rnk, nid, round(cos, 6) AS cos_sim FROM (
          SELECT qid, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
          FROM scored)
        WHERE rnk <= 3
        ORDER BY qid, rnk""")),

    // Anchor-distance outlier screen. τ = −0.15 flags ~10% of vectors at
    // sf0.01 (anchor-cosine spans [−0.35, 0.33] on this corpus), so the
    // filter does real work. Per-row pairwise cosine → bit-identical
    // doubles cross-engine (q45 pattern), rounded to 6dp on output.
    QuerySpec(
      "q80_anchor_outliers",
      (s, d) => anchorOutliers(Tables.embeddings(s, d), threshold = -0.15)
        .orderBy(col("vec_id")),
      Some("""
        WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        anchors AS (SELECT label, MIN(vec_id) AS aid FROM c GROUP BY label),
        av AS (SELECT an.label, an.aid, c.v AS av
               FROM anchors an JOIN c ON c.vec_id = an.aid),
        scored AS (
          SELECT c.vec_id, c.label,
                 list_reduce(list_prepend(0.0,
                   list_transform(list_zip(c.v, av.av), p -> p[1] * p[2])), (x, y) -> x + y)
                 / (sqrt(list_reduce(list_prepend(0.0,
                      list_transform(list_zip(c.v, c.v), p -> p[1] * p[2])), (x, y) -> x + y))
                  * sqrt(list_reduce(list_prepend(0.0,
                      list_transform(list_zip(av.av, av.av), p -> p[1] * p[2])), (x, y) -> x + y))) AS cos
          FROM c JOIN av USING (label) WHERE c.vec_id <> av.aid)
        SELECT vec_id, label, round(cos, 6) AS cos_anchor
        FROM scored WHERE cos < -0.15
        ORDER BY vec_id"""))
  )
}
