package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Multimodal, Pipeline, TextOps}

/** Dev tool: `runMain graft.tools.StepProfile <sfDir> <composition>` —
  * time a composed query's stages INDIVIDUALLY (cold, in dependency
  * order), because [[Profile]] only sees the final frame's executed plan:
  * compositions that run jobs during CONSTRUCTION (localCheckpoint cuts,
  * connected-components rounds, k-means fits) hide their cost before the
  * measured action. r19 optimization-round instrument.
  */
object StepProfile {
  private def t[A](spark: SparkSession, name: String)(f: => DataFrame): Unit = {
    drop(spark)
    val t0 = System.nanoTime()
    f.queryExecution.toRdd.count()
    println(f"STEP $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
  private def drop(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val comp = args(1)
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
    val docs = Tables.documents(spark, sfDir)

    comp match {
      case "q141" =>
        // warm one full pass so codecs/codegen are JITed, like Bench
        Multimodal.curateMediaClusters(docs.select(col("doc_id"), col("source")),
          Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
          Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
          videoFrameHashes =
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF()))
          .queryExecution.toRdd.count()
        t(spark, "img: dHashImages(withPngMedia)") {
          Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF() }
        t(spark, "aud: audioFingerprint(withWavMedia)") {
          Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF() }
        t(spark, "vid: dHashFrames(withVideoKeyframes)") {
          Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF() }
        t(spark, "img pairs (incl. fingerprints)") {
          Multimodal.imageNearDupPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF()) }
        t(spark, "vid pairs (incl. fingerprints)") {
          Multimodal.videoNearDupClips(
            Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF()) }
        t(spark, "mediaPairs (all three legs)") {
          Multimodal.mediaPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF())) }
        t(spark, "full curateMediaClusters") {
          Multimodal.curateMediaClusters(docs.select(col("doc_id"), col("source")),
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            videoFrameHashes =
              Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF())) }

      case "q142" =>
        Pipeline.curationFunnel(docs, minTokens = 10, maxTokens = 100,
          minTtr = 0.3, nearDupThreshold = 0.8, maxTokenDf = 8)
          .queryExecution.toRdd.count()
        val quality = docs
          .withColumn("__toks", TextOps.tokens(col("text")))
          .withColumn("n_tokens", TextOps.tokenCountOfTokens(col("__toks")))
          .withColumn("ttr", TextOps.typeTokenRatioOfTokens(col("__toks")))
          .filter(col("n_tokens").between(10, 100) && col("ttr") > 0.3)
          .drop("__toks")
        t(spark, "quality gate") { quality }
        t(spark, "exact dedup") { Dedup.exact(quality) }
        t(spark, "jaccard pairs over exact") {
          Dedup.jaccardPairs(Dedup.exact(quality), 0.8, maxTokenDf = 8) }
        t(spark, "cdc pairs over exact") {
          TextOps.cdcNearDupPairs(Dedup.exact(quality), minFrac = 0.25) }
        t(spark, "full funnel") {
          Pipeline.curationFunnel(docs, minTokens = 10, maxTokens = 100,
            minTtr = 0.3, nearDupThreshold = 0.8, maxTokenDf = 8) }

      case "ccnew" =>
        val pairs = Multimodal.mediaPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF()))
          .localCheckpoint()
        println(s"EDGES ${pairs.count()}")
        // warm
        Dedup.connectedComponents(pairs).queryExecution.toRdd.count()
        // measured pass on a fresh edge materialization (drop() would
        // invalidate the truncated-lineage blocks above)
        val rows = pairs.collect()
        drop(spark)
        val p2 = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 4), pairs.schema)
        val t0 = System.nanoTime()
        Dedup.connectedComponents(p2).queryExecution.toRdd.count()
        println(f"CCNEW ${(System.nanoTime() - t0) / 1e9}%.3f s")

      case "ccnew2" =>
        val pairs = Multimodal.mediaPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF()))
          .localCheckpoint()
        println(s"EDGES ${pairs.count()}")
        var t0 = System.nanoTime()
        val fwd = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst")).localCheckpoint()
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        var labels = edges.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id"))
          .localCheckpoint()
        println(f"SETUP ${(System.nanoTime() - t0) / 1e9}%.3f s")
        var iter = 0
        var changed = 1L
        while (changed > 0 && iter < 30) {
          t0 = System.nanoTime()
          val nbrMin = edges.join(labels.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("id"), col("comp"))
            .groupBy("id").agg(min("comp").as("new_comp"))
          val prop = labels.join(nbrMin, Seq("id"), "left_outer")
            .select(col("id"), col("comp").as("old"),
              least(col("comp"), coalesce(col("new_comp"), col("comp"))).as("comp"))
            .localCheckpoint(eager = false)
          val jumped = prop.join(
              prop.select(col("id").as("comp"), col("comp").as("__cc")),
              Seq("comp"), "left_outer")
            .select(col("id"), col("old"),
              coalesce(col("__cc"), col("comp")).as("comp"))
            .localCheckpoint(eager = false)
          changed = jumped.filter(col("comp") < col("old")).count()
          labels = jumped.select(col("id"), col("comp"))
          iter += 1
          println(f"ROUND $iter%2d ${(System.nanoTime() - t0) / 1e9}%.3f s  changed=$changed")
        }

      case "ccvar" =>
        // args(2) = hops per round, args(3) = shortcut? ("s" | "n")
        val hops = args(2).toInt
        val short = args(3) == "s"
        val seed = args.length > 4 && args(4) == "seed"
        val pairs = (if (args.length > 5 && args(5) == "q91")
            Dedup.jaccardPairs(docs, 0.5, maxTokenDf = 100)
          else Multimodal.mediaPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF())))
          .localCheckpoint()
        println(s"EDGES ${pairs.count()}")
        val tAll = System.nanoTime()
        var t0 = System.nanoTime()
        val fwd = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst")).localCheckpoint()
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        var labels = (if (seed)
            edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("__nmin"))
              .select(col("id"), least(col("id"), col("__nmin")).as("comp"))
          else edges.select(col("src").as("id")).distinct()
            .withColumn("comp", col("id")))
          .localCheckpoint()
        println(f"SETUP ${(System.nanoTime() - t0) / 1e9}%.3f s")
        var iter = 0
        var changed = 1L
        while (changed > 0 && iter < 30) {
          t0 = System.nanoTime()
          var cur = labels.withColumn("old", col("comp"))
          var h = 0
          while (h < hops) {
            val nbrMin = edges.join(
                cur.select(col("id").as("src"), col("comp")), "src")
              .select(col("dst").as("id"), col("comp"))
              .groupBy("id").agg(min("comp").as("nc"))
            cur = cur.join(nbrMin, Seq("id"), "left_outer")
              .select(col("id"), col("old"),
                least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
            h += 1
          }
          val prop = cur.localCheckpoint(eager = false)
          val next =
            if (short)
              prop.join(prop.select(col("id").as("comp"), col("comp").as("__cc")),
                  Seq("comp"), "left_outer")
                .select(col("id"), col("old"),
                  coalesce(col("__cc"), col("comp")).as("comp"))
                .localCheckpoint(eager = false)
            else prop
          changed = next.filter(col("comp") < col("old")).count()
          labels = next.select(col("id"), col("comp"))
          iter += 1
          println(f"ROUND $iter%2d ${(System.nanoTime() - t0) / 1e9}%.3f s  changed=$changed")
        }
        println(f"CCVAR hops=$hops short=$short total ${(System.nanoTime() - tAll) / 1e9}%.3f s  rounds=$iter")

      case "cc141" =>
        // the q141 edge list, materialized once; then the frontier-CC loop
        // replayed inline with per-round timing
        val pairs = Multimodal.mediaPairs(
            Multimodal.dHashImages(Multimodal.withPngMedia(docs)).toDF(),
            Multimodal.audioFingerprint(Multimodal.withWavMedia(docs)).toDF(),
            Some(Multimodal.dHashFrames(Multimodal.withVideoKeyframes(docs)).toDF()))
          .localCheckpoint()
        println(s"EDGES ${pairs.count()}")
        var t0 = System.nanoTime()
        val fwd = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst")).localCheckpoint()
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        var labels = edges.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id"))
          .localCheckpoint()
        println(f"SETUP ${(System.nanoTime() - t0) / 1e9}%.3f s  nodes=${labels.count()}")
        var frontier = labels
        var frontierSize = 1L
        var iter = 0
        while (frontierSize > 0 && iter < 30) {
          t0 = System.nanoTime()
          val improved = edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("id"), col("comp"))
            .groupBy("id").agg(min("comp").as("new_comp"))
          val joined = labels.join(improved, Seq("id"), "left_outer")
            .localCheckpoint(eager = false)
          frontierSize = joined.filter(col("new_comp") < col("comp")).count()
          frontier = joined.filter(col("new_comp") < col("comp"))
            .select(col("id"), col("new_comp").as("comp"))
          labels = joined.select(col("id"),
            least(col("comp"), coalesce(col("new_comp"), col("comp"))).as("comp"))
          iter += 1
          println(f"ROUND $iter%2d ${(System.nanoTime() - t0) / 1e9}%.3f s  frontier=$frontierSize")
        }

      case "q146" =>
        // the q146 serve side, leg by leg: index prebuilt via the same
        // BuildOnce memo the harness query uses, batch = doc_id < 250
        val dir = graft.operators.BuildOnce.dir("graft-span-index", sfDir) { d =>
          TextOps.buildSpanIndex(docs.filter(col("doc_id") >= 250),
            s"$d/index", n = 6)
          s"$d/index"
        }
        val batch = docs.filter(col("doc_id") < 250)
        // warm
        TextOps.dupSpansIncremental(batch, dir, n = 6, append = false)
          .queryExecution.toRdd.count()
        // leg timings: replay the serve side's internal stations
        var t0 = System.nanoTime()
        def lap(name: String): Unit = {
          println(f"LEG $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
          t0 = System.nanoTime()
        }
        val toksB = batch.select(col("doc_id"),
            TextOps.tokens(col("text")).as("__toks"))
          .localCheckpoint(false)
        toksB.queryExecution.toRdd.count(); lap("tokenize batch")
        val gramPosB = TextOps.positionedGrams(toksB, 6, g => g)
          .localCheckpoint(false)
        gramPosB.queryExecution.toRdd.count(); lap("positioned grams")
        val dfB = toksB.select(col("doc_id"), explode(array_distinct(
            TextOps.wordNgramsOfTokens(col("__toks"), 6))).as("g0"))
          .select(col("doc_id"), col("g0").as("gram"))
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("dfb"), min(col("doc_id")).as("solo_doc_id"))
          .withColumn("gb",
            (graft.functions.HashFunctions.md5_prefix(col("gram"), 8) % 64)
              .cast("int"))
          .localCheckpoint(false)
        dfB.queryExecution.toRdd.count(); lap("dfB aggregate")
        val touchedGb = dfB.select(col("gb")).distinct()
          .collect().map(_.getInt(0)).toSeq
        lap("touchedGb collect")
        val corpusDf = spark.read.parquet(s"$dir/grams")
          .filter(col("gb").isin(touchedGb: _*))
          .join(broadcast(dfB.select(col("gram"))), Seq("gram"), "left_semi")
          .groupBy(col("gram")).agg(sum(col("df")).as("dfc"))
        corpusDf.queryExecution.toRdd.count(); lap("corpusDf probe")
        val joined = dfB.join(corpusDf, Seq("gram"), "left_outer")
          .select(col("gram"), col("dfb"),
            coalesce(col("dfc"), lit(0L)).as("dfc"))
          .localCheckpoint(false)
        joined.queryExecution.toRdd.count(); lap("joined df")
        val dupForBatch = joined.filter(col("dfb") + col("dfc") >= 2)
          .select(col("gram"))
        val bs = TextOps.islandsOf(
          gramPosB.join(dupForBatch, Seq("gram"), "left_semi"), 6)
        bs.queryExecution.toRdd.count(); lap("batch islands")
        val full = TextOps.dupSpansIncremental(batch, dir, n = 6,
          append = false)
        full.queryExecution.toRdd.count(); lap("FULL serve")

      case "q24" =>
        spark.conf.set("spark.sql.files.openCostInBytes", (256L << 10).toString)
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_returnflag"), col("l_partkey"), col("l_suppkey"))
        println(s"SCAN PARTITIONS ${li.rdd.getNumPartitions}")
        def q24(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
            approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
        q24(li).queryExecution.toRdd.count() // warm
        var t0q = System.nanoTime()
        q24(li).queryExecution.toRdd.count()
        println(f"HLL as-is    ${(System.nanoTime() - t0q) / 1e9}%.3f s")
        t0q = System.nanoTime()
        li.queryExecution.toRdd.count()
        println(f"scan only    ${(System.nanoTime() - t0q) / 1e9}%.3f s")

      case "ccold49" =>
        // the r18 frontier loop, replayed inline on q49's dense graph
        val pairs49 = Dedup.jaccardPairs(docs, 0.5, maxTokenDf = Int.MaxValue)
          .localCheckpoint()
        println(s"EDGES ${pairs49.count()}")
        var t0o = System.nanoTime()
        val fwdO = pairs49.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst")).localCheckpoint()
        val edgesO = fwdO.union(
            fwdO.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
        var labelsO = edgesO.select(col("src").as("id")).distinct()
          .withColumn("comp", col("id"))
          .localCheckpoint()
        println(f"SETUP ${(System.nanoTime() - t0o) / 1e9}%.3f s")
        var frontierO = labelsO
        var fs = 1L
        var itO = 0
        while (fs > 0 && itO < 30) {
          t0o = System.nanoTime()
          val improved = edgesO.join(
              frontierO.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("id"), col("comp"))
            .groupBy("id").agg(min("comp").as("new_comp"))
          val joinedO = labelsO.join(improved, Seq("id"), "left_outer")
            .localCheckpoint(eager = false)
          fs = joinedO.filter(col("new_comp") < col("comp")).count()
          frontierO = joinedO.filter(col("new_comp") < col("comp"))
            .select(col("id"), col("new_comp").as("comp"))
          labelsO = joinedO.select(col("id"),
            least(col("comp"), coalesce(col("new_comp"), col("comp"))).as("comp"))
          itO += 1
          println(f"ROUND $itO%2d ${(System.nanoTime() - t0o) / 1e9}%.3f s  frontier=$fs")
        }

      case "ccq49" =>
        val t1 = System.nanoTime()
        val pairs = Dedup.jaccardPairs(docs, 0.5, maxTokenDf = Int.MaxValue)
          .localCheckpoint()
        println(f"PAIRS ${(System.nanoTime() - t1) / 1e9}%.3f s  n=${pairs.count()}")
        val t2 = System.nanoTime()
        Dedup.connectedComponents(pairs).queryExecution.toRdd.count()
        println(f"CC    ${(System.nanoTime() - t2) / 1e9}%.3f s")
        val t3 = System.nanoTime()
        Dedup.dedupClusters(docs, pairs)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("retained")).cast("bigint").as("n_retained"),
            countDistinct(col("comp")).as("n_clusters"))
          .queryExecution.toRdd.count()
        println(f"FULL  ${(System.nanoTime() - t3) / 1e9}%.3f s")

      case other => sys.error(s"unknown composition $other")
    }
    spark.stop()
  }
}
