package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, HistogramSketch, Pipeline, TextOps}

/** One-call nightly index MAINTENANCE — the compaction counterpart of
  * [[Forget]]'s one-call deletion: the library's persisted indexes all
  * follow the generation-append discipline (appends are crash-safe and
  * work ∝ batch; reads merge generations), which means every one of
  * them accumulates history without bound until someone runs its
  * consolidation leg. Until r14 those legs were hand-sequenced — the
  * same forgettable-step hazard `Forget.forget` exists to prevent on
  * the deletion side. `maintain` runs them in one call and PROVES the
  * cheap invariants before returning:
  *
  *  - histogram indexes ([[graft.operators.HistogramSketch
  *    .consolidateHistogramIndex]]): generations summed to one row per
  *    live bucket — read-before ≡ read-after is FORCED here (both reads
  *    are bounded-bucket aggregates, so the proof costs nothing at any
  *    corpus scale).
  *  - KMV sketch indexes ([[graft.operators.Dedup
  *    .consolidateSketchIndex]]): one merged sketch row per source —
  *    read-before ≡ read-after FORCED (|sources|-row reads).
  *  - span-index gram tables ([[graft.operators.TextOps
  *    .consolidateSpanIndexGrams]]): the df/rider algebra collapsed to
  *    net state. The full read-equality proof is corpus-gram-scale, so
  *    it lives in the suite; what is forced here is the cheap
  *    CONSERVATION law — `sum(df)` is invariant under consolidation
  *    (net-zero grams contribute 0), one column scan on each side.
  *  - plain fact artifacts (`pos/`, `digests/`, `members/`, shards):
  *    no algebra to merge, just the small-files problem —
  *    [[graft.operators.Pipeline.compactArtifact]] per entry, partition
  *    layout named by the caller (the pruneArtifact rule).
  *
  * Every rewrite underneath is the shared staged rename-aside swap, so
  * a crash at any point leaves a readable index and a rerun self-heals.
  * Idempotent: consolidating a consolidated index is a no-op rewrite.
  */
object Maintain {

  /** What ran and what was proven; returned only if every forced check
    * passed (the [[Forget.ForgetReport]] doctrine — observing a report
    * IS the proof). */
  final case class MaintainReport(
      histConsolidated: Seq[String],
      kmvConsolidated: Seq[String],
      spanGramsConsolidated: Seq[String],
      compacted: Seq[String])

  /** The decision input for [[maintain]]'s cadence: per named parquet
    * surface, its file count, byte size, and row count — "run the
    * compaction when `listStatus` shows 10× the optimum" needs a view
    * that shows it ([[graft.state.StateInventory]]'s census discipline
    * applied to the index artifacts). File/byte numbers come from ONE
    * recursive listing per surface (cost ∝ the file count being
    * measured — the census is cheapest exactly when it matters least);
    * row counts are parquet-footer counts (no data pages read). For the
    * generation-append families the file count IS the generation
    * pressure: every append lands at least one file, so a surface whose
    * `n_files` dwarfs its post-consolidation size is overdue.
    */
  def indexCensus(spark: SparkSession,
                  surfaces: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    require(surfaces.nonEmpty, "indexCensus: no surfaces given")
    require(surfaces.map(_._1).distinct.size == surfaces.size,
      s"indexCensus: duplicate surface labels in ${surfaces.map(_._1)}")
    val rows = surfaces.map { case (label, path) =>
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var nFiles = 0L
      var bytes = 0L
      val base = p.toUri.getPath
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        // hidden means ANY path component under the surface is '_'- or
        // '.'-prefixed (a crashed writer's _temporary/**/part files have
        // clean leaf names) — otherwise the census counts bytes the
        // n_rows read ignores and reports phantom generation pressure
        val rel = f.getPath.toUri.getPath.stripPrefix(base)
        val hidden = rel.split('/').exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
        if (!hidden) { nFiles += 1; bytes += f.getLen }
      }
      val nRows = spark.read.parquet(path).count()
      (label, path, nFiles, bytes, nRows)
    }
    spark.createDataFrame(rows)
      .toDF("surface", "path", "n_files", "bytes", "n_rows")
  }

  def maintain(spark: SparkSession,
               histIndexDirs: Seq[String] = Seq.empty,
               kmvIndexDirs: Seq[String] = Seq.empty,
               kmvK: Int = 64,
               spanIndexDirs: Seq[String] = Seq.empty,
               compactTargets: Seq[(String, Seq[String])] = Seq.empty,
               compactTargetBytes: Long = 128L << 20): MaintainReport = {
    require(histIndexDirs.nonEmpty || kmvIndexDirs.nonEmpty ||
        spanIndexDirs.nonEmpty || compactTargets.nonEmpty,
      "maintain: nothing to maintain — no histogram, KMV, or span " +
        "indexes and no compaction targets given")

    histIndexDirs.foreach { d =>
      val before = HistogramSketch.readHistogramIndex(spark, d)
        .collect().map(_.toString).sorted.toSeq
      HistogramSketch.consolidateHistogramIndex(spark, d)
      val after = HistogramSketch.readHistogramIndex(spark, d)
        .collect().map(_.toString).sorted.toSeq
      // detection, not rollback: the staged swap completed, so the
      // pre-consolidation history is gone — a mismatch here (a
      // deterministic sum/filter cannot produce one on a quiescent
      // index) means a CONCURRENT WRITER raced the rewrite; stop the
      // writers, restore from backup or rebuild from corpus
      require(after == before,
        s"maintain: histogram consolidation at $d changed the read - a " +
          "concurrent append/retract likely raced the rewrite; the " +
          "pre-consolidation history is not recoverable from this path")
    }
    kmvIndexDirs.foreach { d =>
      val before = Dedup.readSketchIndex(spark, d, kmvK)
        .collect().map(_.toString).sorted.toSeq
      Dedup.consolidateSketchIndex(spark, d, kmvK)
      val after = Dedup.readSketchIndex(spark, d, kmvK)
        .collect().map(_.toString).sorted.toSeq
      require(after == before,
        s"maintain: KMV consolidation at $d changed the read")
    }
    spanIndexDirs.foreach { d =>
      // the conservation law, not the full equality (that proof is
      // corpus-gram-scale and suite-pinned): net-zero grams carry 0, so
      // total df is invariant — one column scan per side
      def totalDf: Long = spark.read.parquet(s"$d/grams")
        .agg(coalesce(sum(col("df")), lit(0L))).head().getLong(0)
      val before = totalDf
      TextOps.consolidateSpanIndexGrams(spark, d)
      val after = totalDf
      require(after == before,
        s"maintain: span-gram consolidation at $d broke df conservation " +
          s"($before -> $after)")
    }
    compactTargets.foreach { case (dir, partitionCols) =>
      Pipeline.compactArtifact(spark, dir, compactTargetBytes, partitionCols)
    }
    MaintainReport(
      histIndexDirs.map(d => s"$d/hist"),
      kmvIndexDirs.map(d => s"$d/sketches"),
      spanIndexDirs.map(d => s"$d/grams"),
      compactTargets.map(_._1))
  }
}
