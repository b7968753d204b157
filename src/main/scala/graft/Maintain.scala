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
  * Every rewrite underneath is the shared staged rename-aside swap, and
  * `maintain` runs the swap's residue self-heal
  * ([[graft.operators.Pipeline.healStagedResidue]]) BEFORE its own
  * gate reads, so a crash at any point — including inside a prior
  * run's swap window — leaves a readable index and a rerun self-heals.
  * Idempotent: consolidating a consolidated index is a no-op rewrite.
  *
  * CADENCE: with `auto = true` the call is census-driven — each
  * surface's file count is measured first and only surfaces whose
  * `n_files ≥ autoFactor × optimum` pay the rewrite (optimum = the
  * post-consolidation file floor: one file per partition-value
  * directory, at least `ceil(bytes / compactTargetBytes)`, at least
  * 1). A nightly caller runs ONE unconditional call and fresh indexes
  * skip the O(index) rewrite; the returned report names every surface
  * measured, whether it ran, and why — the threshold glue that r14
  * callers re-implemented by hand.
  */
object Maintain {

  /** One surface's census-driven verdict: measured generation pressure
    * (`nFiles`) vs the post-consolidation floor (`optimumFiles`), and
    * whether the rewrite ran. `reason` is human-readable and names the
    * threshold, so a nightly log shows WHY a surface was skipped. */
  final case class SurfaceDecision(
      surface: String,
      nFiles: Long,
      optimumFiles: Long,
      ran: Boolean,
      reason: String)

  /** What ran and what was proven; returned only if every forced check
    * passed (the [[Forget.ForgetReport]] doctrine — observing a report
    * IS the proof). The `*Consolidated`/`compacted` lists name the
    * surfaces that actually PAID a rewrite this call; `decisions`
    * records every surface measured (in `auto` mode, skipped surfaces
    * appear here with the threshold that spared them). */
  final case class MaintainReport(
      histConsolidated: Seq[String],
      kmvConsolidated: Seq[String],
      spanGramsConsolidated: Seq[String],
      compacted: Seq[String],
      decisions: Seq[SurfaceDecision] = Seq.empty)

  /** Recursive listing of one surface: visible file count, visible
    * bytes, and the number of leaf DATA directories (distinct parents
    * of visible files — 1 for a flat artifact, the partition-value
    * directory count for a partitioned one). Hidden means ANY path
    * component under the surface is '_'- or '.'-prefixed (a crashed
    * writer's _temporary/&#42;&#42;/part files have clean leaf names) —
    * otherwise the census counts bytes the n_rows read ignores and
    * reports phantom generation pressure. */
  private def surfaceFiles(qualified: org.apache.hadoop.fs.Path,
                           fs: org.apache.hadoop.fs.FileSystem): (Long, Long, Long) = {
    var nFiles = 0L
    var bytes = 0L
    val leafDirs = scala.collection.mutable.HashSet.empty[String]
    val base = qualified.toUri.getPath
    val it = fs.listFiles(qualified, true)
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(base)
      val hidden = rel.split('/').exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) {
        nFiles += 1; bytes += f.getLen
        leafDirs += f.getPath.getParent.toUri.getPath
      }
    }
    (nFiles, bytes, leafDirs.size.toLong)
  }

  /** The decision input for [[maintain]]'s cadence: per named parquet
    * surface, its file count, byte size, row count, and forget-marker
    * debt — "run the compaction when `listStatus` shows 10× the
    * optimum" needs a view that shows it
    * ([[graft.state.StateInventory]]'s census discipline applied to the
    * index artifacts). File/byte numbers come from ONE recursive
    * listing per surface (cost ∝ the file count being measured — the
    * census is cheapest exactly when it matters least); row counts are
    * parquet-footer counts (no data pages read). For the
    * generation-append families the file count IS the generation
    * pressure: every append lands at least one file, so a surface whose
    * `n_files` dwarfs its post-consolidation size is overdue.
    *
    * `n_markers` is the surface's replay-marker debt: the histogram
    * index records each applied `(dir, idSet)` retraction as a file
    * under the sibling `hist_forget_markers/` directory
    * ([[Forget.forget]]'s replay-idempotence discipline) — one per
    * distinct delete list, FOREVER, because markers must survive
    * consolidation (the retraction they record is folded into the
    * consolidated rows) and are only cleared by a full rebuild. That
    * makes them part of the surface's file pressure, and their
    * lifecycle load-bearing — so the census reports them (0 for
    * surfaces without a marker sibling).
    *
    * A surface that does not exist fails loudly WITH ITS LABEL — the
    * census is the cadence decision input, and a bare
    * FileNotFoundException from three stack frames down does not say
    * which of twelve surfaces is missing. Paths are qualified against
    * the surface's filesystem first, so relative paths classify their
    * hidden segments correctly.
    */
  def indexCensus(spark: SparkSession,
                  surfaces: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    require(surfaces.nonEmpty, "indexCensus: no surfaces given")
    require(surfaces.map(_._1).distinct.size == surfaces.size,
      s"indexCensus: duplicate surface labels in ${surfaces.map(_._1)}")
    val rows = surfaces.map { case (label, path) =>
      val raw = new org.apache.hadoop.fs.Path(path)
      val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = fs.makeQualified(raw)
      if (!fs.exists(p)) {
        // a missing surface with a rename-aside sibling is not "never
        // built" — it's a crashed staged rewrite mid-swap, and the data
        // is one rename away; the census is read-only by design, so it
        // points at the healer instead of healing
        val parent = p.getParent
        val residue =
          if (parent != null && fs.exists(parent))
            fs.listStatus(parent).map(_.getPath.getName)
              .filter(n => n.startsWith(p.getName + "__") &&
                n.endsWith("_old")).toSeq
          else Seq.empty[String]
        require(residue.isEmpty,
          s"indexCensus: surface '$label' is missing at $p but a crashed " +
            s"staged rewrite left ${residue.mkString(", ")} beside it - " +
            "the index is recoverable; run Maintain.maintain (it " +
            "self-heals the swap residue first) and census after")
        require(requirement = false,
          s"indexCensus: surface '$label' does not exist at $p - " +
            "censusing an index before its build (or after a failed " +
            "one) has no file pressure to report; build the surface or " +
            "drop it from the census")
      }
      val (nFiles, bytes, _) = surfaceFiles(p, fs)
      // marker debt belongs to the HISTOGRAM surface alone: the
      // `hist_forget_markers/` sibling lives beside `hist/` in the
      // index root, so attributing it by parent directory would charge
      // every co-located surface (a KMV `sketches/`, a compact target
      // sharing the root) with the histogram's debt — double-counted
      // pressure in the one view that drives cadence (r16)
      val markers = new org.apache.hadoop.fs.Path(
        p.getParent, "hist_forget_markers")
      val nMarkers =
        if (p.getName == "hist" && fs.exists(markers))
          fs.listStatus(markers).count(_.isFile).toLong
        else 0L
      val nRows = spark.read.parquet(path).count()
      (label, path, nFiles, bytes, nRows, nMarkers)
    }
    spark.createDataFrame(rows)
      .toDF("surface", "path", "n_files", "bytes", "n_rows", "n_markers")
  }

  def maintain(spark: SparkSession,
               histIndexDirs: Seq[String] = Seq.empty,
               kmvIndexDirs: Seq[String] = Seq.empty,
               kmvK: Int = 64,
               spanIndexDirs: Seq[String] = Seq.empty,
               compactTargets: Seq[(String, Seq[String])] = Seq.empty,
               compactTargetBytes: Long = 128L << 20,
               auto: Boolean = false,
               autoFactor: Int = 8): MaintainReport = {
    require(histIndexDirs.nonEmpty || kmvIndexDirs.nonEmpty ||
        spanIndexDirs.nonEmpty || compactTargets.nonEmpty,
      "maintain: nothing to maintain — no histogram, KMV, or span " +
        "indexes and no compaction targets given")
    require(autoFactor >= 1, s"maintain: autoFactor must be >= 1, got $autoFactor")

    val decisions = scala.collection.mutable.ListBuffer.empty[SurfaceDecision]

    // Heal crash residue FIRST, then decide: the gate reads below run
    // before the consolidation's own self-heal, so a prior run that
    // crashed inside the swap window (dir renamed aside, stage not yet
    // renamed in) would otherwise turn this rerun's before-read into
    // PATH_NOT_FOUND. `tags` covers every staged rewrite that can leave
    // residue on the surface, not just the one this call would run.
    def decide(surface: String, tags: Seq[String]): Boolean = {
      tags.foreach(t => Pipeline.healStagedResidue(spark, surface, t))
      if (!auto) {
        decisions += SurfaceDecision(surface, -1L, -1L, ran = true,
          "auto=false: unconditional maintenance")
        true
      } else {
        val raw = new org.apache.hadoop.fs.Path(surface)
        val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val p = fs.makeQualified(raw)
        require(fs.exists(p),
          s"maintain: surface $p does not exist - it cannot be " +
            "maintained before its build; drop it from the call")
        val (nFiles, bytes, leafDirs) = surfaceFiles(p, fs)
        // the post-consolidation floor: one file per partition-value
        // directory (a partitioned rewrite cannot merge across values),
        // never below the byte-budget file count the compaction itself
        // would produce, never below 1
        val optimum = Seq(1L, leafDirs,
          (bytes + compactTargetBytes - 1L) / compactTargetBytes).max
        val threshold = autoFactor.toLong * optimum
        val run = nFiles >= threshold
        decisions += SurfaceDecision(surface, nFiles, optimum, run,
          if (run)
            s"n_files $nFiles >= threshold $threshold " +
              s"($autoFactor x optimum $optimum): overdue"
          else
            s"n_files $nFiles < threshold $threshold " +
              s"($autoFactor x optimum $optimum): skipped")
        run
      }
    }

    val histRan = histIndexDirs.filter(d =>
      decide(s"$d/hist", Seq("consolidate")))
    histRan.foreach { d =>
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
    // a crashed GDPR rebuild leaves "rebuild"-tagged residue on the
    // same surface a consolidation maintains — heal both
    val kmvRan = kmvIndexDirs.filter(d =>
      decide(s"$d/sketches", Seq("consolidate", "rebuild")))
    kmvRan.foreach { d =>
      val before = Dedup.readSketchIndex(spark, d, kmvK)
        .collect().map(_.toString).sorted.toSeq
      Dedup.consolidateSketchIndex(spark, d, kmvK)
      val after = Dedup.readSketchIndex(spark, d, kmvK)
        .collect().map(_.toString).sorted.toSeq
      require(after == before,
        s"maintain: KMV consolidation at $d changed the read")
    }
    val spanRan = spanIndexDirs.filter(d =>
      decide(s"$d/grams", Seq("consolidate")))
    spanRan.foreach { d =>
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
    val compactRan = compactTargets.filter { case (dir, _) =>
      decide(dir, Seq("compact", "prune"))
    }
    compactRan.foreach { case (dir, partitionCols) =>
      Pipeline.compactArtifact(spark, dir, compactTargetBytes, partitionCols)
    }
    MaintainReport(
      histRan.map(d => s"$d/hist"),
      kmvRan.map(d => s"$d/sketches"),
      spanRan.map(d => s"$d/grams"),
      compactRan.map(_._1),
      decisions.toList)
  }
}
