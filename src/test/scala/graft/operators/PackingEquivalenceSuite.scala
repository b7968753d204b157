package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Randomized differential gates for the r12 kernels:
  *
  *  - `packSequences`' two-pass distributed prefix sum must be
  *    BYTE-IDENTICAL to the window formulation it replaced, on random
  *    multi-strata frames including empty strata, null texts, null
  *    strata, and duplicate-free ids in random insertion order.
  *  - `cdcChunksClamped` must satisfy the clamp invariants on random
  *    byte strings (not just the hand fixtures), and the identity clamp
  *    must reproduce the pure tier exactly.
  *
  * Fixed seeds (scalatestplus bridge not in the offline deps).
  */
class PackingEquivalenceSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-packing-equivalence")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("prefix-sum packing ≡ window formulation on random frames (incl. nulls)") {
    val sql = spark
    import sql.implicits._
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 300 + rnd.nextInt(300)
      val rows = rnd.shuffle((1L to n.toLong).toList).map { id =>
        val src: String =
          if (rnd.nextInt(20) == 0) null else s"s${rnd.nextInt(5)}"
        val text: String =
          if (rnd.nextInt(15) == 0) null
          else (0 until rnd.nextInt(9)).map(j => s"w${rnd.nextInt(40)}")
            .mkString(" ") // may be "" (one empty token after split)
        (id, src, text)
      }
      val docs = rows.toDF("doc_id", "source", "text").repartition(5)
      val budget = 16 + rnd.nextInt(48)

      val got = Pipeline.packSequences(docs, budget)
        .select($"doc_id", $"chunk_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap

      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = docs
        .withColumn("n_tokens", TextOps.tokenCount($"text"))
        .withColumn("__cum", sum($"n_tokens").over(w))
        .withColumn("chunk_id", expr(s"(__cum - n_tokens) div $budget"))
        .select($"doc_id", $"chunk_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap

      assert(got === want, s"seed $seed budget $budget diverged")
    }
  }

  test("cdcChunksClamped invariants + identity-clamp equivalence on random texts") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { i =>
      val len = rnd.nextInt(400)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    }.toDF("doc_id", "text")

    val ident = TextOps.cdcChunksClamped(docs, minLen = 1,
      maxLen = Int.MaxValue).collect().map(_.toSeq).toSet
    val pure = TextOps.cdcChunks(docs).collect().map(_.toSeq).toSet
    assert(ident === pure, "identity clamp must equal the pure tier")

    val (minL, maxL) = (12, 48)
    val clamped = TextOps.cdcChunksClamped(docs, minLen = minL, maxLen = maxL)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    docs.collect().foreach { d =>
      val id = d.getLong(0); val len = d.getString(1).length
      val cs = clamped.filter(_._1 == id).sortBy(_._2)
      if (len == 0) assert(cs.map(_._4).toSeq == Seq(0L))
      else {
        assert(cs.head._3 == 1L && cs.map(_._4).sum == len.toLong,
          s"doc $id must tile $len chars: ${cs.toSeq}")
        cs.sliding(2).foreach {
          case Array(a, b) => assert(b._3 == a._3 + a._4,
            s"gap/overlap in doc $id")
          case _ => ()
        }
        assert(cs.forall(_._4 <= maxL), s"maxLen violated in doc $id")
        assert(cs.dropRight(1).forall(_._4 >= minL),
          s"non-final chunk under minLen in doc $id: ${cs.toSeq}")
      }
    }
  }
  test("re-packing a frame that already has chunk_id fails loudly") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "s0", "a b c")).toDF("doc_id", "source", "text")
    val packed = Pipeline.packSequences(docs, budgetTokens = 10)
    // the schema-append would silently DUPLICATE the field; the guard
    // names the fix instead
    val ex = intercept[IllegalArgumentException] {
      Pipeline.packSequences(packed, budgetTokens = 5)
    }
    assert(ex.getMessage.contains("chunk_id"))
    // an undeclared n_tokens column refuses too (r13): it would be
    // silently replaced by whitespace counts
    val ex2 = intercept[IllegalArgumentException] {
      Pipeline.packSequences(packed.drop("chunk_id"), budgetTokens = 5)
    }
    assert(ex2.getMessage.contains("n_tokens"))
    // and both documented recoveries work: declare the existing counts
    // as the budget measure (reuses them — no re-tokenize)...
    assert(Pipeline.packSequences(packed.drop("chunk_id"), budgetTokens = 5,
        tokenCountCol = Some("n_tokens"))
      .columns.count(_ == "chunk_id") === 1)
    // ...or drop them and re-count
    assert(Pipeline.packSequences(packed.drop("chunk_id", "n_tokens"),
        budgetTokens = 5)
      .columns.count(_ == "chunk_id") === 1)
  }

  // ---- trainingOrder: the seeded deterministic permutation kernel ----

  private def chunkFixture(seed: Int, n: Int) = {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(seed)
    rnd.shuffle((0 until n).map(i => (s"s${i % 7}", i.toLong / 7)).toList)
      .toDF("stratum", "chunk_id")
  }

  /** Driver-side reference: md5-prefix hash + total (hash, keys) sort,
    * computed with java.security MessageDigest — fully independent of
    * the Spark kernel under test. */
  private def referenceOrder(rows: Seq[(String, Long)], seed: Long): Map[(String, Long), Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String, c: Long): Long = {
      val hex = md.digest(s"$seed:$s:$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    rows.sortBy { case (s, c) => (h(s, c), s, c) }
      .zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
  }

  test("trainingOrder: exact permutation, stable across partition counts, ≡ md5 reference") {
    val base = chunkFixture(seed = 11, n = 400)
    val keys = base.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = referenceOrder(keys, seed = 7L)
    for (parts <- Seq(1, 5, 13)) {
      val got = Pipeline.trainingOrder(base.repartition(parts), seed = 7L,
          keyCols = Seq("stratum", "chunk_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      // a PERMUTATION: every position 0..n-1 exactly once
      assert(got.values.toSeq.sorted == (0L until keys.size.toLong),
        s"parts=$parts: pos is not an exact 0..n-1 permutation")
      assert(got == ref,
        s"parts=$parts: kernel order diverged from the driver-side md5 reference")
    }
  }

  test("trainingOrder: a different seed is a different permutation; same seed replays") {
    val base = chunkFixture(seed = 3, n = 200)
    def run(seed: Long) = Pipeline.trainingOrder(base, seed, Seq("stratum", "chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a1 = run(7L); val a2 = run(7L); val b = run(8L)
    assert(a1 == a2, "same seed must replay the identical order")
    assert(a1 != b, "seed 8 produced seed 7's permutation")
    // and not a near-identity reshuffle: most keys must actually move
    val moved = a1.count { case (k, p) => b(k) != p }
    assert(moved > a1.size / 2, s"only $moved/${a1.size} keys moved between seeds")
  }

  test("tokenQuota composes with materializeMix via the copy-composite key") {
    val sql = spark
    import sql.implicits._
    // a materialized mix REPEATS doc_ids (copies) — the r14 duplicate
    // refusal must not break the recipe pipeline: the copy-composite
    // key is the multiset's primary key, exactly as packSequences uses
    val docs = (1L to 60L).map(i => (i, "A", Seq.fill(5)(s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val plan = Seq(("A", 2500000L)).toDF("source", "epochs_micro") // 2.5 epochs
    val multiset = Pipeline.materializeMix(docs, plan)
      .withColumn("mix_id", concat_ws("#", $"doc_id", $"copy"))
    // raw doc_id would refuse (copies duplicate it) — loudly, not wrong
    val eDup = intercept[Exception] {
      Pipeline.tokenQuota(multiset, 100).collect()
    }
    assert(eDup.getMessage != null && eDup.getMessage.contains("duplicate") ||
      Option(eDup.getCause).exists(c => c.getMessage != null &&
        c.getMessage.contains("duplicate")))
    // the composite key admits deterministically across partitionings
    def kept(parts: Int) = Pipeline.tokenQuota(
        multiset.repartition(parts), 100, idCol = "mix_id")
      .select($"mix_id").collect().map(_.getString(0)).toSet
    val k = kept(3)
    assert(k.nonEmpty && k.size < multiset.count(),
      s"budget must bite: ${k.size}")
    assert(kept(1) === k && kept(9) === k,
      "mix admission must not depend on partitioning")
  }

  test("curriculumOrder: bands contiguous ascending, hash-decorrelated within, guards") {
    val sql = spark
    import sql.implicits._
    val base = chunkFixture(seed = 23, n = 600)
      .withColumn("band", (col("chunk_id") % 3).cast("long"))
    def run(parts: Int) = Pipeline.curriculumOrder(base.repartition(parts),
        seed = 7L, keyCols = Seq("stratum", "chunk_id"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
        r.getLong(3))).toSeq // (key, band, pos)
    val rows = run(5)
    // exact permutation, bands form contiguous ascending blocks
    assert(rows.map(_._3).sorted == (0L until 600L))
    val byPos = rows.sortBy(_._3).map(_._2)
    assert(byPos == byPos.sorted,
      "band must be non-decreasing along the schedule (easy -> hard)")
    // within a band the order IS the q169 permutation restricted to it:
    // the hash is the same function of the keys, so the relative order
    // of two same-band keys must match trainingOrder's
    val flat = Pipeline.trainingOrder(base.drop("band"), seed = 7L,
        keyCols = Seq("stratum", "chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L to 2L).foreach { b =>
      val inBand = rows.filter(_._2 == b).sortBy(_._3).map(_._1)
      assert(inBand == inBand.sortBy(flat),
        s"band $b must preserve the seeded within-band permutation")
    }
    // partition invariance
    assert(run(1).toSet == rows.toSet && run(11).toSet == rows.toSet)
    // guards: null band, duplicate (band, keys), missing band column —
    // while the SAME key in two DIFFERENT bands is legal (sorts apart)
    val nullBand = base.withColumn("band",
      when(col("chunk_id") === 0L, lit(null)).otherwise(col("band")))
    val e1 = intercept[Exception] {
      Pipeline.curriculumOrder(nullBand, 7L, Seq("stratum", "chunk_id")).collect()
    }
    assert(e1.getMessage != null && e1.getMessage.contains("null key") ||
      Option(e1.getCause).exists(_.getMessage.contains("null key")))
    val dup = Seq(("s0", 1L, 0L), ("s0", 1L, 0L), ("s0", 2L, 0L))
      .toDF("stratum", "chunk_id", "band")
    val e2 = intercept[Exception] {
      Pipeline.curriculumOrder(dup, 7L, Seq("stratum", "chunk_id")).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("duplicate key") ||
      Option(e2.getCause).exists(_.getMessage.contains("duplicate key")))
    val crossBand = Seq(("s0", 1L, 0L), ("s0", 1L, 1L), ("s0", 2L, 0L))
      .toDF("stratum", "chunk_id", "band")
    assert(Pipeline.curriculumOrder(crossBand, 7L,
      Seq("stratum", "chunk_id")).count() === 3)
    intercept[IllegalArgumentException] {
      Pipeline.curriculumOrder(base.drop("band"), 7L, Seq("stratum", "chunk_id"))
    }
  }

  test("trainingOrderEpochs: per-epoch permutations, epoch 0 ≡ q169, decorrelated, stable") {
    val base = chunkFixture(seed = 17, n = 700)
    val n = 700L
    def collectEpochs(parts: Int) =
      Pipeline.trainingOrderEpochs(base.repartition(parts), seed = 7L,
          nEpochs = 3, keyCols = Seq("stratum", "chunk_id"))
        .collect()
        .map(r => (r.getLong(3), (r.getString(0), r.getLong(1)), r.getLong(2)))
    val rows = collectEpochs(4)
    // each epoch is an EXACT permutation 0..n-1
    (0L to 2L).foreach { e =>
      val pos = rows.filter(_._1 == e).map(_._3).sorted
      assert(pos.toSeq == (0L until n), s"epoch $e is not a permutation")
    }
    // epoch 0 IS the single-epoch order (seed ^ 0 = seed): upgrading a
    // run to multi-epoch never changes what epoch 0 trains on
    val single = Pipeline.trainingOrder(base, seed = 7L,
        keyCols = Seq("stratum", "chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val epoch0 = rows.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    assert(epoch0 == single, "epoch 0 must equal trainingOrder at the same seed")
    // cross-epoch decorrelation: for independent permutations the
    // expected count of positions holding the SAME chunk in two epochs
    // is 1 (fixed points of a random permutation) — a kernel regression
    // that reuses one permutation scores n
    for (Seq(a, b) <- Seq(0L, 1L, 2L).combinations(2)) {
      val pa = rows.filter(_._1 == a).map(t => t._3 -> t._2).toMap
      val pb = rows.filter(_._1 == b).map(t => t._3 -> t._2).toMap
      val same = (0L until n).count(p => pa(p) == pb(p))
      assert(same <= 8,
        s"epochs $a/$b share $same same-pos chunks (expected ~1 of $n)")
    }
    // per-epoch mixing health: the q172 audit on each epoch's slice
    // stays near share_micro (packing order would score ~10^6)
    val asDf = {
      val sql = spark
      import sql.implicits._
      rows.toSeq.map(t => (t._2._1, t._2._2, t._3, t._1))
        .toDF("stratum", "chunk_id", "pos", "epoch")
    }
    (0L to 2L).foreach { e =>
      val audit = Pipeline.orderMixingAudit(
          asDf.filter(col("epoch") === e).drop("epoch"))
        .select("stratum", "same_next_micro", "share_micro")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      audit.foreach { case (stratum, sameMicro, shareMicro) =>
        assert(math.abs(sameMicro - shareMicro) < 120000,
          s"epoch $e stratum $stratum: same_next $sameMicro far from " +
            s"share $shareMicro - the permutation left runs back-to-back")
      }
    }
    // partition-count invariance: the schedule is a pure function of
    // (seed, keys), never of layout
    assert(collectEpochs(1).toSet == rows.toSet &&
      collectEpochs(11).toSet == rows.toSet,
      "epoch schedule must not depend on partitioning")
    // guards: zero epochs, hot schedules, epoch-column collision
    intercept[IllegalArgumentException] {
      Pipeline.trainingOrderEpochs(base, 7L, 0, Seq("stratum", "chunk_id"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.trainingOrderEpochs(base, 7L, 1001, Seq("stratum", "chunk_id"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.trainingOrderEpochs(base.withColumn("epoch", lit(0)),
        7L, 2, Seq("stratum", "chunk_id"))
    }
  }

  test("curriculumOrderEpochs: bands hold per epoch, within-band re-deal per epoch, epoch 0 ≡ q182") {
    val base = chunkFixture(seed = 29, n = 600)
      .withColumn("band", (col("chunk_id") % 3).cast("long"))
    val n = 600L
    def collectEpochs(parts: Int) =
      Pipeline.curriculumOrderEpochs(base.repartition(parts), seed = 7L,
          nEpochs = 3, keyCols = Seq("stratum", "chunk_id"))
        .collect()
        .map(r => (r.getLong(4), (r.getString(0), r.getLong(1)),
          r.getLong(2), r.getLong(3))) // (epoch, key, band, pos)
    val rows = collectEpochs(4)
    // every epoch: exact permutation AND contiguous ascending bands
    (0L to 2L).foreach { e =>
      val ep = rows.filter(_._1 == e)
      assert(ep.map(_._4).sorted.toSeq == (0L until n),
        s"epoch $e is not a permutation")
      val bandsByPos = ep.sortBy(_._4).map(_._3)
      assert(bandsByPos.toSeq == bandsByPos.sorted.toSeq,
        s"epoch $e: band must be non-decreasing along the schedule")
    }
    // epoch 0 IS the single-epoch curriculum (seed ^ 0 = seed)
    val single = Pipeline.curriculumOrder(base, seed = 7L,
        keyCols = Seq("stratum", "chunk_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val epoch0 = rows.filter(_._1 == 0L).map(t => t._2 -> t._4).toMap
    assert(epoch0 == single,
      "epoch 0 must equal curriculumOrder at the same seed")
    // cross-epoch decorrelation is per-BAND (a chunk never leaves its
    // band): expected fixed points per band pair of permutations is 1,
    // so ~3 across bands; a kernel regression reusing one within-band
    // permutation scores n
    for (Seq(a, b) <- Seq(0L, 1L, 2L).combinations(2)) {
      val pa = rows.filter(_._1 == a).map(t => t._4 -> t._2).toMap
      val pb = rows.filter(_._1 == b).map(t => t._4 -> t._2).toMap
      val same = (0L until n).count(p => pa(p) == pb(p))
      assert(same <= 12,
        s"epochs $a/$b share $same same-pos chunks (expected ~3 of $n)")
    }
    // partition invariance: the schedule is a pure function of
    // (seed, band, keys)
    assert(collectEpochs(1).toSet == rows.toSet &&
      collectEpochs(11).toSet == rows.toSet,
      "epoch curriculum must not depend on partitioning")
    // guards inherit: zero epochs, hot schedule, epoch collision,
    // missing band
    intercept[IllegalArgumentException] {
      Pipeline.curriculumOrderEpochs(base, 7L, 0, Seq("stratum", "chunk_id"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.curriculumOrderEpochs(base, 7L, 1001, Seq("stratum", "chunk_id"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.curriculumOrderEpochs(base.withColumn("epoch", lit(0)),
        7L, 2, Seq("stratum", "chunk_id"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.curriculumOrderEpochs(base.drop("band"), 7L, 2,
        Seq("stratum", "chunk_id"))
    }
  }

  test("tokenQuotaPlan: per-stratum allocs ≡ one tokenQuota per stratum; plan contract loud") {
    val sql = spark
    import sql.implicits._
    val docs = (1L to 90L).map { i =>
      val src = s"s${i % 3}"
      (i, src, Seq.fill((i % 5 + 1).toInt)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val plan = Seq(("s0", 20L), ("s1", 45L), ("s2", 7L))
      .toDF("source", "alloc_tokens")
    val kept = Pipeline.tokenQuotaPlan(docs, plan)
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // ground truth: the scalar-budget kernel once per stratum at that
    // stratum's allocation — the exact hand composition the operator
    // replaces
    val byHand = Seq(("s0", 20), ("s1", 45), ("s2", 7)).flatMap {
      case (src, b) =>
        Pipeline.tokenQuota(docs.filter($"source" === src), b)
          .select($"doc_id").collect().map(r => (r.getLong(0), src))
    }.toSet
    assert(kept === byHand,
      s"plan admission must equal per-stratum scalar admission:\n" +
        s"plan $kept\nhand $byHand")
    // every stratum's budget must actually bite in this fixture
    Seq("s0", "s1", "s2").foreach { src =>
      val offered = docs.filter($"source" === src).count()
      val keptN = kept.count(_._2 == src)
      assert(keptN > 0 && keptN < offered,
        s"fixture drift: $src kept $keptN of $offered")
    }
    // explicit 0 = sanctioned drop, visible in the report as zeros with
    // the alloc; absent stratum = loud refusal, never a silent default
    val planDrop = Seq(("s0", 20L), ("s1", 45L), ("s2", 0L))
      .toDF("source", "alloc_tokens")
    val dropped = Pipeline.tokenQuotaPlan(docs, planDrop)
      .select($"source").collect().map(_.getString(0)).toSet
    assert(dropped === Set("s0", "s1"),
      s"an explicit 0-alloc stratum must admit nothing: $dropped")
    val report = Pipeline.tokenQuotaPlanReport(docs, planDrop)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)))).toMap
    assert(report("s2")._1 == 0L && report("s2")._3 == 0L &&
        report("s2")._2 == 30L,
      s"the drop must be VISIBLE: alloc 0, offered counted, admitted 0: " +
        s"${report("s2")}")
    val ePlanGap = intercept[Exception] {
      Pipeline.tokenQuotaPlan(docs,
        Seq(("s0", 20L), ("s1", 45L)).toDF("source", "alloc_tokens"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ePlanGap).exists(_.contains("no allocation in the plan")),
      s"an unplanned stratum must refuse loudly: $ePlanGap")
    // allocated-but-silent strata report zeros (a mix-plan failure the
    // report exists to surface), and plan hygiene refuses loudly
    val reportGhost = Pipeline.tokenQuotaPlanReport(
        docs.filter($"source" =!= "s2"),
        Seq(("s0", 20L), ("s1", 45L), ("ghost", 99L))
          .toDF("source", "alloc_tokens"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4)))).toMap
    assert(reportGhost("ghost") === ((99L, 0L, 0L)),
      s"allocated-but-silent must report zeros: ${reportGhost("ghost")}")
    intercept[IllegalArgumentException] {
      Pipeline.tokenQuotaPlan(docs,
        Seq(("s0", 20L), ("s0", 30L), ("s1", 1L), ("s2", 1L))
          .toDF("source", "alloc_tokens")).collect()
    }
    intercept[IllegalArgumentException] {
      Pipeline.tokenQuotaPlan(docs,
        Seq(("s0", -5L), ("s1", 1L), ("s2", 1L))
          .toDF("source", "alloc_tokens")).collect()
    }
  }

  test("orderMixingAuditEpochs: one wrecked epoch surfaces; the flat audit averages it away") {
    val sql = spark
    import sql.implicits._
    // two healthy epochs (the real kernel) + one WRECKED epoch whose
    // "permutation" is packing order (every stratum a contiguous run) —
    // the seed-derivation-bug shape the per-epoch audit exists to catch
    val base = chunkFixture(seed = 31, n = 400)
    val healthy = Pipeline.trainingOrderEpochs(base, seed = 7L, nEpochs = 2,
      keyCols = Seq("stratum", "chunk_id"))
    val wrecked = base.orderBy(col("stratum"), col("chunk_id"))
      .withColumn("pos", expr("row_number() over (order by stratum, chunk_id) - 1")
        .cast("long"))
      .withColumn("epoch", lit(2L))
    val ordered = healthy.unionByName(wrecked.select(healthy.columns.map(col): _*))

    val perEpoch = Pipeline.orderMixingAuditEpochs(ordered)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(5),
        r.getLong(6))) // (epoch, stratum, same_next_micro, share_micro)
    // healthy epochs: same_next ≈ share everywhere
    perEpoch.filter(_._1 < 2L).foreach { case (e, s, same, share) =>
      assert(math.abs(same - share) < 150000,
        s"healthy epoch $e stratum $s: same_next $same vs share $share")
    }
    // the wrecked epoch: every stratum's successors are its own rows —
    // same_next_micro pegs near 10^6 regardless of share
    val badRows = perEpoch.filter(_._1 == 2L)
    assert(badRows.nonEmpty && badRows.forall(_._3 > 900000),
      s"the wrecked epoch must peg same_next_micro near 10^6: " +
        badRows.mkString(", "))
    // and the FLAT audit over the union averages the wreck into noise:
    // positions repeat across epochs so pairing is cross-epoch garbage,
    // but the point stands structurally — per-stratum same_next over the
    // union sits far from 10^6, so the wreck is invisible without the
    // epoch dimension
    val flat = Pipeline.orderMixingAudit(ordered.drop("epoch"))
      .collect().map(r => r.getLong(4))
    assert(flat.forall(_ < 900000),
      s"the flat audit must NOT show the wreck (that's the gap the " +
        s"epoch audit closes): ${flat.toSeq}")
  }

  test("materializeMix: copies are floor/ceil of epochs, extra-copy rate tracks frac, guard fires") {
    val sql = spark
    import sql.implicits._
    // two strata: A at 2.4 epochs (full=2, frac=0.4), B at 0.5 (draw-only)
    val docs = (1L to 400L).map(i => (i, if (i <= 200) "A" else "B", s"t$i"))
      .toDF("doc_id", "source", "text")
    val plan = Seq(("A", 2400000L), ("B", 500000L)).toDF("source", "epochs_micro")
    val out = Pipeline.materializeMix(docs, plan)
      .groupBy($"doc_id", $"source").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("copies"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val aCopies = out.filter(_._2 == "A").map(_._3)
    val bDocs = out.filter(_._2 == "B")
    assert(aCopies.forall(c => c == 2L || c == 3L),
      s"A copies must be floor/ceil of 2.4: ${aCopies.distinct.toSeq}")
    val aExtra = aCopies.count(_ == 3L)
    // md5 draw over 200 docs at p=0.4: expect ~80, allow wide noise band
    assert(aExtra > 40 && aExtra < 120, s"A extra-copy rate off: $aExtra/200")
    assert(bDocs.forall(_._3 == 1L), "B emits only the drawn single copies")
    assert(bDocs.length > 50 && bDocs.length < 150,
      s"B draw rate off: ${bDocs.length}/200 at p=0.5")
    // and each (doc, copy) pair is distinct with contiguous copy indices
    val copies = Pipeline.materializeMix(docs, plan)
      .select($"doc_id", $"copy").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(copies.distinct.length === copies.length, "duplicate (doc, copy) rows")
    copies.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.map(_._2).sorted.toSeq == (0L until cs.length.toLong),
        s"doc $id copy indices not contiguous from 0")
    }
    // pathological plan refused loudly
    val hot = Seq(("A", 2000L * 1000000L)).toDF("source", "epochs_micro")
    val ex = intercept[Exception] {
      Pipeline.materializeMix(docs.filter($"source" === "A"), hot).collect()
    }
    assert(ex.getMessage.contains("maxEpochs") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxEpochs")),
      s"hot plan must name the guard: $ex")
  }

  test("orderMixingAudit discriminates: packing order ~10^6, shuffled order ~share") {
    val sql = spark
    import sql.implicits._
    // 4 strata x 100 chunks
    val chunks = (0 until 400).map(i => (s"s${i / 100}", (i % 100).toLong))
      .toDF("stratum", "chunk_id")
    // packing order: pos = rank in (stratum, chunk_id) — runs of 100
    val packedOrder = chunks.withColumn("pos",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"stratum", $"chunk_id")).cast("long") - 1)
    val packed = Pipeline.orderMixingAudit(packedOrder)
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("same_next_micro"), r.getAs[Long]("share_micro"))).toMap
    packed.foreach { case (s, (same, share)) =>
      assert(same > 950000L, s"$s: packing order must score near 10^6, got $same")
      assert(share === 250000L, s"$s: share must be exactly 1/4, got $share")
    }
    // the q169 shuffle: same chunks, hash order — near the 1/4 share
    val shuffled = Pipeline.orderMixingAudit(
        Pipeline.trainingOrder(chunks, seed = 42, Seq("stratum", "chunk_id")))
      .collect().map(r => r.getAs[String]("stratum") ->
        r.getAs[Long]("same_next_micro")).toMap
    shuffled.foreach { case (s, same) =>
      assert(same < 450000L,
        s"$s: shuffled order must sit near the 250000 share, got $same")
    }
  }

  test("materializeMix → trainingOrder composition: (doc, copy) keys order the multiset") {
    val sql = spark
    import sql.implicits._
    val docs = (1L to 120L).map(i => (i, if (i % 2 == 0) "A" else "B", s"t$i"))
      .toDF("doc_id", "source", "text")
    val plan = Seq(("A", 2200000L), ("B", 700000L)).toDF("source", "epochs_micro")
    val mixed = Pipeline.materializeMix(docs, plan)
    val ordered = Pipeline.trainingOrder(mixed, seed = 9L,
      keyCols = Seq("doc_id", "copy"))
    val rows = ordered.select($"doc_id", $"copy", $"pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the permutation covers the full multiset exactly
    assert(rows.map(_._3).sorted.toSeq == (0L until rows.length.toLong))
    // copies of the SAME doc land apart: with >100 rows, a shuffled
    // order should separate nearly all of a doc's copies
    val adjacentSameDoc = rows.sortBy(_._3).sliding(2).count {
      case Array(a, b) => a._1 == b._1
      case _ => false
    }
    // deterministic fixture outcome: 4 of ~160 adjacencies (expected ~1
    // under independence; a per-doc grouping would score ~60+)
    assert(adjacentSameDoc <= 8,
      s"copies of one doc must scatter, found $adjacentSameDoc adjacent")
  }

  test("tokenQuota: partition-invariant, monotone in budget, oversize-first admitted") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(31)
    val docs = ((1L to 200L).map { i =>
      (i, s"s${i % 3}", Seq.fill(1 + rnd.nextInt(12))("w").mkString(" "))
    } :+ ((999L, "solo", Seq.fill(500)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    def kept(budget: Int, parts: Int): Set[Long] =
      Pipeline.tokenQuota(docs.repartition(parts), budget)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    val k1 = kept(40, 1); val k7 = kept(40, 7)
    assert(k1 === k7, "admission must not depend on partitioning")
    assert(k1.nonEmpty && (k1 -- Set(999L)).size < 200,
      s"budget must bite: ${k1.size}")
    // monotone: raising the budget only admits more
    val k2 = kept(80, 4)
    assert(k1.subsetOf(k2), "a higher budget must be a superset admission")
    // budget >= total admits everything
    assert(kept(10000, 4).size === 201)
    // a doc bigger than the whole budget still enters when it is its
    // stratum's hash-first (cum-before 0 < budget): the solo stratum's
    // one 500-token doc survives a 40-token budget
    assert(k1.contains(999L), "a quota must never erase a stratum")
  }

  test("tokenQuotaReport reconciles exactly with the gate; oversize utilization visible") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(41)
    val docs = ((1L to 150L).map { i =>
      (i, s"s${i % 3}", Seq.fill(1 + rnd.nextInt(10))("w").mkString(" "))
    } :+ ((999L, "solo", Seq.fill(400)("w").mkString(" ")))
      :+ ((998L, null.asInstanceOf[String], "dropped strata row")))
      .toDF("doc_id", "source", "text")
    val report = Pipeline.tokenQuotaReport(docs, budgetTokens = 60)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // the report can never disagree with the gate: same kernel, one pass
    val admitted = Pipeline.tokenQuota(docs, budgetTokens = 60)
      .groupBy($"source").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    report.foreach { case (src, (nOff, offTok, nAdm, admTok, spill, util)) =>
      assert(admitted.get(src).map(_._1).getOrElse(0L) === nAdm,
        s"$src: report n_admitted must equal the gate's")
      assert(admitted.get(src).map(_._2).getOrElse(0L) === admTok,
        s"$src: report admitted_tokens must equal the gate's")
      assert(spill === offTok - admTok && nOff >= nAdm)
      assert(util === admTok * 1000000L / 60L)
    }
    // offered covers every non-null-strata doc — the dropped-strata row
    // is in NEITHER side (the streaming-twin admission rule)
    assert(report.values.map(_._1).sum === 151L, s"offered: $report")
    assert(!report.contains(null))
    // the solo oversize doc: utilization exceeds 10^6 VISIBLY
    assert(report("solo")._6 > 1000000L,
      s"oversize-first admission must be visible: ${report("solo")}")
  }

  test("tokenQuota: duplicate doc_id refuses loudly; plain packing stays permissive") {
    val sql = spark
    import sql.implicits._
    // both copies of doc 5 share one __qkey and sit adjacent in the
    // kernel's order — without the refusal they'd silently double-spend
    // the budget; the pass-1 scan catches them (complete: the range
    // partitioner never splits equal keys)
    val dup = ((1L to 10L).map(i => (i, "s0", s"w$i x$i y$i")) :+
        ((5L, "s0", "dup copy text"))).toDF("doc_id", "source", "text")
    val ex = intercept[Exception] {
      Pipeline.tokenQuota(dup, 1000).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("duplicate") ||
      Option(ex.getCause).exists(c => c.getMessage != null &&
        c.getMessage.contains("duplicate")),
      s"duplicate id must name the refusal: $ex")
    // the same id in ANOTHER stratum is not a double-spend (separate
    // budgets) and must pass
    val crossStrata = ((1L to 10L).map(i => (i, "s0", s"w$i")) :+
        ((5L, "s1", "other stratum"))).toDF("doc_id", "source", "text")
    assert(Pipeline.tokenQuota(crossStrata, 1000).count() === 11)
    // packSequences' DEFAULT keeps today's permissive semantics: a
    // repeated id simply packs both copies (mix materialization relies
    // on it via the copy-composite key)
    assert(Pipeline.packSequences(dup, 1000).count() === 11)
  }

  test("trainingOrder: null keys and pre-existing pos column fail loudly") {
    val sql = spark
    import sql.implicits._
    val withNull = Seq(("s0", java.lang.Long.valueOf(1L)), (null, java.lang.Long.valueOf(2L)))
      .toDF("stratum", "chunk_id")
    val ex = intercept[Exception] {
      Pipeline.trainingOrder(withNull, 7L, Seq("stratum", "chunk_id")).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("null key") ||
        Option(ex.getCause).exists(_.getMessage.contains("null key")),
      s"null key must name the refusal: $ex")
    val withPos = Seq(("s0", 1L, 0L)).toDF("stratum", "chunk_id", "pos")
    val ex2 = intercept[IllegalArgumentException] {
      Pipeline.trainingOrder(withPos, 7L, Seq("stratum", "chunk_id"))
    }
    assert(ex2.getMessage.contains("pos"))
    // duplicate key tuples tie completely on (hash, keys): their order
    // is shuffle-delivery-dependent, so the reproducibility guarantee
    // would be silently false — refused loudly instead
    val dup = Seq(("s0", 1L, "a"), ("s0", 1L, "b"), ("s0", 2L, "c"))
      .toDF("stratum", "chunk_id", "payload")
    val ex3 = intercept[Exception] {
      Pipeline.trainingOrder(dup, 7L, Seq("stratum", "chunk_id")).collect()
    }
    assert(ex3.getMessage.contains("duplicate key") ||
      Option(ex3.getCause).exists(_.getMessage.contains("duplicate key")),
      s"duplicate keys must name the refusal: $ex3")
  }

  test("materializeMix: guard boundary (exactly maxEpochs refuses) and column collisions") {
    val sql = spark
    import sql.implicits._
    val docs = Seq((1L, "A", "x")).toDF("doc_id", "source", "text")
    // exactly 1000 epochs = the documented refusal point (≥, not >)
    val atLimit = Seq(("A", 1000L * 1000000L)).toDF("source", "epochs_micro")
    val ex = intercept[Exception] {
      Pipeline.materializeMix(docs, atLimit).collect()
    }
    assert(ex.getMessage.contains("maxEpochs") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxEpochs")))
    // pre-existing output columns refuse loudly (the chunk_id rule)
    val withCopy = docs.withColumn("copy", org.apache.spark.sql.functions.lit(0L))
    val ex2 = intercept[IllegalArgumentException] {
      Pipeline.materializeMix(withCopy, Seq(("A", 500000L)).toDF("source", "epochs_micro"))
    }
    assert(ex2.getMessage.contains("copy"))
  }
}
