package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: build → search must return BIT-IDENTICAL
  * results to the inline fit-and-search with the same parameters (search
  * is the same code path; training is the same seeding + Lloyd loops),
  * and the on-disk artifacts must be self-describing.
  */
class AnnIndexSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ann-index")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("search against the persisted index == inline ivfPqTopK, bit for bit") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)

    val dir = Files.createTempDirectory("graft-ann-index").toString
    AnnIndex.build(emb, dir, nClusters = 8, iters = 3,
      numSub = 8, codebookK = 16, subIters = 2)
    val fromIndex = AnnIndex.search(emb, dir, queries, k = 5,
        nProbe = 3, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    val inline = Similarity.ivfPqTopK(emb, queries, k = 5,
        nClusters = 8, nProbe = 3, iters = 3,
        numSub = 8, codebookK = 16, subIters = 2, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

    assert(fromIndex.nonEmpty, "index search returned no rows")
    assert(fromIndex.toSeq == inline.toSeq,
      s"index search diverged from inline:\n index=${fromIndex.take(5).toSeq}\n inline=${inline.take(5).toSeq}")
  }

  test("artifacts are self-describing parquet (coarse / books / codes)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft-ann-artifacts").toString
    AnnIndex.build(emb, dir, nClusters = 4, iters = 1,
      numSub = 4, codebookK = 8, subIters = 1)

    val coarse = spark.read.parquet(s"$dir/coarse")
    assert(coarse.count() === 4)
    val books = spark.read.parquet(s"$dir/books")
    assert(books.select(countDistinct(col("m"))).head.getLong(0) === 4)
    assert(books.count() === 4L * 8)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() === emb.count())
    // every code within the fitted codebook range
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 8).count()
    assert(bad === 0)
  }

  test("append: frozen-model encode is deterministic; appended vectors are findable") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)

    val dirA = Files.createTempDirectory("graft-ann-appA").toString
    val dirB = Files.createTempDirectory("graft-ann-appB").toString
    Seq(dirA, dirB).foreach(AnnIndex.build(corpus, _, nClusters = 8,
      iters = 2, numSub = 4, codebookK = 8, subIters = 1))
    Seq(dirA, dirB).foreach(AnnIndex.append(batch, _))

    val nAll = emb.count()
    val codesA = spark.read.parquet(s"$dirA/codes")
    assert(codesA.count() === nAll, "append grows codes by exactly the batch")

    // same frozen model → two appends encode identically (cell + codes)
    def rows(dir: String) = spark.read.parquet(s"$dir/codes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(rows(dirA) === rows(dirB), "frozen-model encode must be deterministic")

    // an exact copy of an appended vector must retrieve it at rank 1
    // (exact re-rank puts cosine 1.0 first; id tie-break can only
    // prefer the identical vector itself)
    val probeId = batch.select(min(col("vec_id"))).head.getLong(0)
    // probe under a FRESH id (search excludes same-id matches) carrying
    // the appended vector's exact embedding; shortlist deep enough that
    // the coarse 4×8 ADC ranking can't drop the copy before the exact
    // re-rank (which then pins cosine 1.0 first)
    val q = emb.filter(col("vec_id") === probeId)
      .withColumn("vec_id", lit(999999L))
    val top = AnnIndex.search(emb, dirA, q, k = 1, nProbe = 8, shortlist = 200)
      .collect().head
    assert(top.getLong(2) === probeId && top.getDouble(3) === 1.0,
      s"appended vector $probeId must surface at cosine 1.0, got $top")
  }

  test("prune: forgotten ids never surface; search == same-model index of survivors; " +
      "append composes before and after") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val forget = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val forgetIds = forget.collect().map(_.getLong(0)).toSet

    val dir = Files.createTempDirectory("graft-ann-prune").toString
    AnnIndex.build(emb, dir, nClusters = 8, iters = 2,
      numSub = 4, codebookK = 8, subIters = 1)
    AnnIndex.prune(forget, dir)

    // (a) pruned ids are gone from the artifact and from EVERY result
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.filter(col("nid").isin(forgetIds.toSeq: _*)).count() === 0L)
    assert(codes.count() === emb.count() - forgetIds.size)
    val res = AnnIndex.search(emb, dir, queries, k = 10,
      nProbe = 8, shortlist = 200)
    val returned = res.collect().map(_.getLong(2)).toSet
    assert(returned.nonEmpty && returned.intersect(forgetIds).isEmpty,
      s"pruned ids surfaced in search: ${returned.intersect(forgetIds)}")

    // (c) pruned index == an index of only the survivors under the SAME
    // frozen model (coarse/books copied, survivors encoded into codes/)
    val ref = Files.createTempDirectory("graft-ann-prune-ref").toString
    spark.read.parquet(s"$dir/coarse").write.parquet(s"$ref/coarse")
    spark.read.parquet(s"$dir/books").write.parquet(s"$ref/books")
    AnnIndex.append(emb.filter(col("vec_id") % 7 =!= 0), ref)
    def rows(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val refRes = AnnIndex.search(emb, ref, queries, k = 10,
      nProbe = 8, shortlist = 200)
    assert(rows(res) == rows(refRes),
      "pruned-index search must be bit-identical to a survivor-only " +
        "index under the same model")

    // (b) append after prune composes; a re-played delete is idempotent
    val back = emb.filter(col("vec_id") % 7 === 0 && col("vec_id") % 2 === 0)
      .withColumn("vec_id", col("vec_id") + 2000000L)
    AnnIndex.append(back, dir)
    AnnIndex.prune(forget, dir)
    val codes2 = spark.read.parquet(s"$dir/codes")
    assert(codes2.count() === emb.count() - forgetIds.size + back.count())
    assert(codes2.filter(col("nid").isin(forgetIds.toSeq: _*)).count() === 0L)
  }

  test("searchWithin: filtered search == search over a same-model permitted-only index") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val allowed = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet

    val dir = Files.createTempDirectory("graft-ann-within").toString
    AnnIndex.build(emb, dir, nClusters = 8, iters = 2,
      numSub = 4, codebookK = 8, subIters = 1)
    val filtered = AnnIndex.searchWithin(emb, dir, queries, allowed,
      k = 5, nProbe = 8, shortlist = 100)
    val rowsF = filtered.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rowsF.nonEmpty && rowsF.forall(t => allowedIds.contains(t._3)),
      s"every filtered result must be in scope: ${rowsF.filterNot(t => allowedIds.contains(t._3))}")

    // reference: an index that only ever contained the permitted ids,
    // under the SAME frozen model (coarse/books copied, codes pruned)
    val ref = Files.createTempDirectory("graft-ann-within-ref").toString
    spark.read.parquet(s"$dir/coarse").write.parquet(s"$ref/coarse")
    spark.read.parquet(s"$dir/books").write.parquet(s"$ref/books")
    spark.read.parquet(s"$dir/codes").write.parquet(s"$ref/codes")
    AnnIndex.prune(emb.filter(col("vec_id") % 3 =!= 0).select(col("vec_id")), ref)
    val rowsR = AnnIndex.search(emb, ref, queries, k = 5,
        nProbe = 8, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rowsF == rowsR,
      "pre-shortlist filter must equal a permitted-only index, not a post-filter")
  }

  test("recallAudit: per-query recall vs brute force + macro average; bounded [0,1]") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val sample = emb.filter(col("vec_id") < 8)
    val dir = Files.createTempDirectory("graft-ann-recall").toString
    AnnIndex.build(emb, dir, nClusters = 8, iters = 2,
      numSub = 4, codebookK = 8, subIters = 1)
    val audit = AnnIndex.recallAudit(emb, dir, sample, k = 5,
      nProbe = 8, shortlist = 200).collect()
    val perQ = audit.filter(!_.isNullAt(0))
    val macroRow = audit.filter(_.isNullAt(0))
    assert(perQ.length === 8, s"one row per sampled query: ${perQ.length}")
    assert(perQ.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    assert(macroRow.length === 1)
    val macroAvg = macroRow.head.getDouble(2)
    val mean = perQ.map(_.getDouble(2)).sum / perQ.length
    assert(math.abs(macroAvg - mean) < 1e-9,
      s"macro row must average the per-query recalls: $macroAvg vs $mean")
    // deep probe over every cell with a big shortlist ≈ exact: measured
    // macro recall on this fixture is exactly 1.0 (deterministic build —
    // seeded k-means, fixed corpus), pinned at measured − 0.1
    assert(macroAvg >= 0.9, s"audited recall below measured-0.1 floor: $macroAvg")
  }

  test("append: a batch whose dim differs from the frozen model fails loudly") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft-ann-dimck").toString
    AnnIndex.build(emb, dir, nClusters = 4, iters = 1,
      numSub = 4, codebookK = 8, subIters = 1)
    val truncated = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 5000000L)
      .withColumn("embedding", slice(col("embedding"), 1, 7))
    val e = intercept[Exception] { AnnIndex.append(truncated, dir) }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("frozen model dim")),
      s"dim mismatch must raise the append guard, got: $msgs")
    // and nothing was appended
    assert(spark.read.parquet(s"$dir/codes").count() === emb.count())
  }
}
