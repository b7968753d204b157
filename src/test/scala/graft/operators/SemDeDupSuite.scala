package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup cluster-then-prune semantic dedup: the clustered mode is
  * gated against the exact all-pairs mode (nClusters = 1 IS exact), the
  * keeper rule is min-id, and the cluster-size cap is prospective.
  */
class SemDeDupSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-semdedup")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val dim = 8

  /** Two orthogonal directions (first-half dims vs second-half dims,
    * cross-group cosine exactly 0) with deterministic jitter; ids
    * 101/102 are exact copies of 1/3, id 201 an exact copy of 51 — the
    * copies are the ground-truth dup set at an exact-copy threshold.
    */
  private def fixture() = {
    val sql = spark
    import sql.implicits._
    // per-dim values 1.0..2.0 from distinct mod-11 residue patterns: every
    // base vector is a genuinely different direction (pairwise cosine well
    // below an exact-copy threshold; an additive-constant jitter would
    // leave them near-parallel and defeat the copy-only gate)
    def vec(group: Int, j: Long): Seq[Double] =
      (0 until dim).map { i =>
        val active = if (group == 0) i < dim / 2 else i >= dim / 2
        if (active) 1.0 + ((j * 31 + i * 17) % 11) / 10.0 else 0.0
      }
    val a = (1L to 10L).map(j => (j, vec(0, j)))
    val b = (51L to 60L).map(j => (j, vec(1, j)))
    val dups = Seq((101L, vec(0, 1L)), (102L, vec(0, 3L)), (201L, vec(1, 51L)))
    (a ++ b ++ dups).toDF("vec_id", "embedding")
  }

  test("nClusters=1 equals exact all-pairs cosinePairs losers") {
    val emb = fixture()
    val exactLosers = Dedup.cosinePairs(
        emb.withColumn("label", lit("all")), threshold = 0.999)
      .select(col("vec_b").as("vec_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val semLosers = Dedup.semDeDupLosers(emb, threshold = 0.999,
        nClusters = 1, iters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(semLosers === exactLosers,
      s"nClusters=1 must be the exact mode: sem=$semLosers exact=$exactLosers")
    // the exact copies lose to their min-id originals
    assert(exactLosers.intersect(Set(101L, 102L, 201L)) === Set(101L, 102L, 201L))
    assert(!exactLosers.contains(1L) && !exactLosers.contains(51L),
      "min-id originals are keepers")
  }

  test("clustered mode finds every exact-copy dup (copies always co-cluster); " +
      "keepers+losers partition") {
    val emb = fixture()
    // at an exact-copy threshold the gate is robust to clustering
    // quality: identical vectors share an argmin BY CONSTRUCTION, so the
    // clustered mode may never miss one of these pairs
    val exact = Dedup.semDeDupLosers(emb, threshold = 0.99999,
        nClusters = 1, iters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(exact === Set(101L, 102L, 201L), s"exact-copy losers: $exact")
    val clustered = Dedup.semDeDupLosers(emb, threshold = 0.99999,
        nClusters = 2, iters = 3)
      .collect().map(_.getLong(0)).toSet
    assert(clustered === exact,
      s"copies must never straddle cells: clustered=$clustered exact=$exact")

    val keepers = Dedup.semDeDup(emb, threshold = 0.99999,
        nClusters = 2, iters = 3)
      .collect().map(_.getLong(0)).toSet
    val all = emb.collect().map(_.getLong(0)).toSet
    assert(keepers.intersect(clustered).isEmpty && (keepers ++ clustered) === all,
      "keepers and losers must partition the corpus")
  }

  test("cap applies before any vector shuffle: no Window, broadcast anti-join") {
    val emb = fixture()
    val v = emb.select(col("vec_id").as("nid"),
      Similarity.asDouble(col("embedding")).as("cv"))
    val cents = Dedup.fitSemDeDupModel(emb, nClusters = 2, iters = 1)
    val frame = Dedup.cappedAssignment(v, cents, maxClusterSize = 4096)
    // the r8 regression: a Window count over cid shuffled the full vector
    // payload of exactly the degenerate cell the cap exists to contain
    val windows = frame.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"cap must not use a Window over cid: $windows")
    val phys = frame.queryExecution.sparkPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      s"over-cap cid set must broadcast into an anti-join:\n$phys")
  }

  test("an oversized cluster is dropped from pairing prospectively") {
    val emb = fixture()
    // every cluster exceeds a cap of 2 → no candidate pairs at all
    val losers = Dedup.semDeDupLosers(emb, threshold = 0.999,
        nClusters = 2, iters = 3, maxClusterSize = 2)
      .collect()
    assert(losers.isEmpty,
      s"capped-out clusters must produce no pairs, got ${losers.toSeq}")
    intercept[IllegalArgumentException] {
      Dedup.semDeDupLosers(emb, threshold = 0.5, nClusters = 0)
    }
  }
}
