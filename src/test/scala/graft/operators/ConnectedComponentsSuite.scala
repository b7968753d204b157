package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** connectedComponents / dedupClusters: pairs → canonical-member clusters.
  * The transitive case (a~b, b~c, but never a~c as a pair) is the whole
  * reason the operator exists — per-pair keep-the-smaller-id would retain
  * 2 of 3 chain members.
  */
class ConnectedComponentsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-cc")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sql = spark
    import sql.implicits._
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long chain collapses to one component (multi-round propagation)") {
    // path 1-2-3-...-9: diameter 8 forces several propagation rounds; the
    // min label must walk the whole chain
    val chain = (1L until 9L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got === (1L to 9L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep distinct canonical ids") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("late merge: two grown components joined by a single bridge edge") {
    // components {1,2,3} and {7,8,9} merge through (3,7) — labels that
    // already converged locally must keep flowing across the bridge
    val got = components(Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (3L, 7L)))
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 7L, 8L, 9L))
  }

  test("dedupClusters: chain retains exactly the canonical member; singletons retained") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(
      (1L, "aaa"), (2L, "aab"), (3L, "abb"), // chain via pairs below
      (5L, "zzz"))                           // appears in no pair
    .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.dedupClusters(docs, pairs)
      .select("doc_id", "comp", "retained")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (5L, 5L, 1)))
  }

  private def unionFindOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).flatMap { case (_, members) =>
      val canon = members.min; members.map(_ -> canon)
    }
  }

  private def alternating(pairs: Seq[(Long, Long)],
                          maxIterations: Int = 40): Map[Long, Long] = {
    val sql = spark
    import sql.implicits._
    Dedup.connectedComponentsAlternating(pairs.toDF("doc_a", "doc_b"),
        maxIterations = maxIterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("alternating star variant matches union-find on random graphs (property)") {
    // several seeds × densities: sparse (mostly chains/singletons pairs),
    // medium, and dense (one giant component) — the label contract must be
    // identical to the frontier variant's for every shape
    for (seed <- Seq(1, 2, 3); n <- Seq(30, 80)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(n)((rng.nextInt(50).toLong, rng.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      assert(alternating(edges) === unionFindOracle(edges),
        s"seed=$seed n=$n")
    }
  }

  test("adversarial 10k-node path graph converges in O(log n) star rounds") {
    // diameter 9999 — the frontier variant would need ~10k rounds; the
    // alternating variant's bound is O(log n): 40 rounds is orders of
    // magnitude of headroom over log2(10000) ≈ 13.3, and the require
    // inside the operator fails loudly if the bound is ever exceeded
    val path = (1L until 10000L).map(i => (i, i + 1))
    val got = alternating(path)
    assert(got.size === 10000)
    assert(got.values.forall(_ == 1L))
  }

  test("connectedComponents falls back to the star variant past maxIterations") {
    val sql = spark
    import sql.implicits._
    // diameter 29 > maxIterations 5: the frontier loop cannot finish, so
    // the result must come from the fallback — and still be exact
    val path = (1L until 30L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(path.toDF("doc_a", "doc_b"),
        maxIterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 30L).map(_ -> 1L).toMap)
  }

  test("agrees with a brute-force union-find on a random graph") {
    val rng = new scala.util.Random(7)
    val edges = Seq.fill(60)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonicalize: min member per root
    val byRoot = nodes.groupBy(find)
    val expected = byRoot.flatMap { case (_, members) =>
      val canon = members.min; members.map(_ -> canon)
    }
    assert(components(edges) === expected)
  }
}
