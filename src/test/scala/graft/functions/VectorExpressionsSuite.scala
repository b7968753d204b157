package graft.functions

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class VectorExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-vector-fns")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("array_dot matches HOF fold bit-for-bit on real embeddings") {
    val sql = spark
    import sql.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val a = emb.filter($"vec_id" < 20).select($"vec_id".as("ida"), $"v".as("va"))
    val b = emb.filter($"vec_id".between(20, 40)).select($"vec_id".as("idb"), $"v".as("vb"))
    val pairs = a.crossJoin(b)
      .select(
        VectorFunctions.array_dot($"va", $"vb").as("native"),
        Similarity.dotHof($"va", $"vb").as("hof"))
    val mismatches = pairs.filter($"native" =!= $"hof").count()
    assert(mismatches === 0)
  }

  test("array_norm equals sqrt of self-dot") {
    val sql = spark
    import sql.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform($"embedding", _.cast("double")).as("v"))
    val bad = emb.select(
      VectorFunctions.array_norm($"v").as("n"),
      sqrt(VectorFunctions.array_dot($"v", $"v")).as("s"))
      .filter($"n" =!= $"s").count()
    assert(bad === 0)
  }

  test("array_dot participates in whole-stage codegen") {
    val sql = spark
    import sql.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(transform($"embedding", _.cast("double")).as("v"))
    val plan = emb.select(VectorFunctions.array_dot($"v", $"v").as("d"))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark WSCG stages: the array_dot projection must carry
    // one (the HOF cast projection below it notably does not — HOFs break
    // codegen, which is why these expressions exist)
    val dotLine = plan.linesIterator.find(_.contains("array_dot")).get
    assert(dotLine.trim.startsWith("*("), plan)
  }

  test("nearest_centroid picks the argmin cell, ties to lowest id, codegen'd") {
    val sql = spark
    import sql.implicits._
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0))
    val df = Seq(
      Seq(1.0, 1.0),    // nearest: (0,0) → 0
      Seq(9.0, 1.0),    // nearest: (10,0) → 1
      Seq(1.0, 9.0),    // nearest: (0,10) → 2
      Seq(5.0, 0.0))    // tie between 0 and 1 → lowest id 0
      // repartition keeps the projection physical (ConvertToLocalRelation
      // would otherwise fold it into the LocalRelation)
      .toDF("v").repartition(1)
    val got = df.select(VectorFunctions.nearest_centroid($"v", cents).as("cid"))
    assert(got.collect().map(_.getInt(0)).toSeq === Seq(0, 1, 2, 0))
    val line = got.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("nearest_centroid")).get
    assert(line.contains("*("), "nearest_centroid must stay in WSCG")
  }

  test("pq_dist_table + pq_adc_score reproduce exact subspace distances, codegen'd") {
    val sql = spark
    import sql.implicits._
    // 2 subspaces of dim 2, 2 centroids each — hand-checkable
    val codebooks: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),   // subspace 0
      Array(Array(2.0, 2.0), Array(5.0, 5.0)))   // subspace 1
    val df = Seq(Seq(1.0, 1.0, 2.0, 2.0)).toDF("qr").repartition(1)
    val tableDf = df.select(
      VectorFunctions.pq_dist_table($"qr", codebooks).as("t"))
    val table = tableDf.collect().head.getSeq[Double](0)
    // sub0: (1,1) vs (0,0)=2, vs (1,1)=0; sub1: (2,2) vs (2,2)=0, vs (5,5)=18
    assert(table === Seq(2.0, 0.0, 0.0, 18.0))
    val line = tableDf.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("pq_dist_table")).get
    assert(line.contains("*("), "pq_dist_table must stay in WSCG")

    val scored = Seq((Seq(2.0, 0.0, 0.0, 18.0), Seq(1, 0)), // codes: sub0→1, sub1→0
                     (Seq(2.0, 0.0, 0.0, 18.0), Seq(0, 1)))
      .toDF("t", "codes").repartition(1)
      .select(VectorFunctions.pq_adc_score($"t", $"codes", 2).as("d"))
    assert(scored.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 20.0))
  }

  test("null array yields null, mismatched lengths use the shorter") {
    val sql = spark
    import sql.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val got = df.select(VectorFunctions.array_dot($"a", $"b")).collect()
    assert(got(0).getDouble(0) === 11.0) // 1*3 + 2*4
    assert(got(1).isNullAt(0))
  }

  test("TopKAggregator ranks NaN like the window formulation (largest)") {
    val sql = spark
    import sql.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val scored = Seq((0.5, 10L), (Double.NaN, 11L), (0.9, 12L), (0.8, 13L))
      .toDF("cos", "nid").withColumn("qid", lit(1))
    val topk = udaf(new TopKAggregator(2))
    val agg = scored.groupBy($"qid").agg(topk($"cos", $"nid").as("top"))
      .select(posexplode($"top")).select($"col._2".as("nid"))
      .collect().map(_.getLong(0)).toSeq
    val win = scored.withColumn("rnk", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)))
      .filter($"rnk" <= 2).orderBy($"rnk")
      .collect().map(_.getAs[Long]("nid")).toSeq
    // Spark sorts NaN as the largest double: both must return [11, 12]
    assert(win === Seq(11L, 12L), s"window fixture drifted: $win")
    assert(agg === win, s"aggregator $agg diverged from window $win")
  }

  test("equal_lanes matches the HOF formulation and stays codegen'd") {
    val sql = spark
    import sql.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 200).map { i =>
      val a = Array.fill(64)(rnd.nextLong() % 8)
      // mutate a random subset so agreement varies across the range
      val b = a.clone()
      (0 until rnd.nextInt(65)).foreach(_ => b(rnd.nextInt(64)) = rnd.nextLong())
      (i, a.toSeq, b.toSeq)
    }
    val df = rows.toDF("id", "a", "b")
    val hof = df.select($"id", aggregate(
        zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // repartition defeats ConvertToLocalRelation so the PLAN (not a
    // pre-folded local table) is what the codegen assertion inspects
    val fused = df.repartition(2).select($"id",
        VectorFunctions.equal_lanes($"a", $"b").as("n"))
    val got = fused.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got === hof, "equal_lanes diverged from the HOF fold")
    // AQE's final-plan rendering marks codegen stages with the `*(n)`
    // prefix rather than the literal WholeStageCodegen node name
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("equal_lanes"),
      s"equal_lanes must stay inside a codegen stage:\n$plan")
  }

  test("equal_lanes: a NULL lane never counts as equal (HOF semantics)") {
    val sql = spark
    import sql.implicits._
    // graft_equal_lanes is on the public SQL surface — nullable arrays
    // are legal inputs; getLong on a null lane must not read a phantom 0
    val df = Seq((1,
        Seq[java.lang.Long](1L, null, null, 4L),
        Seq[java.lang.Long](1L, 0L, null, 5L)))
      .toDF("id", "a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.select(VectorFunctions.equal_lanes($"a", $"b")).head().getInt(0)
    // lane 0 equal; lane 1 null vs 0 NOT equal; lane 2 null vs null NOT
    // equal; lane 3 unequal → exactly 1
    assert(run(df) === 1, "interpreted path")
    assert(run(df.repartition(2)) === 1, "codegen path")
  }
}