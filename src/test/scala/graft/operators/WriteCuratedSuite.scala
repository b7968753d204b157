package graft.operators

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** writeCurated: the publish step — per-partition directories, in-file
  * ordering, bounded shard size, lossless round-trip.
  */
class WriteCuratedSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-write-curated")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("partition layout, shard-size bound, in-file order, lossless round-trip") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory("graft-curated").toString + "/corpus"
    Pipeline.writeCurated(docs, out, partitionCol = "lang",
      sortCol = "doc_id", maxRecordsPerFile = 25)

    val back = spark.read.parquet(out)
    // lossless: same rows, schema partition column included
    assert(back.count() === docs.count())
    assert(back.columns.sorted === docs.columns.sorted)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet

    // one directory per lang; every data file obeys the shard cap
    val files = back.inputFiles
    assert(langs.forall(l => files.exists(_.contains(s"lang=$l"))))
    files.foreach { f =>
      val n = spark.read.parquet(f).count()
      assert(n <= 25, s"$f holds $n rows > maxRecordsPerFile")
    }

    // a one-slice read returns exactly that language's rows (directory
    // pruning itself is proven on scan metrics in PartitionPruningSuite)
    val slice = back.filter(col("lang") === langs.head)
    assert(slice.count() === docs.filter(col("lang") === langs.head).count())

    // rows inside each file are sorted by doc_id (reproducible shards +
    // min/max stats usable for row-group skipping)
    files.take(5).foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"$f not sorted by doc_id")
    }
  }
}
