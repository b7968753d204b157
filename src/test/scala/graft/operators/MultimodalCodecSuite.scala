package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** Real javax.imageio codec path: PNG encode→decode round-trips the
  * generative pixels exactly; nearest-neighbor resample picks the
  * documented source coordinates (up- and down-scale); corrupt payloads
  * fail loudly instead of producing silent garbage features.
  */
class MultimodalCodecSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-multimodal-codec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def grayRef(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  test("PNG round-trip reproduces the generative pixels exactly") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(0L, 1L, 7L, 123L).toDF("doc_id")
    val feats = Multimodal.decodeImage(Multimodal.withPngMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    Seq(0L, 1L, 7L, 123L).foreach { id =>
      val (w, h) = ((id % 8 + 4).toInt, (id % 6 + 3).toInt)
      val expectedSum = (for (y <- 0 until h; x <- 0 until w)
        yield grayRef(id, x, y).toLong).sum
      val f = feats(id)
      assert((f.width, f.height, f.n_pixels) === ((w, h, w.toLong * h)))
      assert(f.pixel_sum === expectedSum, s"doc $id pixel sum")
      assert(f.h0 + f.h1 + f.h2 + f.h3 === w.toLong * h)
    }
  }

  test("nearest-neighbor resample reads floor-mapped source pixels, both directions") {
    val sql = spark
    import sql.implicits._
    val docs = Seq(5L).toDF("doc_id") // 9x8 source
    val (w, h) = (9, 8)
    // downscale 9x8 -> 4x3
    val down = Multimodal.resizeImageNN(Multimodal.withPngMedia(docs), 4, 3)
      .collect().head
    val expected = (for (y <- 0 until 3; x <- 0 until 4)
      yield grayRef(5L, x * w / 4, y * h / 3).toLong).sum
    assert(down.pixel_sum === expected)
    assert((down.out_w, down.out_h) === ((4, 3)))
    // upscale 9x8 -> 12x9: floor mapping duplicates source pixels
    val up = Multimodal.resizeImageNN(Multimodal.withPngMedia(docs), 12, 9)
      .collect().head
    val expectedUp = (for (y <- 0 until 9; x <- 0 until 12)
      yield grayRef(5L, x * w / 12, y * h / 9).toLong).sum
    assert(up.pixel_sum === expectedUp)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImageNN(Multimodal.withPngMedia(docs), 0, 3)
    }
  }

  test("corrupt payloads fail loudly, not as garbage features") {
    val sql = spark
    import sql.implicits._
    val bad = Seq(Multimodal.PngRow(1L, Array[Byte](1, 2, 3, 4))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImage(bad).collect()
    }
    assert(e.getMessage != null)
  }
}
