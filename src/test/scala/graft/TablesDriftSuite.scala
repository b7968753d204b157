package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The driver's generator has changed `events.ts`'s parquet physical type
  * between rounds (TIMESTAMP(NANOS) → TIMESTAMP_MICROS), which silently
  * broke every integer-ns consumer in r06. `Tables.events` now absorbs
  * the drift at the loader seam; this suite pins BOTH branches — the one
  * the current testdata exercises AND the one it doesn't — so neither can
  * rot unnoticed when the generator flips again.
  */
class TablesDriftSuite extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dirLong: String = _
  private var dirMicros: String = _
  private var dirNtz: String = _

  // one canonical instant, expressed both ways: 2024-03-01T12:34:56.789Z
  private val micros = 1709296496789000L
  private val nanos  = micros * 1000L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tables-drift")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage two sf-dirs whose events.parquet differ ONLY in ts physical
    // type: a ns-long column (what nanosAsLong surfaces for
    // TIMESTAMP(NANOS)) and a genuine timestamp column (MICROS)
    dirLong = Files.createTempDirectory("graft-drift-long").toString
    dirMicros = Files.createTempDirectory("graft-drift-micros").toString
    dirNtz = Files.createTempDirectory("graft-drift-ntz").toString
    val base = spark.range(1).select(
      lit(7L).as("event_id"), lit(42L).as("user_id"),
      lit("view").as("event_type"), lit(1.5).as("value"),
      lit("{}").as("props"))
    base.withColumn("ts", lit(nanos))
      .write.mode("overwrite").parquet(s"$dirLong/events.parquet")
    base.withColumn("ts", timestamp_micros(lit(micros)))
      .write.mode("overwrite").parquet(s"$dirMicros/events.parquet")
    // the driver's current flavor: TIMESTAMP_MICROS with
    // isAdjustedToUTC=false → Spark reads TimestampNTZType. Written under
    // the UTC session so the naive wall-clock IS the UTC instant.
    base.withColumn("ts", timestamp_micros(lit(micros)).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirNtz/events.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("events.ts arrives as a ns-long from ALL physical flavors, same value") {
    for ((dir, tag) <- Seq((dirLong, "ns-long"), (dirMicros, "micros-utc"),
        (dirNtz, "micros-ntz"))) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType === LongType, s"$tag: ${df.schema("ts")}")
      val v = df.select(col("ts")).head.getLong(0)
      assert(v === nanos, s"$tag must land on the SAME ns instant: $v vs $nanos")
    }
  }

  test("normalization is timezone-independent (session tz must not shift the instant)") {
    // the NTZ branch pins the naive wall-clock to UTC; a session in
    // another zone must still read the identical ns-since-epoch value
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val v = Tables.events(spark, dirNtz).select(col("ts")).head.getLong(0)
      assert(v === nanos, s"Tokyo session shifted the instant: $v vs $nanos")
      val v2 = Tables.events(spark, dirMicros).select(col("ts")).head.getLong(0)
      assert(v2 === nanos, s"Tokyo session shifted the tz'd instant: $v2 vs $nanos")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("an unsupported ts physical type fails LOUDLY at load, not downstream") {
    val dirBad = Files.createTempDirectory("graft-drift-bad").toString
    spark.range(1).select(lit(7L).as("event_id"), lit("not-a-time").as("ts"))
      .write.mode("overwrite").parquet(s"$dirBad/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dirBad))
    assert(e.getMessage.contains("events.ts"))
  }
}
