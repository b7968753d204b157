package graft.state

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types._

/** Property: unsigned-lex comparison of RangeKeyCodec encodings must equal
  * value comparison, for every supported fixed-width type, including sign
  * boundaries and IEEE754 negatives — the invariant the whole
  * RangeKeyScan design rests on. Generators sampled with fixed seeds
  * (scalatestplus bridge is not in the offline deps).
  */
class RangeKeyCodecPropertySuite extends AnyFunSuite {

  private def encoded(dt: DataType, v: Any): Array[Byte] = {
    val proj = UnsafeProjection.create(Array[DataType](dt))
    val row = proj.apply(InternalRow(v)).copy()
    val out = new Array[Byte](1 + RangeKeyCodec.width(dt))
    RangeKeyCodec.encode(row, 0, dt, out, 0)
    out
  }

  private def cmp(a: Array[Byte], b: Array[Byte]): Int =
    Integer.signum(java.util.Arrays.compareUnsigned(a, b))

  private def samples[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("long encoding preserves order (incl. Long.Min/Max)") {
    val gen = Gen.frequency(
      8 -> Gen.choose(Long.MinValue, Long.MaxValue),
      2 -> Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L))
    val vs = samples(gen, 300, 7L)
    for (x <- vs; y <- vs.take(30)) {
      assert(cmp(encoded(LongType, x), encoded(LongType, y)) ===
        Integer.signum(java.lang.Long.compare(x, y)), s"($x, $y)")
    }
  }

  test("int encoding preserves order") {
    val vs = samples(Gen.choose(Int.MinValue, Int.MaxValue), 300, 11L) ++
      Seq(Int.MinValue, Int.MaxValue, 0, -1, 1)
    for (x <- vs; y <- vs.take(30)) {
      assert(cmp(encoded(IntegerType, x), encoded(IntegerType, y)) ===
        Integer.signum(Integer.compare(x, y)), s"($x, $y)")
    }
  }

  test("double encoding preserves order on finite values") {
    val gen = Gen.frequency(
      8 -> Gen.choose(-1e300, 1e300),
      2 -> Gen.oneOf(0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
        Double.MaxValue, -Double.MaxValue))
    val vs = samples(gen, 300, 13L)
    for (x <- vs; y <- vs.take(30)) {
      assert(cmp(encoded(DoubleType, x), encoded(DoubleType, y)) ===
        Integer.signum(java.lang.Double.compare(x, y)), s"($x, $y)")
    }
  }

  test("float, short and byte encodings preserve order") {
    val fs = samples(Gen.choose(-1e30f, 1e30f), 200, 17L)
    for (x <- fs; y <- fs.take(20)) {
      assert(cmp(encoded(FloatType, x), encoded(FloatType, y)) ===
        Integer.signum(java.lang.Float.compare(x, y)), s"($x, $y)")
    }
    val ss = samples(Gen.choose(Short.MinValue, Short.MaxValue), 200, 19L)
    for (x <- ss; y <- ss.take(20)) {
      assert(cmp(encoded(ShortType, x), encoded(ShortType, y)) ===
        Integer.signum(java.lang.Short.compare(x, y)), s"($x, $y)")
    }
    val bs = (Byte.MinValue to Byte.MaxValue).map(_.toByte)
    for (x <- bs; y <- bs) {
      assert(cmp(encoded(ByteType, x.toByte), encoded(ByteType, y.toByte)) ===
        Integer.signum(java.lang.Byte.compare(x.toByte, y.toByte)))
    }
  }

  test("null sorts before every value") {
    val nullEnc = encoded(LongType, null)
    samples(Gen.choose(Long.MinValue, Long.MaxValue), 200, 23L).foreach { x =>
      assert(cmp(nullEnc, encoded(LongType, x)) === -1, s"null vs $x")
    }
  }
}
