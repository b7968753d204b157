package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash / SimHash fingerprints over a token array.
  *
  * The composable formulation (64 × `transform`/`aggregate` HOFs, one per
  * hash function/bit) is semantically fine but each HOF is interpreted
  * per row — at sf0.1 that alone cost ~50-95 s/query. These expressions
  * hash each token ONCE and derive all lanes from it with multiply-xor
  * mixing (the standard "one hash + k mixers" MinHash construction), in
  * Java emitted into whole-stage codegen.
  */
object HashMix {
  /** xxhash64-style avalanche finalizer — applied per (tokenHash, lane). */
  @inline final def mix(h: Long, lane: Long): Long = {
    var x = h ^ (lane * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33
    x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33
    x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  final def tokenHash(s: UTF8String): Long =
    org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42).toLong
}

/** `minhash64(tokens)` → ARRAY<BIGINT> of `nHashes` min-hash lanes. */
case class MinHash64(child: Expression, nHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  // constructor-time: the SQL registration exposes nHashes to arbitrary
  // queries, and nHashes <= 0 would diverge between the interpreted path
  // (empty signature) and codegen (NegativeArraySizeException per row)
  require(nHashes >= 1, s"nHashes must be >= 1, got $nHashes")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = HashMix.tokenHash(arr.getUTF8String(i))
      var lane = 0
      while (lane < nHashes) {
        val v = HashMix.mix(h, lane)
        if (v < mins(lane)) mins(lane) = v
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val lane = ctx.freshName("lane")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
        long[] $mins = new long[$nHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $h = graft.functions.HashMix.tokenHash($a.getUTF8String($i));
          for (int $lane = 0; $lane < $nHashes; $lane++) {
            long $v = graft.functions.HashMix.mix($h, (long) $lane);
            if ($v < $mins[$lane]) $mins[$lane] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash64 =
    copy(child = newChild)
}

/** `simhash64(tokens)` → 64-bit SimHash of the token array. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = HashMix.mix(HashMix.tokenHash(arr.getUTF8String(i)), 0L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) sums(bit) += 1 else sums(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (sums(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bit = ctx.freshName("bit")
      val bit2 = ctx.freshName("bit2")
      val h = ctx.freshName("h")
      val sums = ctx.freshName("sums")
      val out = ctx.freshName("out")
      s"""
        int[] $sums = new int[64];
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $h = graft.functions.HashMix.mix(
            graft.functions.HashMix.tokenHash($a.getUTF8String($i)), 0L);
          for (int $bit = 0; $bit < 64; $bit++) {
            if ((($h >>> $bit) & 1L) == 1L) $sums[$bit]++; else $sums[$bit]--;
          }
        }
        long $out = 0L;
        for (int $bit2 = 0; $bit2 < 64; $bit2++) {
          if ($sums[$bit2] > 0) $out |= (1L << $bit2);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `lsh_sign_bits(vec, table)` → BIGINT of `nBits` random-hyperplane sign
  * bits for an ARRAY<DOUBLE> vector. Plane components are derived
  * deterministically from (table, bit, dim) by the same mixer, centered to
  * [-0.5, 0.5] — both sides of an ANN join bucket identically without
  * shipping a plane matrix.
  */
case class LshSignBits(child: Expression, table: Int, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  // 1L << bit wraps at 64 (Java shift is mod 64), so nBits > 64 would
  // silently alias plane 64 onto plane 0 instead of failing
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sign_bits"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var out = 0L
    var bit = 0
    while (bit < nBits) {
      var acc = 0.0
      var d = 0
      val n = v.numElements()
      while (d < n) {
        val plane = (HashMix.mix(table.toLong * 1315423911L + bit, d.toLong)
          & 0x3FF).toDouble / 1024.0 - 0.5
        acc += v.getDouble(d) * plane
        d += 1
      }
      if (acc > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bit = ctx.freshName("bit")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val plane = ctx.freshName("plane")
      val out = ctx.freshName("out")
      s"""
        long $out = 0L;
        int $n = $a.numElements();
        for (int $bit = 0; $bit < $nBits; $bit++) {
          double $acc = 0.0;
          for (int $d = 0; $d < $n; $d++) {
            double $plane = (graft.functions.HashMix.mix(
                ${table}L * 1315423911L + $bit, (long) $d) & 0x3FFL) / 1024.0 - 0.5;
            $acc += $a.getDouble($d) * $plane;
          }
          if ($acc > 0) $out |= (1L << $bit);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignBits =
    copy(child = newChild)
}

/** `md5_bucket(s, buckets)` ≡ `conv(substring(md5(s), 1, 8), 16, 10) %
  * buckets` — the feature-hash bucket of the importance/quality family —
  * without materializing the 32-char hex string, substring-slicing it, and
  * string-parsing it back per gram (r18: the feature stream is
  * tokens+bigrams, ~1.2M grams per corpus pass at sf0.1, and the hex
  * round-trip was most of the q139/q145 agg pipelines). The first four
  * digest bytes big-endian ARE that hex prefix's value; same md5, same
  * bucket for every input, DuckDB oracles unchanged.
  */
case class Md5Prefix(child: Expression, hexLen: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(hexLen >= 1 && hexLen <= 15, s"hexLen must be in [1,15], got $hexLen")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix.compute(input.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Prefix$$.MODULE$$.compute($s, $hexLen);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  /** Value of the first `hexLen` hex digits of md5(s) — one nibble per
    * digit, most-significant first, exactly the number
    * `conv(substring(md5(s), 1, hexLen), 16, 10)` parses back out of the
    * hex string. */
  def compute(s: UTF8String, hexLen: Int): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1) & 0xFF
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xF
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}

object HashFunctions {
  import ColumnBridge.{column, expression}

  def minhash64(tokens: Column, nHashes: Int): Column =
    column(MinHash64(expression(tokens), nHashes))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def lsh_sign_bits(vec: Column, table: Int, nBits: Int): Column =
    column(LshSignBits(expression(vec), table, nBits))

  /** md5 hex-prefix value (codegen'd; ≡ conv(substring(md5(s), 1, hexLen),
    * 16, 10) — same values, no hex round-trip). */
  def md5_prefix(s: Column, hexLen: Int): Column =
    column(Md5Prefix(expression(s), hexLen))
}
