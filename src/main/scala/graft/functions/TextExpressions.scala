package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram (shingle) array of a string — the standard MinHash
  * input for near-dup detection that must survive token-boundary edits
  * (the shingle→minhash→band→bucket-join pipeline). Codegen'd for the
  * same reason as the hash expressions: a HOF formulation
  * (`transform(sequence(...), i -> substring(...))`) is interpreted per
  * row and allocates a lambda frame per shingle.
  *
  * Overlapping shingles, char-based (UTF8-aware); strings shorter than k
  * yield a single whole-string shingle so short docs still participate.
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def inputTypes: Seq[DataType] =
    Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    CharShingles.compute(input.asInstanceOf[UTF8String], k)

  // both paths go through the shared O(n) routine — per-shingle
  // substringSQL would rescan the byte stream from position 0 for every
  // shingle (O(n²) per document on the dedup hot path)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharShingles$$.MODULE$$.compute($s, $k);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  /** All overlapping char k-grams in ONE pass: a single private copy of
    * the payload bytes (scan row buffers are reused, so a borrowed
    * reference would silently mutate to later rows' bytes inside any
    * consumer that buffers the array), one walk recording char-boundary
    * byte offsets, then each shingle wraps a range of that private array
    * — zero per-shingle byte copying.
    */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val nBytes = s.numBytes
    val bytes = new Array[Byte](nBytes)
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    // char-boundary byte offsets: offsets(i) = byte position of char i
    val offsets = new Array[Int](nBytes + 1)
    var n = 0
    var off = 0
    while (off < nBytes) {
      offsets(n) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      n += 1
    }
    offsets(n) = nBytes
    if (n <= k) {
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes, 0, nBytes)))
    }
    val cnt = n - k + 1
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      out(i) = UTF8String.fromBytes(bytes, offsets(i), offsets(i + k) - offsets(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Overlapping character k-grams of a string column (codegen'd). */
  def char_shingles(text: Column, k: Int): Column =
    column(CharShingles(expression(text), k))
}
