package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  * Overlapping shingles, char-based (UTF8-aware via `substringSQL`);
  * strings shorter than k yield a single whole-string shingle so short
  * docs still participate.
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n <= k) return new GenericArrayData(Array[Any](s))
    val cnt = n - k + 1
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      out(i) = s.substringSQL(i + 1, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val gad = classOf[GenericArrayData].getName
      s"""
        int $n = $s.numChars();
        if ($n <= $k) {
          ${ev.value} = new $gad(new Object[] { $s });
        } else {
          int $cnt = $n - $k + 1;
          Object[] $arr = new Object[$cnt];
          for (int $i = 0; $i < $cnt; $i++) {
            $arr[$i] = $s.substringSQL($i + 1, $k);
          }
          ${ev.value} = new $gad($arr);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Overlapping character k-grams of a string column (codegen'd). */
  def char_shingles(text: Column, k: Int): Column =
    column(CharShingles(expression(text), k))
}
