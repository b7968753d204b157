package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType}

/** Exact decimal arithmetic in the LONG domain for the TPC-H-shaped
  * aggregates (r18 optimization).
  *
  * The q01/q02/q03 money math was expressed as
  * `sum(cast(x as DECIMAL(18,4)) * (1 ± cast(y as DECIMAL(18,4))) ...)`:
  * per row that pays 3-4 double→Decimal casts plus 1-2 NON-COMPACT decimal
  * multiplies (the (18,4)×(18,4) product is DECIMAL(37,8), past the 18-digit
  * compact-long representation, so every row routes through
  * `java.math.BigDecimal` with a precision check) — profiled at 1.9 s of a
  * 2.5 s q01 at sf0.1 (HashAggregate aggTime, single scan task). The exact
  * same rationals are computable as ±scale-4 unscaled LONGS: quantize once
  * per column ([[MicroQuant]] — bit-identical to the Cast's
  * `BigDecimal.valueOf(x).setScale(s, HALF_UP)`), multiply/add in plain
  * codegen'd 64-bit integers (products bounded far under 2^63 by the money
  * domain), sum as compact `DECIMAL(38,0)`, and convert the handful of
  * FINAL per-group sums back through [[UnscaledToDouble]] (the same
  * `BigDecimal(unscaled, scale).doubleValue()` the old plan's final cast
  * performed). Values are equal by construction at every step, so the
  * oracle hashes cannot move.
  */
case class MicroQuant(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  // Domain note (ADVICE r18): OUT of the bounded money domain this
  // expression diverges from the `cast(x as DECIMAL(18,4))` it replaced —
  // the non-ANSI cast returns NULL on NaN/Infinity/precision overflow,
  // while BigDecimal.valueOf(NaN) / longValueExact THROW, failing the
  // task loudly instead of nulling the row. That is deliberate: every
  // call site feeds TPC-H money columns whose products are bounded
  // ≤ ~1.1e17 < 2^63 (BatchQueries q01-q03 bounds note), so an overflow
  // here means corrupted input, and a loud failure beats a silent NULL
  // changing an aggregate. Do not reuse for unbounded/NaN-able domains.
  require(scale >= 0 && scale <= 9, s"unsupported scale $scale")
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "micro_quant"

  override def nullSafeEval(a: Any): Any = {
    val d = a.asInstanceOf[Double]
    java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = java.math.BigDecimal.valueOf($a)
          .setScale($scale, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MicroQuant =
    copy(child = newChild)
}

/** `unscaled_double(x, scale)` → `BigDecimal(x, scale).doubleValue()` for a
  * DECIMAL(38,0) unscaled sum — the exact value (and therefore the exact
  * IEEE double) the old plan's `cast(sum(decimal…) as double)` produced.
  * Runs once per OUTPUT group, never per input row.
  */
case class UnscaledToDouble(child: Expression, scale: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(scale >= 0 && scale <= 18, s"unsupported scale $scale")
  override def inputTypes: Seq[DataType] = Seq(DecimalType(38, 0))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "unscaled_double"

  override def nullSafeEval(a: Any): Any = {
    val d = a.asInstanceOf[Decimal]
    new java.math.BigDecimal(d.toJavaBigDecimal.unscaledValue(), scale).doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = new java.math.BigDecimal(
          $a.toJavaBigDecimal().unscaledValue(), $scale).doubleValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): UnscaledToDouble =
    copy(child = newChild)
}

object DecimalFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Scale-`s` unscaled-long quantization of a double — bit-identical to
    * `cast(x as DECIMAL(18, s))`'s rounding. */
  def micro_quant(x: Column, scale: Int = 4): Column =
    column(MicroQuant(expression(x), scale))

  /** Exact double of a DECIMAL(38,0) unscaled sum at `scale`. */
  def unscaled_double(x: Column, scale: Int): Column =
    column(UnscaledToDouble(expression(x), scale))
}
