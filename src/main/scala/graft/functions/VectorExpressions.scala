package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native vector arithmetic for the similarity-search path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express a dot
  * product correctly but are CodegenFallback — every row pays lambda
  * interpretation over 64 elements. These expressions generate a tight
  * primitive loop inside whole-stage codegen instead (preference (b) of
  * the custom-operator ladder: an `Expression` before any planner
  * surgery). Summation order is the same sequential left fold, so results
  * stay bit-identical to the HOF formulation and the DuckDB oracle.
  *
  * Inputs must be ARRAY<DOUBLE> (cast upstream); null elements are treated
  * as 0 to keep the loop branch-free.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm — `sqrt(array_dot(a, a))` without materializing twice. */
case class ArrayNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val v = x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $v = $a.getDouble($i);
          $acc += $v * $v;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNorm =
    copy(child = newChild)
}

/** Index of the nearest centroid (squared L2) for an ARRAY<DOUBLE> vector.
  *
  * The K×dim centroid matrix rides inside the expression as a flat
  * `double[]` reference object — a fitted-model literal, exactly like a
  * broadcast variable but visible to whole-stage codegen. This makes
  * k-means `assign` a pure map-side projection: no crossJoin, no shuffle,
  * no per-row allocation. Ties break to the lowest centroid id
  * (strict `<` with ascending scan).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val k = centroids.length
  private lazy val dim = if (k > 0) centroids(0).length else 0
  private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      System.arraycopy(centroids(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = c * dim
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = x.getDouble(i) - flat(base + i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
        int $n = java.lang.Math.min($dim, $a.numElements());
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $c = 0; $c < $k; $c++) {
          int $base = $c * $dim;
          double $d = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $t = $a.getDouble($i) - $flatRef[$base + $i];
            $d += $t * $t;
          }
          if ($d < $bestD) { $bestD = $d; $best = $c; }
        }
        ${ev.value} = $best;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `pq_dist_table(queryResidual)` → ARRAY<DOUBLE> of numSub×k squared
  * distances between each query sub-vector and each product-quantization
  * codebook centroid — the per-query ADC (asymmetric distance
  * computation) lookup table, built ONCE per (query, probed cell) and
  * then shared by every candidate scored against it.
  */
case class PqDistTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  private lazy val numSub = codebooks.length
  private lazy val k = if (numSub > 0) codebooks(0).length else 0
  private lazy val subDim = if (k > 0) codebooks(0)(0).length else 0
  // [ (m*k + c) * subDim + j ]
  private lazy val flat: Array[Double] = {
    val out = new Array[Double](numSub * k * subDim)
    var m = 0
    while (m < numSub) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(m)(c), 0, out, (m * k + c) * subDim, subDim)
        c += 1
      }
      m += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val table = new Array[Double](numSub * k)
    var m = 0
    while (m < numSub) {
      var c = 0
      while (c < k) {
        val base = (m * k + c) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val idx = m * subDim + j
          val xv = if (idx < xn) x.getDouble(idx) else 0.0
          val t = xv - flat(base + j)
          d += t * t
          j += 1
        }
        table(m * k + c) = d
        c += 1
      }
      m += 1
    }
    new GenericArrayData(table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val table = ctx.freshName("table")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      val idx = ctx.freshName("idx")
      val xv = ctx.freshName("xv")
      val xn = ctx.freshName("xn")
      s"""
        int $xn = $a.numElements();
        double[] $table = new double[${numSub * k}];
        for (int $m = 0; $m < $numSub; $m++) {
          for (int $c = 0; $c < $k; $c++) {
            int $base = ($m * $k + $c) * $subDim;
            double $d = 0.0;
            for (int $j = 0; $j < $subDim; $j++) {
              int $idx = $m * $subDim + $j;
              double $xv = $idx < $xn ? $a.getDouble($idx) : 0.0;
              double $t = $xv - $flatRef[$base + $j];
              $d += $t * $t;
            }
            $table[$m * $k + $c] = $d;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($table);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** `pq_adc_score(table, codes)` → DOUBLE: Σ over subspaces of
  * table[m·k + codes[m]] — the ADC approximate squared distance of one
  * PQ-encoded candidate to the query whose lookup table this is. The hot
  * path of IVF-PQ search: one array index per subspace, no vector math.
  */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes with Serializable {
  require(k >= 1, s"codebook size k must be >= 1, got $k")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(tableAny: Any, codesAny: Any): Any = {
    val table = tableAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    var s = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      val code = codes.getInt(m)
      if (code < 0 || code >= k)
        throw new IllegalArgumentException(
          s"PQ code $code out of range [0, $k) — codes were built against " +
            "a different codebook size than this ADC table")
      s += table.getDouble(m * k + code)
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (table, codes) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      s"""
        double $s = 0.0;
        int $n = $codes.numElements();
        for (int $m = 0; $m < $n; $m++) {
          int $code = $codes.getInt($m);
          if ($code < 0 || $code >= $k) {
            throw new IllegalArgumentException(
              "PQ code " + $code + " out of range [0, $k) — codes were built " +
              "against a different codebook size than this ADC table");
          }
          $s += $table.getDouble($m * $k + $code);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two ARRAY<LONG> values are equal — the
  * MinHash signature-agreement kernel. The `aggregate(zip_with(...))`
  * formulation is CodegenFallback: every CANDIDATE PAIR pays two
  * interpreted 64-element lambda passes in the LSH verify, the exact
  * hot-loop trap the repo's HOF lesson documents. This is one fused
  * primitive loop inside whole-stage codegen; counting stops at the
  * shorter length (equal lengths in practice — signatures share
  * nHashes). */
case class EqualLanes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "equal_lanes"

  // A NULL lane never counts as equal (to anything, including another
  // NULL) — the semantics of the `aggregate(zip_with(a, b, _ === _))`
  // formulation this expression replaced: getLong on a null lane would
  // silently read 0, inflating agreement counts for SQL callers with
  // nullable arrays (graft_equal_lanes is on the public surface).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $acc = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
              $a.getLong($i) == $b.getLong($i)) $acc++;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqualLanes =
    copy(left = newLeft, right = newRight)
}

/** `signed_fold_micro(q)` → ARRAY<LONG> of `outDim` signed sums
  * `proj[j] = Σ_i q[i] · signs[i·outDim + j]` over an ARRAY<LONG> µ-unit
  * vector — the Johnson–Lindenstrauss ±1 projection kernel in ONE
  * codegen'd loop. Replaces an `array(outDim × aggregate(zip_with(...)))`
  * formulation whose 16 interpreted lambda folds × 64 elements paid
  * per-row boxing for every multiply-add (the r18 q109 measurement);
  * integer arithmetic is identical, so results are bit-equal.
  *
  * Null/length semantics mirror the HOF formulation for every NON-NULL
  * input array: `zip_with` null-pads a length mismatch and a null lane
  * nulls its products, so any input that is not a fully-non-null
  * `inDim`-length array yields every output dim NULL. One DELIBERATE
  * divergence (ADVICE r18): a NULL input ARRAY null-propagates to a NULL
  * result (UnaryExpression default), where the old
  * `array(aggregate(zip_with(null,…))…)` built a non-null array of
  * `outDim` NULLs. Embeddings are non-null at every call site, so no
  * declared query can observe the difference; a downstream `is null`
  * check on the projection WOULD.
  */
case class SignedFoldMicro(child: Expression, signs: Array[Long], outDim: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(outDim > 0 && signs.length % outDim == 0,
    s"signs length ${signs.length} not a multiple of outDim $outDim")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "signed_fold_micro"

  private lazy val inDim = signs.length / outDim

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != inDim || (0 until inDim).exists(x.isNullAt))
      return new GenericArrayData(new Array[Any](outDim))
    val acc = new Array[Long](outDim)
    var i = 0
    while (i < inDim) {
      val q = x.getLong(i)
      val base = i * outDim
      var j = 0
      while (j < outDim) { acc(j) += q * signs(base + j); j += 1 }
      i += 1
    }
    new GenericArrayData(acc.map(Long.box(_): Any))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val out = ctx.freshName("out")
      s"""
        boolean $bad = $a.numElements() != $inDim;
        for (int $i = 0; !$bad && $i < $inDim; $i++) {
          if ($a.isNullAt($i)) $bad = true;
        }
        Object[] $out = new Object[$outDim];
        if (!$bad) {
          long[] $acc = new long[$outDim];
          for (int $i = 0; $i < $inDim; $i++) {
            long $q = $a.getLong($i);
            int $base = $i * $outDim;
            for (int $j = 0; $j < $outDim; $j++) {
              $acc[$j] += $q * $signsRef[$base + $j];
            }
          }
          for (int $j = 0; $j < $outDim; $j++) {
            $out[$j] = java.lang.Long.valueOf($acc[$j]);
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SignedFoldMicro =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Dot product of two ARRAY<DOUBLE> columns (codegen'd). */
  def array_dot(a: Column, b: Column): Column =
    column(ArrayDot(expression(a), expression(b)))

  /** L2 norm of an ARRAY<DOUBLE> column (codegen'd). */
  def array_norm(a: Column): Column = column(ArrayNorm(expression(a)))

  /** Equal-position count of two ARRAY<LONG> columns (codegen'd). */
  def equal_lanes(a: Column, b: Column): Column =
    column(EqualLanes(expression(a), expression(b)))

  /** JL ±1 projection kernel over an ARRAY<LONG> µ-unit vector (codegen'd). */
  def signed_fold_micro(q: Column, signs: Array[Long], outDim: Int): Column =
    column(SignedFoldMicro(expression(q), signs, outDim))

  /** Cosine similarity via the codegen'd primitives. */
  def array_cosine(a: Column, b: Column): Column =
    array_dot(a, b) / (array_norm(a) * array_norm(b))

  /** Nearest-centroid id (squared L2, codegen'd) over an embedded matrix. */
  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    column(NearestCentroid(expression(vec), centroids))

  /** Per-query ADC lookup table over embedded PQ codebooks (codegen'd). */
  def pq_dist_table(queryResidual: Column,
                    codebooks: Array[Array[Array[Double]]]): Column =
    column(PqDistTable(expression(queryResidual), codebooks))

  /** ADC approximate distance: sum of table entries picked by codes. */
  def pq_adc_score(table: Column, codes: Column, k: Int): Column =
    column(PqAdcScore(expression(table), expression(codes), k))
}
