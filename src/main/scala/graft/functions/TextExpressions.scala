package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

/** Per-document word-n-gram repetition statistics — the Gopher-style
  * repetition quality signals (duplicate-n-gram fraction, most-repeated
  * n-gram count) a curation pipeline thresholds on to drop boilerplate
  * and degenerate loops. Returns STRUCT(n_grams, n_dup, top_count):
  *
  *   - `n_grams`:   total n-gram occurrences in the doc
  *   - `n_dup`:     occurrences belonging to an n-gram that appears ≥2×
  *   - `top_count`: occurrences of the single most frequent n-gram
  *
  * Counts (not fractions) so downstream rollups stay in exact integer
  * arithmetic until one final division — the property that makes the
  * group-level duplicate fraction bit-reproducible across engines.
  *
  * Codegen'd single pass per row: an exploded
  * ngram→groupBy(doc, gram)→groupBy(doc) formulation costs two keyed
  * shuffles of the full gram stream; this is map-side, zero shuffle.
  */
case class NgramRepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "ngram_repetition"

  override def nullSafeEval(input: Any): Any =
    NgramRepetitionStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramRepetitionStats$$.MODULE$$.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionStats =
    copy(child = newChild)
}

object NgramRepetitionStats {
  /** One pass over a private copy of the payload bytes. Tokens are the
    * single-space split (empty tokens kept — `split(text, ' ')` parity
    * with Spark and DuckDB); since the separator is one byte, an n-gram
    * of ADJACENT tokens is a contiguous byte range of the source, so
    * each counting key wraps that range with zero per-gram copying
    * (0x20 never occurs inside a UTF-8 multibyte sequence, making the
    * byte scan char-safe).
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val nBytes = s.numBytes
    val bytes = new Array[Byte](nBytes)
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    var nTokens = 1
    var i = 0
    while (i < nBytes) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    if (nTokens < n) return InternalRow(0L, 0L, 0L)
    // starts(t) = byte offset of token t; sentinel so that n-gram g
    // spans bytes [starts(g), starts(g + n) - 1) — one space before the
    // next token's start
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nBytes) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTokens) = nBytes + 1
    val nGrams = nTokens - n + 1
    val counts = new java.util.HashMap[UTF8String, Array[Int]](nGrams * 2)
    var g = 0
    while (g < nGrams) {
      val st = starts(g)
      val key = UTF8String.fromBytes(bytes, st, starts(g + n) - 1 - st)
      val c = counts.get(key)
      if (c == null) counts.put(key, Array(1)) else c(0) += 1
      g += 1
    }
    var dup = 0L
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c >= 2) dup += c
      if (c > top) top = c
    }
    InternalRow(nGrams.toLong, dup, top)
  }
}

/** Positions (1-based) of every word n-gram of a token array that is a
  * member of a FIXED gram set — the serve-tier primitive of surgical
  * decontamination ([[graft.operators.TextOps.decontaminateSpansServe]]):
  * the eval gram set compiles into the expression, each executor builds
  * ONE `HashSet[UTF8String]` from it lazily (once per task pipeline, not
  * per row), and the per-row cost is O(tokens) hash probes. The
  * literal-map `try_element_at` formulation this replaces was a LINEAR
  * scan of the map per gram — O(tokens × |grams|) — which is why its cap
  * sat at 4096 grams; here the cap is plan-serialization size only.
  *
  * Tokens must come from `split(text, " ")` (the engine-wide
  * tokenization): the joined token stream IS the source text, so every
  * n-gram is a contiguous byte range of ONE rebuilt buffer — zero
  * per-gram copying (the [[NgramRepetitionStats]] technique) and the
  * gram bytes are byte-identical to `concat_ws(" ", slice(toks, i, n))`,
  * the construction the eval side used. A null token element is REFUSED
  * loudly (split never produces one; `concat_ws` would silently skip it
  * and desynchronize gram text from positions).
  */
case class GramSetStarts(child: Expression, n: Int, grams: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(n >= 2, s"gram width must be >= 2, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "gram_set_starts"

  // one set per deserialized expression instance per executor — shared by
  // every task that pipeline runs, never rebuilt per row
  @transient private lazy val gramSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](grams.size * 2)
    grams.foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val nTokens = arr.numElements()
    if (nTokens < n) return GramSetStarts.Empty
    val toks = new Array[UTF8String](nTokens)
    var total = nTokens - 1 // single-space separators
    var i = 0
    while (i < nTokens) {
      val t = arr.getUTF8String(i)
      if (t == null) throw new IllegalArgumentException(
        s"gram_set_starts: null token at index $i - token arrays must " +
          "come from split() (concat_ws would skip the null and shift " +
          "gram text against positions)")
      toks(i) = t
      total += t.numBytes
      i += 1
    }
    val bytes = new Array[Byte](total)
    // starts(t) = byte offset of token t; sentinel so gram g spans
    // bytes [starts(g), starts(g + n) - 1) — one space before the next
    // token's start
    val starts = new Array[Int](nTokens + 1)
    var off = 0
    i = 0
    while (i < nTokens) {
      starts(i) = off
      toks(i).writeToMemory(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
      off += toks(i).numBytes
      if (i < nTokens - 1) { bytes(off) = ' '; off += 1 }
      i += 1
    }
    starts(nTokens) = total + 1
    val nGrams = nTokens - n + 1
    val out = new Array[Int](nGrams)
    var cnt = 0
    var g = 0
    while (g < nGrams) {
      val st = starts(g)
      val key = UTF8String.fromBytes(bytes, st, starts(g + n) - 1 - st)
      if (gramSet.contains(key)) { out(cnt) = g + 1; cnt += 1 }
      g += 1
    }
    if (cnt == 0) GramSetStarts.Empty
    else UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the gram set rides the references array (one object per plan, not
    // per row); codegen emits a single virtual call into the shared
    // O(tokens) routine
    val ref = ctx.addReferenceObj("gramSetStarts", this,
      classOf[GramSetStarts].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSetStarts =
    copy(child = newChild)
}

object GramSetStarts {
  private val Empty: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
}

/** Overlapping word n-grams of a token array — the gram stream every
  * span-dedup / contamination operator explodes. Codegen'd for the same
  * reason as [[CharShingles]]: the HOF formulation
  * (`transform(sequence(1, size−n+1), i -> concat_ws(" ", slice(toks, i,
  * n)))`) is CodegenFallback — per GRAM it paid an interpreted lambda
  * frame, a `slice` array allocation, and a boxed loop index (r18 profile:
  * the three gram-generation pipelines of q144 ran ~560 ms each at sf0.1,
  * ~2 µs/gram). This expression emits the identical strings from one
  * O(tokens·n) loop.
  *
  * Semantics pinned to the HOF form it replaces: `size < n` (or a NULL
  * array) yields an EMPTY array, never null; null tokens inside a window
  * are skipped by the same `concat_ws` null rule (`UTF8String.concatWs`
  * is `concat_ws`'s own kernel).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordNgrams.Empty
    else WordNgrams.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val m = "graft.functions.WordNgrams$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $m.Empty() : $m.compute(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  val Empty: ArrayData = new GenericArrayData(new Array[Any](0))
  private val Sep = UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return Empty
    val m = sz - n + 1
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The 64-char-prefix polynomial rolling hash (mod 1e9+7) behind
  * [[graft.operators.TextOps.fingerprint]] — codegen'd (r18). The HOF form
  * `aggregate(sequence(1, length(t)), 0L, (acc, i) => (acc·31 +
  * ascii(substring(t, i, 1))) % 1000000007)` re-evaluated an interpreted
  * lambda (plus a substring slice) PER CHARACTER. This kernel walks the
  * string's code points once — `length`/`substring` count code points and
  * `ascii` returns the first character's code point, so the fold values
  * are identical (TextExprSuite pins equality against the HOF form,
  * including non-ASCII and empty inputs).
  */
case class PrefixPolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "prefix_poly_hash"

  override def nullSafeEval(input: Any): Any =
    PrefixPolyHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PrefixPolyHash$$.MODULE$$.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): PrefixPolyHash =
    copy(child = newChild)
}

object PrefixPolyHash {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Overlapping character k-grams of a string column (codegen'd). */
  def char_shingles(text: Column, k: Int): Column =
    column(CharShingles(expression(text), k))

  /** Overlapping word n-grams of a token-array column (codegen'd; empty —
    * never null — below n tokens, matching the HOF form it replaced). */
  def word_ngrams(toks: Column, n: Int): Column =
    column(WordNgrams(expression(toks), n))

  /** Word-n-gram repetition stats struct of a text column (codegen'd). */
  def ngram_repetition(text: Column, n: Int): Column =
    column(NgramRepetitionStats(expression(text), n))

  /** 1-based start positions of token-array n-grams that are members of
    * the fixed gram set (codegen'd HashSet probe, O(tokens) per row). */
  def gram_set_starts(toks: Column, n: Int, grams: Seq[String]): Column =
    column(GramSetStarts(expression(toks), n, grams))

  /** 31-base polynomial rolling hash mod 1e9+7 over a string's code
    * points (codegen'd; ≡ the per-char HOF fold it replaced). */
  def prefix_poly_hash(s: Column): Column =
    column(PrefixPolyHash(expression(s)))
}
