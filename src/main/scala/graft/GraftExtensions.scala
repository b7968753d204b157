package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayDot, ArrayNorm, CharShingles, EqualLanes, GramSetStarts, LshSignBits, MinHash64, NgramRepetitionStats, SimHash64}

/** SQL-surface registration of the engine's codegen'd expressions via
  * `SparkSessionExtensions` (preference (c) of the custom-operator
  * ladder): `spark.sql("SELECT graft_array_dot(a, b) ...")` works in any
  * session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Literal-only parameters (hash counts, table/bit widths) are folded at
  * registration time — they parameterize generated code, so they cannot
  * be column-valued.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String)(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      new FunctionBuilder { def apply(children: Seq[Expression]): Expression = builder(children) }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_array_dot",
      "graft_array_dot(a, b) - sequential-fold dot product of two ARRAY<DOUBLE>") {
      case Seq(a, b) => ArrayDot(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_array_dot expects 2 arguments, got ${other.length}")
    }
    register(ext, "graft_array_norm",
      "graft_array_norm(a) - L2 norm of an ARRAY<DOUBLE>") {
      case Seq(a) => ArrayNorm(a)
      case other => throw new IllegalArgumentException(
        s"graft_array_norm expects 1 argument, got ${other.length}")
    }
    register(ext, "graft_minhash64",
      "graft_minhash64(tokens, nHashes) - nHashes-lane minhash signature of ARRAY<STRING>") {
      case Seq(tokens, n) => MinHash64(tokens, intLit(n, "nHashes"))
      case other => throw new IllegalArgumentException(
        s"graft_minhash64 expects 2 arguments, got ${other.length}")
    }
    register(ext, "graft_simhash64",
      "graft_simhash64(tokens) - 64-bit simhash of ARRAY<STRING>") {
      case Seq(tokens) => SimHash64(tokens)
      case other => throw new IllegalArgumentException(
        s"graft_simhash64 expects 1 argument, got ${other.length}")
    }
    register(ext, "graft_char_shingles",
      "graft_char_shingles(text, k) - overlapping character k-grams of a string") {
      case Seq(text, k) => CharShingles(text, intLit(k, "k"))
      case other => throw new IllegalArgumentException(
        s"graft_char_shingles expects 2 arguments, got ${other.length}")
    }
    register(ext, "graft_ngram_repetition",
      "graft_ngram_repetition(text, n) - word-n-gram repetition stats struct(n_grams, n_dup, top_count)") {
      case Seq(text, n) => NgramRepetitionStats(text, intLit(n, "n"))
      case other => throw new IllegalArgumentException(
        s"graft_ngram_repetition expects 2 arguments, got ${other.length}")
    }
    register(ext, "graft_gram_set_starts",
      "graft_gram_set_starts(tokens, n, grams) - 1-based positions of " +
        "token-array n-grams that are members of the FOLDABLE grams " +
        "array (compiled per-executor HashSet, O(tokens) per row)") {
      case Seq(toks, n, grams) =>
        // the gram set compiles into the expression, so it must be known
        // at plan time — a foldable array literal (array('a b','c d')),
        // never a per-row column
        require(grams.foldable && grams.dataType.isInstanceOf[
            org.apache.spark.sql.types.ArrayType] &&
            grams.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType == org.apache.spark.sql.types.StringType,
          "graft_gram_set_starts: grams must be a foldable ARRAY<STRING> " +
            "literal - the set compiles into the plan")
        val evaled = grams.eval()
        require(evaled != null,
          "graft_gram_set_starts: grams must not be NULL")
        val arr = evaled.asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        val lits = (0 until arr.numElements()).map { i =>
          val g = arr.getUTF8String(i)
          require(g != null,
            s"graft_gram_set_starts: null gram at index $i - the " +
              "compiled set cannot hold NULL")
          g.toString
        }.distinct
        // the SQL surface honors the same plan-serialization-weight caps
        // the Scala API enforces (decontaminateSpansServe's defaults):
        // the set ships in every task's plan, and the task binary grows
        // with gram BYTES (~1.1x, measured in PLANS.md), so both the
        // element count and the UTF-8 payload are bounded
        require(lits.size <= 500000,
          s"graft_gram_set_starts: ${lits.size} distinct grams exceed " +
            "the 500000 plan-weight cap; use the broadcast-join tier " +
            "(decontaminateSpans) for larger suites")
        val litBytes = lits.iterator
          .map(g => g.getBytes("UTF-8").length.toLong).sum
        require(litBytes <= (32L << 20),
          s"graft_gram_set_starts: grams total $litBytes UTF-8 bytes, " +
            "exceeding the 33554432-byte plan-weight cap; use the " +
            "broadcast-join tier (decontaminateSpans) for heavier suites")
        GramSetStarts(toks, intLit(n, "n"), lits)
      case other => throw new IllegalArgumentException(
        s"graft_gram_set_starts expects 3 arguments, got ${other.length}")
    }
    register(ext, "graft_equal_lanes",
      "graft_equal_lanes(a, b) - count of equal positions of two ARRAY<BIGINT> (minhash agreement)") {
      case Seq(a, b) => EqualLanes(a, b)
      case other => throw new IllegalArgumentException(
        s"graft_equal_lanes expects 2 arguments, got ${other.length}")
    }
    register(ext, "graft_lsh_sign_bits",
      "graft_lsh_sign_bits(vec, table, nBits) - random-hyperplane sign signature of ARRAY<DOUBLE>") {
      case Seq(vec, t, n) => LshSignBits(vec, intLit(t, "table"), intLit(n, "nBits"))
      case other => throw new IllegalArgumentException(
        s"graft_lsh_sign_bits expects 3 arguments, got ${other.length}")
    }
  }
}
