package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate: a deliberate slowdown must trip it, noise
  * and methodology changes must not.
  */
class BenchRegressionSuite extends AnyFunSuite {

  private val tag = "full-pass-min2-mat"

  test("a deliberate 2x+ slowdown trips the gate; healthy queries do not") {
    val prev = Map("q01" -> 1.0, "q02" -> 0.5, "q03" -> 2.0)
    val now = Seq("q01" -> 2.5, // the probe: 2.5x and +1.5 s → flagged
      "q02" -> 0.9,             // 1.8x → under the factor
      "q03" -> 1.9)             // faster
    val regs = Bench.findRegressions(prev, now)
    assert(regs === Map("q01" -> ((1.0, 2.5))))
  }

  test("noise floor: sub-floor absolute jitter never flags even past 2x") {
    val regs = Bench.findRegressions(Map("q" -> 0.05), Seq("q" -> 0.12))
    assert(regs.isEmpty, s"0.05→0.12 s is jitter, not a regression: $regs")
    // but the same RATIO with real absolute cost does flag
    assert(Bench.findRegressions(Map("q" -> 0.5), Seq("q" -> 1.2)).nonEmpty)
  }

  test("failed passes (negative time) and unknown queries never flag") {
    val regs = Bench.findRegressions(Map("q" -> 1.0), Seq("q" -> -3.0, "new_q" -> 9.0))
    assert(regs.isEmpty)
  }

  test("previous record parses; a different warmup tag is not comparable") {
    val rec = """{"metric":"total","value":3.0,"warmup":"full-pass-min2-mat",
      "queries":{"q01":1.25,"q02":0.5},"sf":"/x"}"""
    assert(Bench.parsePrevQueries(rec, tag) === Map("q01" -> 1.25, "q02" -> 0.5))
    assert(Bench.parsePrevQueries(rec, "other-tag") === Map.empty)
    // a record at a different scale factor is not comparable either
    assert(Bench.parsePrevQueries(rec, tag, Some("/x")) ===
      Map("q01" -> 1.25, "q02" -> 0.5))
    assert(Bench.parsePrevQueries(rec, tag, Some("/y")) === Map.empty)
    assert(Bench.parsePrevQueries("{not json", tag) === Map.empty)
    assert(Bench.parsePrevQueries("""{"warmup":"full-pass-min2-mat"}""", tag) === Map.empty)
  }

  test("end-to-end: a slowed query surfaces from a real prior record") {
    // replay the gate exactly as main() runs it: parse prior file text,
    // diff against a pass where one query doubled
    val prior = """{"warmup":"full-pass-min2-mat","queries":{"q17_dedup":0.8,"q32_lsh":2.9}}"""
    val prev = Bench.parsePrevQueries(prior, tag)
    val now = Seq("q17_dedup" -> 0.85, "q32_lsh" -> 6.4)
    val regs = Bench.findRegressions(prev, now)
    assert(regs === Map("q32_lsh" -> ((2.9, 6.4))))
  }
}
