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

  test("committed baseline: file is valid and the 1.5x drift gate reads it") {
    // BENCH_BASELINE.json is the cross-round drift reference — a
    // committed snapshot of the last round's per-query record. Its git
    // history IS the per-round per-query bench series (bench_result.json
    // itself is gitignored), so the file must stay parseable under the
    // gate's warmup-tag + sf discipline or the drift gate silently
    // disarms (Map.empty → no drift ever flags).
    val path = java.nio.file.Paths.get("BENCH_BASELINE.json")
    assert(java.nio.file.Files.exists(path),
      "BENCH_BASELINE.json must be committed — the cross-round drift " +
        "gate reads it and its history is the per-query bench record")
    val baseline = Bench.parsePrevQueries(
      java.nio.file.Files.readString(path), tag, Some("/root/testdata/sf0.1"))
    assert(baseline.size >= 100,
      s"baseline must carry the full per-query map, got ${baseline.size}")
    assert(baseline.values.forall(v => v > 0 && v < 60),
      "baseline times must be positive, sane per-query seconds")

    // the LOOSER 1.5x factor catches multi-round creep the 2x
    // previous-run gate cannot: +60% in one hop flags here, not there
    val crept = Seq(baseline.head._1 -> (baseline.head._2 * 1.6 + 0.4))
    assert(Bench.findRegressions(baseline, crept, factor = 1.5).nonEmpty,
      "a 1.6x creep must trip the drift gate")
    assert(Bench.findRegressions(baseline, crept).isEmpty
      || baseline.head._2 * 1.6 + 0.4 > 2 * baseline.head._2,
      "the same creep stays invisible to the 2x gate (that is the gap " +
        "the baseline gate closes)")
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

  test("tail re-measure: an ambient spike self-retires, a real regression survives") {
    val prev = Map("q_spike" -> 1.0, "q_real" -> 1.0, "q_ok" -> 1.0)
    // min-of-2 saw both q_spike and q_real at 3x; q_ok is clean
    val minOf2 = Seq("q_spike" -> 3.0, "q_real" -> 3.1, "q_ok" -> 1.05)
    assert(Bench.findRegressions(prev, minOf2).keySet === Set("q_spike", "q_real"))
    // third isolated sample: the spike reproduces fast (ambient was the
    // cause), the real regression reproduces slow
    val merged = Bench.mergeRemeasure(minOf2,
      Map("q_spike" -> 1.02, "q_real" -> 3.05))
    assert(merged.toMap === Map("q_spike" -> 1.02, "q_real" -> 3.05, "q_ok" -> 1.05))
    assert(Bench.findRegressions(prev, merged).keySet === Set("q_real"),
      "only the reproducing regression may carry a flag into the record")
  }

  test("tail re-measure can only improve the record, never worsen it") {
    val minOf2 = Seq("q_a" -> 2.0, "q_b" -> 2.0, "q_fail" -> -1.5)
    val merged = Bench.mergeRemeasure(minOf2,
      Map("q_a" -> 2.6,   // slower third sample: ignored
          "q_b" -> -0.4,  // re-measure pass threw: never overwrites
          "q_fail" -> 0.3)) // original failed every pass: stays negative
    assert(merged.toMap === Map("q_a" -> 2.0, "q_b" -> 2.0, "q_fail" -> -1.5))
  }
}
