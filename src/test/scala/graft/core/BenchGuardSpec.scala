package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The bench outlier guard is only as good as its baseline parsing: the
  * driver's BENCH_rN.json wraps the bench JSON line backslash-escaped inside
  * a "tail" string, and BENCH_LOCAL_BASELINE.json is plain JSON — both must
  * parse from the repo root (where Bench runs), scoped to the matching sf.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("readPrevBenchTimes parses the real round artifact and local baseline") {
    assume(new java.io.File("BENCH_r02.json").exists ||
      new java.io.File("BENCH_LOCAL_BASELINE.json").exists)
    val times = graft.Bench.readPrevBenchTimes("/root/testdata/sf0.1")
    assert(times.nonEmpty, "no baselines parsed from BENCH_r*.json / BENCH_LOCAL_BASELINE.json")
    assert(times.contains("topk_event_types"), s"missing expected key in ${times.keys.toSeq.sorted}")
    assert(times.values.forall(_ > 0), "non-positive baseline survived filtering")
  }

  test("readPrevBenchTimes is empty for a different scale factor") {
    val times = graft.Bench.readPrevBenchTimes("/root/testdata/sf1.0-nonexistent")
    assert(times.isEmpty, s"sf-scoping failed: $times")
  }
}
