package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for Bench's self-adjudication pieces (the decision rule
  * and the baseline parse are pure — no Spark session needed). The
  * end-to-end retry path is exercised by running `graft.Bench` with a
  * forced-tiny SPARK_GRAFT_BASELINE (see COVERAGE.md round-11 item 1). */
class BenchAdjudiSpec extends AnyFunSuite {

  test("classifyStubborn: inflated sentinels -> load_suspect, quiet -> regression") {
    val bases = Seq(Some(0.30), Some(0.25), Some(0.20))
    // sentinels at ~2x their baselines: the box is loud
    assert(Bench.classifyStubborn(Seq(0.60, 0.50, 0.40), bases) == "load_suspect")
    // sentinels at baseline: believe the row
    assert(Bench.classifyStubborn(Seq(0.31, 0.24, 0.21), bases) == "regression")
    // boundary: mean ratio exactly 1.5 is NOT suspect (> , not >=)
    assert(Bench.classifyStubborn(Seq(0.45, 0.375, 0.30), bases) == "regression")
    // missing/zero baselines contribute nothing; all-missing defaults to
    // regression (no evidence the box is loud -> don't excuse the row)
    assert(Bench.classifyStubborn(Seq(9.0, 9.0, 9.0),
      Seq(None, None, Some(0.0))) == "regression")
    // one usable sentinel is enough to flag load
    assert(Bench.classifyStubborn(Seq(0.9, 1.0, 1.1),
      Seq(None, None, Some(0.20))) == "load_suspect")
  }

  test("loadBaseline: flat JSON parses; garbage/missing files disable adjudication") {
    val f = java.nio.file.Files.createTempFile("base", ".json")
    java.nio.file.Files.write(f,
      """{"q1_agg":0.81,"topk":1.3e-1,"weird_name":2}""".getBytes("UTF-8"))
    val m = Bench.loadBaseline(f.toString)
    assert(m == Map("q1_agg" -> 0.81, "topk" -> 0.13, "weird_name" -> 2.0))
    assert(Bench.loadBaseline("/does/not/exist.json").isEmpty)
    val g = java.nio.file.Files.createTempFile("garb", ".json")
    java.nio.file.Files.write(g, "not json at all".getBytes("UTF-8"))
    assert(Bench.loadBaseline(g.toString).isEmpty)
  }
}
