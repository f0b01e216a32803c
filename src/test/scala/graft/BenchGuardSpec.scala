package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-10-verdict contract that quarantined quadratic
  * diagnostics (q238 all-pairs LOF, q244 fixed-cell LOF, q251 the quality
  * curve containing the exact arm) are NEVER benched on a >10x ScaleUp
  * corpus by default — q244's 641 s at 30x must not land inside a future
  * BENCHSCALE total by accident — while the deliberate-measure path
  * (naming the query in SPARK_GRAFT_BENCH_ONLY) still runs them. */
class BenchGuardSpec extends AnyFunSuite {

  test("scaleOf parses ScaleUp dir names and ignores plain sf dirs") {
    assert(Bench.scaleOf("/tmp/graft_30x") === Some(30))
    assert(Bench.scaleOf("/tmp/graft_100x") === Some(100))
    assert(Bench.scaleOf("/tmp/graft_h10x") === Some(10))
    assert(Bench.scaleOf("/root/testdata/sf0.1") === None)
  }

  test("diagnostics are excluded beyond 10x, included at <=10x and at gate SF") {
    for (q <- Bench.diagNotBeyond10x) {
      assert(Bench.excludedDiagnostic(q, "/tmp/graft_30x", None), q)
      assert(Bench.excludedDiagnostic(q, "/tmp/graft_100x", None), q)
      assert(!Bench.excludedDiagnostic(q, "/tmp/graft_10x", None), q)
      assert(!Bench.excludedDiagnostic(q, "/root/testdata/sf0.1", None), q)
    }
  }

  test("naming a diagnostic in the ONLY subset forces it (deliberate-measure path)") {
    assert(!Bench.excludedDiagnostic(
      "q244_lof_outliers_ivf", "/tmp/graft_30x", Some(Seq("q244"))))
    // an ONLY subset that does NOT name it still excludes it
    assert(Bench.excludedDiagnostic(
      "q244_lof_outliers_ivf", "/tmp/graft_30x", Some(Seq("q242"))))
  }

  test("production queries are never excluded") {
    assert(!Bench.excludedDiagnostic("q247_lof_outliers_lsh", "/tmp/graft_100x", None))
    assert(!Bench.excludedDiagnostic("q242_ccnet_buckets", "/tmp/graft_100x", None))
  }
}
