package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench.summarizeAxis

/** Pins the scaling-record defenses in [[Bench.summarizeAxis]] — the
  * guards exist because each failure mode actually shipped in a recorded
  * campaign (see BASELINE.md runs A/G/H/I and VERDICT r4's "black mark"):
  * a dead level must never emit Infinity/NaN, a trough-crushed hardware
  * calibration must never penalize the normalized number, and a window
  * that could not be defended must flag itself degraded.
  */
class BenchSummarySpec extends AnyFunSuite {

  private def fin(d: Double): Boolean =
    !d.isNaN && !d.isInfinity

  test("clean two-sample window: best-of estimators, expected ratio, not degraded") {
    val s = summarizeAxis(Seq(5852.3, 4191.6), Seq(10547.6, 8420.5), 4.0, 0.436)
    assert(s.thruLo === 5852.3 && s.thruHi === 10547.6)
    assert(math.abs(s.efficiency - (10547.6 / 5852.3) / 4.0) < 1e-12)
    assert(s.efficiencyNorm === 1.0) // 0.451 / 0.436 > 1 → capped (run B)
    assert(!s.degraded)
  }

  test("dead lo level (r5 first campaign): finite zeros, degraded — never Infinity") {
    val s = summarizeAxis(Seq(0.0), Seq(4720.6), 4.0, 0.242)
    assert(s.thruLo === 0.0 && s.thruHi === 4720.6)
    assert(s.efficiency === 0.0 && s.efficiencyNorm === 0.0)
    assert(s.degraded)
    assert(fin(s.efficiency) && fin(s.efficiencyNorm))
  }

  test("dead hi level: finite zeros, degraded") {
    val s = summarizeAxis(Seq(9822.4, 8100.0), Seq(0.0, 0.0), 4.0, 0.5)
    assert(s.efficiency === 0.0 && s.efficiencyNorm === 0.0 && s.degraded)
  }

  test("both levels dead (ceiling-length trough): all zeros, degraded, finite") {
    val s = summarizeAxis(Nil, Nil, 4.0, 0.5)
    assert(s.thruLo === 0.0 && s.thruHi === 0.0)
    assert(s.efficiency === 0.0 && s.efficiencyNorm === 0.0 && s.degraded)
    assert(fin(s.efficiency) && fin(s.efficiencyNorm))
  }

  test("hi<lo inversion (r4 record, 3725 < 5669): flagged degraded, ratio still finite") {
    val s = summarizeAxis(Seq(5669.4, 0.0), Seq(3725.0, 0.0), 4.0, 0.614)
    assert(s.degraded) // inversion AND single nonzero sample per level
    assert(math.abs(s.efficiency - (3725.0 / 5669.4) / 4.0) < 1e-12)
    assert(fin(s.efficiencyNorm))
  }

  test("impossible >1 hw factor (run I's 2.83) is clamped: normalization can only help") {
    val raw = summarizeAxis(Seq(8116.1, 3602.5), Seq(3949.5, 5224.3), 4.0, 1.0)
    val crushed = summarizeAxis(Seq(8116.1, 3602.5), Seq(3949.5, 5224.3), 4.0, 2.829)
    assert(crushed.efficiencyNorm >= raw.efficiency) // not the run-I 0.057 penalty
    assert(crushed.efficiencyNorm === raw.efficiencyNorm) // clamp → factor 1.0
  }

  test("single-sample level is degraded even with a healthy ratio (run B's thread lo)") {
    val s = summarizeAxis(Seq(9822.4), Seq(12415.4, 6272.8), 4.0, 1.0)
    assert(!s.efficiency.isNaN && s.efficiency > 0)
    assert(s.degraded)
  }

  test("zero/negative hw factor falls back to the raw ratio") {
    val s = summarizeAxis(Seq(100.0, 90.0), Seq(200.0, 190.0), 4.0, 0.0)
    assert(s.efficiencyNorm === s.efficiency)
  }

  test("failed samples (0.0) never lower the best-of estimator") {
    val s = summarizeAxis(Seq(0.0, 5000.0, 0.0), Seq(0.0, 9000.0, 8000.0), 4.0, 1.0)
    assert(s.thruLo === 5000.0 && s.thruHi === 9000.0)
  }

  test("JSON formatting of every degenerate shape stays parseable") {
    val shapes = Seq(
      (Nil, Nil), (Seq(0.0), Seq(0.0)), (Seq(1.0), Nil), (Nil, Seq(1.0)),
      (Seq(0.0, 0.0), Seq(4720.6)), (Seq(5669.4), Seq(3725.0)))
    for ((lo, hi) <- shapes) {
      val s = summarizeAxis(lo, hi, 4.0, 0.5)
      val j = f"""{"e":${s.efficiency}%.3f,"n":${s.efficiencyNorm}%.3f}"""
      assert(!j.contains("Infinity") && !j.contains("NaN"), j)
    }
  }
}
