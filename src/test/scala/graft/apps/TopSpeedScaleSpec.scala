package graft.apps

import org.scalatest.funsuite.AnyFunSuite

/** The key-scaled TopSpeed probe's scaling gate (pure function): the
  * lint must pass the measured key-parallel precedent (3.3×/10×,
  * TOPSPEED_SCALE_R13.json) with headroom and fail a key-sequential
  * regression (~rowRatio× time), across single- and multi-decade
  * steps. */
class TopSpeedScaleSpec extends AnyFunSuite {

  test("scaleOk passes the measured key-parallel precedent, fails sequential") {
    // r13 measured point: 10x rows → 3.31x time
    assert(TopSpeedScale.scaleOk(10.0, 3.31))
    // exactly linear passes
    assert(TopSpeedScale.scaleOk(10.0, 10.0) === false) // 10 > 6.6: over bound
    assert(TopSpeedScale.scaleOk(10.0, 6.5))
    // a key-sequential regression (time ~ rows) fails loudly
    assert(!TopSpeedScale.scaleOk(10.0, 20.9)) // the fixture-pinned ratio
    // multi-decade step composes geometrically: bound(100x) = 6.6^2 = 43.56
    assert(TopSpeedScale.scaleOk(100.0, 40.0))
    assert(!TopSpeedScale.scaleOk(100.0, 50.0))
    // sub-1x ratios (cache warmup on a small step) always pass
    assert(TopSpeedScale.scaleOk(0.5, 0.9))
    assert(TopSpeedScale.scaleOk(1.0, 1.0))
  }
}
