package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the mover auto-ledger's four-way verdict taxonomy
  * ([[Bench.moverVerdict]], judge r14): the binary noise/reproduces
  * enum conflated improvement rows and graft-only drift rows with the
  * actionable slow movers — a reader had to eyeball 19 ledger rows to
  * find the 2 that mattered. The contract: "slower" is EXACTLY the
  * actionable class (graft slower than its twin, or a reproduced
  * twin-parity wall regression); "faster" is an improvement; "no_twin"
  * is reproduced drift with no vanilla ratio to anchor a direction
  * call; "noise" is everything the solo minimums fail to reproduce. */
class BenchLedgerSpec extends AnyFunSuite {

  test("slower: solo ratio >= 1.2 with a twin") {
    assert(Bench.moverVerdict(hasTwin = true, 1.27, None) === "slower")
    assert(Bench.moverVerdict(hasTwin = true, 1.2, Some(0.0)) === "slower")
  }

  test("slower: twin-parity ratio but reproduced wall drift UP vs prior") {
    assert(Bench.moverVerdict(hasTwin = true, 1.05, Some(0.3)) === "slower")
  }

  test("faster: solo ratio <= 1/1.2, or reproduced drift DOWN") {
    assert(Bench.moverVerdict(hasTwin = true, 0.8, None) === "faster")
    // the r14 class: 17 of 19 "reproduces" rows were walls DROPPING
    // >15% vs prior — improvements, not regressions
    assert(Bench.moverVerdict(hasTwin = true, 1.0, Some(-0.25)) === "faster")
  }

  test("no_twin: vanilla skipped/failed + reproduced drift, either way") {
    assert(Bench.moverVerdict(hasTwin = false, 0.0, Some(0.3)) === "no_twin")
    assert(Bench.moverVerdict(hasTwin = false, 0.0, Some(-0.3)) === "no_twin")
  }

  test("noise: nothing trigger-class holds on the solo minimums") {
    assert(Bench.moverVerdict(hasTwin = true, 1.1, Some(0.1)) === "noise")
    assert(Bench.moverVerdict(hasTwin = true, 0.95, None) === "noise")
    assert(Bench.moverVerdict(hasTwin = false, 0.0, Some(0.05)) === "noise")
    assert(Bench.moverVerdict(hasTwin = false, 0.0, None) === "noise")
  }

  test("ratio boundaries: 1.2 is slower-inclusive, 1/1.2 faster-inclusive") {
    assert(Bench.moverVerdict(hasTwin = true, 1.19, None) === "noise")
    assert(Bench.moverVerdict(hasTwin = true, 1.0 / 1.2, None) === "faster")
    assert(Bench.moverVerdict(hasTwin = true, 0.84, None) === "noise")
  }

  // Fresh-JVM confirmation (round 15): an in-battery "slower" verdict
  // is recomputed on a child JVM's minimums via freshOutcome — the
  // same taxonomy over numbers with no shared session state. The three
  // historical overturned readings are the regression fixture.
  test("fresh-JVM parity overturns an in-battery slower (the r13-r15 class)") {
    // r15-sf1 containment: in-battery solo 1.293, fresh JVMs 8.34/8.19
    val (v1, r1) = Bench.freshOutcome(8.34, 8.19, priorWall = Some(8.62))
    assert(v1 === "noise" && math.abs(r1 - 1.018) < 0.01)
    // r14 containment: fresh 2.343 vs 2.944 — graft faster
    assert(Bench.freshOutcome(2.343, 2.944, None)._1 === "faster")
  }

  test("fresh-JVM reproduction keeps the slower verdict") {
    assert(Bench.freshOutcome(2.6, 2.0, None)._1 === "slower")
    // twin-parity ratio but the fresh wall still drifts >15% up vs prior
    assert(Bench.freshOutcome(2.6, 2.5, priorWall = Some(2.0))._1 === "slower")
  }

  test("fresh-JVM with a skipped twin and no reproduced drift is noise") {
    assert(Bench.freshOutcome(2.0, 0.0, priorWall = Some(1.95))._1 === "noise")
    assert(Bench.freshOutcome(2.5, 0.0, priorWall = Some(2.0))._1 === "no_twin")
  }

  // Session-scale normalization of the drift baseline (round 15): the
  // same battery measured 198 vs 245 s across two sessions an hour
  // apart — drift must be relative to the session, not the box's mood.
  test("sessionScale is the median current/prior over matched queries") {
    val prior = (1 to 9).map(i => s"q$i" -> 1.0).toMap
    // most queries run 1.24x the prior's walls (a hot session); one
    // genuine mover at 3x and one at 0.4x must not move the median
    val mins = (1 to 7).map(i => s"q$i" -> 1.24).toMap ++
      Map("q8" -> 3.0, "q9" -> 0.4)
    assert(math.abs(Bench.sessionScale(prior, mins) - 1.24) < 1e-9)
  }

  test("sessionScale degrades to 1.0 on few matches or incomparable artifacts") {
    val few = (1 to 5).map(i => s"q$i" -> 1.0).toMap
    assert(Bench.sessionScale(few, few.map { case (k, _) => k -> 1.4 }) === 1.0)
    val many = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    // a median past 2x means the prior is not comparable (wrong set/SF)
    assert(Bench.sessionScale(many, many.map { case (k, _) => k -> 2.5 }) === 1.0)
    assert(Bench.sessionScale(Map.empty, Map.empty) === 1.0)
  }
}
