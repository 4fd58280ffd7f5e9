package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench sweep-retry policy (VERDICT r16 #7): the kept sweep
  * ALONE owns the artifact's errors and exit decision, so a transient
  * failure in a gate-discarded sweep that a retry cleaned up must not
  * poison the final artifact — while staying visible as per-sweep
  * evidence. Also pins the speed-normalized companion total
  * (VERDICT r16 #3). */
class BenchPolicySpec extends AnyFunSuite {

  private def pass(total: Double, ext: Double = 0.1, steal: Double = 0.0,
      errors: Map[String, String] = Map.empty) =
    Bench.Pass(total, ext, steal, Map("q" -> total), errors)

  private def sweepOf(loadStart: Double, p1: Bench.Pass, p2: Bench.Pass,
      warmErrors: Map[String, String] = Map.empty) =
    Bench.Sweep(loadStart, loadStart, loadStart, 470.0, warmErrors, p1, p2)

  test("retried-away transient: dirty sweep's error does not reach the " +
      "kept clean sweep (exit would be 0), but stays on its own sweep") {
    val dirty = sweepOf(1.0,
      pass(40.0, ext = 3.2, errors = Map("q_x" -> "FetchFailed: transient")),
      pass(41.0, ext = 2.8))
    val clean = sweepOf(1.0, pass(31.0), pass(31.5))
    assert(!dirty.clean && clean.clean)
    val sweeps = Seq(dirty, clean)
    val kept = sweeps(Bench.keptIndex(sweeps))
    // the exit-1 condition is kept.errors.nonEmpty — must be empty here
    assert(kept.errors.isEmpty,
      "a retried-away transient must not force a failing exit")
    // the evidence is not erased: the discarded sweep still owns it
    assert(dirty.errors.contains("q_x"))
  }

  test("first clean sweep wins even when a later sweep is faster") {
    val clean = sweepOf(1.0, pass(33.0), pass(33.5))
    val fasterDirty = sweepOf(1.0, pass(30.0, steal = 1.2), pass(30.5))
    assert(Bench.keptIndex(Seq(clean, fasterDirty)) === 0)
  }

  test("no clean sweep: least-dirty (min-total) kept, its errors drive " +
      "the exit") {
    val a = sweepOf(5.0, pass(45.0, ext = 2.0), pass(46.0))
    val b = sweepOf(5.0,
      pass(40.0, ext = 2.0, errors = Map("q_y" -> "OOM")), pass(41.0))
    val kept = Seq(a, b)(Bench.keptIndex(Seq(a, b)))
    assert(kept eq b, "min pass-total sweep is the least-dirty fallback")
    assert(kept.errors.contains("q_y"),
      "a kept dirty sweep's own errors must still fail the run")
  }

  test("warm-up errors count against their sweep like timed-pass errors") {
    val s = sweepOf(1.0, pass(30.0), pass(30.0),
      warmErrors = Map("q_z" -> "warmup: AnalysisException"))
    assert(s.errors.contains("q_z"))
  }

  test("sweep gates: loadavg, ext-cores and steal each dirty a sweep " +
      "independently; unreadable (-1) counters do not") {
    assert(!sweepOf(2.5, pass(30.0), pass(30.0)).clean)
    assert(!sweepOf(1.0, pass(30.0, ext = 1.6), pass(30.0)).clean)
    assert(!sweepOf(1.0, pass(30.0), pass(30.0, steal = 0.4)).clean)
    assert(sweepOf(1.0, pass(30.0, ext = -1.0, steal = -1.0),
      pass(30.0, ext = -1.0, steal = -1.0)).clean)
  }

  test("speed-normalized companion: slower box deflates, reference box " +
      "is identity, unreadable probe passes through") {
    assert(math.abs(Bench.speedNorm(33.281, 449.0) -
      33.281 * 449.0 / 470.0) < 1e-9)
    assert(Bench.speedNorm(31.409, 470.0) === 31.409)
    assert(Bench.speedNorm(30.0, -1.0) === 30.0)
  }
}
