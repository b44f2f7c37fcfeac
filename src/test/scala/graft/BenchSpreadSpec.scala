package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contamination flag (round 19): BENCH_r18's 32-core
  * artifact carried a 9.5x-inflated t10 median on untouched code with
  * `contended:false` — the 1-minute loadavg gate cannot see a co-tenant
  * spike that starts mid-run. The per-query run spread can, and these
  * rules are what turn it into the artifact's `contended` bit, so they
  * are pinned here as pure functions.
  */
class BenchSpreadSpec extends AnyFunSuite {

  test("a mid-run spike poisons a query's spread: flagged") {
    // 5 runs, two hit by a spike: median stays sane, max pulls far away
    assert(Bench.spreadFlagged(min = 0.23, median = 0.25, max = 2.2))
    // the BENCH_r18 t10 shape if >=3 runs were hit: median itself
    // poisoned, max/median smallish BUT the clean runs drag min down —
    // caught from the other side when any clean run remains
    assert(Bench.spreadFlagged(min = 0.25, median = 2.0, max = 9.0))
  }

  test("floor-class jitter is not contention: unflagged") {
    // 3.5x ratio but 60 ms absolute — scheduling noise on a tiny query
    assert(!Bench.spreadFlagged(min = 0.02, median = 0.025, max = 0.08))
    // honest steady query
    assert(!Bench.spreadFlagged(min = 0.40, median = 0.45, max = 0.52))
    // failed-query sentinel never flags
    assert(!Bench.spreadFlagged(min = -1.0, median = -1.0, max = -1.0))
  }

  test("one hiccup is absorbed by the median; three flagged queries mean a window") {
    assert(!Bench.contendedBySpread(0))
    assert(!Bench.contendedBySpread(1))
    assert(!Bench.contendedBySpread(2))
    assert(Bench.contendedBySpread(3))
    assert(Bench.contendedBySpread(10))
  }
}
