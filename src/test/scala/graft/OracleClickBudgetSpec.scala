package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Guards the oracle click budget: the q301/q302/q306/q310 (and burst)
  * oracles expand clicks with a fixed `unnest(range(0, 45))` — exactly
  * the maximum click count the current fixture geometry admits
  * (n ≤ 7052, first click at ≥ 200, minimum advance = width + 150).
  * If the n formula grows or the minimum gap shrinks, the oracle would
  * silently truncate its click train while the engine keeps
  * generating — these assertions fail FIRST.
  */
class OracleClickBudgetSpec extends AnyFunSuite {

  /** n = 4000 + (g % 7) * 500 + g % 53 — the shared fixture size. */
  private val nMax = 4000 + 6 * 500 + 52

  test("closed-form worst case: the densest legal train fits 45") {
    // clicks run while p + width <= n - 100, p0 >= 200, and each
    // advance is width + gap with gap = 150 + mix % 250 >= 150.
    for (width <- Seq(1, 3)) {
      val maxClicks = 1 + (nMax - 100 - width - 200) / (width + 150)
      assert(maxClicks <= 45,
        s"width-$width trains can reach $maxClicks clicks > the " +
          "45-row oracle budget: widen unnest(range(0, 45))")
    }
  }

  test("empirical max over 4000 seeds stays within the budget") {
    // Replays the generator walks (clickTrain: width 3; hybrid/burst
    // single-sample clicks: width 1) and counts actual clicks at the
    // worst-case n.
    def count(seed: Long, width: Int): Int = {
      var p = 200 + Audio.mix32(seed * 1024 + 1000) % 200
      var i = 0
      while (p + width <= nMax - 100) {
        p += width + 150 + Audio.mix32(seed * 1024 + 2L * i + 1) % 250
        i += 1
      }
      i
    }
    val worst = (0L until 4000L).flatMap(s =>
      Seq(count(s, 1), count(s, 3))).max
    assert(worst <= 45, s"observed $worst clicks > 45-row budget")
  }
}
