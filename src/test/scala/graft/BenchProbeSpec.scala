package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention detector: a fixed-work single-thread probe
  * whose wall time moves only when the core is contended — the signal
  * the wall≫cpu steal heuristic cannot see (r9: co-tenant pressure
  * inflated CPU and wall together). A deliberately loaded host must flip
  * the suspect threshold; an idle one must not. */
class BenchProbeSpec extends AnyFunSuite {

  private def median(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.length - 1) / 2)

  test("probe inflates past the suspect factor under synthetic load, not idle") {
    BenchProbe.warmup()
    val idle = median(Seq.fill(7)(BenchProbe.run()))
    info(f"idle probe median: $idle%.4f s (clean ref ${BenchProbe.CleanSec}%.3f)")
    // the idle measurement must sit inside the clean-host band, or the
    // bench would cry wolf on every quiet run
    assert(idle < BenchProbe.CleanSec * BenchProbe.SuspectFactor,
      f"idle probe $idle%.4f s exceeds the clean band — recalibrate " +
        "BenchProbe.CleanSec for this host class")

    // saturate every core: the single probe thread now time-slices, so
    // its fixed work takes visibly longer — the r9 co-tenant signature
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hogs = (0 until Runtime.getRuntime.availableProcessors * 2).map { _ =>
      val t = new Thread(() => {
        var x = 0x12345L
        while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 42L) println("")
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      Thread.sleep(100)
      val loaded = median(Seq.fill(7)(BenchProbe.run()))
      info(f"loaded probe median: $loaded%.4f s")
      assert(loaded > idle * BenchProbe.SuspectFactor,
        f"loaded probe $loaded%.4f did not inflate past " +
          f"${BenchProbe.SuspectFactor}× idle $idle%.4f")
    } finally {
      stop.set(true)
      hogs.foreach(_.join(1000))
    }
  }
}
