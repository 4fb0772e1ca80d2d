package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention detectors. Two probes (see [[BenchProbe]]):
  * the spin probe catches core descheduling/oversubscription, the
  * bandwidth probe catches the shared-DRAM/SMT pressure the spin probe
  * is blind to (the r10 failure mode). Each must inflate under its own
  * class of synthetic load.
  *
  * Assertions here are RELATIVE (loaded vs idle measured in the same
  * process minutes apart) — an absolute clean-host band would turn the
  * suite red on slower or busier CI silicon, which is a calibration
  * problem, not a code defect. The absolute band is only checked when
  * the operator has explicitly calibrated this host via the
  * SPARK_GRAFT_PROBE_CLEAN_SEC / SPARK_GRAFT_BW_CLEAN_SEC overrides;
  * uncalibrated hosts get an `info` line instead. The bench artifact
  * itself carries the absolute values (`probe_sec`, `bw_probe_sec`) for
  * offline judgement. */
class BenchProbeSpec extends AnyFunSuite {

  private def median(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.length - 1) / 2)

  private def withDaemons[A](n: Int)(work: java.util.concurrent.atomic.AtomicBoolean => Runnable)(body: => A): A = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ts = (0 until n).map { _ =>
      val t = new Thread(work(stop)); t.setDaemon(true); t.start(); t
    }
    try { Thread.sleep(100); body }
    finally { stop.set(true); ts.foreach(_.join(1000)) }
  }

  test("spin probe inflates under CPU oversubscription, relative to idle") {
    BenchProbe.warmup()
    val idle = median(Seq.fill(7)(BenchProbe.run()))
    info(f"idle spin probe median: $idle%.4f s (clean ref ${BenchProbe.CleanSec}%.3f)")
    // absolute clean-band check ONLY on an explicitly calibrated host —
    // elsewhere it is a host property, not a code property
    if (sys.env.contains("SPARK_GRAFT_PROBE_CLEAN_SEC"))
      assert(idle < BenchProbe.CleanSec * BenchProbe.SuspectFactor,
        f"idle probe $idle%.4f s exceeds the calibrated clean band")
    else if (idle >= BenchProbe.CleanSec * BenchProbe.SuspectFactor)
      info(f"note: idle $idle%.4f s above default clean band — host slower " +
        "or busier than the calibration class (not a failure)")

    // saturate every core: the single probe thread now time-slices, so
    // its fixed work takes visibly longer — the oversubscription signature.
    // 3× cores (not 2×): under a concurrently-running suite the margin at
    // 2× was a coin flip (measured 1.2× once under full-suite load).
    withDaemons(Runtime.getRuntime.availableProcessors * 3)(stop => () => {
      var x = 0x12345L
      while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
      if (x == 42L) println("")
    }) {
      // settle, then discard the first samples: the just-woken test
      // thread has minimal CFS vruntime and outruns the hogs for its
      // first few slices — early samples read nearly clean
      Thread.sleep(300)
      val loaded = median(Seq.fill(9)(BenchProbe.run()).drop(2))
      info(f"loaded spin probe median: $loaded%.4f s")
      assert(loaded > idle * BenchProbe.SuspectFactor,
        f"loaded spin probe $loaded%.4f did not inflate past " +
          f"${BenchProbe.SuspectFactor}× idle $idle%.4f")
    }
  }

  test("bandwidth probe inflates under co-tenant memory traffic, relative to idle") {
    BenchProbe.warmup()
    val idle = median(Seq.fill(7)(BenchProbe.runBandwidth()))
    val idle0Spin = median(Seq.fill(3)(BenchProbe.run()))
    info(f"idle bandwidth probe median: $idle%.4f s (clean ref ${BenchProbe.BwCleanSec}%.3f)")
    if (sys.env.contains("SPARK_GRAFT_BW_CLEAN_SEC"))
      assert(idle < BenchProbe.BwCleanSec * BenchProbe.BwSuspectFactor,
        f"idle bandwidth probe $idle%.4f s exceeds the calibrated clean band")

    // co-tenant memory pressure WITHOUT CPU oversubscription (hogs + probe
    // threads < cores): each hog runs a 64 MiB→64 MiB copy stream — src
    // fill + dst RFO + dst writeback, three DRAM streams per hog, the
    // heaviest per-core bandwidth demand plain JVM code can make.
    // Collectively ~10× the shared L3, so the contended resource is DRAM
    // bandwidth — exactly the r10 signature the spin probe proved blind
    // to. (Calibration on this host: bw probe 0.025→0.049 s under this
    // load — ~2×, comfortably past the 1.5× flag — while the spin probe
    // sat at 0.0479 vs 0.0476 idle, dead flat.)
    val hogWords = 8 << 20 // 64 MiB of longs per hog array
    // never oversubscribe: hogs + probe threads must stay under the core
    // count or the "spin probe must NOT fire" assertion below measures
    // scheduling pressure, not bandwidth isolation (on a 16-core host,
    // max(8, …) would run 8 hogs + 8 bw threads and break its own premise)
    val cores = Runtime.getRuntime.availableProcessors
    val nHogs = math.max(1, cores - BenchProbe.BwThreads - 2)
    val isolatable = cores > BenchProbe.BwThreads + 2
    withDaemons(nHogs)(stop => () => {
      val src = Array.tabulate(hogWords)(_.toLong)
      val dst = new Array[Long](hogWords)
      while (!stop.get()) {
        var i = 0
        while (i < src.length) { dst(i) = src(i) + 1L; i += 8 }
      }
      if (dst(0) == 42L) println("")
    }) {
      val loaded = median(Seq.fill(7)(BenchProbe.runBandwidth()))
      val spinLoaded = median(Seq.fill(3)(BenchProbe.run()))
      info(f"loaded bandwidth probe median: $loaded%.4f s " +
        f"(spin probe under the same load: $spinLoaded%.4f s)")
      // sensitivity bar, deliberately BELOW the artifact's 1.5× flag
      // threshold: this synthetic load measured 1.5-2.0× across
      // calibration runs, and asserting the flag factor itself leaves
      // zero margin (a full-suite run measured 1.48× — same probe, same
      // load, different co-resident JVM noise). The artifact flags
      // against a CALIBRATED clean value; the spec proves the probe
      // moves with bandwidth pressure at all, which 1.3× establishes
      // and the r10-class event (3× CPU inflation) dwarfs.
      assert(loaded > idle * 1.3,
        f"loaded bandwidth probe $loaded%.4f did not inflate past " +
          f"1.3× idle $idle%.4f — the probe is not bandwidth-sensitive")
      // the r10 lesson, asserted: under pure memory pressure the spin
      // probe must NOT be the one that fires — if it does, the load was
      // oversubscribing cores and this test is no longer isolating
      // bandwidth sensitivity
      // RELATIVE sensitivity, not an absolute non-firing bar: under a
      // concurrently-running suite the spin probe can drift past its
      // threshold from co-load alone (measured 1.4× once), so the
      // assertable claim is that the BANDWIDTH probe inflates decisively
      // more than the spin probe under memory-only pressure — the r10
      // lesson stated as an instrument comparison. Only where hogs +
      // probe threads genuinely fit under the core count.
      val bwRatio = loaded / idle
      val spinRatio = spinLoaded / idle0Spin
      if (isolatable)
        assert(spinRatio < bwRatio * 0.75,
          f"spin probe inflated $spinRatio%.2fx vs bandwidth probe " +
            f"$bwRatio%.2fx under memory-only load — the bandwidth probe " +
            "is supposed to be the sensitive instrument here")
      else info(f"host has only $cores cores (≤ BwThreads+2) — " +
        "skipping the relative-sensitivity assertion")
    }
  }

  test("fixed work: both probes report positive, finite seconds") {
    BenchProbe.warmup()
    val s = BenchProbe.run(); val b = BenchProbe.runBandwidth()
    assert(s > 0 && s.isFinite && b > 0 && b.isFinite)
  }
}
