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

  /** Whole-system CPU utilization right now (0..1): the probes' idle-vs-
    * loaded contrast is only measurable on a quiet box. Co-tenant load is
    * precisely what the probes exist to DETECT at bench time — here it
    * makes the experiment itself invalid, so the sensitivity tests cancel
    * rather than fail (the r10/r11 official benches were poisoned by
    * exactly this kind of noise). */
  private def systemCpuLoad(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getCpuLoad // prime the interval
        Thread.sleep(300)
        val l = os.getCpuLoad
        if (l.isNaN) 0.0 else l
      case _ => 0.0
    }

  private def requireQuietHost(): Unit = {
    val l = systemCpuLoad()
    assume(l < 0.20,
      f"system CPU already at ${l * 100}%.0f%% before the experiment — " +
        "co-tenant load makes idle-vs-loaded sensitivity unmeasurable")
  }

  /** Run one sensitivity measurement up to `attempts` times until `ok`
    * holds; if it never does AND the final idle baseline sat well above
    * the clean reference, CANCEL (the host is visibly co-tenanted — the
    * very condition these probes exist to detect makes their own
    * idle-vs-loaded contrast unmeasurable); otherwise fail. */
  private def retryOrCancel[T](attempts: Int, measure: () => T)(
      ok: T => Boolean)(idleOf: T => Double, cleanRef: Double)(
      failMsg: T => String): T = {
    var last = measure()
    var n = 1
    while (!ok(last) && n < attempts) { last = measure(); n += 1 }
    if (!ok(last)) {
      if (idleOf(last) > cleanRef * 1.5)
        cancel(f"host contended (idle ${idleOf(last)}%.4f s vs clean " +
          f"$cleanRef%.3f): ${failMsg(last)}")
      else fail(failMsg(last))
    }
    last
  }

  private def withDaemons[A](n: Int)(work: java.util.concurrent.atomic.AtomicBoolean => Runnable)(body: => A): A = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ts = (0 until n).map { _ =>
      val t = new Thread(work(stop)); t.setDaemon(true); t.start(); t
    }
    try { Thread.sleep(100); body }
    finally { stop.set(true); ts.foreach(_.join(1000)) }
  }

  test("spin probe inflates under CPU oversubscription, relative to idle") {
    requireQuietHost()
    BenchProbe.warmup()
    def measure(): (Double, Double) = {
      val idle = median(Seq.fill(7)(BenchProbe.run()))
      // saturate every core: the single probe thread now time-slices, so
      // its fixed work takes visibly longer — the oversubscription
      // signature. 3× cores (not 2×): under a concurrently-running suite
      // the margin at 2× was a coin flip.
      withDaemons(Runtime.getRuntime.availableProcessors * 3)(stop => () => {
        var x = 0x12345L
        while (!stop.get()) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 42L) println("")
      }) {
        // settle, then discard the first samples: the just-woken test
        // thread has minimal CFS vruntime and outruns the hogs for its
        // first few slices — early samples read nearly clean
        Thread.sleep(300)
        (idle, median(Seq.fill(9)(BenchProbe.run()).drop(2)))
      }
    }
    val (idle, loaded) = retryOrCancel(3, measure)(
      m => m._2 > m._1 * BenchProbe.SuspectFactor)(
      _._1, BenchProbe.CleanSec)(m =>
      f"loaded spin probe ${m._2}%.4f did not inflate past " +
        f"${BenchProbe.SuspectFactor}× idle ${m._1}%.4f")
    info(f"idle spin probe median: $idle%.4f s (clean ref ${BenchProbe.CleanSec}%.3f)")
    info(f"loaded spin probe median: $loaded%.4f s")
    // absolute clean-band check ONLY on an explicitly calibrated host —
    // elsewhere it is a host property, not a code property
    if (sys.env.contains("SPARK_GRAFT_PROBE_CLEAN_SEC"))
      assert(idle < BenchProbe.CleanSec * BenchProbe.SuspectFactor,
        f"idle probe $idle%.4f s exceeds the calibrated clean band")
    else if (idle >= BenchProbe.CleanSec * BenchProbe.SuspectFactor)
      info(f"note: idle $idle%.4f s above default clean band — host slower " +
        "or busier than the calibration class (not a failure)")
  }

  test("bandwidth probe inflates under co-tenant memory traffic, relative to idle") {
    requireQuietHost()
    BenchProbe.warmup()
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

    final case class M(idle: Double, idleSpin: Double,
      loaded: Double, spinLoaded: Double) {
      def bwRatio: Double = loaded / idle
      def spinRatio: Double = spinLoaded / idleSpin
    }
    def measure(): M = {
      val idle = median(Seq.fill(7)(BenchProbe.runBandwidth()))
      val idleSpin = median(Seq.fill(3)(BenchProbe.run()))
      withDaemons(nHogs)(stop => () => {
        val src = Array.tabulate(hogWords)(_.toLong)
        val dst = new Array[Long](hogWords)
        while (!stop.get()) {
          var i = 0
          while (i < src.length) { dst(i) = src(i) + 1L; i += 8 }
        }
        if (dst(0) == 42L) println("")
      }) {
        M(idle, idleSpin, median(Seq.fill(7)(BenchProbe.runBandwidth())),
          median(Seq.fill(3)(BenchProbe.run())))
      }
    }
    // Two claims, both RELATIVE and both retried (a co-resident suite or
    // host tenant can poison any single sample window):
    //  1. sensitivity bar, deliberately BELOW the artifact's 1.5× flag
    //     threshold: this synthetic load measured 1.5-2.0× across
    //     calibration runs, and asserting the flag factor itself leaves
    //     zero margin. 1.3× establishes the probe moves with bandwidth
    //     pressure at all; the r10-class event (3× CPU inflation) dwarfs it.
    //  2. the r10 lesson as an instrument comparison: under memory-only
    //     pressure the BANDWIDTH probe must inflate decisively more than
    //     the spin probe — only asserted where hogs + probe threads
    //     genuinely fit under the core count.
    val m = retryOrCancel(3, measure)(m =>
      m.loaded > m.idle * 1.3 && (!isolatable || m.spinRatio < m.bwRatio * 0.75))(
      _.idle, BenchProbe.BwCleanSec)(m =>
      if (m.loaded <= m.idle * 1.3)
        f"loaded bandwidth probe ${m.loaded}%.4f did not inflate past " +
          f"1.3× idle ${m.idle}%.4f — the probe is not bandwidth-sensitive"
      else
        f"spin probe inflated ${m.spinRatio}%.2fx vs bandwidth probe " +
          f"${m.bwRatio}%.2fx under memory-only load — the bandwidth probe " +
          "is supposed to be the sensitive instrument here")
    info(f"idle bandwidth probe median: ${m.idle}%.4f s (clean ref ${BenchProbe.BwCleanSec}%.3f)")
    info(f"loaded bandwidth probe median: ${m.loaded}%.4f s " +
      f"(spin probe under the same load: ${m.spinLoaded}%.4f s)")
    if (!isolatable) info(f"host has only $cores cores (≤ BwThreads+2) — " +
      "relative-sensitivity assertion was skipped")
    if (sys.env.contains("SPARK_GRAFT_BW_CLEAN_SEC"))
      assert(m.idle < BenchProbe.BwCleanSec * BenchProbe.BwSuspectFactor,
        f"idle bandwidth probe ${m.idle}%.4f s exceeds the calibrated clean band")
  }

  test("fixed work: both probes report positive, finite seconds") {
    BenchProbe.warmup()
    val s = BenchProbe.run(); val b = BenchProbe.runBandwidth()
    assert(s > 0 && s.isFinite && b > 0 && b.isFinite)
  }
}
