package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Per-query JVM-internals telemetry for Bench's stderr `done` lines.
  *
  * Exists because of the round-8/9/10 gate-drift mystery: full-suite runs
  * sporadically show an alphabetically-CONSECUTIVE block of queries 2-4×
  * over their floors (r8: the back half; r9 gate: q66-q71; r10 local
  * repro: q85-q91 in one rep, q67-q70 in another, clean in the rest)
  * while the same queries are floor-stable in isolation and /proc PSI
  * shows zero system pressure.
  *
  * The r10 campaign (tools/r10/, 30+ instrumented full runs) ATTRIBUTED
  * the drift: external-to-guest CPU contention on the shared host. Every
  * in-JVM candidate was excluded by direct measurement — GC (gc.log +
  * these deltas: ≤0.9 s/run, ≈0 during drifted queries), JIT (bursts
  * present in some drifted queries, absent in others — a co-symptom, not
  * the cause), code-cache size (240 MB vs 512 MB A/B: both drift),
  * safepoint stalls (-Xlog:safepoint over 12 runs: ≤0.9 s stopped, max
  * single pause 83 ms) — while /proc/stat steal bursts line up with the
  * slow reps (7.6 cpu-s in one vs ≤0.9 baseline) and a deliberate
  * CPU competitor (a concurrent sbt compile) reproduces the exact
  * moving-contiguous-block signature: queries run sequentially, so any
  * external deprivation window maps to a consecutive block of slow
  * queries. Deltas of these counters per query (steal included) make any
  * future drifting run self-attributing: drift + gc≈0 + jit≈0 + rising
  * steal = the host, not the plan.
  */
object JvmTelemetry {

  final case class Snap(gcMs: Long, gcN: Long, jitMs: Long,
      codeMb: Double, metaMb: Double, classes: Long, stealJiffies: Long)

  /** Milliseconds per /proc/stat jiffy, from `getconf CLK_TCK` (round-13
    * advice: the previous hardcoded ×10 assumed USER_HZ=100, which is
    * near-universal on Linux but not guaranteed). Integer division
    * truncates for tick rates that don't divide 1000 (e.g. 300 Hz →
    * 3 ms instead of 3.33) — acceptable for a diagnostic counter whose
    * consumers compare orders of magnitude. Fallback 10 ms (100 Hz)
    * when getconf is missing or unparseable.
    */
  private[graft] lazy val msPerJiffy: Long =
    try {
      val p = new ProcessBuilder("getconf", "CLK_TCK").start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      p.waitFor()
      val hz = out.toLong
      if (hz > 0) math.max(1L, 1000L / hz) else 10L
    } catch { case _: Throwable => 10L }

  private def pools = ManagementFactory.getMemoryPoolMXBeans.asScala

  /** Cumulative hypervisor steal (jiffies, summed over all vCPUs) from
    * /proc/stat — the r10 drift campaign's discriminator: a drifting
    * query block with gc≈0, jit≈0 and rising steal is the HOST taking
    * the CPU away, not the JVM or the plan. 0 where unreadable (non-
    * Linux, masked /proc) — the field then never moves, which is itself
    * unambiguous.
    */
  private def steal(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+"))
        .filter(_.length > 8).map(_(8).toLong).getOrElse(0L)
      finally src.close()
    } catch { case _: Throwable => 0L }

  def snapshot(): Snap = {
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val jit = ManagementFactory.getCompilationMXBean
    val code = pools.filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum / 1048576.0
    val meta = pools.find(_.getName == "Metaspace")
      .map(_.getUsage.getUsed / 1048576.0).getOrElse(0.0)
    Snap(
      gcMs = gcs.map(_.getCollectionTime).sum,
      gcN = gcs.map(_.getCollectionCount).sum,
      jitMs = if (jit != null && jit.isCompilationTimeMonitoringSupported)
        jit.getTotalCompilationTime else 0L,
      codeMb = code, metaMb = meta,
      classes = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount.toLong,
      stealJiffies = steal())
  }

  /** Render the delta since `before` (plus absolute cache/metaspace
    * occupancy — the pressure numbers are absolute by nature).
    */
  def delta(before: Snap): String = {
    val now = snapshot()
    f"gc=+${now.gcMs - before.gcMs}ms/${now.gcN - before.gcN}n " +
      f"jit=+${now.jitMs - before.jitMs}ms " +
      f"code=${now.codeMb}%.0fMB meta=${now.metaMb}%.0fMB " +
      f"classes=${now.classes}%d(+${now.classes - before.classes}%d) " +
      f"steal=+${(now.stealJiffies - before.stealJiffies) * msPerJiffy}ms"
  }
}
