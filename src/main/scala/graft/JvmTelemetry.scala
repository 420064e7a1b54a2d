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
  * shows zero system pressure. That pattern — a moving, contiguous,
  * minutes-scale tax inside a single long-lived JVM — fingerprints JVM
  * background machinery (JIT recompilation storms, code-cache flushing
  * once ~85 queries × dozens of codegen classes fill the reserved cache,
  * GC cycles), not the query plans. Deltas of these counters per query
  * turn any future drifting run into its own attribution evidence.
  */
object JvmTelemetry {

  final case class Snap(gcMs: Long, gcN: Long, jitMs: Long,
      codeMb: Double, metaMb: Double, classes: Long)

  private def pools = ManagementFactory.getMemoryPoolMXBeans.asScala

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
      classes = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount.toLong)
  }

  /** Render the delta since `before` (plus absolute cache/metaspace
    * occupancy — the pressure numbers are absolute by nature).
    */
  def delta(before: Snap): String = {
    val now = snapshot()
    f"gc=+${now.gcMs - before.gcMs}ms/${now.gcN - before.gcN}n " +
      f"jit=+${now.jitMs - before.jitMs}ms " +
      f"code=${now.codeMb}%.0fMB meta=${now.metaMb}%.0fMB " +
      f"classes=${now.classes}%d(+${now.classes - before.classes}%d)"
  }
}
