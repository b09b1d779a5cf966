package graft

/** JVM JIT/codegen forensic samplers (round 17, VERDICT item 7).
  *
  * The round-16 session-rot diagnosis (SCALE.md "round-16 notes") hinged
  * on three counters that until now lived only in tools/RotBisect's /tmp
  * session logs: cumulative HotSpot compilation time, code-cache
  * occupancy, and the Janino codegen compile count. Folding them into
  * Bench's per-query maps means a future rot regression is caught by
  * `warm_regressions` WITH its diagnosis attached — a warm query whose
  * wall doubles while its jit_sec delta explodes and codegen_n stays 0
  * is the sweeper-flushing signature; nonzero codegen_n on a warm pass
  * is the cache-eviction signature (both legs fixed in build.sbt:66-67
  * and Graft.scala, but config can regress).
  *
  * All samplers are cumulative-monotone (deltas are the per-query
  * signal) and return -1 when the JVM exposes no sensor, so a reader
  * can't mistake "no data" for "flat".
  */
object Forensics {
  /** Cumulative HotSpot JIT compilation milliseconds (all compiler
    * threads). Deltas around a query measure how much re-JIT the query
    * paid — the direct cold-code-flushing evidence. */
  def jitMillis: Long =
    try {
      val b = java.lang.management.ManagementFactory.getCompilationMXBean
      if (b != null && b.isCompilationTimeMonitoringSupported)
        b.getTotalCompilationTime
      else -1L
    } catch { case _: Throwable => -1L }

  /** Current bytes used across the CodeHeap pools (JDK 17 segmented code
    * cache: non-nmethods / profiled / non-profiled). An occupancy that
    * keeps CLIMBING across a session under `-XX:-UseCodeCacheFlushing`
    * toward the 512 MB reserve is the early warning that the
    * flushing-off half of the rot fix is approaching its safety bound. */
  def codeCacheUsedBytes: Long =
    try {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(p => p.getName.startsWith("CodeHeap") ||
          p.getName == "Code Cache")
      if (pools.isEmpty) -1L else pools.map(_.getUsage.getUsed).sum
    } catch { case _: Throwable => -1L }

  /** Cumulative count of Janino whole-stage-codegen compilations in this
    * JVM (Spark's CodegenMetrics source). A WARM pass re-compiling
    * generated classes it already compiled cold means the codegen class
    * cache evicted them — leg 2 of the round-16 rot mechanism. */
  def codegenCompileCount: Long =
    try org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    catch { case _: Throwable => -1L }
}
