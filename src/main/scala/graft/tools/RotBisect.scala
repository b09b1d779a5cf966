package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-rot bisect harness (round 16, SCALE.md "fourth decade" item 3).
  *
  * The r15 sf1000v probe saw q_text_bpe — the per-iteration re-planning
  * fixpoint, i.e. the query most sensitive to driver/session state — run
  * 49 s cold at session start but 197 s (retry 176 s) at the end of the
  * 10-query session, while a FRESH single-query session reps it at
  * 48.8/40.2/40.0 s. The rot is therefore state accumulated by the other
  * nine queries. This tool reproduces the pattern under instrumentation
  * and bisects the suspect list:
  *
  *   run.sh graft.tools.RotBisect <sfDir> <suspectsCsv|-> [detector] [reps]
  *
  * Sequence: warm-up → detector once (in-session control) → each suspect
  * once, in order → detector × reps. After EVERY step it prints the
  * counters that discriminate the candidate mechanisms:
  *   - rdd_count / rdd_mem / rdd_disk (sc.getRDDStorageInfo): pinned
  *     storage that `spark.catalog.clearCache()` cannot reach —
  *     localCheckpoint blocks and raw-RDD persists (the round-4 class);
  *   - heap_used after a forced full GC: driver/JVM-side accretion;
  *   - codegen_n / codegen_ms (CodegenMetrics): Janino compile count and
  *     time — if the rotted detector recompiles what a fresh session
  *     caches, the 100-entry codegen cache was flushed by the suspects;
  *   - scratch_gb: bytes under this JVM's spark scratch dirs (blockmgr /
  *     spark-* in java.io.tmpdir) — shuffle-file accretion the
  *     ContextCleaner hasn't collected;
  *   - gc/cpu/ext/steal per step, Bench's rot-vs-environment
  *     discriminators, so a contaminated window can't convict.
  */
object RotBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1000v")
    val suspects = args.lift(1).filterNot(_ == "-").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val detector = args.lift(2).getOrElse("q_text_bpe")
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    // optional settle pause (seconds) before each detector rep: if the
    // amplification vanishes after an idle window, the mechanism is a
    // TRANSIENT (concurrent GC / C2 compile-queue backlog working through
    // the predecessor's churn), not evicted state the detector must
    // rebuild
    val settle = args.lift(4).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
    // GRAFT_CODEGEN_CACHE: A/B the static codegen-cache size (default
    // 100 entries) — the eviction-vs-churn discriminator: with the cache
    // sized past the session's working set, a rotted detector shows
    // codegen_n=0; if its CPU ALSO normalizes, eviction was the driver
    val spark = sys.env.get("GRAFT_CODEGEN_CACHE")
      .fold(b0)(n => b0.config("spark.sql.codegen.cache.maxEntries", n))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)", "count(distinct id % 100)")
      .collect()

    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def cpuNanos: Long =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      } catch { case _: Throwable => -1L }
    def hostStat(): (Long, Long) =
      try {
        val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        val idle = f(3) + (if (f.length > 4) f(4) else 0L)
        val steal = if (f.length > 7) f(7) else 0L
        (f.sum - idle, steal)
      } catch { case _: Throwable => (-1L, -1L) }
    // this JVM's spark scratch (shuffle + localCheckpoint blocks): spark-*
    // dirs in java.io.tmpdir created after JVM start
    val jvmStart = java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    def scratchBytes(): Long = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
      val roots = Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.lastModified >= jvmStart &&
          (f.getName.startsWith("spark-") || f.getName.startsWith("blockmgr-")))
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      roots.map(du).sum
    }
    def codegen(): (Long, Long) = {
      val m = org.apache.spark.metrics.source.CodegenMetrics
      (m.METRIC_COMPILATION_TIME.getCount, m.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    }
    // task-level discrimination of WHERE amplified CPU goes: task/retry
    // counts separate recompute (more tasks) from per-task cost; spill
    // bytes expose execution-memory squeeze; stage attempts >0 expose
    // lost-block/fetch-failure resubmission
    val tTasks = new java.util.concurrent.atomic.AtomicLong(0)
    val tFailed = new java.util.concurrent.atomic.AtomicLong(0)
    val tMemSpill = new java.util.concurrent.atomic.AtomicLong(0)
    val tDiskSpill = new java.util.concurrent.atomic.AtomicLong(0)
    val tRetryStages = new java.util.concurrent.atomic.AtomicLong(0)
    val tTaskCpu = new java.util.concurrent.atomic.AtomicLong(0)
    val tTaskDeser = new java.util.concurrent.atomic.AtomicLong(0)
    val tGcTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tTasks.incrementAndGet()
        if (e.taskInfo != null && !e.taskInfo.successful) tFailed.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          tMemSpill.addAndGet(m.memoryBytesSpilled)
          tDiskSpill.addAndGet(m.diskBytesSpilled)
          tTaskCpu.addAndGet(m.executorCpuTime)
          tTaskDeser.addAndGet(m.executorDeserializeTime)
          tGcTime.addAndGet(m.jvmGCTime)
        }
      }
      override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (e.stageInfo.attemptNumber > 0) tRetryStages.incrementAndGet()
    })
    def execMem(): (Long, Long) = {
      val s = spark.sparkContext.getExecutorMemoryStatus.values
      (s.map(_._1).sum, s.map(_._2).sum) // (max, remaining) storage memory
    }
    // JIT code-cache occupancy + cumulative HotSpot compilation time: the
    // deopt hypothesis — a codegen-heavy sf1000 query fills the reserved
    // code cache, flushing evicts the detector's compiled methods, and
    // its next run burns interpreted/C1 CPU until re-JIT'd
    def codeCache(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asScala.filter(_.getName.startsWith("CodeHeap"))
      (pools.map(_.getUsage.getUsed).sum, pools.map(_.getUsage.getMax).sum)
    }
    def jitMillis: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    def storage(): (Int, Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // returns None when the query FAILED: time-to-failure is not a wall
    // time, and feeding it into the ROT/CLEAN ratio would let a crashing
    // detector or suspect produce a meaningless verdict (round-17 advice
    // fix — the same artifact-rot class as Bench's `failures` map)
    def step(tag: String, name: String): Option[Double] = {
      val (hb0, hs0) = hostStat(); val g0 = gcMillis; val c0 = cpuNanos
      val (cg0, _) = codegen()
      val (tk0, tf0, ms0, ds0, rs0) = (tTasks.get, tFailed.get,
        tMemSpill.get, tDiskSpill.get, tRetryStages.get)
      val (tc0, td0, tg0) = (tTaskCpu.get, tTaskDeser.get, tGcTime.get)
      val jit0 = jitMillis
      val t0 = System.nanoTime()
      val ok =
        try { graft.SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          println(s"[rot] $tag $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      val (hb1, hs1) = hostStat()
      val proc = (cpuNanos - c0) / 1e9
      val ext = if (hb0 < 0) -1.0 else math.max(0.0, (hb1 - hb0) / 100.0 - proc)
      val steal = if (hs0 < 0) -1.0 else (hs1 - hs0) / 100.0
      val (rc, rm, rd) = storage()
      val heap = {
        val r = Runtime.getRuntime; (r.totalMemory - r.freeMemory) / (1 << 20)
      }
      val (cg1, _) = codegen()
      val (mx, rem) = execMem()
      println(s"[rot] $tag $name wall=${fmt(wall)} gc=${fmt((gcMillis - g0) / 1e3)} " +
        s"cpu=${fmt(proc)} ext=${fmt(ext)} steal=${fmt(steal)} " +
        s"rdd_count=$rc rdd_mem_mb=${rm / (1 << 20)} rdd_disk_mb=${rd / (1 << 20)} " +
        s"heap_mb=$heap codegen_n=${cg1 - cg0} scratch_gb=${fmt(scratchBytes() / 1e9)} " +
        s"tasks=${tTasks.get - tk0} failed=${tFailed.get - tf0} " +
        s"retry_stages=${tRetryStages.get - rs0} " +
        s"mem_spill_gb=${fmt((tMemSpill.get - ms0) / 1e9)} " +
        s"disk_spill_gb=${fmt((tDiskSpill.get - ds0) / 1e9)} " +
        s"task_cpu=${fmt((tTaskCpu.get - tc0) / 1e9)} " +
        s"task_deser_s=${fmt((tTaskDeser.get - td0) / 1e3)} " +
        s"task_gc_s=${fmt((tGcTime.get - tg0) / 1e3)} " +
        s"store_used_mb=${(mx - rem) / (1 << 20)} " +
        { val (ccu, ccm) = codeCache()
          s"jit_s=${fmt((jitMillis - jit0) / 1e3)} " +
          s"codecache_mb=${ccu / (1 << 20)}/${ccm / (1 << 20)}" })
      if (ok) Some(wall) else None
    }

    val base = step("control", detector)
    // suspects may fail by design (the sf1000 lsh ENOSPC is itself a rot
    // trigger) — their wall times don't enter the verdict, only the
    // detector's do, so a failed suspect is logged but not disqualifying
    suspects.foreach(s => step("suspect", s))
    val after = (1 to reps).map { i =>
      if (settle > 0) { println(s"[rot] settle ${settle}s"); Thread.sleep(settle * 1000L) }
      step(s"detect$i", detector)
    }
    val verdict = (base, after) match {
      case (Some(b), reps2) if reps2.forall(_.isDefined) =>
        if (reps2.flatten.min > 1.5 * b) "ROT" else "CLEAN"
      case _ => "INVALID" // a detector rep failed: no timing to compare
    }
    println(s"[rot] VERDICT=$verdict control=${base.map(fmt).getOrElse("FAIL")} " +
      s"after=${after.map(_.map(fmt).getOrElse("FAIL")).mkString(",")} " +
      s"suspects=${suspects.mkString(",")}")
    spark.stop()
  }
}
