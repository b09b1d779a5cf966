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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
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
    def storage(): (Int, Long, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    def step(tag: String, name: String): Double = {
      val (hb0, hs0) = hostStat(); val g0 = gcMillis; val c0 = cpuNanos
      val (cg0, _) = codegen()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        println(s"[rot] $tag $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
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
      println(s"[rot] $tag $name wall=${fmt(wall)} gc=${fmt((gcMillis - g0) / 1e3)} " +
        s"cpu=${fmt(proc)} ext=${fmt(ext)} steal=${fmt(steal)} " +
        s"rdd_count=$rc rdd_mem_mb=${rm / (1 << 20)} rdd_disk_mb=${rd / (1 << 20)} " +
        s"heap_mb=$heap codegen_n=${cg1 - cg0} scratch_gb=${fmt(scratchBytes() / 1e9)}")
      wall
    }

    val base = step("control", detector)
    suspects.foreach(s => step("suspect", s))
    val after = (1 to reps).map(i => step(s"detect$i", detector))
    val verdict =
      if (after.min > 1.5 * base) "ROT" else "CLEAN"
    println(s"[rot] VERDICT=$verdict control=${fmt(base)} " +
      s"after=${after.map(fmt).mkString(",")} suspects=${suspects.mkString(",")}")
    spark.stop()
  }
}
