ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pypiperspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through UNPREFIXED: sbt's default logger
// wraps every line in "[info] ", which breaks any harness that parses a
// machine-readable line (Bench's single JSON line) out of captured output
// — all nine driver bench artifacts to date record parsed:null because
// of that prefix.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[N] runs every task slot in this one JVM: size the heap like a
  // production executor (~1.5 GB/core on the 32-core/128 GiB bench box),
  // not like a driver — 8g starved 32 slots to ~144 MB of execution
  // memory each and pushed the heavy queries into spill. Capped at half
  // of physical RAM so smaller machines degrade to spill instead of
  // meeting the OS OOM-killer; SPARK_DRIVER_MEM overrides.
  // the RAM probe is HotSpot-specific (com.sun.management); on another
  // JVM (OpenJ9 etc.) or under a restrictive sandbox fall back to 8g
  // instead of failing the whole build load
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", scala.util.Try {
    val ram = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getTotalMemorySize
    val gb = math.max(2L, math.min(48L, ram / 2 >> 30))
    s"${gb}g"
  }.getOrElse("8g"))}",
  // the ContextCleaner's periodic System.gc() (see Bench/Verify conf)
  // must not stop the world for seconds on a 48 g heap — make explicit
  // GC a concurrent G1 cycle; the cleaner only needs references
  // *noticed*, not a full compaction
  "-XX:+ExplicitGCInvokesConcurrent",
  // The round-15 sf1000 "cross-query session rot" (q_text_bpe 197 s warm
  // vs 49 s cold, SCALE.md round-16 bisect): the JDK-17 nmethod sweeper
  // SPECULATIVELY flushes cold compiled code while a codegen+spill-heavy
  // query floods the JIT — the next query re-runs its (unchanged,
  // Janino-cached) generated classes at interpreter/C1 tier and re-JITs
  // from scratch, a measured 3–5× task-CPU amplification with the code
  // cache never past 85 of 240 MB. Disabling speculative flushing
  // removed the amplification entirely (RotBisect A/B, 7-hypothesis
  // falsification matrix in SCALE.md). With flushing off a FULL code
  // cache would disable compilation permanently, so reserve 512 MB —
  // 6× the deepest occupancy any graft campaign session has reached.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:-UseCodeCacheFlushing",
)
