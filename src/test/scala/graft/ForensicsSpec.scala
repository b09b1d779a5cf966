package graft

import org.apache.spark.sql.functions._

/** Pins the JVM forensic samplers Bench folds into BENCH_FULL.json
  * (round 17, verdict item 7): each sensor must be readable and
  * cumulative-monotone, and the Janino codegen counter must actually
  * tick when a novel whole-stage-codegen shape compiles — a sampler
  * that silently reads 0 forever would make the rot-diagnosis fields
  * worthless exactly when they're needed. */
class ForensicsSpec extends SparkSpec {

  test("jitMillis is readable and monotone") {
    val a = Forensics.jitMillis
    assert(a > 0, "HotSpot should have JIT'd something by test time")
    val b = Forensics.jitMillis
    assert(b >= a)
  }

  test("code cache occupancy is readable and nonzero") {
    val used = Forensics.codeCacheUsedBytes
    assert(used > (1L << 20), s"CodeHeap used=$used — expected >1MB in a warm JVM")
  }

  test("codegen compile count ticks on a novel codegen shape") {
    val c0 = Forensics.codegenCompileCount
    assert(c0 >= 0)
    // a column shape no other suite builds (41 derived columns summed):
    // whole-stage codegen sources are cached by exact generated text, so
    // a novel shape forces at least one fresh Janino compilation
    val wide = spark.range(100).select(
      (0 until 41).map(i => (col("id") * (i + 3)).as(s"fz$i")): _*)
    wide.select(expr((0 until 41).map(i => s"fz$i").mkString("+")).as("s"))
      .agg(sum("s")).collect()
    val c1 = Forensics.codegenCompileCount
    assert(c1 >= 1, "codegen counter never ticked in this JVM")
    assert(c1 >= c0)
  }
}
