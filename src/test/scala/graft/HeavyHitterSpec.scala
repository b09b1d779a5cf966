package graft

import graft.queries.{Registry, TextAnalysis}
import org.apache.spark.sql.functions._

/** q_text_heavy_hitters: the bounded-shuffle candidate/rescan top-k.
  * The oracle pins the VALUES against the full GROUP BY; these tests pin
  * the mechanism — partitioning-invariance of the per-partition pass,
  * the exactness of the fallback on adversarially flat data, and the
  * strictness of the threshold proof. */
class HeavyHitterSpec extends SparkSpec {

  private def corpusGrams = {
    import spark.implicits._
    val ws = filter(split(col("text"), " "), w => w =!= "")
    Tables(spark, sf).documents
      .select(explode(TextAnalysis.bigramCol(ws)).as("g")).as[String]
  }

  private def fullTopK(k: Int) = corpusGrams.toDF("g")
    .groupBy("g").agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("g")).limit(k)
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("matches the exact full aggregation on the corpus (via the judged query)") {
    val full = fullTopK(15).map { case (g, n) => (g, n) }
    val got = Registry.all.find(_.name == "q_text_heavy_hitters").get
      .run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.catalog.clearCache() // drop the pass-1/rescan caches (test hygiene)
    assert(got == full,
      s"bounded top-k drifted from the full aggregation:\n$got\nvs\n$full")
  }

  test("partitioning-invariant: 1, 7, and 32 input partitions give the identical answer") {
    val full = fullTopK(10)
    for (parts <- Seq(1, 7, 32)) {
      val got = TextAnalysis.heavyHitters(corpusGrams.repartition(parts), 10, 256)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      spark.catalog.clearCache()
      assert(got == full, s"answer depends on partitioning ($parts parts):\n$got\nvs\n$full")
    }
  }

  test("adversarially flat distribution falls back and stays exact") {
    import spark.implicits._
    // 3000 distinct grams, each appearing exactly twice, spread over 8
    // partitions with cap 16: round-robin repartitioning puts a gram's
    // two copies in different partitions, so local counts are ~1 and
    // every overflowing partition's threshold is ≥ 1, giving T ≈ 8 —
    // kth = 2 is NOT strictly above it, the proof must fail, and the
    // exact fallback must produce the lexicographic-smallest count-2
    // grams
    val grams = (0 until 3000).flatMap(i => Seq(f"g$i%04d", f"g$i%04d"))
      .toDS().repartition(8)
    val got = TextAnalysis.heavyHitters(grams, 5, 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(got == (0 until 5).map(i => (f"g$i%04d", 2L)),
      s"fallback must deliver the exact flat-distribution answer: $got")
  }

  test("the proof obligation is strict: kth > T, not kth >= T") {
    // Simulate the threshold algebra directly: cutoff-0 partitions
    // always prove; equal-count ties at T must NOT prove (a withheld
    // gram with global count exactly T could beat a candidate on the
    // gram tie-break).
    val flat = Seq(2L, 2L, 2L) // 3 partitions, each withholding count-2 grams
    val t = flat.sum
    assert(!(6L > t), "kth == T must NOT prove")
    assert(7L > t, "kth strictly above T proves")
  }
}
