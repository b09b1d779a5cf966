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
    // partitions with cap 16: the Misra–Gries maps overflow constantly,
    // so each partition's decrement-round count decs_p is large
    // (T ≈ N/(cap+1) across partitions) while kth = 2 — the proof must
    // fail, the verdict flag must say so, and the exact fallback must
    // produce the lexicographic-smallest count-2 grams
    val grams = (0 until 3000).flatMap(i => Seq(f"g$i%04d", f"g$i%04d"))
      .toDS().repartition(8)
    val (df, proven) = TextAnalysis.heavyHittersProven(grams, 5, 16)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(!proven, "flat distribution must NOT prove bounded exactness")
    assert(got == (0 until 5).map(i => (f"g$i%04d", 2L)),
      s"fallback must deliver the exact flat-distribution answer: $got")
  }

  test("evictions forced by a small cap: skewed data still proves exact (no fallback)") {
    import spark.implicits._
    // 20 heavy grams (1000 copies each) + 6000 distinct singletons, over
    // 8 partitions with cap 64: singleton pressure forces MG decrement
    // rounds in every partition (the maps overflow ~12× over), yet the
    // eviction mass stays small — each round absorbs cap+1 = 65 units,
    // so T ≈ 6000/65 ≈ 92 ≪ kth ≈ 1000 (heavies lose at most decs_p
    // locally and are recounted exactly in pass 2). The bounded path
    // must PROVE itself under evictions and match the exact answer.
    val heavy = (0 until 20).flatMap(i => Seq.fill(1000)(f"h$i%02d"))
    val light = (0 until 6000).map(i => f"s$i%05d")
    val grams = scala.util.Random.shuffle(heavy ++ light).toDS().repartition(8)
    val (df, proven) = TextAnalysis.heavyHittersProven(grams, 10, 64)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(proven, "skewed distribution under evictions must still prove exactness")
    assert(got == (0 until 10).map(i => (f"h$i%02d", 1000L)),
      s"bounded path drifted under evictions: $got")
  }

  test("candidate set smaller than k abstains from the proof (nCand >= k clause)") {
    import spark.implicits._
    // Only 3 distinct grams but k = 5: the candidate set can never reach
    // k, so the proof must abstain (nCand < k) and the fallback must
    // return all 3 grams exactly — the clause MG makes necessary, since
    // evictions can shrink summaries below k even when kth > T.
    val grams = (Seq.fill(10)("aa") ++ Seq.fill(5)("bb") ++ Seq("cc"))
      .toDS().repartition(2)
    val (df, proven) = TextAnalysis.heavyHittersProven(grams, 5, 16)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    assert(!proven, "nCand < k must not prove (ranks nCand+1..k could be withheld)")
    assert(got == Seq(("aa", 10L), ("bb", 5L), ("cc", 1L)),
      s"sub-k fallback must still be exact: $got")
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
