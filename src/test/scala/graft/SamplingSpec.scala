package graft

import org.apache.spark.sql.functions._

/** Randomized sampling surface (`sample` / stratified `sampleBy`) —
  * fraction-accurate but partitioning-dependent, so pinned by bounds
  * here rather than a cross-engine oracle; the reproducible hash-based
  * sampling is the judged, oracle-checked path (queries/Sampling). */
class SamplingSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf).orders

  test("seeded sample is reproducible and fraction-accurate") {
    val total = orders.count()
    val a = orders.sample(withReplacement = false, 0.2, seed = 42)
    val b = orders.sample(withReplacement = false, 0.2, seed = 42)
    assert(a.count() == b.count(), "same seed, same partitioning => same rows")
    val frac = a.count().toDouble / total
    assert(frac > 0.1 && frac < 0.3, s"fraction off: $frac")
  }

  test("stratified sampleBy hits per-stratum fractions") {
    val fractions = Map("1-URGENT" -> 0.5, "5-LOW" -> 0.1)
    val s = orders.stat.sampleBy("o_orderpriority", fractions, seed = 7)
    val got = s.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == fractions.keySet, "unsampled strata must drop out")
    for ((k, f) <- fractions) {
      val frac = got(k).toDouble / base(k)
      assert(math.abs(frac - f) < 0.15, s"stratum $k fraction $frac != $f")
    }
  }

  test("deterministic stratified sample hits per-stratum rates (sampleBy-bound parity)") {
    val docs = Tables(spark, sf).documents
    val got = graft.queries.Sampling.qSampleStratified.run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- base) {
      val want = lang match {
        case "en" => 0.6; case "de" => 0.3; case _ => 0.1
      }
      val frac = got.getOrElse(lang, 0L).toDouble / n
      // same accuracy bound the seeded sampleBy test uses — the
      // deterministic scramble is as fraction-accurate as the RNG...
      assert(math.abs(frac - want) < 0.15, s"stratum $lang fraction $frac != $want")
    }
    // ...and additionally partitioning-invariant, which sampleBy is not
    val bucket = graft.queries.Scramble(col("doc_id")) % 100
    val rate = when(col("lang") === "en", 60)
      .when(col("lang") === "de", 30).otherwise(10)
    val reparted = docs.repartition(13).filter(bucket < rate)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == got)
  }

  test("hash split is exhaustive, disjoint, and partitioning-invariant") {
    val q = graft.queries.Sampling.qSampleSplit
    val r1 = q.run(spark, sf).collect().map(r => r.getString(0) -> r.getLong(1))
    assert(r1.map(_._2).sum == Tables(spark, sf).documents.count())
    // same data through a different partitioning => identical splits
    val docs = Tables(spark, sf).documents.repartition(13)
    val bucket = graft.queries.Scramble(col("doc_id")) % 100
    val r2 = docs
      .select(when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1.toMap == r2)
  }

  test("DSIR selection prefers the target domain on a vocabulary-separated fixture") {
    // src0 (the target) writes from vocab A, src1 from vocab B; with the
    // vocabularies disjoint, every src0 doc's integer logit exceeds every
    // src1 doc's by tens of millions of micro-units — far beyond the
    // Gumbel key's bounded perturbation (u over a 2^20 lattice keeps
    // floor(-ln(-ln u)·1e6) within about [-2.7e6, 14.6e6]) — so the
    // Gumbel-top-|src0| draw must select exactly the src0 docs.
    import spark.implicits._
    val va = Vector("alpha", "beta", "gamma", "delta", "eps")
    val vb = Vector("omega", "psi", "chi", "phi", "ups")
    def doc(id: Long, v: Vector[String]): (Long, String, String) =
      (id, if (v == va) "src0" else "src1",
        (0 until 40).map(i => v(((id + i) % 5).toInt)).mkString(" "))
    val fixture = ((0L until 8L).map(doc(_, va)) ++
      (8L until 24L).map(doc(_, vb))).toDF("doc_id", "source", "text")
    val scored = graft.queries.Sampling.dsirScored(fixture)
      .orderBy(col("skey").desc, col("doc_id")).collect()
    assert(scored.length == 24)
    val top = scored.take(8).map(_.getString(1)).toSet
    assert(top == Set("src0"), s"top-8 not all target: ${top.mkString(",")}")
    val minTarget = scored.take(8).map(_.getLong(2)).min
    val maxOther = scored.drop(8).map(_.getLong(2)).max
    assert(minTarget > maxOther,
      s"logit separation violated: $minTarget <= $maxOther")
  }

  test("DSIR scores are a pure function of the data (partitioning-invariant)") {
    val docs = Tables(spark, sf).documents
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.queries.Sampling.dsirScored(d)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val a = run(docs.repartition(3))
    val b = run(docs.repartition(17))
    assert(a == b, "DSIR logits/keys changed under repartitioning")
  }

  test("class rebalance yields exactly equal counts, each the minimum class size") {
    val rows = graft.queries.Sampling.qSampleBalance.run(spark, sf).collect()
    val counts = rows.map(_.getLong(1)).toSet
    assert(counts.size == 1, s"unequal class counts: ${rows.mkString(", ")}")
    val minClass = graft.Tables(spark, sf).documents
      .groupBy("lang").count().agg(org.apache.spark.sql.functions.min("count"))
      .head().getLong(0)
    assert(counts.head == minClass,
      s"balanced size ${counts.head} != scarcest class $minClass")
  }

  test("temperature quotas flatten a skewed source distribution (alpha = 0.7)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed fixture: this corpus's sources are uniform, where
    // temperature scaling is inert by construction — the algebra must
    // be pinned where it has something to do
    val counts = Seq(("big", 10000L), ("mid", 1000L), ("tiny", 10L))
      .toDF("source", "n_s")
    val q = graft.queries.Sampling.temperatureQuotas(counts, 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // exact integer expectations: wgt = floor(1e6 * n^0.7 + 0.5) with
    // the SAME JVM pow the engine uses
    for ((src, (n, wgt, _)) <- q)
      assert(wgt == math.floor(math.pow(n.toDouble, 0.7) * 1e6 + 0.5).toLong,
        s"$src weight drifted: $wgt for n=$n")
    val (nB, wB, qB) = q("big"); val (nT, wT, qT) = q("tiny")
    // flattening: big/tiny quota ratio must sit strictly BELOW the
    // proportional ratio (1000x) and ABOVE uniform (1x)
    assert(qB > qT && qB.toDouble / qT < nB.toDouble / nT,
      s"no flattening: quotas $qB/$qT vs counts $nB/$nT")
    // quotas respect the budget and monotonicity in n_s
    assert(q.values.map(_._3).sum <= 10000L)
    assert(qB >= q("mid")._3 && q("mid")._3 >= qT)
  }

  test("temperature mix selection is deterministic and quota-bounded on the corpus") {
    val run1 = graft.queries.Sampling.qMixTemperature.run(spark, sf).collect()
    val run2 = graft.queries.Sampling.qMixTemperature.run(spark, sf).collect()
    assert(run1.sameElements(run2), "selection not deterministic")
    run1.foreach { r =>
      val (nDocs, quota, nSel) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(nSel == math.min(nDocs, quota),
        s"${r.getString(0)}: selected $nSel of quota $quota with $nDocs docs")
    }
  }

  test("k-center coreset covers every cluster of a clustered fixture; a prefix sample does not") {
    // 4 well-separated clusters on orthogonal axes (8 members each,
    // tiny deterministic in-cluster jitter on a SECOND axis so members
    // are distinct but stay cos≈1 to their own cluster and cos≈0 to
    // the others). k-center's defining property: 4 selections must
    // land one per cluster — while the naive prefix baseline (first 4
    // ids: the "cheap sample" a pipeline would otherwise take) stays
    // inside cluster 0 by construction.
    import spark.implicits._
    val vecs = (0L until 32L).map { id =>
      val cl = (id / 8).toInt
      val v = Array.fill(8)(0f)
      v(cl) = 1f
      v((cl + 4) % 8) = 0.01f * (id % 8 + 1)
      (id, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val sel = graft.queries.Sampling.kCenterGreedy(df, 4)
    val clusters = sel.map(_._2 / 8).toSet
    assert(clusters == Set(0L, 1L, 2L, 3L),
      s"k-center must span all 4 clusters, got $sel")
    val prefixClusters = vecs.take(4).map(_._1 / 8).toSet
    assert(prefixClusters == Set(0L), "fixture broken: prefix spans clusters")
    // gap trace: strictly positive after the seed, non-increasing
    // (the covering radius shrinks monotonically up to float ties)
    val gaps = sel.drop(1).map(_._3)
    assert(gaps.forall(_ > 0.5), s"inter-cluster gaps must be large: $gaps")
    assert(gaps.zip(gaps.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"gap trace not non-increasing: $gaps")
    // determinism: a second run is identical
    assert(graft.queries.Sampling.kCenterGreedy(df, 4) == sel)
  }
}
