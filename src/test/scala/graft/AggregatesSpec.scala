package graft

import graft.queries.Aggregates
import org.apache.spark.sql.functions._

/** Error-bound pins for the approximate aggregates — the operators whose
  * sketches are engine-specific (no DuckDB oracle by design): the spec
  * asserts they track their exact counterparts within the advertised
  * tolerance, which is the property a 100 TB user actually relies on. */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of the exact count per group") {
    // same bound the judged query folds into its est_within_10pct column (at its looser 5σ width);
    // asserted here with the raw estimate visible for diagnosis
    val rows = graft.Tables(spark, sf).lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"group ${r.get(0)}: approx $approx vs exact $exact")
    }
    // and the judged row must carry the bound as TRUE everywhere
    val judged = Aggregates.qAggApproxDistinct.run(spark, sf).collect()
    assert(judged.forall(_.getAs[Boolean]("est_within_10pct")))
  }

  test("approx_percentile tracks the exact interpolated percentile") {
    val li = graft.Tables(spark, sf).lineitem
    val r = li.agg(
      percentile(col("l_extendedprice").cast("double"), lit(0.5)).as("exact"),
      approx_percentile(col("l_extendedprice").cast("double"), lit(0.5),
        lit(10000)).as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    // approx_percentile guarantees rank error ≤ n/accuracy; on this
    // distribution that is well under 1% in value
    assert(math.abs(approx - exact) / exact <= 0.01,
      s"approx $approx vs exact $exact")
  }

  test("quantile sketch: exact-integer merge is associative and parallelism-invariant") {
    import org.apache.spark.sql.functions._
    import graft.functions.{QuantileHistAgg, QuantileHistUnionAgg}
    import spark.implicits._
    // the algebra, pinned directly on the aggregator: (x⊕y)⊕z = x⊕(y⊕z)
    // and x⊕y = y⊕x, as EXACT arrays (merge mutates its left arg — feed
    // it clones, the same contract Spark's ObjectAggregation honors)
    val u = new QuantileHistUnionAgg(4)
    val (x, y, z) = (Array(1L, 0L, 5L, 2L), Array(0L, 7L, 1L, 0L),
      Array(3L, 3L, 0L, 9L))
    val left = u.merge(u.merge(x.clone(), y.clone()), z.clone())
    val right = u.merge(x.clone(), u.merge(y.clone(), z.clone()))
    val swapped = u.merge(y.clone(), x.clone())
    assert(left.sameElements(right), "merge must be associative")
    assert(u.merge(x.clone(), y.clone()).sameElements(swapped),
      "merge must be commutative")
    // end-to-end: identical sketches at any parallelism, and the
    // shard-then-union path equals the direct single-pass sketch —
    // the property that makes persisted per-shard sketches mergeable
    val vals = (1 to 997).map(i => (i % 5, i % 13, (i * 37 % 131500).toDouble))
    def skOf(parts: Int) = vals.toDF("g", "shard", "v").repartition(parts)
      .groupBy("g").agg(QuantileHistAgg.sketch(col("v")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val one = skOf(1)
    val thirteen = skOf(13)
    assert(one == thirteen, "sketch must be parallelism-invariant")
    val viaUnion = vals.toDF("g", "shard", "v")
      .groupBy("g", "shard")
      .agg(QuantileHistAgg.sketch(col("v")).as("sk"))
      .groupBy("g").agg(QuantileHistAgg.union(col("sk")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(viaUnion == one, "shard-then-union must equal direct sketch")
    // config-mismatch guard: a wrong-width sketch fails loudly
    intercept[Exception] {
      Seq(Seq(1L, 2L)).toDF("sk")
        .agg(QuantileHistAgg.union(col("sk"))).collect()
    }
  }

  test("persisted HLL sketch union tracks exact distincts; merge ≡ direct") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables(spark, sf).orders
    val sk = spark.read.parquet(
      graft.queries.Aggregates.monthlySketchPath(spark, sf))
    // merged-sketch estimate vs the exact distinct over the raw data
    val est = sk.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .head().getLong(0)
    val exact = orders.select("o_custkey").distinct().count()
    assert(math.abs(est - exact).toDouble / exact <= 0.02,
      s"sketch est $est vs exact $exact")
    // merging the per-month sketches must equal sketching the raw data
    // directly — the property that makes the artifact maintainable
    val direct = orders
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))))
      .head().getLong(0)
    assert(est == direct, s"merged $est != direct $direct")
  }
}
