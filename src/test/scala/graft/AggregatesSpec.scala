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
