package graft

import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffled storage so repeated joins/aggregations
  * on the bucket key skip the exchange entirely — at 100 TB this is the
  * difference between re-shuffling the fact table per query and never
  * shuffling it. Asserts the co-located join plan has NO shuffle. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val t = Tables(spark, sf)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the in-memory catalog can leave orphaned locations from prior runs
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("li_b", "ord_b").foreach { n =>
      val d = new java.io.File(wh, n)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(d)
      }
    }
    t.lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    t.orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
    // force the merge join so bucketing (not broadcast) carries the day,
    // then assert the JOIN keys need no exchange (the aggregation's own
    // exchange on o_orderpriority is expected); restore the SAVED
    // threshold — the session is shared across every suite
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(!plan.contains("hashpartitioning(l_orderkey")
      && !plan.contains("hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its keys:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // and the result matches the plain (shuffling) join
    val plain = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq ==
      plain.orderBy("o_orderpriority").collect().toSeq)
  }
}
