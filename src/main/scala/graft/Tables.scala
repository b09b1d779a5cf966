package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md). Every `SparkEntry.queries` function receives the scale
  * -factor directory and goes through here, so filter pushdown and column
  * pruning reach the parquet scan uniformly.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed catalog
  * tables; the loader keeps the access path behind one seam so swapping
  * `spark.read.parquet(dir)` for `spark.table(name)` is a one-line change.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos and floor to
    * microseconds — DuckDB's `epoch_us` floors identically, so oracle
    * parity holds; floor is monotone, so ordering and range predicates
    * against µs-aligned bounds are unchanged. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
