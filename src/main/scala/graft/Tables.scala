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
  /** events.ts normalized to a session-TZ (UTC) TIMESTAMP — see
    * [[Tables.normalizeTs]] for the generator-version schemas handled. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** events.ts across generator versions, normalized to one type.
    *
    * Early generators wrote parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]); under
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as a raw-nanos
    * LONG and is floored to microseconds (DuckDB's `epoch_us` floors
    * identically, and floor is monotone, so ordering and µs-aligned
    * range predicates agree). The round-10 generator writes native
    * timestamp[us], which Spark reads as TIMESTAMP_NTZ — cast to the
    * session-TZ TIMESTAMP (session TZ is pinned UTC by Graft.builder,
    * so the instant is unchanged and the output type matches what every
    * query/oracle was written against). Both paths yield bit-identical
    * µs instants. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
