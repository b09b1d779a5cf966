package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real logic lives in graft.queries.*; this object only adapts the
  * catalog to the driver's Map-shaped interface. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. ListMap keeps
    * registry order, so Verify dumps and Bench timings run in the same
    * deterministic sequence every build (a plain Map's hash order moves
    * the JVM-warm-up cost to different queries per build, making
    * per-query bench numbers incomparable across rounds). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      graft.queries.Registry.all.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
