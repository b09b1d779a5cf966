package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Non-parquet source formats as JUDGED capabilities: the nation table
  * served through a CSV scan and region through a JSON-lines scan, joined
  * and rolled up, hash-checked against the DuckDB oracle reading the
  * original parquet. Staging (parquet → csv/json on local disk, written
  * once per sf dir) is test plumbing; the judged surface is a schema'd
  * `spark.read.csv/json` feeding a normal Catalyst plan — pruning,
  * broadcast, aggregation all behave exactly as over parquet. At 100 TB
  * the same readers scan text-format data lakes split-parallel; explicit
  * schemas avoid the full-data inference pass (`inferSchema` reads
  * everything once before the real scan — never at scale). */
object SourceQueries {

  /** Stage `df` under /tmp in `fmt`, once per (table, sf dir);
    * `partitionCols` stages a hive-partitioned layout instead of a flat
    * one. */
  private def stage(spark: SparkSession, dir: String, table: String,
      fmt: String, df: => DataFrame,
      partitionCols: Seq[String] = Nil): String = {
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_src_${table}_${fmt}_${dir.hashCode.toHexString}")
    // key on _SUCCESS, not the directory: a crashed partial write must
    // be overwritten, not trusted
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS")))
      df.coalesce(1).write.mode("overwrite").format(fmt)
        .option("header", "true").partitionBy(partitionCols: _*)
        .save(out.toString)
    out.toString
  }

  /** CSV nation ⋈ JSON region → nations per region. The oracle reads the
    * parquet originals: a hash match proves the text scans are lossless
    * (schema'd read, no inference drift). */
  val qSourceCsvJson: QueryDef = QueryDef.oracle(
    "q_source_csv_json",
    """SELECT r_name, COUNT(*) AS n_nations,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_keys
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val nationCsv = spark.read
      .schema(t.nation.schema)
      .option("header", "true")
      .csv(stage(spark, dir, "nation", "csv", t.nation))
    val regionJson = spark.read
      .schema(t.region.schema)
      .json(stage(spark, dir, "region", "json", t.region))
    nationCsv.join(broadcast(regionJson),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        sum(col("n_nationkey")).cast("long").as("sum_keys"))
      .orderBy("r_name")
  }

  /** ORC scan with predicate pushdown — the third columnar lake format
    * (parquet everywhere else, csv/json above). The filter must reach
    * the ORC reader as a pushed predicate (PlanSpec pins PushedFilters
    * on the orc scan), exactly as it would on parquet; a hash match
    * against the parquet-reading oracle proves the format roundtrip is
    * lossless. */
  val qSourceOrc: QueryDef = QueryDef.oracle(
    "q_source_orc",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
      |FROM customer WHERE c_acctbal > 1000
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val customerOrc = spark.read
      .schema(t.customer.schema)
      .orc(stage(spark, dir, "customer", "orc", t.customer))
    customerOrc.filter(col("c_acctbal") > 1000)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey")).cast("long").as("sum_keys"))
      .orderBy("c_mktsegment")
  }

  /** Dynamic partition pruning over a month-partitioned fact — THE scan
    * optimization a date-partitioned 100 TB lake lives on: the dim-side
    * filter (Q1 months) prunes fact PARTITIONS at runtime via the
    * reused broadcast, so the scan never touches the other three
    * quarters' files. The fact table is staged once per sf dir as a
    * hive-partitioned parquet layout (partition column = yyyy-MM month);
    * PlanSpec pins the `dynamicpruning` expression in the fact scan's
    * PartitionFilters. The oracle states the same aggregate as a plain
    * quarter filter over the unpartitioned parquet — a hash match proves
    * pruning changed the I/O, not the answer. */
  val qJoinDpp: QueryDef = QueryDef.oracle(
    "q_join_dpp",
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM orders WHERE quarter(o_orderdate) = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val fact = spark.read.parquet(stage(spark, dir, "orders_part", "parquet",
      t.orders.withColumn("o_month",
        date_format(col("o_orderdate"), "yyyy-MM")),
      partitionCols = Seq("o_month")))
    // dim: month → quarter, built from the orders DATES (dim-side work is
    // dim-sized); the Q1 filter on it is what DPP pushes into the fact scan
    val dim = t.orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        quarter(col("o_orderdate")).as("q"))
      .distinct()
      .filter(col("q") === 1)
    fact.join(broadcast(dim), fact("o_month") === dim("m"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_month")
  }

  val all: Seq[QueryDef] = Seq(qSourceCsvJson, qSourceOrc, qJoinDpp)
}
