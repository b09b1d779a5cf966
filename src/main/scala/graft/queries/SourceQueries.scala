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

  /** The 16-bit × 2 Morton (Z-order) interleave as ONE algebra rendered
    * per engine (the Scramble discipline — the two must never drift):
    * bit i of b1 lands at 2i, bit i of b2 at 2i+1, extracted with pure
    * integer div/mod so the identical expression runs under Spark's
    * `div` and DuckDB's `//`. Inputs must be in [0, 65536); z < 2^32. */
  private[queries] def zInterleaveSql(b1: String, b2: String,
      divOp: String): String =
    (0 until 16).map { i =>
      val p = 1L << i
      // bare integral literals: both parsers widen past int32 to bigint,
      // and the inputs are bigint columns, so every term stays 64-bit
      s"(($b1 $divOp $p) % 2) * ${1L << (2 * i)} + " +
        s"(($b2 $divOp $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Z-ORDER (space-filling-curve) layout — the multi-dimensional
    * clustering a 100 TB lake uses when queries slice on TWO columns at
    * once: a single-column sort makes parquet min/max stats tight on
    * that column only, while sorting by the Morton interleave of
    * (custkey, order-day) tiles the 2-D space so EVERY file's min/max
    * box is small in BOTH dimensions — a (custkey range × date range)
    * box query then skips most row groups on stats alone, which no
    * 1-D layout can do. Each dimension is NORMALIZED to the full
    * 16-bit range via its table max (deterministic integral arithmetic,
    * identical in both engines) before interleaving — unnormalized
    * unequal bit widths make the curve's high bits degenerate to the
    * wider dimension, i.e. a plain 1-D sort (measured: the unnormalized
    * curve tied the date sort on file skipping; the normalized one
    * beats it). The staged layout is range-partitioned and sorted by z
    * (write-once, _SUCCESS-keyed); the judged query runs the 2-D box
    * rollup over the z-laid table AND pins the curve values themselves
    * (sum/min/max of z per group — integer-exact, same rendered algebra
    * in DuckDB). A hash match proves the layout changed the I/O, not
    * the answer (the DPP argument); LayoutSpec quantifies the
    * file-skipping win against a date-sorted layout. */
  val qLayoutZorder: QueryDef = QueryDef.oracle(
    "q_layout_zorder",
    s"""WITH d AS (
      |  SELECT o_orderpriority, o_custkey, o_orderdate, o_totalprice,
      |    date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd
      |  FROM orders),
      |b AS (
      |  SELECT o_orderpriority, o_custkey, o_orderdate, o_totalprice,
      |    o_custkey * 65535 // (SELECT MAX(o_custkey) FROM d) AS b1,
      |    dd * 65535 // (SELECT MAX(dd) FROM d) AS b2
      |  FROM d),
      |z AS (
      |  SELECT o_orderpriority, o_custkey, o_orderdate, o_totalprice,
      |    ${zInterleaveSql("b1", "b2", "//")} AS zval
      |  FROM b)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(zval) AS BIGINT) AS sum_z,
      |  CAST(MIN(zval) AS BIGINT) AS min_z, CAST(MAX(zval) AS BIGINT) AS max_z
      |FROM z
      |WHERE o_custkey BETWEEN 20 AND 60
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val laid = spark.read.parquet(zorderedOrdersPath(spark, dir))
    laid
      .filter(col("o_custkey").between(20, 60)
        && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Num.dsum(col("o_totalprice")).as("revenue"),
        sum(col("zval")).cast("long").as("sum_z"),
        min(col("zval")).cast("long").as("min_z"),
        max(col("zval")).cast("long").as("max_z"))
      .orderBy("o_orderpriority")
  }

  /** Stage orders in Z-order: per-dimension 16-bit normalization by the
    * table max (two bounded driver scalars — the CC convergence-scalar
    * kind; the oracle states the same maxes as scalar subqueries), then
    * zval by the SAME rendered interleave as the oracle, 64 range
    * partitions sorted within — each output file covers one compact
    * curve segment, i.e. a small 2-D tile. Write-once per sf dir
    * (shared with LayoutSpec). */
  private[graft] def zorderedOrdersPath(
      spark: SparkSession, dir: String): String = {
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_src_orders_zorder_parquet_${dir.hashCode.toHexString}")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val t = Tables(spark, dir)
      val withDay = t.orders
        .withColumn("dd", datediff(col("o_orderdate"),
          lit("1995-01-01").cast("timestamp")).cast("bigint"))
      val mx = withDay
        .agg(max(col("o_custkey")), max(col("dd"))).head()
      val (maxCk, maxDd) = (mx.getLong(0), mx.getLong(1))
      // `div`, not `/`: Column./ is double division; the oracle's `//`
      // is integral and the two must match bit-for-bit
      val withZ = withDay
        .withColumn("b1", expr(s"o_custkey * 65535 div $maxCk"))
        .withColumn("b2", expr(s"dd * 65535 div $maxDd"))
        .withColumn("zval", expr(zInterleaveSql("b1", "b2", "div")))
        .drop("dd", "b1", "b2")
      withZ.repartitionByRange(64, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  val all: Seq[QueryDef] =
    Seq(qSourceCsvJson, qSourceOrc, qJoinDpp, qLayoutZorder)
}
