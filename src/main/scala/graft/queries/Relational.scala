package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Core relational operators: scan→filter→aggregate→sort. Phase-0 slice
  * from SURVEY.md §7. */
object Relational {

  /** TPC-H-Q1-style pricing summary: full scan of the largest fact table,
    * predicate pushed to parquet, partial+final hash aggregation on a
    * low-cardinality key (no skew possible: ≤8 groups), tiny result.
    * Scales linearly with input; the shuffle moves only ~8 rows per
    * partition (map-side partial agg). */
  val q1PricingSummary: QueryDef = QueryDef.oracle(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  ) { (spark, dir) =>
    import Num._
    val li = Tables(spark, dir).lineitem
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H-Q5-style five-way star join: local-supplier revenue per nation
    * for one region and one order year. The declarative shape is the
    * point — six relations stated as a chain of equi-joins and Catalyst
    * picks the physical order and strategies: region→nation prune first
    * (broadcast), customer/supplier dims broadcast against the fact
    * tables, and the only real shuffle is the orders⋈lineitem fact-fact
    * join on the order key with the date filter PUSHED to the orders
    * scan (cutting the build side ~6× before it exchanges). Exactly the
    * plan a hand-scheduled engine has to hard-code, for free — and the
    * c_nationkey = s_nationkey cross-dimension predicate is what makes
    * join ORDER genuinely matter here. Revenue sums ride the exact
    * decimal interior, so ORDER BY revenue DESC agrees bit-for-bit with
    * the oracle. */
  val q5LocalSupplier: QueryDef = QueryDef.oracle(
    "q5_local_supplier",
    """SELECT n_name, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
      |    AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
  ) { (spark, dir) =>
    import Num._
    val t = Tables(spark, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey")
        && col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val all: Seq[QueryDef] = Seq(q1PricingSummary, q5LocalSupplier)
}
