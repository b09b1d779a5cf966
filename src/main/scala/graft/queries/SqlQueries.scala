package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** The pure-SQL surface (`spark.sql` over registered views) and
  * pivot/subquery operators, proving a user of the reference could run
  * plain ANSI SQL against the same engine. */
object SqlQueries {
  import Num._

  private def views(spark: org.apache.spark.sql.SparkSession, dir: String,
      names: String*): Unit = {
    val t = Tables(spark, dir)
    names.foreach {
      case n @ "orders" => t.orders.createOrReplaceTempView(n)
      case n @ "lineitem" => t.lineitem.createOrReplaceTempView(n)
      case n @ "customer" => t.customer.createOrReplaceTempView(n)
      case n => throw new IllegalArgumentException(n)
    }
  }

  /** Pivot: return-flag quantities spread into columns per line status.
    * Values enumerated explicitly — at scale an implicit pivot means an
    * extra distinct-scan just to discover them. */
  val qAggPivot: QueryDef = QueryDef.oracle(
    "q_agg_pivot",
    """SELECT l_linestatus,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END
      |    AS DECIMAL(30,6))) AS DOUBLE) AS qty_a,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END
      |    AS DECIMAL(30,6))) AS DOUBLE) AS qty_n,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END
      |    AS DECIMAL(30,6))) AS DOUBLE) AS qty_r
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .na.fill(0.0)
      .select(col("l_linestatus"), col("A").as("qty_a"), col("N").as("qty_n"),
        col("R").as("qty_r"))
      .orderBy("l_linestatus")
  }

  /** Scalar subquery: orders above the global decimal-exact mean price.
    * Catalyst plans the subquery once and broadcasts the scalar. */
  val qScalarSubquery: QueryDef = QueryDef.oracle(
    "q_scalar_subquery",
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
      |  FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    views(spark, dir, "orders")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
        |  FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS — decorrelated by Catalyst into
    * semi/anti joins (same plans as q_join_semi/q_join_anti). */
  val qExistsSubquery: QueryDef = QueryDef.oracle(
    "q_exists_subquery",
    """SELECT c_mktsegment,
      |  COUNT(CASE WHEN has_urgent THEN 1 END) AS n_with_urgent,
      |  COUNT(*) AS n
      |FROM (
      |  SELECT c_mktsegment,
      |    EXISTS (SELECT 1 FROM orders
      |            WHERE o_custkey = c_custkey
      |              AND o_orderpriority = '1-URGENT') AS has_urgent
      |  FROM customer)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    views(spark, dir, "orders", "customer")
    spark.sql(
      """SELECT c_mktsegment,
        |  COUNT(CASE WHEN has_urgent THEN 1 END) AS n_with_urgent,
        |  COUNT(*) AS n
        |FROM (
        |  SELECT c_mktsegment,
        |    EXISTS (SELECT 1 FROM orders
        |            WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT') AS has_urgent
        |  FROM customer)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** CTE + LATERAL VIEW explode, pure SQL end-to-end: per-order line
    * counts via a CTE, then each order's priority string exploded into
    * words (DuckDB mirrors with unnest). Proves the SQL surface carries
    * the same generator/1→N semantics the DataFrame catalog has. */
  val qSqlCteLateral: QueryDef = QueryDef.oracle(
    "q_sql_cte_lateral",
    """WITH per_order AS (
      |  SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_lines
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2)
      |SELECT w AS word, COUNT(*) AS n_orders, CAST(SUM(n_lines) AS BIGINT) AS sum_lines
      |FROM (SELECT n_lines, unnest(string_split(o_orderpriority, '-')) AS w
      |      FROM per_order)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    views(spark, dir, "orders", "lineitem")
    spark.sql(
      """WITH per_order AS (
        |  SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_lines
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2)
        |SELECT w AS word, COUNT(*) AS n_orders, SUM(n_lines) AS sum_lines
        |FROM per_order
        |LATERAL VIEW explode(split(o_orderpriority, '-')) t AS w
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** CDC upsert / SCD1 snapshot maintenance — the merge every nightly
    * pipeline runs against its snapshot. With no transactional table
    * format in play, the Spark-native shape IS the rewrite MERGE
    * compiles to: survivors = base LEFT ANTI upserts on the key, then
    * UNION ALL the upsert batch — one shuffle per side on the join key
    * (bucket both by the key at 100 TB and the anti join is
    * exchange-free). The upsert batch is derived deterministically from
    * the base (scrambled ~10 % price-bumped updates + a disjoint-key
    * insert slice), so both engines construct the identical batch; the
    * post-merge per-status rollup hash-pins the result. Update rows are
    * verifiably CHANGED (price × 1.1 — one IEEE multiply, identical on
    * both engines) and insert keys are offset beyond the key domain. */
  val qUpsertSnapshot: QueryDef = QueryDef.oracle(
    "q_upsert_snapshot",
    s"""WITH upd AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice
      |  FROM orders WHERE ${Scramble.sql("o_orderkey")} % 10 = 0),
      |ins AS (
      |  SELECT o_orderkey + 10000000000 AS o_orderkey,
      |    'N' AS o_orderstatus, o_totalprice
      |  FROM orders WHERE ${Scramble.sql("o_orderkey")} % 97 = 7),
      |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |survivors AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM batch b
      |                    WHERE b.o_orderkey = o.o_orderkey)),
      |merged AS (SELECT * FROM survivors UNION ALL SELECT * FROM batch)
      |SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val base = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val upd = base.filter(Scramble(col("o_orderkey")) % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
    val ins = base.filter(Scramble(col("o_orderkey")) % 97 === 7)
      .select((col("o_orderkey") + 10000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    val batch = upd.unionByName(ins)
    base.join(batch.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(batch)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  val all: Seq[QueryDef] =
    Seq(qAggPivot, qScalarSubquery, qExistsSubquery, qSqlCteLateral,
      qUpsertSnapshot)
}
