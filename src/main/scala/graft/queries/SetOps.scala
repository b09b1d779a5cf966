package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set-operation catalog: UNION ALL, INTERSECT, EXCEPT (+ ALL variant).
  * Reference analog: pyPiper fan-out (`a | [b, c]`, SURVEY.md §2.A op #8)
  * gives branching but no merge; these are the merge half. All inputs are
  * pre-aggregated/pre-projected so the distinct shuffle moves keys, not
  * payloads.
  */
object SetOps {

  /** UNION ALL of two tagged role projections, then re-aggregated. */
  val qSetUnionAll: QueryDef = QueryDef.oracle(
    "q_set_union_all",
    """SELECT nationkey, role, COUNT(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey, 'customer' AS role FROM customer
      |  UNION ALL
      |  SELECT s_nationkey AS nationkey, 'supplier' AS role FROM supplier
      |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val c = t.customer.select(col("c_nationkey").as("nationkey"), lit("customer").as("role"))
    val s = t.supplier.select(col("s_nationkey").as("nationkey"), lit("supplier").as("role"))
    c.unionByName(s)
      .groupBy("nationkey", "role").agg(count(lit(1)).as("n"))
      .orderBy("nationkey", "role")
  }

  /** INTERSECT (distinct): brands shipped in both 1995 and 1998. */
  val qSetIntersect: QueryDef = QueryDef.oracle(
    "q_set_intersect",
    """SELECT p_brand FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE year(l_shipdate) = 1995
      |INTERSECT
      |SELECT p_brand FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE year(l_shipdate) = 1998
      |ORDER BY p_brand""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    def brands(yr: Int) =
      t.part.join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .filter(year(col("l_shipdate")) === yr)
        .select("p_brand")
    brands(1995).intersect(brands(1998)).orderBy("p_brand")
  }

  /** EXCEPT (distinct): brands shipped in 1995 but never in 1998. */
  val qSetExcept: QueryDef = QueryDef.oracle(
    "q_set_except",
    """SELECT p_brand FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE year(l_shipdate) = 1995
      |EXCEPT
      |SELECT p_brand FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE year(l_shipdate) = 1998
      |ORDER BY p_brand""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    def brands(yr: Int) =
      t.part.join(t.lineitem, col("p_partkey") === col("l_partkey"))
        .filter(year(col("l_shipdate")) === yr)
        .select("p_brand")
    brands(1995).except(brands(1998)).orderBy("p_brand")
  }

  /** EXCEPT ALL: multiset difference (per-occurrence), folded to counts. */
  val qSetExceptAll: QueryDef = QueryDef.oracle(
    "q_set_except_all",
    """SELECT o_orderpriority, COUNT(*) AS n FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val f = t.orders.filter(col("o_orderstatus") === "F").select("o_orderpriority")
    val o = t.orders.filter(col("o_orderstatus") === "O").select("o_orderpriority")
    f.exceptAll(o)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** INTERSECT ALL: multiset intersection, folded to counts. */
  val qSetIntersectAll: QueryDef = QueryDef.oracle(
    "q_set_intersect_all",
    """SELECT o_orderpriority, COUNT(*) AS n FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val f = t.orders.filter(col("o_orderstatus") === "F").select("o_orderpriority")
    val o = t.orders.filter(col("o_orderstatus") === "O").select("o_orderpriority")
    f.intersectAll(o)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** UNION (distinct): all nation keys appearing on either side, each
    * once — the dedup shuffle moves just the key column. */
  val qSetUnion: QueryDef = QueryDef.oracle(
    "q_set_union",
    """SELECT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    t.customer.select(col("c_nationkey").as("nationkey"))
      .unionByName(t.supplier.select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")
  }

  val all: Seq[QueryDef] = Seq(
    qSetUnionAll, qSetIntersect, qSetExcept, qSetExceptAll, qSetIntersectAll,
    qSetUnion)
}
