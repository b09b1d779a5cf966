package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the order network — the second graph family next
  * to connected components (`operators/ConnectedComponents`, the dedup
  * cluster-resolution tail). Reference analog: none (pyPiper has no graph
  * notion); this is training-data-pipeline territory — rank-based corpus
  * weighting (PageRank over a citation/link graph) is a standard quality
  * prior.
  */
object Graph {

  /** PageRank, integer fixed-point, 3 unrolled power iterations over the
    * symmetric customer↔supplier bipartite graph (an edge per distinct
    * (customer, supplier) trading pair, both directions, so rank
    * circulates and no node dangles).
    *
    * Determinism discipline: ranks live in micro-units as LONGs; each
    * node's per-edge contribution is `rank div out-degree` (integer
    * floor) and the damped update is `150000 + (85 * Σcontrib) div 100`
    * — every operation is exact 64-bit integer arithmetic, so any
    * engine at any parallelism produces identical ranks (the q_text_
    * lm_score no-libm rule applied to an iterative algorithm; the
    * oracle unrolls the same three iterations as MATERIALIZED CTEs).
    *
    * Scale shape (Pregel-by-DataFrame): the edge+degree table is built
    * once and persisted — it is the loop invariant; each iteration is
    * one equi-join (rank → edges on src) and one hash aggregate
    * (groupBy dst), i.e. rank rows move, edges don't. At 100 TB both
    * sides are bucketed by the join key so iterations are exchange-free
    * on the edge side; iteration count is a config (web-graph practice:
    * ~10–50, or until the micro-unit ranks fix — integer ranks make
    * convergence an EXACT equality test, no epsilon). Output: top-20
    * nodes by final rank (distributed TakeOrdered; the rank window runs
    * over the 20 survivors only). */
  val qGraphPagerank: QueryDef = QueryDef.oracle(
    "q_graph_pagerank",
    """WITH pairs AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS MATERIALIZED (
      |  SELECT c AS src, s AS dst FROM pairs
      |  UNION ALL
      |  SELECT s AS src, c AS dst FROM pairs),
      |deg AS MATERIALIZED (
      |  SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
      |r0 AS MATERIALIZED (
      |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      |r1 AS MATERIALIZED (
      |  SELECT e.dst AS node,
      |    CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON d.src = e.src
      |  GROUP BY 1),
      |r2 AS MATERIALIZED (
      |  SELECT e.dst AS node,
      |    CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON d.src = e.src
      |  GROUP BY 1),
      |r3 AS MATERIALIZED (
      |  SELECT e.dst AS node,
      |    CAST(150000 + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
      |  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON d.src = e.src
      |  GROUP BY 1)
      |SELECT rn, node, r FROM (
      |  SELECT node, r, ROW_NUMBER() OVER (ORDER BY r DESC, node) AS rn FROM r3)
      |WHERE rn <= 20 ORDER BY rn""".stripMargin,
  ) { (spark, dir) =>
    val r3 = pagerank(orderGraphEdges(spark, dir), 3)
    val top = r3.orderBy(col("r").desc, col("node").asc).limit(20)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("r").desc, col("node").asc)
    top.withColumn("rn", row_number().over(w))
      .select(col("rn"), col("node"), col("r"))
      .orderBy("rn")
  }

  /** The judged bipartite trading graph: an edge per distinct
    * (customer, supplier) pair, both directions; customers are even
    * node ids, suppliers odd. Exposed so GraphSpec can rank the SAME
    * graph and assert structural properties over the full rank table. */
  private[graft] def orderGraphEdges(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = t.orders.select("o_orderkey", "o_custkey")
      .join(t.lineitem.select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** The iteration core over any (src, dst) edge list — exposed for
    * GraphSpec's hand-computed exact-rank fixture. Every node must have
    * out-degree ≥ 1 (the judged graph is symmetric, so it does; dangling
    * nodes at scale get the standard redistribute-or-self-loop
    * treatment upstream). Returns (node, r) in micro-units. */
  private[graft] def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // loop invariant: edges with the source degree attached, persisted —
    // every iteration re-scans it; only the rank table moves per round.
    // Both joins BROADCAST the node-sized side explicitly: deg and rank
    // are aggregate outputs whose statistics Catalyst can't estimate, so
    // the static plan would sort-merge-shuffle the full edge table per
    // iteration; the hint pins at planning time what AQE would otherwise
    // only discover at runtime (measured: same ~4 s warm band either
    // way at sf0.1 — the hint buys plan STABILITY, not local speed; the
    // remaining per-iteration exchange is the groupBy(dst) partial,
    // collapsed map-side to |V| rows). At 100 TB, where ranks outgrow a
    // broadcast, the equivalent is bucketing edges and ranks by the
    // join key: iterations stay exchange-free on the edge side.
    val withDeg = edges.join(broadcast(deg), "src").persist()
    val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    val rN = (1 to iters).foldLeft(r0: DataFrame) { (rank, _) =>
      withDeg.join(broadcast(rank), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("contrib"))
        .select(col("dst").as("node"),
          expr("150000L + (85L * contrib) div 100L").as("r"))
    }
    // materialize the node-sized result, then free the edge-sized loop
    // invariant — its lifetime ends with the iteration, not the session
    Exec.materialized(rN, withDeg)
  }

  val all: Seq[QueryDef] = Seq(qGraphPagerank)
}
