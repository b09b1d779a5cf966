package graft

import org.apache.spark.sql.functions._

/** Exact-rank fixtures for the integer fixed-point PageRank — the
  * determinism claim is EXACT 64-bit arithmetic, so the spec pins exact
  * longs, not tolerances. */
class GraphSpec extends SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    graft.queries.Graph.pagerank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("2-cycle is the fixed point: ranks stay at 1e6 exactly") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("3-path concentrates rank in the middle, exact hand-computed values") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    // iter 1: r(1)=r(3)=150000+(85*500000)div 100=575000;
    //         r(2)=150000+(85*2000000)div 100=1850000
    assert(ranks(edges, 1) == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    // iter 2: contribs 575000 (ends) / 925000 (middle halves) →
    //         r(1)=r(3)=936250, r(2)=1127500
    assert(ranks(edges, 2) == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("judged query: suppliers outrank customers on the bipartite graph") {
    val rows = graft.queries.Graph.qGraphPagerank.run(spark, sf).collect()
    assert(rows.length == 20)
    // rn is 1..20 and ranks are non-increasing
    assert(rows.map(_.getInt(0)).sameElements(1 to 20))
    val rs = rows.map(_.getLong(2))
    assert(rs.zip(rs.tail).forall { case (a, b) => a >= b })
    // STRUCTURAL property over the FULL rank table (a fixed head-count
    // assertion is a data-distribution heuristic that can flake at sfs
    // it wasn't tuned on): suppliers (odd ids) aggregate ~15× the degree
    // of customers (even ids) at every TPC-H sf, so the MEDIAN supplier
    // rank must exceed the MEDIAN customer rank — scale-free, exact
    def median(xs: Array[Long]): Long = { val s = xs.sorted; s(s.length / 2) }
    val full = graft.queries.Graph
      .pagerank(graft.queries.Graph.orderGraphEdges(spark, sf), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (supp, cust) = full.partition(_._1 % 2 == 1)
    assert(supp.nonEmpty && cust.nonEmpty)
    assert(median(supp.map(_._2)) > median(cust.map(_._2)),
      "median supplier rank should exceed median customer rank")
  }
}
