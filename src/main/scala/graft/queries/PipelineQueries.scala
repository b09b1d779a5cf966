package graft.queries

import graft.Tables
import graft.pipeline.{Node, Pipeline}
import org.apache.spark.sql.functions._

/** Judged queries expressed through the pyPiper-shaped facade
  * (graft.pipeline), proving the composition API produces the same
  * Catalyst plans — and therefore the same results and the same pushdown
  * behavior — as direct DataFrame code. */
object PipelineQueries {
  import Num._

  /** Chain: source | filter | transform | aggregate — the canonical
    * pyPiper linear pipeline, lazily composed. */
  val qPipeChain: QueryDef = QueryDef.oracle(
    "q_pipe_chain",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_quantity > 30
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val graph =
      Node.where("big_qty", col("l_quantity") > 30) |
        Node.transform("revenue")(
          _.withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))) |
        Node.batchAll("agg")(
          _.groupBy("l_returnflag")
            .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n"))
            .orderBy("l_returnflag"))
    Pipeline(Tables(spark, dir).lineitem, graph).outputs("big_qty.revenue.agg")
  }

  /** Fan-out: one cached scan of orders feeds two branches (status
    * histogram, priority revenue), merged by UNION ALL — pyPiper's
    * `a | [b, c]` with the merge half it lacks. */
  val qPipeFanout: QueryDef = QueryDef.oracle(
    "q_pipe_fanout",
    """SELECT * FROM (
      |  SELECT 'status' AS branch, o_orderstatus AS k, COUNT(*) AS n FROM orders GROUP BY 2
      |  UNION ALL
      |  SELECT 'priority' AS branch, o_orderpriority AS k, COUNT(*) AS n FROM orders GROUP BY 2
      |) ORDER BY branch, k""".stripMargin,
  ) { (spark, dir) =>
    val byStatus = Node.batchAll("by_status")(
      _.groupBy(col("o_orderstatus").as("k")).agg(count(lit(1)).as("n"))
        .select(lit("status").as("branch"), col("k"), col("n")))
    val byPriority = Node.batchAll("by_priority")(
      _.groupBy(col("o_orderpriority").as("k")).agg(count(lit(1)).as("n"))
        .select(lit("priority").as("branch"), col("k"), col("n")))
    val outs = Pipeline(Tables(spark, dir).orders,
      Node.streams("all", "*") | Seq(byStatus, byPriority)).outputs
    outs("all.by_status").unionByName(outs("all.by_priority"))
      .orderBy("branch", "k")
  }

  val all: Seq[QueryDef] = Seq(qPipeChain, qPipeFanout)
}
