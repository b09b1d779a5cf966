package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit (round 18): which judged queries end in a NO-GROUPING-KEY
  * aggregate? Bench/QTime drive queries with `count()`, and a count
  * over a keyless aggregate lets ColumnPruning strip the aggregate's
  * input expressions (output is 1 row regardless) — the measurement
  * then omits the final scalar computation. Operators BELOW the tail
  * that determine cardinality (joins, keyed aggregates, windows,
  * generators) cannot be pruned, so the hazard is bounded to the tail
  * projection — but it should be on the record per query.
  * Usage: runMain graft.tools.AuditTails [sfDir] */
object AuditTails {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Graft.builder("local[4]", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort, Project}
    graft.queries.Registry.all.foreach { q =>
      try {
        def tail(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
            : String = p match {
          case s: Sort => tail(s.child)
          case pr: Project => tail(pr.child)
          case a: Aggregate if a.groupingExpressions.isEmpty =>
            "KEYLESS-AGG-TAIL"
          case other => other.nodeName
        }
        val t = tail(q.run(spark, dir).queryExecution.optimizedPlan)
        if (t == "KEYLESS-AGG-TAIL") println(f"${q.name}%-32s $t")
      } catch { case e: Throwable =>
        println(f"${q.name}%-32s audit-error: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
