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
    import org.apache.spark.sql.catalyst.plans.logical._
    graft.queries.Registry.all.foreach { q =>
      try {
        // Descend through EVERY cardinality-preserving-or-reducing unary
        // node that count()'s ColumnPruning can see through — not just
        // Sort/Project. A keyless Aggregate under Filter/Limit/
        // SubqueryAlias/Repartition is just as prunable (r18 ADVICE).
        def tail(p: LogicalPlan): String = p match {
          case s: Sort => tail(s.child)
          case pr: Project => tail(pr.child)
          case f: Filter => tail(f.child)
          case l: GlobalLimit => tail(l.child)
          case l: LocalLimit => tail(l.child)
          case sa: SubqueryAlias => tail(sa.child)
          case r: Repartition => tail(r.child)
          case r: RepartitionByExpression => tail(r.child)
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
