package graft.tools

/** Dev main (not driver surface): run named catalog queries at any sf and
  * print rows + wall per query — the quick instrument behind SCALE.md
  * measurements that need real sf0.1 numbers for a handful of queries
  * without paying a full Verify/Bench pass.
  *
  *   sbt "runMain graft.tools.Probe /root/testdata/sf0.1 q_a q_b ..."
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val q = graft.queries.Registry.all.find(_.name == n)
        .getOrElse(sys.error(s"unknown query: $n"))
      val t0 = System.nanoTime()
      val rows = q.run(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"""{"query":"$n","rows":$rows,"sec":$sec%.3f}""")
    }
    spark.stop()
  }
}
