package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected catalog queries repeatedly (cold + warm runs)
  * to separate JIT/planning overhead from real execution cost.
  * Usage: runMain graft.tools.QTime <sfDir> <reps> [names...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // GRAFT_SHUFFLE_PARTS: A/B the partition count without changing
      // thread parallelism (the config-at-scale experiments)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("graft.streaming.statePartitions",
        sys.env.getOrElse("GRAFT_STATE_PARTS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSet
    graft.queries.Registry.all
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          q.run(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"${q.name}%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
      }
    spark.stop()
  }
}
