package graft.tools

/** Diagnostic: ANN recall vs the exact cosine top-k at an arbitrary sf
  * (the spec pins floors at sf0.001 only; this measures the rest).
  * `sbt "runMain graft.tools.RecallCheck /root/testdata/sf0.1"` */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Graft.builder("local[8]", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = pairs(graft.queries.Similarity.qSimTopk.run(spark, sf).collect())
    val pq = pairs(graft.queries.Similarity.qSimPqSearch.run(spark, sf).collect())
    val ivfpq = pairs(graft.queries.Similarity.qSimIvfPq.run(spark, sf).collect())
    println(s"RECALL pq=${(pq & brute).size.toDouble / brute.size} ivfpq=${(ivfpq & brute).size.toDouble / brute.size}")
    spark.stop()
  }
}
