package graft.tools

import org.apache.spark.sql.functions._

/** Dev main: LSH banding diagnostics at any sf — bucket-size histogram
  * and candidate-pair mass, the two numbers that decide whether the
  * banded self-join is linear or quietly quadratic at a given scale.
  *
  *   sbt "runMain graft.tools.LshDiag /tmp/graft_sf100"
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text")).as("s"))
      .filter(size(col("s")) > 0)
    println(s"docs: ${docs.count()}")
    val banded = graft.queries.Dedup.bandKeysDiag(docs)
    banded.cache()
    println(s"banded rows: ${banded.count()}")
    val buckets = banded.groupBy("band", "key").count()
    buckets.cache()
    val top = buckets.orderBy(col("count").desc).limit(20).collect()
    println("top buckets: " + top.map(_.getLong(2)).mkString(","))
    // candidate pair mass = sum over buckets of n*(n-1)/2
    val pairMass = buckets
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs"))
      .head().getLong(0)
    println(s"candidate pair mass: $pairMass")
    val multi = buckets.filter(col("count") > 1).count()
    println(s"buckets with >1 doc: $multi")
    for (b <- Seq(64, 128, 256, 512)) {
      val row = buckets.filter(col("count") <= b)
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")),
          count(lit(1))).head()
      val dropped = buckets.filter(col("count") > b).count()
      println(s"cap $b: pair mass ${row.getLong(0)}, dropped buckets $dropped")
    }
    spark.stop()
  }
}
