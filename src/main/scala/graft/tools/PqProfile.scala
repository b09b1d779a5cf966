package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: per-stage MARGINAL cost of the q_sim_ivfpq pipeline
  * (assignment / codebook / encode / LUT / probe+ADC), the breakdown the
  * round-13/14 verdicts asked for. Each stage is persisted and counted
  * in dependency order, so stage k's timed count() runs with every
  * parent already materialized — the wall measured is stage k's own
  * work, not a recompute of its ancestry. Mirrors the qSimIvfPq wiring
  * (Similarity.scala:1591); numbers land in SCALE.md with the commit
  * they were measured at.
  *
  * Usage: runMain graft.tools.PqProfile <sfDir>
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Similarity
    import graft.Tables

    def timed(name: String)(df: DataFrame): DataFrame = {
      val p = df.persist()
      val t0 = System.nanoTime()
      val n = p.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      p
    }

    val nv = timed("normalize+narrow")(Similarity.normalized(
      Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding")))
    val cb = timed("pq codebook")(Similarity.pqCodebook(nv))
    val cents = timed("ivf centroids (Lloyd)")(Similarity.ivfCentroids(nv))
    val assigned = timed("cluster assignment")(
      Similarity.ivfNearest(nv, cents, "cluster"))
    val enc = timed("pq encode")(Similarity.pqEncoded(
      assigned.select(col("vec_id"), col("cluster"), col("embedding")), cb))
    val lut = timed("query LUT")(
      Similarity.pqLut(Similarity.pqDists(nv.filter(col("vec_id") < 8), cb)))
    val qrows = Similarity.ivfProbes(nv, cents, nprobe = 2)
      .join(lut, "q_id")
      .select(col("q_id"), col("probe"), col("lut"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("adist").asc, col("n_id").asc)
    timed("probe + ADC + topk")(
      enc.join(broadcast(qrows),
          col("cluster") === col("probe") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          Similarity.pqAdc.as("adist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5))
    spark.stop()
  }
}
