package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage MARGINAL cost of the q_text_classify inference
  * pipeline — the round-17 verdict's profiling target (225.8 s warm at
  * sf1000v, the heaviest un-profiled steady-state line). Stages persist
  * in dependency order (the PqProfile discipline) so each timed count()
  * measures its own work, not recomputed ancestry:
  *
  *   1. labeled   — corpus scan + tokenize + teacher rule (ws retained)
  *   2. model     — staged weight/meta read (KB-sized; stages if absent)
  *   3. perDoc    — explode(ws) → broadcast weight join → groupBy(doc_id)
  *                  Σw  (the corpus-sized explode + doc-keyed aggregate)
  *   4. joinback  — labeled ⋈ perDoc by doc_id + prior attach (the
  *                  shuffle that carries the full token arrays)
  *   5. census    — the (lang, teacher, pred) rollup (output-sized)
  *
  * Usage: runMain graft.tools.ClassifyProfile <sfDir>
  */
object ClassifyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextAnalysis

    def timed(name: String)(df: DataFrame): DataFrame = {
      val p = df.persist()
      val t0 = System.nanoTime()
      val n = p.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
      p
    }

    val labeled = timed("labeled (tok+teacher)")(
      TextAnalysis.nbLabeled(spark, dir))
    val t0 = System.nanoTime()
    val model = TextAnalysis.nbModelPath(spark, dir)
    val weights = spark.read.parquet(s"$model/weights").persist()
    val meta = spark.read.parquet(s"$model/meta").persist()
    val nw = weights.count(); meta.count()
    println(f"${"model read/stage"}%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($nw weights)")
    val perDoc = timed("perDoc explode+agg")(
      labeled.select(col("doc_id"), explode(col("ws")).as("tok"))
        .join(broadcast(weights), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("w"), lit(0L))).cast("long").as("s")))
    val back = timed("joinback by doc_id")(
      labeled.join(perDoc, Seq("doc_id"), "left")
        .crossJoin(broadcast(meta.select(col("prior_w"))))
        .withColumn("logit", coalesce(col("s"), lit(0L)) + col("prior_w"))
        .drop("s", "prior_w", "ws"))
    timed("census rollup")(
      back.select(col("lang"), col("pos").as("teacher_en"),
          (col("logit") >= 0).as("pred_en"), col("logit"))
        .groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit")))
    // A/B: the round-18 in-row fold (nbLogit's shipped form) from the
    // SAME persisted labeled input — directly comparable to the sum of
    // the perDoc + joinback stages it replaces
    timed("A/B in-row logit")(
      TextAnalysis.nbLogit(labeled, weights, meta))
    spark.stop()
  }
}
