package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage cost of the q_text_classify inference pipeline —
  * the round-17 verdict's profiling target (225.8 s warm at sf1000v,
  * the heaviest un-profiled steady-state line).
  *
  * Unlike PqProfile this does NOT persist stage outputs: the first
  * stage (tokenized corpus with teacher labels) is 50 M rows × ~200
  * tokens at sf1000v — persisting it starves execution memory and
  * OOMs the very aggregate being measured (measured r18). Instead each
  * timed plan runs FROM THE SCAN, exactly like the judged query does,
  * and stage marginals fall out by subtraction:
  *
  *   S1 tokenize+teacher    — the shared scan both plans start from
  *   S2 S1 + explode+agg    — adds the former plan's 10 B-token-row
  *                            explode → broadcast join → doc-keyed Σ
  *   S3 former inference    — S2 + the corpus⋈corpus join-back (which
  *                            re-runs S1 a second time) + census
  *   S4 shipped inference   — the r18 in-row graft_nb_dot fold + census
  *
  * Diagnostic variants (select stages by listing prefixes as args 3+,
  * e.g. `... 2 S1 S5 S6`): S1b forces tokenization through a hash so
  * no simplification can cheat it; S5 is the bare nbDot fold with the
  * model as LITERAL arrays (no join at all); S6 is one combined-row
  * crossJoin without the census — together they split S4 into
  * fold / join-materialization / census parts.
  *
  * Usage: runMain graft.tools.ClassifyProfile <sfDir> [reps] [stages...]
  */
object ClassifyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val stages = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextAnalysis

    val cpuA = new java.util.concurrent.atomic.AtomicLong(0)
    val tkA = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { cpuA.addAndGet(m.executorCpuTime); tkA.incrementAndGet() }
        }
      })
    // HONESTY NOTE (r18, learned the hard way): the action must be the
    // noop SINK, not count(). count() over a no-grouping-key aggregate
    // lets ColumnPruning strip the aggregate's input expressions — the
    // plan returns "1 row" without tokenizing anything, and a 97-second
    // stage reads as 0.6 s. Variants with grouping keys were honest all
    // along (the key values determine the row count); the global-sum
    // "fast" variants in the first r18 dissection were fiction.
    def timed(name: String)(mk: => DataFrame): Unit =
      if (stages.isEmpty || stages.exists(name.startsWith))
        (1 to reps).foreach { r =>
          Thread.sleep(300)
          val (c0, k0) = (cpuA.get, tkA.get)
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"$name%-26s rep$r $wall%8.2f s  (" +
            f"taskCpu=${(cpuA.get - c0) / 1e9}%8.1f s, tasks=${tkA.get - k0})")
        }

    val model = TextAnalysis.nbModelPath(spark, dir)
    val weights = spark.read.parquet(s"$model/weights")
    val meta = spark.read.parquet(s"$model/meta")
    def labeled = TextAnalysis.nbLabeled(spark, dir)

    // S1: force ws AND pos (a bare count() would prune the tokenize)
    timed("S1 tokenize+teacher")(
      labeled.select(sum(size(col("ws")) +
        when(col("pos"), 1).otherwise(0)).as("f")))
    // S2: the former plan's corpus-sized explode → join → doc-keyed agg
    timed("S2 S1+explode+agg")(
      labeled.select(col("doc_id"), explode(col("ws")).as("tok"))
        .join(broadcast(weights), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("w"), lit(0L))).cast("long").as("s"))
        .agg(sum(col("s"))))
    // S3: the complete former inference (join-back re-tokenizes)
    timed("S3 former inference")({
      val perDoc = labeled.select(col("doc_id"), explode(col("ws")).as("tok"))
        .join(broadcast(weights), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("w"), lit(0L))).cast("long").as("s"))
      labeled.join(perDoc, Seq("doc_id"), "left")
        .crossJoin(broadcast(meta.select(col("prior_w"))))
        .withColumn("logit", coalesce(col("s"), lit(0L)) + col("prior_w"))
        .drop("s", "prior_w", "ws")
        .select(col("lang"), col("pos").as("teacher_en"),
          (col("logit") >= 0).as("pred_en"), col("logit"))
        .groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit"))
    })
    // S4: the shipped in-row inference (nbLogit's r18 form)
    timed("S4 shipped inference")(
      TextAnalysis.nbLogit(labeled, weights, meta)
        .select(col("lang"), col("pos").as("teacher_en"),
          (col("logit") >= 0).as("pred_en"), col("logit"))
        .groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit")))
    // S1b: tokenization forced through a hash — simplification-proof
    timed("S1b tokenize hash-forced")(
      labeled.select(sum(xxhash64(concat_ws(",", col("ws")))
        + when(col("pos"), 1L).otherwise(0L)).as("f")))
    // S5: bare fold, model as literals (no join anywhere)
    timed("S5 fold, literal model")({
      import graft.functions.GraftFunctions.nbDot
      val m = weights.orderBy("tok").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val prior = meta.select(col("prior_w")).head().getLong(0)
      labeled.select(sum(nbDot(col("ws"),
        typedlit(m.map(_._1).toSeq), typedlit(m.map(_._2).toSeq))
        + lit(prior)).as("f"))
    })
    // S6: single combined-row crossJoin (model + prior in ONE broadcast
    // row), fold, no census — isolates the join materialization cost
    timed("S6 one crossJoin fold")({
      import graft.functions.GraftFunctions.nbDot
      val wrow = weights
        .agg(sort_array(collect_list(struct(col("tok"), col("w")))).as("tw"))
        .select(transform(col("tw"), s => s("tok")).as("wtoks"),
          transform(col("tw"), s => s("w")).as("wvals"))
        .crossJoin(broadcast(meta.select(col("prior_w"))))
      labeled.crossJoin(broadcast(wrow))
        .select(sum(nbDot(col("ws"), col("wtoks"), col("wvals"))
          + col("prior_w")).as("f"))
    })
    // S7: shipped nbLogit, census replaced by a bare sum — is the cost
    // in nbLogit or in the census?
    timed("S7 nbLogit+sum")(
      TextAnalysis.nbLogit(labeled, weights, meta)
        .select(sum(col("logit")).as("f")))
    // S8: S6's plan + the exact census — the other half of the bisect
    timed("S8 S6+census")({
      import graft.functions.GraftFunctions.nbDot
      val wrow = weights
        .agg(sort_array(collect_list(struct(col("tok"), col("w")))).as("tw"))
        .select(transform(col("tw"), s => s("tok")).as("wtoks"),
          transform(col("tw"), s => s("w")).as("wvals"))
        .crossJoin(broadcast(meta.select(col("prior_w"))))
      labeled.crossJoin(broadcast(wrow))
        .withColumn("logit", nbDot(col("ws"), col("wtoks"), col("wvals"))
          + col("prior_w"))
        .select(col("lang"), col("pos").as("teacher_en"),
          (col("logit") >= 0).as("pred_en"), col("logit"))
        .groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit"))
    })
    // S9/S10/S11: bisect WHERE the census cost lives
    def shipped = TextAnalysis.nbLogit(labeled, weights, meta)
      .select(col("lang"), col("pos").as("teacher_en"),
        (col("logit") >= 0).as("pred_en"), col("logit"))
    // S9: materialization barrier (narrow shuffle) before the census
    timed("S9 census post-exchange")(
      shipped.repartition(64, col("lang"), col("teacher_en"), col("pred_en"))
        .groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit")))
    // S10: same key set, count-only aggregates (no logit references)
    timed("S10 census count-only")(
      shipped.groupBy("lang", "teacher_en", "pred_en")
        .agg(count(lit(1)).as("n_docs")))
    // S11: single constant key, full aggregate list
    timed("S11 1-key full aggs")(
      shipped.groupBy(lit(1).as("k"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("logit")).cast("long").as("sum_logit"),
          min(col("logit")).as("min_logit"),
          max(col("logit")).as("max_logit")))
    // S12-S14: which grouping key carries the penalty?
    timed("S12 keys bool,bool")(
      shipped.groupBy("teacher_en", "pred_en").agg(count(lit(1)).as("n")))
    timed("S13 key lang only")(
      shipped.groupBy("lang").agg(count(lit(1)).as("n")))
    timed("S14 key hash(lang)")(
      shipped.groupBy(xxhash64(col("lang")).as("lh")).agg(count(lit(1)).as("n")))
    // S15-S17: which boolean key?
    timed("S15 key pos (labeled)")(
      labeled.groupBy("pos").agg(count(lit(1)).as("n")))
    timed("S16 key teacher_en")(
      shipped.groupBy("teacher_en").agg(count(lit(1)).as("n")))
    timed("S17 key pred_en")(
      shipped.groupBy("pred_en").agg(count(lit(1)).as("n")))
    // DIAG: executed-plan WSCG spans of the fast (S7) vs slow (S15)
    // shapes (post-execution, so AQE's final plan is what prints)
    if (stages.contains("DIAG")) {
      val fast = labeled.select(sum(when(col("pos"), 1L).otherwise(0L)).as("f"))
      fast.count()
      println("===== fast (sum over pos) final plan =====")
      println(fast.queryExecution.executedPlan.toString)
      val slow = labeled.groupBy("pos").agg(count(lit(1)).as("n"))
      slow.count()
      println("===== slow (groupBy pos) final plan =====")
      println(slow.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
