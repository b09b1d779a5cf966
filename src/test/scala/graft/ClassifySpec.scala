package graft

import graft.queries.{Registry, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic pins for q_text_classify — the trained-model lifecycle
  * properties the oracle hash can't state on its own:
  *
  *  - LEARNABILITY: the NB algebra must actually learn when signal
  *    exists. The judged corpus's teacher rule is learnable (~87%
  *    agreement vs ~54% majority — pinned below from the judged
  *    output), and on a constructed corpus with strong class-
  *    conditional skew the same train/score code must reach near-
  *    perfect accuracy with the correct weight signs.
  *  - PERSISTENCE FIDELITY: the staged model equals a fresh retrain
  *    (the from-index ≡ from-scratch pin, model edition).
  *  - OOV CONTRACT: a document with no in-vocabulary tokens scores
  *    exactly the prior.
  */
class ClassifySpec extends SparkSpec {

  private def judged() =
    Registry.all.find(_.name == "q_text_classify").get.run(spark, sf)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3)))

  test("corpus: learned model beats the majority class against the teacher") {
    val rows = judged()
    val total = rows.map(_._4).sum
    val agree = rows.filter(r => r._2 == r._3).map(_._4).sum
    val posShare = rows.filter(_._2).map(_._4).sum.toDouble / total
    val majority = math.max(posShare, 1 - posShare)
    // measured at sf0.001: agreement 0.874, majority 0.504 — the model
    // genuinely learns the rule, it does not just emit the prior
    assert(majority < 0.65, s"teacher degenerate: majority=$majority")
    assert(agree.toDouble / total >= 0.80,
      s"agreement ${agree.toDouble / total} below floor (majority $majority)")
  }

  test("staged model equals a fresh retrain (persistence fidelity)") {
    val model = TextAnalysis.nbModelPath(spark, sf)
    val staged = spark.read.parquet(s"$model/weights")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val (fw, fm) = TextAnalysis.nbTrain(TextAnalysis.nbLabeled(spark, sf))
    val fresh = fw.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(staged.sameElements(fresh), "staged weights drift from retrain")
    val stagedPrior = spark.read.parquet(s"$model/meta")
      .select("prior_w").head().getLong(0)
    assert(stagedPrior == fm.select("prior_w").head().getLong(0))
  }

  test("skewed fixture corpus: near-perfect accuracy, correct weight signs") {
    import spark.implicits._
    // 200 docs, genuinely skewed class-conditionals: pos docs are
    // 'alpha'-heavy, neg docs 'beta'-heavy, shared 'noise' everywhere.
    // Deterministic LCG-ish mixing so the fixture is stable.
    val docs = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val heavy = if (pos) "alpha" else "beta"
      val body = Seq.tabulate(20)(j =>
        if ((i * 31 + j * 7) % 5 < 3) heavy else "noise")
      (i.toLong, pos, body)
    }.toDF("doc_id", "pos", "ws")
    val (w, m) = TextAnalysis.nbTrain(docs)
    val wts = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wts("alpha") > 0 && wts("beta") < 0,
      s"wrong learned directions: $wts")
    val scored = TextAnalysis.nbLogit(docs, w, m)
      .select(col("pos"), (col("logit") >= 0).as("pred"))
      .collect()
    val acc = scored.count(r => r.getBoolean(0) == r.getBoolean(1)).toDouble /
      scored.length
    assert(acc >= 0.95, s"fixture accuracy $acc below 0.95")
  }

  test("a document with only out-of-vocabulary tokens scores the prior") {
    import spark.implicits._
    val train = Seq((0L, true, Seq("alpha", "alpha")),
      (1L, false, Seq("beta", "beta"))).toDF("doc_id", "pos", "ws")
    val (w, m) = TextAnalysis.nbTrain(train)
    val oov = Seq((9L, true, Seq("zeta", "omega")))
      .toDF("doc_id", "pos", "ws")
    val logit = TextAnalysis.nbLogit(oov, w, m).select("logit").head().getLong(0)
    val prior = m.select("prior_w").head().getLong(0)
    assert(logit == prior, s"OOV logit $logit != prior $prior")
  }
}
