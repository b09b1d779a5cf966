package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Sampling operators — first-class for a training-data pipeline
  * (corpus downsampling, eval-split carving, per-stratum balancing).
  *
  * The judged query uses DETERMINISTIC hash sampling: a Knuth
  * multiplicative scramble of the row key mod 100. The key is reduced
  * mod 1e9+7 BEFORE the multiply so the intermediate stays below 2^63
  * for any non-negative int64 key — a raw `key * 2654435761` would
  * silently wrap in Spark (non-ANSI Long multiply) above ~3.5e9 while
  * DuckDB raises an overflow error, breaking engine/oracle parity at
  * exactly the id range a 100 TB corpus reaches. Unlike `df.sample`,
  * whose output depends on partitioning (seeded XORShift per partition),
  * key-hash sampling is a pure function of the data — the same rows are
  * selected on 1 partition or 10 000, on Spark or DuckDB, today or in a
  * re-run. That reproducibility is exactly what an LLM data pipeline
  * needs from a split: membership must not change when the cluster
  * re-partitions. `df.sample`/`sampleBy` (fraction-accurate, not
  * reproducible across repartitioning) are covered in SamplingSpec. */
object Sampling {
  import Num._

  /** ~7 % deterministic sample of lineitem by scrambled order key, then
    * the q1-style rollup — scan-side filter (no shuffle added by the
    * sampling itself), identical membership at any partition count. */
  val qSampleHash: QueryDef = QueryDef.oracle(
    "q_sample_hash",
    s"""SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |WHERE ${Scramble.sql("l_orderkey")} % 100 < 7
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .filter(Scramble(col("l_orderkey")) % 100 < 7)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Reproducible train/val/test split: the same scramble bucketed into
    * 80/10/10 — every row lands in exactly one split, and membership is
    * stable under re-partitioning and re-runs (the property that keeps a
    * held-out set held out for the lifetime of a 100 TB corpus). */
  val qSampleSplit: QueryDef = QueryDef.oracle(
    "q_sample_split",
    s"""SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM (
      |  SELECT CASE WHEN ${Scramble.sql("doc_id")} % 100 < 80 THEN 'train'
      |              WHEN ${Scramble.sql("doc_id")} % 100 < 90 THEN 'val'
      |              ELSE 'test' END AS split, n_chars
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val bucket = Scramble(col("doc_id")) % 100
    Tables(spark, dir).documents
      .select(when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"), col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("split")
  }

  /** Deterministic STRATIFIED sample — per-stratum rates (the corpus-
    * balancing move of an LLM data pipeline: keep more of scarce
    * languages, downsample the dominant one). Same Knuth-scramble
    * membership as q_sample_hash, so the selection is a pure function of
    * (doc_id, lang): stable under re-partitioning, re-runs, and engine
    * choice — the property `df.sampleBy` (per-partition RNG) lacks.
    * SamplingSpec checks the realized rate of each stratum against
    * sampleBy's at matching fractions. */
  val qSampleStratified: QueryDef = QueryDef.oracle(
    "q_sample_stratified",
    s"""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE ${Scramble.sql("doc_id")} % 100 <
      |      CASE WHEN lang = 'en' THEN 60 WHEN lang = 'de' THEN 30 ELSE 10 END
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val bucket = Scramble(col("doc_id")) % 100
    val rate = when(col("lang") === "en", 60)
      .when(col("lang") === "de", 30).otherwise(10)
    Tables(spark, dir).documents
      .filter(bucket < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  /** EXACT class rebalance — downsample every language to the size of
    * the scarcest one, so output class counts are equal BY CONSTRUCTION
    * (the hard guarantee q_sample_stratified's hand-tuned rates only
    * approximate). Rows are ranked per language by the Knuth scramble of
    * doc_id — a deterministic shuffle, membership a pure function of the
    * data — and rank ≤ global-minimum-class-count keeps the head. The
    * ranking window is PARTITIONED by language (parallel; never a
    * whole-corpus window), and the target size rides as a one-row
    * broadcast — the nested-loop it plans is a 1-row × corpus scalar
    * attach, the same by-design shape as q_ts_gapfill's grid. */
  val qSampleBalance: QueryDef = QueryDef.oracle(
    "q_sample_balance",
    s"""WITH r AS (
      |  SELECT lang, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ${Scramble.sql("doc_id")} % 1000000007, doc_id) AS rk
      |  FROM documents),
      |t AS (SELECT MIN(c) AS target FROM
      |      (SELECT COUNT(*) AS c FROM documents GROUP BY lang) s)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM r, t WHERE rk <= target
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val scr = Scramble(col("doc_id")) % 1000000007L
    val ranked = docs
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(scr.asc, col("doc_id").asc)))
    val target = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("target"))
    ranked.crossJoin(broadcast(target))
      .filter(col("rk") <= col("target"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  val all: Seq[QueryDef] =
    Seq(qSampleHash, qSampleSplit, qSampleStratified, qSampleBalance)
}
