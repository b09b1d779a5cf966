package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond dedup/quality: benchmark
  * DECONTAMINATION (drop training docs that leak eval-set n-grams) and
  * SEQUENCE PACKING (greedy token-budget binning of documents into
  * training sequences) — both first-class passes in a real LLM data
  * pipeline, both deterministic and DuckDB-oracle-checked.
  */
object Curation {

  /** Distinct word-5-gram set, built by zipping five shifted slices —
    * strictly linear per document (the index-lambda formulation loses
    * common-subexpression elimination across HOF boundaries and goes
    * O(L²); see Dedup.shingles). */
  private[graft] def grams5(c: Column): Column = {
    val ws = filter(split(c, " "), w => w =!= "")
    val n = size(ws)
    def sl(k: Int) = slice(ws, lit(k), n - 4)
    val g = zip_with(
      zip_with(
        zip_with(
          zip_with(sl(1), sl(2), (a, b) => concat_ws(" ", a, b)),
          sl(3), (ab, x) => concat_ws(" ", ab, x)),
        sl(4), (abc, x) => concat_ws(" ", abc, x)),
      sl(5), (abcd, x) => concat_ws(" ", abcd, x))
    when(n >= 5, array_distinct(g)).otherwise(array().cast("array<string>"))
  }

  /** Eval-set decontamination: a deterministic ~5 % hash-sample of the
    * corpus plays the benchmark; a training doc is contaminated if it
    * shares ANY distinct 5-gram with any eval doc. The eval gram set is
    * BROADCAST — the 100 TB shape: benchmarks are MBs while the corpus
    * is the thing that scales, so contamination checking is a broadcast
    * semi-join at the scan, no shuffle of the training side at all.
    * Grams join by xxhash64 (8-byte keys, not ~30-byte strings). */
  val qTextDecontaminate: QueryDef = QueryDef.oracle(
    "q_text_decontaminate",
    """WITH g AS (
      |  SELECT doc_id, source, (doc_id * 2654435761) % 97 < 5 AS is_eval,
      |    list_distinct(list_transform(range(1, len(ws) - 3),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
      |           || ws[i+3] || ' ' || ws[i+4])) AS grams
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 5),
      |ex AS (SELECT doc_id, source, is_eval, unnest(grams) AS gram FROM g),
      |hit AS (
      |  SELECT DISTINCT t.doc_id, t.source
      |  FROM ex t JOIN (SELECT DISTINCT gram FROM ex WHERE is_eval) e
      |    USING (gram)
      |  WHERE NOT t.is_eval)
      |SELECT source, COUNT(*) AS n_contaminated,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      |FROM hit GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    contaminated(Tables(spark, dir).documents,
      (col("doc_id") * 2654435761L) % 97 < 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_contaminated"),
        sum(col("doc_id")).cast("long").as("sum_ids"))
      .orderBy("source")
  }

  /** Library form of the decontamination core: training docs (rows of
    * `docs` where `isEval` is false) that share ≥1 distinct word-5-gram
    * with any eval doc. Returns the flagged docs' (doc_id, source).
    * Broadcast LEFT SEMI against the eval gram-hash set: the training
    * side never shuffles. */
  def contaminated(docs: org.apache.spark.sql.DataFrame,
      isEval: Column): org.apache.spark.sql.DataFrame = {
    val ex = docs
      .select(col("doc_id"), col("source"), isEval.as("is_eval"),
        explode(transform(grams5(col("text")), x => xxhash64(x))).as("h"))
    val evalGrams = ex.filter(col("is_eval"))
      .select(col("h").as("he")).distinct()
    ex.filter(!col("is_eval"))
      .join(broadcast(evalGrams), col("h") === col("he"), "left_semi")
      .select("doc_id", "source").distinct()
  }

  /** Sequence packing: documents greedily packed (in deterministic
    * doc_id order) into 256-token training bins, PER SHARD — the shard
    * (a hash bucket of the doc key) is the parallelism unit, so packing
    * is embarrassingly parallel across shards and each shard's prefix
    * sum is a single ordered pass. A global prefix sum would serialize
    * the corpus through one partition — the classic 100 TB mistake this
    * query's shape is designed against. Bin id = floor(tokens-before /
    * budget), the streaming-friendly closed form of greedy packing. */
  val qPackSequences: QueryDef = QueryDef.oracle(
    "q_pack_sequences",
    """WITH t AS (
      |  SELECT doc_id, (doc_id * 2654435761) % 8 AS shard,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
      |  FROM documents),
      |p AS (
      |  SELECT shard, n_tok,
      |    COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM t),
      |b AS (
      |  SELECT shard, CAST(FLOOR(cum_before / 256) AS BIGINT) AS bin,
      |    COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tok
      |  FROM p GROUP BY 1, 2)
      |SELECT shard, COUNT(*) AS n_bins, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(bin_tok) AS BIGINT) AS sum_tok, MAX(bin_tok) AS max_bin_tok
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    packSequences(Tables(spark, dir).documents
      .select(col("doc_id"),
        ((col("doc_id") * 2654435761L) % 8).as("shard"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("n_tok")),
      budget = 256)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tok")).as("sum_tok"), max(col("bin_tok")).as("max_bin_tok"))
      .orderBy("shard")
  }

  /** Library form of the packing core: assign each (doc_id, shard,
    * n_tok) row its training-sequence bin — greedy in doc_id order
    * within each shard, bin = floor(tokens-before / budget). Adds
    * `bin`; per-shard prefix sums parallelize across shards. */
  def packSequences(docs: org.apache.spark.sql.DataFrame,
      budget: Int): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .drop("cum_before")
  }

  /** Repetition-ratio quality gate (the classic corpus-filter rule:
    * drop docs whose most frequent word-2-gram covers too much of the
    * text — boilerplate, chat spam, keyword stuffing). Integer-exact:
    * a doc fails when 8 × top-2-gram-count > total 2-grams (ratio
    * > 1/8). One explode + two hash aggregates, shuffling (doc, gram
    * hash) pairs — the per-doc counting shape that scales linearly. */
  val qTextRepetition: QueryDef = QueryDef.oracle(
    "q_text_repetition",
    """WITH g AS (
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(ws)),
      |    i -> ws[i] || ' ' || ws[i+1])) AS gram
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 2),
      |pc AS (
      |  SELECT doc_id, source, COUNT(*) AS c
      |  FROM g GROUP BY doc_id, source, gram),
      |d AS (
      |  SELECT doc_id, source, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n_grams
      |  FROM pc GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN 8 * top_c > n_grams THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repetitive,
      |  CAST(SUM(doc_id * CASE WHEN 8 * top_c > n_grams THEN 1 ELSE 0 END)
      |    AS BIGINT) AS sum_flagged_ids
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val ws = filter(split(col("text"), " "), x => x =!= "")
    val grams2 = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val perDoc = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"),
        explode(grams2).as("gram"))
      .groupBy(col("doc_id"), col("source"), xxhash64(col("gram")).as("gh"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "source")
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_grams"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("top_c") * 8 > col("n_grams"), 1L).otherwise(0L))
          .as("n_repetitive"),
        sum(col("doc_id") * when(col("top_c") * 8 > col("n_grams"), 1L)
          .otherwise(0L)).as("sum_flagged_ids"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] =
    Seq(qTextDecontaminate, qPackSequences, qTextRepetition)
}
