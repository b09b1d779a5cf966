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
    val ws = graft.functions.GraftFunctions.graftTokens(c)
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
    s"""WITH g AS (
      |  SELECT doc_id, source, ${Scramble.sql("doc_id")} % 97 < 5 AS is_eval,
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
      Scramble(col("doc_id")) % 97 < 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n_contaminated"),
        sum(col("doc_id")).cast("long").as("sum_ids"))
      .orderBy("source")
  }

  /** Library form of the decontamination core: training docs (rows of
    * `docs` where `isEval` is false) that share ≥1 distinct word-5-gram
    * with any eval doc. Returns the flagged docs' (doc_id, source).
    * Broadcast LEFT SEMI against the eval gram-hash set: the training
    * side never shuffles.
    *
    * Collision tolerance (deliberate): grams match by xxhash64, so an
    * 8-byte hash collision can flag a CLEAN doc as contaminated — a
    * false positive that costs one good training doc, never a missed
    * leak (hash equality is implied by gram equality, so recall is
    * exact). At 100 TB the expected FP count is corpus_grams ×
    * eval_grams / 2^64 — e.g. 10^12 × 10^7 grams ≈ 5×10^-1 docs — and
    * dropping the occasional clean doc is the cheap side of the
    * trade; matching on gram strings would ship ~30-byte keys in the
    * broadcast instead of 8-byte hashes. Callers needing zero FPs can
    * re-verify flagged docs against the eval gram STRINGS (a second
    * pass over only the flagged set). */
  def contaminated(docs: org.apache.spark.sql.DataFrame,
      isEval: Column): org.apache.spark.sql.DataFrame = {
    // gram hashing is the corpus-wide scan stage → the native one-pass
    // graft_shingle_hashes(text, 5); hash-identical to
    // transform(grams5(text), xxhash64) (CurationSpec pins it), dedup on
    // hashes covered by the collision-tolerance note above
    val ex = docs
      .select(col("doc_id"), col("source"), isEval.as("is_eval"),
        explode(graft.functions.GraftFunctions.shingleHashes(col("text"), 5))
          .as("h"))
    val evalGrams = ex.filter(col("is_eval"))
      .select(col("h").as("he")).distinct()
    ex.filter(!col("is_eval"))
      .join(broadcast(evalGrams), col("h") === col("he"), "left_semi")
      .select("doc_id", "source").distinct()
  }

  /** Sequence packing: documents greedily packed (in deterministic
    * doc_id order) into 256-token training bins, PER SHARD — the shard
    * (a hash bucket of the doc key) is the parallelism unit, so packing
    * is embarrassingly parallel across shards. TRUE greedy: a bin
    * closes when the next doc doesn't fit, so no bin ever exceeds the
    * budget (except a single oversized doc alone in its bin). The
    * oracle replays the same fold as a per-shard recursive CTE. */
  val qPackSequences: QueryDef = QueryDef.oracle(
    "q_pack_sequences",
    s"""WITH RECURSIVE t AS (
      |  SELECT doc_id, ${Scramble.sql("doc_id")} % 8 AS shard, n_tok,
      |    ROW_NUMBER() OVER (PARTITION BY ${Scramble.sql("doc_id")} % 8
      |                       ORDER BY doc_id) AS rn
      |  FROM (SELECT doc_id,
      |          len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
      |        FROM documents)),
      |g AS (
      |  SELECT shard, rn, n_tok, CAST(0 AS BIGINT) AS bin, n_tok AS fill
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.shard, t.rn, t.n_tok,
      |    CASE WHEN g.fill + t.n_tok <= 256 THEN g.bin ELSE g.bin + 1 END,
      |    CASE WHEN g.fill + t.n_tok <= 256 THEN g.fill + t.n_tok
      |         ELSE t.n_tok END
      |  FROM g JOIN t ON t.shard = g.shard AND t.rn = g.rn + 1),
      |b AS (
      |  SELECT shard, bin, COUNT(*) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS bin_tok
      |  FROM g GROUP BY 1, 2)
      |SELECT shard, COUNT(*) AS n_bins, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(SUM(bin_tok) AS BIGINT) AS sum_tok, MAX(bin_tok) AS max_bin_tok
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    packSequences(Tables(spark, dir).documents
      .select(col("doc_id"),
        (Scramble(col("doc_id")) % 8).as("shard"),
        size(graft.functions.GraftFunctions.graftTokens(col("text")))
          .cast("long")
          .as("n_tok")),
      budget = 256)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tok"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_bins"), sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tok")).as("sum_tok"), max(col("bin_tok")).as("max_bin_tok"))
      .orderBy("shard")
  }

  /** Library form of the packing core: assign each (doc_id, shard,
    * n_tok:long) row its training-sequence bin — TRUE greedy in doc_id
    * order within each shard (a bin closes when the next doc would push
    * it past `budget`; a doc alone larger than the budget gets its own
    * bin). Adds `bin: long`.
    *
    * The greedy fold is inherently sequential PER SHARD (each bin id
    * depends on every prior doc's size), so this is one of the few
    * honest `mapPartitions` sites in the library: shards are hashed to
    * partitions and sorted, and one ordered pass folds each shard —
    * parallelism comes from shard count, exactly how a production
    * packing job shards a 100 TB corpus. For the streaming-friendly
    * closed form (no sequential pass, bins may overflow by up to one
    * doc) see [[packSequencesByOffset]]. */
  def packSequences(docs: org.apache.spark.sql.DataFrame,
      budget: Int): org.apache.spark.sql.DataFrame = {
    val schema = docs.schema.add("bin", org.apache.spark.sql.types.LongType)
    val si = docs.schema.fieldIndex("shard")
    val ni = docs.schema.fieldIndex("n_tok")
    docs.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var shard: Any = null
        var bin = 0L
        var fill = 0L
        var open = false
        it.map { r =>
          val s = r.get(si)
          val n = r.getLong(ni)
          if (!open || s != shard) { shard = s; bin = 0L; fill = n; open = true }
          else if (fill + n <= budget) fill += n
          else { bin += 1; fill = n }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Offset-binning variant: bin = floor(tokens-before / budget) — a
    * pure prefix-sum (window) closed form with NO sequential pass, so it
    * also works under structured streaming and never reshuffles row
    * order. The trade: a doc straddling a boundary is assigned by its
    * starting offset, so a bin can hold up to budget + maxDoc − 1
    * tokens. Use when downstream tolerates overflow-by-one-doc (e.g.
    * when docs are subsequently truncated to the sequence length);
    * [[packSequences]] is the strict-budget packer. */
  def packSequencesByOffset(docs: org.apache.spark.sql.DataFrame,
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
    * > 1/8). One explode + two hash aggregates, shuffling (doc, gram)
    * pairs — the per-doc counting shape that scales linearly. Counts
    * group on the gram STRING, not its hash: a hash collision here
    * would MERGE two distinct grams' counts and inflate top_c — a
    * wrong answer, not a tolerable false positive — and unlike the
    * decontamination broadcast there is no size win to buy with it
    * (the shuffle key carries the doc_id either way; 2-grams are
    * short). */
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
    val ws = graft.functions.GraftFunctions.graftTokens(col("text"))
    val grams2 = when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val perDoc = Tables(spark, dir).documentsDense
      .select(col("doc_id"), col("source"),
        explode(grams2).as("gram"))
      .groupBy(col("doc_id"), col("source"), col("gram"))
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

  /** PII patterns shared by the Spark columns and the DuckDB oracle —
    * one definition, engine/oracle parity (the [[Scramble]] discipline).
    * Restricted to the regex subset where java.util.regex and RE2 agree
    * exactly: literal classes, bounded repetition, `\b` word boundaries
    * — no backreferences, no lookaround, no possessives. */
  private[graft] val EmailPat = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private[graft] val PhonePat = """\b555-[0-9]{3}-[0-9]{4}\b"""
  private[graft] val IpPat =
    """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Redact all three PII classes, email → phone → IP (fixed order so
    * engines agree even where patterns could interact). */
  private[graft] def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"), IpPat, "<IP>")

  /** The oracle-SQL twin of [[redactPii]], from the same pattern
    * constants. DuckDB regexp_replace is first-match-only by default —
    * the 'g' flag is what makes it mirror Spark's replace-all. Rendered
    * single-line: these fragments are interpolated into stripMargin SQL,
    * where a continuation line starting with `|` (e.g. the `||` concat
    * operator) would lose its first char to the margin strip. */
  private[graft] def redactPiiSql(inner: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($inner, " +
      s"'$EmailPat', '<EMAIL>', 'g'), '$PhonePat', '<PHONE>', 'g'), " +
      s"'$IpPat', '<IP>', 'g')"

  /** Deterministic planted PII: the synthetic corpus is letters-only
    * word salad, so email/phone/IPv4 are derived from doc_id (moduli
    * 3/11/7 — coprime to the 20-source round-robin so every source sees
    * a mix) and appended identically on both engines. One definition,
    * two renderings. */
  private[graft] def plantedPiiCol: Column = {
    val id = col("doc_id")
    concat(col("text"),
      when(id % 3 === 0, concat(lit(" reach user"), id.cast("string"),
        lit("@mail"), (id % 7).cast("string"), lit(".example dept")))
        .otherwise(lit("")),
      when(id % 11 === 0, concat(lit(" call 555-"),
        lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((id % 10000).cast("string"), 4, "0"), lit(" now")))
        .otherwise(lit("")),
      when(id % 7 === 0, concat(lit(" host 10."), (id % 256).cast("string"),
        lit("."), ((id * 7) % 256).cast("string"),
        lit("."), ((id * 13) % 256).cast("string"), lit(" up")))
        .otherwise(lit("")))
  }

  private[graft] val plantedPiiSql: String =
    "text " +
      "|| CASE WHEN doc_id % 3 = 0 THEN ' reach user' || " +
      "CAST(doc_id AS VARCHAR) || '@mail' || " +
      "CAST(doc_id % 7 AS VARCHAR) || '.example dept' ELSE '' END " +
      "|| CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || " +
      "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END " +
      "|| CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.' || " +
      "CAST((doc_id * 7) % 256 AS VARCHAR) || '.' || " +
      "CAST((doc_id * 13) % 256 AS VARCHAR) || ' up' ELSE '' END"

  /** PII detection + redaction — the scrub pass every training corpus
    * runs before anything else. The synthetic documents are letters-only
    * word salad, so deterministic PII (email/phone/IPv4 derived from
    * doc_id, moduli 3/11/7 — coprime to the 20-source round-robin so
    * every source sees a mix) is planted identically on both engines,
    * then genuinely found and redacted by regex. Scale shape: one scan,
    * three codegen'd regex passes per row, a per-source hash aggregate —
    * embarrassingly parallel, zero pre-aggregation shuffle. Redaction
    * order (email → phone → IP) is fixed so engines agree even where
    * patterns could interact. `min_tail`/`max_tail` hash-pin the actual
    * redacted TEXT (not just counts): the planted suffix starts at
    * length(text)+1 and redaction never touches the digit-free body. */
  val qTextPiiRedact: QueryDef = QueryDef.oracle(
    "q_text_pii_redact",
    s"""WITH p AS (
      |  SELECT doc_id, source, length(text) AS tlen, $plantedPiiSql
      |    AS pii
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, pii, tlen,
      |    len(regexp_extract_all(pii, '$EmailPat')) AS n_e,
      |    len(regexp_extract_all(pii, '$PhonePat')) AS n_p,
      |    len(regexp_extract_all(pii, '$IpPat')) AS n_i,
      |    ${redactPiiSql("pii")} AS red
      |  FROM p)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_e + n_p + n_i > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS docs_with_pii,
      |  CAST(SUM(n_e) AS BIGINT) AS n_emails,
      |  CAST(SUM(n_p) AS BIGINT) AS n_phones,
      |  CAST(SUM(n_i) AS BIGINT) AS n_ips,
      |  CAST(SUM(length(pii) - length(red)) AS BIGINT) AS chars_removed,
      |  MIN(CASE WHEN n_e + n_p + n_i > 0 THEN substr(red, tlen + 1) END)
      |    AS min_tail,
      |  MAX(CASE WHEN n_e + n_p + n_i > 0 THEN substr(red, tlen + 1) END)
      |    AS max_tail
      |FROM r GROUP BY source ORDER BY source""".stripMargin,
  ) { (spark, dir) =>
    val scanned = Tables(spark, dir).documents
      .select(col("doc_id"), col("source"), length(col("text")).as("tlen"),
        plantedPiiCol.as("pii"))
      .select(col("source"), col("pii"), col("tlen"),
        regexp_count(col("pii"), lit(EmailPat)).as("n_e"),
        regexp_count(col("pii"), lit(PhonePat)).as("n_p"),
        regexp_count(col("pii"), lit(IpPat)).as("n_i"),
        redactPii(col("pii")).as("red"))
    val hasPii = col("n_e") + col("n_p") + col("n_i") > 0
    val tail = col("red").substr(col("tlen") + 1, length(col("red")))
    scanned.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(hasPii, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("n_e")).cast("long").as("n_emails"),
        sum(col("n_p")).cast("long").as("n_phones"),
        sum(col("n_i")).cast("long").as("n_ips"),
        sum(length(col("pii")) - length(col("red"))).cast("long")
          .as("chars_removed"),
        min(when(hasPii, tail)).as("min_tail"),
        max(when(hasPii, tail)).as("max_tail"))
      .orderBy("source")
  }

  val all: Seq[QueryDef] =
    Seq(qTextDecontaminate, qPackSequences, qTextRepetition, qTextPiiRedact)
}
