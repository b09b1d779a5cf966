package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Remaining catalog corners: predicate vocabulary, TF-IDF, and the typed
  * Dataset[T] surface. */
object Misc {
  import Num._

  /** Predicate vocabulary in one filter: IN-list, BETWEEN, null-safe
    * equality, disjunction. All pushable — the scan should show every
    * conjunct in PushedFilters. */
  val qFilterPredicates: QueryDef = QueryDef.oracle(
    "q_filter_predicates",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_totalprice BETWEEN 50000 AND 300000
      |  AND (o_orderstatus IS NOT DISTINCT FROM 'O' OR o_orderstatus = 'F')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).orders
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        && col("o_totalprice").between(50000, 300000)
        && (col("o_orderstatus") <=> "O" || col("o_orderstatus") === "F"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  /** TF-IDF with exact rational arithmetic: score = tf·N·10⁶ ÷ df in
    * bigint (a monotone transform of tf/df — same ranking as tf·(N/df),
    * with no libm ln() whose last-ulp differences could flip cross-engine
    * ties). Top-3 terms per language by (score, term). Two shuffles:
    * df aggregation, then per-language top-k window. */
  val qTextTfidf: QueryDef = QueryDef.oracle(
    "q_text_tfidf",
    """WITH tok AS (
      |  SELECT lang, doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |tf AS (SELECT lang, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT lang, rn, w AS term, tf, df, score FROM (
      |  SELECT lang, w, tf, df,
      |    tf * 1000000 * (SELECT n_docs FROM n) // df AS score,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY tf * 1000000 * (SELECT n_docs FROM n) // df DESC, w) AS rn
      |  FROM tf JOIN df USING (w))
      |WHERE rn <= 3 ORDER BY lang, rn""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val nDocs = docs.count() // tiny metadata-ish count; broadcast as literal
    val tok = docs.select(col("lang"), col("doc_id"),
      explode(graft.functions.GraftFunctions.graftTokens(col("text"))).as("w"))
    val tf = tok.groupBy("lang", "w").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy("lang")
      .orderBy(col("score").desc, col("w").asc)
    tf.join(broadcast(df), "w")
      // `div` = exact bigint division (double `/` + floor can round up
      // across an integer boundary and disagree with the oracle's `//`)
      .withColumn("score", expr(s"tf * 1000000L * ${nDocs}L div df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("lang"), col("rn"), col("w").as("term"), col("tf"),
        col("df"), col("score"))
      .orderBy("lang", "rn")
  }

  /** Typed Dataset[T] surface: case-class Encoder, typed filter/map, then
    * back to relational aggregation. The typed lambdas are an opaque wall
    * for Catalyst (no pushdown through them) — kept deliberately tiny and
    * late, which is the rule for using this API at scale. */
  val qTypedDataset: QueryDef = QueryDef.oracle(
    "q_typed_dataset",
    """SELECT seg, COUNT(*) AS n, CAST(SUM(bal_cents) AS BIGINT) AS sum_cents FROM (
      |  SELECT c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      |  FROM customer WHERE c_acctbal > 0)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    import spark.implicits._
    Tables(spark, dir).customer
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .as[Customer]
      .filter(_.c_acctbal > 0)
      .map(c => (c.c_mktsegment,
        math.floor(c.c_acctbal * 100 + 0.5).toLong))
      .toDF("seg", "bal_cents")
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("sum_cents"))
      .orderBy("seg")
  }

  /** MapType surface: JSON parsed to map<string,bigint>, interrogated via
    * map_keys/map_values/size — the dynamic-schema complement of
    * q_fn_json's fixed-struct parse. */
  val qFnMap: QueryDef = QueryDef.oracle(
    "q_fn_map",
    """SELECT event_type, COUNT(*) AS n,
      |  MIN(json_keys(props)[1]) AS min_key,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_v,
      |  MAX(len(json_keys(props))) AS max_sz
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val m = from_json(col("props"), lit("map<string,bigint>"))
    Tables(spark, dir).events
      .select(col("event_type"),
        element_at(map_keys(m), 1).as("k1"),
        element_at(map_values(m), 1).as("v1"),
        size(m).as("sz"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min(col("k1")).as("min_key"),
        sum(col("v1")).as("sum_v"), max(col("sz")).as("max_sz"))
      .orderBy("event_type")
  }

  /** Progress reporting (SURVEY §2.A op #13) as a JUDGED entry: the
    * quality gate's selectivity telemetry is collected by `observe()`
    * INSIDE the gate's own pass — accumulator metrics, no second scan,
    * no driver-side rows — and the emitted row IS the telemetry, so the
    * DuckDB oracle hash-checks that in-flight metrics are exact. This is
    * the 100 TB analog of pyPiper's tqdm progress: a counter that rides
    * the job, not a recount. */
  val qObserveMetrics: QueryDef = QueryDef.oracle(
    "q_observe_metrics",
    """SELECT COUNT(*) AS n_in,
      |  CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 1000 THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_pass,
      |  CAST(SUM(CASE WHEN n_chars BETWEEN 100 AND 1000 THEN n_chars ELSE 0 END)
      |       AS BIGINT) AS chars_pass
      |FROM documents""".stripMargin,
  ) { (spark, dir) =>
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val gate = col("n_chars").between(100, 1000)
    val gated = Tables(spark, dir).documents
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(gate, 1L).otherwise(0L)).as("n_pass"),
        sum(when(gate, col("n_chars")).otherwise(0L)).as("chars_pass"))
      .filter(gate)
    gated.foreach((_: org.apache.spark.sql.Row) => ()) // one pass; metrics ride it
    val m = obs.get
    Seq((m("n_in").asInstanceOf[Long], m("n_pass").asInstanceOf[Long],
      m("chars_pass").asInstanceOf[Long]))
      .toDF("n_in", "n_pass", "chars_pass")
  }

  /** Time-series gap-fill (resample): daily per-type counts of a sparse
    * event slice (~1 % hash sample) against the COMPLETE (type × day)
    * grid, missing cells zero-filled. The grid is generated inside the
    * plan — `sequence()` over the observed date bounds crossed with the
    * distinct types via an explicit broadcast (a 30×5 dimension, not
    * data) — so the fill is a left join against a broadcast grid: no
    * driver loop, no shuffle added beyond the aggregation's own. The
    * standard shape for "report every bucket, even empty ones" over a
    * 100 TB event store. */
  val qTsGapfill: QueryDef = QueryDef.oracle(
    "q_ts_gapfill",
    s"""WITH e AS (
      |  SELECT event_type, CAST(make_timestamp(epoch_us(ts)) AS DATE) AS d,
      |    value, event_id
      |  FROM events),
      |grid AS (
      |  SELECT t.event_type, CAST(g.d AS DATE) AS d
      |  FROM (SELECT DISTINCT event_type FROM e) t,
      |    (SELECT unnest(generate_series((SELECT MIN(d) FROM e),
      |      (SELECT MAX(d) FROM e), INTERVAL 1 DAY)) AS d) g),
      |sparse AS (
      |  SELECT event_type, d, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(30,6))) AS sv
      |  FROM e WHERE ${Scramble.sql("event_id")} % 97 = 0
      |  GROUP BY 1, 2)
      |SELECT g.event_type, g.d, COALESCE(s.n, 0) AS n,
      |  CAST(COALESCE(s.sv, 0) AS DOUBLE) AS sum_value
      |FROM grid g LEFT JOIN sparse s
      |  ON g.event_type = s.event_type AND g.d = s.d
      |ORDER BY 1, 2""".stripMargin,
  ) { (spark, dir) =>
    val e = graft.Tables(spark, dir).events
      .select(col("event_type"), to_date(col("ts")).as("d"), col("value"),
        col("event_id"))
    val bounds = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val days = bounds.select(explode(
      sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val grid = days.join(broadcast(e.select("event_type").distinct()))
    val sparse = e.filter(Scramble(col("event_id")) % 97 === 0)
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("sv"))
    grid.join(sparse, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sv"), lit(0).cast("decimal(30,6)")).cast("double")
          .as("sum_value"))
      .orderBy("event_type", "d")
  }

  /** Data profiling — the first pass anyone runs on a new corpus:
    * per-column row/null/distinct counts and min/max. Spark side is ONE
    * scan: cast-to-string, `unpivot` to (col_name, value), then a 5-key
    * hash aggregate — at 100 TB that's a single map stage plus a shuffle
    * of pre-aggregated partials, vs the naive one-scan-per-column
    * profile (which the oracle deliberately states, column by column).
    * Exact COUNT(DISTINCT) here because the table is judged; the 100 TB
    * profile swaps in approx_count_distinct (q_agg_approx_distinct is
    * that path's judged entry) without changing the shape. */
  val qProfile: QueryDef = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    QueryDef.oracle(
      "q_profile",
      cols.map { c =>
        s"""|SELECT '$c' AS col_name, COUNT(*) AS n_rows,
            |  COUNT($c) AS n_non_null,
            |  COUNT(DISTINCT $c) AS n_distinct,
            |  MIN(CAST($c AS VARCHAR)) AS min_val,
            |  MAX(CAST($c AS VARCHAR)) AS max_val
            |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    ) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(cols.map(c => col(c).cast("string").as(c)): _*)
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          cols.map(col).toArray, "col_name", "value")
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_non_null"),
          countDistinct(col("value")).as("n_distinct"),
          min(col("value")).as("min_val"),
          max(col("value")).as("max_val"))
        .orderBy("col_name")
    }
  }

  /** Distribution-DRIFT monitoring (PSI — population stability index),
    * the data-quality alarm between two corpus snapshots: bin a feature
    * identically on both sides, compare bin proportions, and PSI =
    * Σ (p_ref − p_cur)·ln(p_ref/p_cur) per bin (industry thresholds:
    * > 0.1 investigate, > 0.25 drifted). Snapshots here are the
    * deterministic doc_id halves; the feature is n_chars in 8 fixed
    * 150-char bins (integer `div`, engine-exact). One scan + one tiny
    * hash agg (snapshots × bins rows); totals ride a 1-row broadcast.
    * Proportions are clipped at 1e−6 (the standard empty-bin guard —
    * ln(0) must be unreachable at ANY sf, not just the judged ones);
    * ln is the one libm call, so contributions round to 4 dp (the
    * Num.r4 rule, same as q_text_bm25). */
  val qProfileDrift: QueryDef = QueryDef.oracle(
    "q_profile_drift",
    """WITH b AS (
      |  SELECT CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS snap,
      |    LEAST(n_chars // 150, 7) AS bin
      |  FROM documents),
      |c AS (SELECT snap, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(SUM(CASE WHEN snap = 0 THEN n ELSE 0 END) AS BIGINT) AS tot_ref,
      |    CAST(SUM(CASE WHEN snap = 1 THEN n ELSE 0 END) AS BIGINT) AS tot_cur
      |  FROM c),
      |m AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN snap = 0 THEN n ELSE 0 END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN snap = 1 THEN n ELSE 0 END) AS BIGINT) AS n_cur
      |  FROM c GROUP BY 1)
      |SELECT bin, n_ref, n_cur,
      |  ROUND((GREATEST(CAST(n_ref AS DOUBLE) / tot_ref, 0.000001)
      |       - GREATEST(CAST(n_cur AS DOUBLE) / tot_cur, 0.000001))
      |    * ln(GREATEST(CAST(n_ref AS DOUBLE) / tot_ref, 0.000001)
      |       / GREATEST(CAST(n_cur AS DOUBLE) / tot_cur, 0.000001)), 4) AS psi
      |FROM m, t ORDER BY bin""".stripMargin,
  ) { (spark, dir) =>
    val b = graft.Tables(spark, dir).documents
      .select(when(col("doc_id") % 2 === 0, 0).otherwise(1).as("snap"),
        expr("least(n_chars div 150, 7)").as("bin"))
    val c = b.groupBy("snap", "bin").agg(count(lit(1)).as("n"))
    val t = c.agg(
      sum(when(col("snap") === 0, col("n")).otherwise(0L)).cast("long")
        .as("tot_ref"),
      sum(when(col("snap") === 1, col("n")).otherwise(0L)).cast("long")
        .as("tot_cur"))
    val m = c.groupBy("bin").agg(
      sum(when(col("snap") === 0, col("n")).otherwise(0L)).cast("long")
        .as("n_ref"),
      sum(when(col("snap") === 1, col("n")).otherwise(0L)).cast("long")
        .as("n_cur"))
    // same spelled operand order as the oracle
    def p(n: Column, tot: Column): Column =
      greatest(n.cast("double") / tot, lit(0.000001))
    m.crossJoin(broadcast(t))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((p(col("n_ref"), col("tot_ref")) - p(col("n_cur"), col("tot_cur")))
          * log(p(col("n_ref"), col("tot_ref")) / p(col("n_cur"), col("tot_cur"))),
          4).as("psi"))
      .orderBy("bin")
  }

  val all: Seq[QueryDef] =
    Seq(qFilterPredicates, qTextTfidf, qTypedDataset, qFnMap, qObserveMetrics,
      qTsGapfill, qProfile, qProfileDrift)
}

final case class Customer(c_custkey: Long, c_mktsegment: String, c_acctbal: Double)
