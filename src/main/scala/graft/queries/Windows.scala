package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window-function catalog: ranking, per-group top-k, lag/lead, running
  * row frames, time-range frames, ntile. Reference analog: pyPiper nodes
  * keep mutable `self.*` state across `run()` calls to do this serially
  * (SURVEY.md §2.B); a Spark window is the distributed form — one shuffle
  * on the partition key, a per-partition sort, then a single streaming
  * pass. Every query here partitions on a real key so no partition
  * collapses to a single task at scale.
  */
object Windows {
  import Num._

  /** row_number/rank/dense_rank; top-3 orders per priority. row_number
    * gets a unique tie-break (orderkey); rank/dense_rank deliberately
    * order by price alone so tie semantics are exercised. */
  val qWinRank: QueryDef = QueryDef.oracle(
    "q_win_rank",
    """SELECT o_orderpriority, rn, rnk, drnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
      |    DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
  ) { (spark, dir) =>
    val byPrice = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc)
    val stable = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, dir).orders
      .select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(stable).as("rn"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "rnk", "drnk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rn")
  }

  /** Per-group top-k (top-3 customers per nation by balance) — the
    * row_number ≤ k pattern. At scale this beats a global sort: each
    * nation's partition sorts independently and emits k rows. */
  val qWinTopkPerGroup: QueryDef = QueryDef.oracle(
    "q_win_topk_per_group",
    """SELECT n_name, rn, c_custkey, c_acctbal FROM (
      |  SELECT n_name, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY n_name
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |) WHERE rn <= 3 ORDER BY n_name, rn""".stripMargin,
  ) { (spark, dir) =>
    val t = Tables(spark, dir)
    val w = Window.partitionBy("n_name").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t.customer.join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select("n_name", "rn", "c_custkey", "c_acctbal")
      .orderBy("n_name", "rn")
  }

  /** lag/lead over event time per user, folded to per-user deltas. */
  val qWinLagLead: QueryDef = QueryDef.oracle(
    "q_win_lag_lead",
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(COALESCE(value - prev_value, 0) AS DECIMAL(30,6))) AS DOUBLE) AS sum_delta,
      |  COUNT(next_value) AS n_with_next,
      |  ROUND(MAX(first_v), 6) AS first_val
      |FROM (
      |  SELECT user_id, value,
      |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      |    LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
      |    FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_v
      |  FROM events
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables(spark, dir).events
      .select(col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(w).as("first_v"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        dsum(coalesce(col("value") - col("prev_value"), lit(0))).as("sum_delta"),
        count(col("next_value")).as("n_with_next"),
        round(max(col("first_v")), 6).as("first_val"))
      .orderBy("user_id")
  }

  /** Running sum (rows unbounded-preceding → current) per nation over
    * customers, reduced to min/max of the running series. */
  val qWinRunning: QueryDef = QueryDef.oracle(
    "q_win_running",
    """SELECT c_nationkey, COUNT(*) AS n,
      |  ROUND(MAX(running_bal), 4) AS max_running, ROUND(MIN(running_bal), 4) AS min_running
      |FROM (
      |  SELECT c_nationkey,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6)))
      |      OVER (PARTITION BY c_nationkey ORDER BY c_custkey
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
      |  FROM customer
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).customer
      .select(col("c_nationkey"),
        sum(col("c_acctbal").cast("decimal(30,6)")).over(w).cast("double").as("running_bal"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        r4(max(col("running_bal"))).as("max_running"),
        r4(min(col("running_bal"))).as("min_running"))
      .orderBy("c_nationkey")
  }

  /** Time-range frame: events per user in the trailing hour. Frame is
    * defined over integer epoch-microseconds on BOTH engines so the
    * boundary arithmetic is exact and identical. */
  val qWinRangeFrame: QueryDef = QueryDef.oracle(
    "q_win_range_frame",
    """SELECT event_type, COUNT(*) AS n, MAX(cnt_1h) AS max_cnt_1h,
      |  CAST(SUM(CAST(cnt_1h AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_cnt_1h
      |FROM (
      |  SELECT event_type,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS cnt_1h
      |  FROM events
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    Tables(spark, dir).events
      .select(col("event_type"), count(lit(1)).over(w).as("cnt_1h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max(col("cnt_1h")).as("max_cnt_1h"),
        (sum(col("cnt_1h").cast("decimal(30,6)")).cast("double") / count(lit(1)))
          .as("avg_cnt_1h"))
      .orderBy("event_type")
  }

  /** NTILE quartiles over account balance. */
  val qWinNtile: QueryDef = QueryDef.oracle(
    "q_win_ntile",
    """SELECT quartile, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT c_acctbal, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      |  FROM customer
      |) GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    // Single global NTILE: fine for quantile bucketing of a dim table;
    // for a 100 TB fact use approx percentiles instead (one pass, no
    // global sort).
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables(spark, dir).customer
      .select(col("c_acctbal"), ntile(4).over(w).as("quartile"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("quartile")
  }

  /** Distribution functions: percent_rank / cume_dist / nth_value over
    * account balance within each market segment — one shuffle on the
    * segment key, one ordered pass per partition. Results are rolled up
    * per segment so the output stays aggregate-sized. */
  val qWinDistribution: QueryDef = QueryDef.oracle(
    "q_win_distribution",
    """SELECT seg, COUNT(*) AS n,
      |  ROUND(MAX(pr), 6) AS max_pr, ROUND(MIN(cd), 6) AS min_cd,
      |  CAST(SUM(CAST(third_bal AS DECIMAL(30,6))) AS DOUBLE) AS sum_third
      |FROM (
      |  SELECT c_mktsegment AS seg,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd,
      |    nth_value(c_acctbal, 3) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_bal
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir).customer
      .select(col("c_mktsegment").as("seg"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        nth_value(col("c_acctbal"), 3).over(wRows).as("third_bal"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        round(max(col("pr")), 6).as("max_pr"),
        round(min(col("cd")), 6).as("min_cd"),
        dsum(col("third_bal")).as("sum_third"))
      .orderBy("seg")
  }

  /** BATCH sessionization via `session_window` — the exact operator
    * q_stream_session runs on the stream, applied to the bounded table:
    * one aggregation merges each user's events into 6-h-gap sessions
    * (sessions end at last event + gap; an event exactly at the gap
    * boundary starts a new session — the `>=` rule the oracle's
    * gaps-and-islands CTE encodes), then a per-user rollup. Having the
    * SAME operator on both batch and stream is the point: a backfill and
    * the live pipeline can't drift. Scale shape: session_window is a
    * single hash aggregation keyed (user, merged-window) — no window
    * function, no per-user sort spill. */
  val qWinSessionize: QueryDef = QueryDef.oracle(
    "q_win_sessionize",
    """WITH sessions AS (
      |  SELECT user_id, COUNT(*) AS n
      |  FROM (
      |    SELECT user_id, sid FROM (
      |      SELECT user_id, event_id,
      |        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM (
      |        SELECT user_id, ts, event_id,
      |          CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                 OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                    >= INTERVAL 6 HOUR
      |               THEN 1 ELSE 0 END AS is_new
      |        FROM events)))
      |  GROUP BY user_id, sid)
      |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
      |  MAX(n) AS max_session_events
      |FROM sessions GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    graft.Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"))
      .orderBy("user_id")
  }

  val all: Seq[QueryDef] = Seq(
    qWinRank, qWinTopkPerGroup, qWinLagLead, qWinRunning, qWinRangeFrame,
    qWinNtile, qWinDistribution, qWinSessionize)
}
