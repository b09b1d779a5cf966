package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar-function families (string / date / math / array / JSON), one
  * representative query per family over its natural table. Reference
  * analog: in pyPiper all of this is arbitrary Python inside `Node.run`
  * (SURVEY.md §2.B "String functions…user code"); here every expression is
  * a built-in Catalyst function that stays inside whole-stage codegen —
  * no UDF walls, pushdown and pruning intact.
  *
  * Cross-engine float note: libm results (sqrt/ln/pow) can differ in the
  * last ulp between JVM and C; each per-row value is cast to
  * DECIMAL(30,6) BEFORE the sum, which both quantizes away ulp noise and
  * makes the aggregation order-independent.
  */
object Functions {
  import Num._

  /** String family: split/substring/upper/regexp_extract/levenshtein/
    * length/concat_ws. */
  val qFnString: QueryDef = QueryDef.oracle(
    "q_fn_string",
    """SELECT first_word, COUNT(*) AS n,
      |  MIN(upper(p_type)) AS min_type_u,
      |  MAX(substring(p_name, 1, 4)) AS max_pref,
      |  CAST(SUM(CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_brand_num,
      |  CAST(SUM(levenshtein(first_word, 'widget')) AS BIGINT) AS sum_lev,
      |  CAST(SUM(length(p_name)) AS BIGINT) AS sum_len,
      |  MIN(concat_ws('|', p_brand, p_type)) AS min_brand_type
      |FROM (SELECT *, list_extract(string_split(p_name, ' '), 1) AS first_word FROM part)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).part
      .withColumn("first_word", split(col("p_name"), " ").getItem(0))
      .groupBy("first_word")
      .agg(
        count(lit(1)).as("n"),
        min(upper(col("p_type"))).as("min_type_u"),
        max(substring(col("p_name"), 1, 4)).as("max_pref"),
        sum(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("bigint")).as("sum_brand_num"),
        sum(levenshtein(col("first_word"), lit("widget"))).as("sum_lev"),
        sum(length(col("p_name"))).as("sum_len"),
        min(concat_ws("|", col("p_brand"), col("p_type"))).as("min_brand_type"))
      .orderBy("first_word")
  }

  /** Date/time family: year/month/quarter/date_trunc/datediff/interval
    * arithmetic/day-of-week. DuckDB dayofweek is 0=Sun..6, Spark is
    * 1=Sun..7 — aligned by +1 on the DuckDB side. */
  val qFnDate: QueryDef = QueryDef.oracle(
    "q_fn_date",
    """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  COUNT(*) AS n,
      |  MIN(date_trunc('month', o_orderdate)) AS min_month,
      |  CAST(SUM(datediff('day', o_orderdate, DATE '2002-01-01')) AS BIGINT) AS sum_days_to_2002,
      |  CAST(SUM(month(o_orderdate + INTERVAL 45 DAY)) AS BIGINT) AS sum_shift_month,
      |  CAST(SUM(dayofweek(o_orderdate) + 1) AS BIGINT) AS sum_dow
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).orders
      .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
      .agg(
        count(lit(1)).as("n"),
        min(date_trunc("month", col("o_orderdate"))).cast("date").as("min_month"),
        sum(datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("bigint"))
          .as("sum_days_to_2002"),
        sum(month(col("o_orderdate") + expr("INTERVAL 45 DAYS")).cast("bigint"))
          .as("sum_shift_month"),
        sum(dayofweek(col("o_orderdate")).cast("bigint")).as("sum_dow"))
      .orderBy("yr", "qtr")
  }

  /** Math family: sqrt/ln/pow/abs/ceil/floor, decimal-quantized sums. */
  val qFnMath: QueryDef = QueryDef.oracle(
    "q_fn_math",
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(sqrt(l_quantity) AS DECIMAL(30,6))) AS DOUBLE) AS sum_sqrt_qty,
      |  CAST(SUM(CAST(ln(l_extendedprice) AS DECIMAL(30,6))) AS DOUBLE) AS sum_ln_price,
      |  CAST(SUM(CAST(pow(1 + l_discount, 2) AS DECIMAL(30,6))) AS DOUBLE) AS sum_pow_disc,
      |  CAST(SUM(CAST(abs(l_quantity - 25) AS DECIMAL(30,6))) AS DOUBLE) AS sum_abs_dev,
      |  CAST(SUM(CAST(ceil(l_discount * 10) AS BIGINT)) AS BIGINT) AS sum_ceil,
      |  CAST(SUM(CAST(floor(l_tax * 10) AS BIGINT)) AS BIGINT) AS sum_floor
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(sqrt(col("l_quantity"))).as("sum_sqrt_qty"),
        dsum(log(col("l_extendedprice"))).as("sum_ln_price"),
        dsum(pow(lit(1) + col("l_discount"), 2)).as("sum_pow_disc"),
        dsum(abs(col("l_quantity") - 25)).as("sum_abs_dev"),
        sum(ceil(col("l_discount") * 10).cast("bigint")).as("sum_ceil"),
        sum(floor(col("l_tax") * 10).cast("bigint")).as("sum_floor"))
      .orderBy("l_returnflag")
  }

  /** Array family over embeddings: size/slice/element access/L2 norm via
    * higher-order functions. The norm is an exact-decimal fold of per-
    * element double products — order-independent, engine-independent.
    * All of it stays codegen-side; at 100 TB this is a pure map stage. */
  val qFnArray: QueryDef = QueryDef.oracle(
    "q_fn_array",
    """SELECT label, COUNT(*) AS n,
      |  MIN(len(embedding)) AS min_dim, MAX(len(embedding)) AS max_dim,
      |  ROUND(CAST(SUM(CAST((SELECT SUM(CAST(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)
      |      AS DECIMAL(30,6))) FROM unnest(embedding) AS t(e))
      |    AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_sq_norm,
      |  CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sum_first,
      |  CAST(SUM(CAST((SELECT SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(30,6)))
      |      FROM unnest(embedding[1:8]) AS t(e))
      |    AS DECIMAL(30,6))) AS DOUBLE) AS sum_head8
      |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    val sq = aggregate(
      transform(col("embedding"),
        x => (x.cast("double") * x.cast("double")).cast("decimal(30,6)")),
      lit(0).cast("decimal(30,6)"),
      (acc, x) => (acc + x).cast("decimal(30,6)")).cast("decimal(30,6)")
    val head8 = aggregate(
      transform(slice(col("embedding"), 1, 8), x => x.cast("double").cast("decimal(30,6)")),
      lit(0).cast("decimal(30,6)"),
      (acc, x) => (acc + x).cast("decimal(30,6)")).cast("decimal(30,6)")
    Tables(spark, dir).embeddings
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        min(size(col("embedding"))).as("min_dim"),
        max(size(col("embedding"))).as("max_dim"),
        round(sum(sq).cast("double"), 4).as("sum_sq_norm"),
        sum(col("embedding").getItem(0).cast("double").cast("decimal(30,6)"))
          .cast("double").as("sum_first"),
        sum(head8).cast("double").as("sum_head8"))
      .orderBy("label")
  }

  /** JSON family over events.props: path extraction via both
    * get_json_object and from_json(schema), proving they agree. */
  val qFnJson: QueryDef = QueryDef.oracle(
    "q_fn_json",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k_struct
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .withColumn("k_struct", from_json(col("props"), lit("k BIGINT")).getField("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(col("k_struct")).as("sum_k_struct"))
      .orderBy("event_type")
  }

  /** Bitwise family: AND/OR/XOR, shifts, bit_count, and the bitwise
    * AGGREGATE (bit_xor fold) — pure integer arithmetic, bit-identical
    * across engines by construction. The per-key expressions mirror the
    * hash/partition/bucketing tricks the engine itself uses (SimHash
    * blocks, salt mixing), exposed as the user-facing surface.
    *
    * Aggregate headroom is a SCALE property, proven by the sf10 decade
    * run: the round-12 form summed xor(key, Scramble(custkey)) — ~2⁶¹
    * addends whose SUM overflowed int64 under ANSI mode at sf10's row
    * counts (sf1 passed with only 2.4× headroom left). Wide-addend
    * checksums now fold through bit_xor (bounded at 64 bits for ANY
    * corpus size — the right bitwise checksum aggregate), and the shift
    * expression is masked to 16 bits before its SUM (overflow needs
    * ~1.4e14 rows PER BUCKET — beyond a 100 TB orders table by orders
    * of magnitude). sum_and/sum_bits addends are ≤255/≤63 and keep
    * their plain sums (safe past 10¹⁶ rows). */
  val qFnBitwise: QueryDef = QueryDef.oracle(
    "q_fn_bitwise",
    s"""SELECT o_orderkey % 8 AS bucket, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_and,
      |  CAST(BIT_XOR(xor(o_orderkey, ${Scramble.sql("o_custkey")})) AS BIGINT) AS xor_fold,
      |  CAST(SUM(((o_orderkey << 3) | (o_custkey >> 2)) & 65535) AS BIGINT) AS sum_shifts,
      |  CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS sum_bits
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).orders
      .select((col("o_orderkey") % 8).as("bucket"),
        col("o_orderkey"),
        col("o_orderkey").bitwiseXOR(Scramble(col("o_custkey"))).as("xr"),
        shiftleft(col("o_orderkey"), 3)
          .bitwiseOR(shiftright(col("o_custkey"), 2))
          .bitwiseAND(lit(65535L)).as("sh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey").bitwiseAND(255)).as("sum_and"),
        expr("bit_xor(xr)").as("xor_fold"),
        sum(col("sh")).as("sum_shifts"),
        sum(bit_count(col("o_orderkey")).cast("long")).as("sum_bits"))
      .orderBy("bucket")
  }

  /** Histogram via `width_bucket` — SQL-standard equi-width binning
    * (below range → 0, at-or-above max → nbuckets+1). Integer-exact
    * counts; the standard first look at any numeric column's
    * distribution, and at 100 TB a single partial+final aggregate.
    * DuckDB has no width_bucket, so the oracle spells out Spark's exact
    * formula. Spark 4.1's WidthBucket computes floor(n·(v − min) /
    * (max − min)) + 1 — MULTIPLY first, then one divide (not the
    * divide-by-bucket-width reading of the SQL standard) — so the oracle
    * mirrors that op order literally; with a different op order the two
    * engines could disagree by one ulp at a bucket edge and flip a
    * count. */
  val qFnHistogram: QueryDef = QueryDef.oracle(
    "q_fn_histogram",
    """SELECT CASE WHEN v < 900.0 THEN 0
      |            WHEN v >= 105000.0 THEN 11
      |            ELSE CAST(FLOOR(10 * (v - 900.0) / (105000.0 - 900.0))
      |                      AS BIGINT) + 1 END AS bucket,
      |  COUNT(*) AS n, CAST(MIN(l_orderkey) AS BIGINT) AS min_ok,
      |  CAST(MAX(l_orderkey) AS BIGINT) AS max_ok
      |FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_orderkey
      |      FROM lineitem)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy(width_bucket(col("l_extendedprice").cast("double"),
        lit(900.0), lit(105000.0), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).cast("long").as("min_ok"),
        max(col("l_orderkey")).cast("long").as("max_ok"))
      .orderBy("bucket")
  }

  val all: Seq[QueryDef] = Seq(qFnString, qFnDate, qFnMath, qFnArray, qFnJson,
    qFnBitwise, qFnHistogram)
}
