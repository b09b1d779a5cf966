package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One judged operator: a Spark implementation plus (where SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB on the same parquet.
  *
  * Determinism contract (both sides, see SURVEY.md §5.2):
  *   - stable ORDER BY with a unique tie-break key;
  *   - identical output column names (driver sorts columns by name, then
  *     hashes values);
  *   - float aggregates made order-independent (decimal-sum) or rounded
  *     far below the noise floor.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  def oracle(name: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))

  /** Rows-only driver check — for ops whose semantics DuckDB can't mirror
    * (approx sketches, LSH, streaming state). Pair with a ScalaTest spec. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Execution-shape helpers shared by the iterative queries. */
object Exec {
  /** Materialize `result` (persisted) while the loop-invariant caches
    * backing it are still alive, then free those invariants — so an
    * iterative query's big interior caches (edge tables, cluster
    * assignments) are released deterministically at the end of ITS
    * computation instead of leaking until the harness's clearCache().
    * The persisted `result` itself is aggregate-sized (ranks, pair
    * lists) and stays cached for the caller's action; it falls to
    * clearCache()/session end like any small cached plan. */
  def materialized(result: DataFrame, invariants: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    invariants.foreach(_.unpersist(blocking = false))
    out
  }
}

/** Cross-engine numeric determinism helpers.
  *
  * Floating sums are order-dependent; Spark and DuckDB will not reduce in
  * the same order, so a raw SUM(double) hash-mismatches at any scale. The
  * fix: evaluate the per-row expression in IEEE double (deterministic —
  * same expression tree on both engines), cast each row to a fixed-scale
  * DECIMAL, and let SUM run in exact decimal arithmetic, which is
  * order-independent. Finally cast back to DOUBLE so both engines emit the
  * identical 8-byte value. This survives any scale factor — it is not a
  * tolerance, it is exactness.
  */
object Num {
  /** Order-independent sum of a double expression: exact decimal interior,
    * double exterior. Mirror in oracle SQL with
    * `CAST(SUM(CAST(expr AS DECIMAL(30,6))) AS DOUBLE)`.
    *
    * SCALE LIMIT of the exterior cast (found by the round-11 sf1
    * validation): once |sum| exceeds 2^53·10^-scale (~9.0e9 at scale 6)
    * the exact decimal no longer fits a double, and the two engines'
    * rounding PATHS diverge — Spark's Decimal.toDouble is correctly
    * rounded, DuckDB's DECIMAL→DOUBLE double-rounds (measured: exact
    * …010.941590 → Spark …010.94159 [correct], DuckDB …010.941593).
    * Oracles whose sums can cross that magnitude must spell the
    * exterior as `CAST(CAST(SUM(…) AS VARCHAR) AS DOUBLE)` — the
    * string route is correctly rounded in DuckDB, restoring
    * bit-identity at every magnitude (q1/q5 do this). The same hazard
    * exists per-row for double→DECIMAL casts at high scales: prefer
    * integer outputs via `floor(x·10^k + 0.5)` (pure IEEE ops, engine-
    * independent — see q_media_features). */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double")

  /** Order-independent average: exact decimal sum cast to double, then one
    * double division (deterministic — both engines do the identical IEEE
    * op). Mirror with
    * `CAST(SUM(CAST(e AS DECIMAL(30,6))) AS DOUBLE) / COUNT(e)`. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(30,6)")).cast("double") / count(c)

  /** For genuinely statistical outputs (stddev, corr, …) whose interior
    * can't be made exact: round far below the accumulated error floor.
    * Magnitudes must be O(1e6) or less for 4 dp to be safe. */
  def r4(c: Column): Column = round(c, 4)
}
