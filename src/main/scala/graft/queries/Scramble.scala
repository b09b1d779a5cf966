package graft.queries

import org.apache.spark.sql.Column

/** THE deterministic key scramble, defined once for every sampling /
  * sharding / eval-split site (Spark side AND oracle SQL side — the two
  * must never drift, and a missed site is an engine/oracle parity bug at
  * exactly the id range a 100 TB corpus reaches).
  *
  * The key is reduced mod 1e9+7 BEFORE the Knuth multiply so the
  * intermediate stays below 2^63 for any non-negative int64 key: a raw
  * `key * 2654435761` silently wraps in Spark (non-ANSI Long multiply)
  * above ~3.47e9 while DuckDB raises an overflow error — the engines
  * would disagree exactly where it matters. |intermediate| ≤
  * (1e9+6) · 2654435761 ≈ 2.66e18 < 2^63 ≈ 9.22e18. */
object Scramble {
  val Mod: Long = 1000000007L
  val Knuth: Long = 2654435761L

  /** Overflow-safe scrambled key as a Spark column. */
  def apply(key: Column): Column = (key % Mod) * Knuth

  /** The same expression as an ANSI SQL fragment for oracle queries. */
  def sql(key: String): String = s"(($key % $Mod) * $Knuth)"
}
