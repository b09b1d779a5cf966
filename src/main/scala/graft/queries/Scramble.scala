package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, pmod}

/** THE deterministic key scramble, defined once for every sampling /
  * sharding / eval-split site (Spark side AND oracle SQL side — the two
  * must never drift, and a missed site is an engine/oracle parity bug at
  * exactly the id range a 100 TB corpus reaches).
  *
  * The key is reduced mod 1e9+7 BEFORE the Knuth multiply so the
  * intermediate stays below 2^63 for any int64 key: a raw
  * `key * 2654435761` silently wraps in Spark (non-ANSI Long multiply)
  * above ~3.47e9 while DuckDB raises an overflow error — the engines
  * would disagree exactly where it matters. |intermediate| ≤
  * (1e9+6) · 2654435761 ≈ 2.66e18 < 2^63 ≈ 9.22e18.
  *
  * The reduction is a POSITIVE mod (`pmod` / `(k % m + m) % m`) so a
  * signed key column cannot silently flip downstream `% 100 < p`
  * selections negative (Spark and DuckDB both give `%` the dividend's
  * sign): for non-negative keys — every current site — the value is
  * bit-identical to the plain `%` it replaces; for negative keys both
  * engines now agree on a value in `[0, m)`. */
object Scramble {
  val Mod: Long = 1000000007L
  val Knuth: Long = 2654435761L

  /** Overflow-safe scrambled key as a Spark column. */
  def apply(key: Column): Column = pmod(key, lit(Mod)) * Knuth

  /** The same expression as an ANSI SQL fragment for oracle queries. */
  def sql(key: String): String = s"((($key % $Mod + $Mod) % $Mod) * $Knuth)"
}
