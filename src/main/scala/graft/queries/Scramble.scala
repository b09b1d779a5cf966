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

/** THE rolling-document-fingerprint oracle fragment — the DuckDB twin of
  * [[graft.functions.Fingerprint]], defined ONCE for every oracle that
  * groups or joins on the fingerprint (same discipline as [[Scramble]]:
  * two hand-maintained copies of a cross-engine-exactness-critical
  * definition WILL drift). Rendered single-line because interpolating
  * multi-line fragments into stripMargin strings corrupts lines starting
  * with `|`. See Fingerprint.scala for the exactness argument. */
object FingerprintSql {
  /** list_reduce fold over `col`'s tokens: h = (h·131 + ascii·31+len) mod 1e9+7. */
  def sql(col: String = "text"): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_filter(string_split($col, ' '), x -> x <> ''), " +
      "w -> CAST(ascii(w) * 31 + length(w) AS BIGINT))), " +
      "(a, x) -> (a * 131 + x) % 1000000007)"
}
