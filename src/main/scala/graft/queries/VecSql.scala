package graft.queries

/** DuckDB SQL rendering of the FLOAT-FOLD vector primitives — the
  * oracle-side twins of [[graft.functions.CosineSimilarity]]
  * (`graft_cosine`) and [[graft.functions.HyperplaneBucket]]
  * (`graft_lsh_bucket`) — which turn the whole ANN/similarity family
  * from rows-only entries into full driver hash-compares.
  *
  * Why this is exact, not approximate: every float reduction in those
  * native expressions is a PER-ROW SEQUENTIAL fold with a fixed order —
  * `dot += x*y` ascending over the array — in IEEE double arithmetic on
  * float32 inputs (exact when widened). DuckDB's `list_reduce` is the
  * same left fold, and IEEE `+`, `*`, `/`, `sqrt` are correctly-rounded
  * deterministic operations on BOTH engines, so the folded doubles are
  * BIT-IDENTICAL — comparisons (`dot > 0` sign bits, rank orderings,
  * `>= threshold` cuts) agree exactly, with no epsilon anywhere. The
  * hyperplane coefficients are a pure integer LCG mapped to m/2³¹ − ½ —
  * every coefficient exactly representable in double on both engines.
  * (Same discipline as [[Scramble]]/[[FingerprintSql]]/[[Xxh64Sql]]:
  * one generator per cross-engine-exactness-critical definition.)
  */
object VecSql {

  /** Sequential left-fold sum of a DOUBLE-term list from 0.0 — the SQL
    * twin of `for (i) acc += term(i)`. */
  private def fold(terms: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), $terms), (ac, v) -> ac + v)"

  /** Σ a[i]·b[i] in index order (both float arrays, widened to double
    * per element exactly as the codegen loop does). */
  def dot(a: String, b: String): String =
    fold(s"list_transform(list_zip($a, $b), " +
      "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))")

  /** Σ a[i]² in index order. */
  def norm2(a: String): String =
    fold(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")

  /** `graft_cosine(a, b)`: fused dot/‖a‖²/‖b‖² folds, then
    * dot / (√na·√nb), 0 on zero denominator. The three accumulators
    * interleave in one JVM loop but each sums its own terms in index
    * order, so three independent folds produce the identical bits. */
  def cos(a: String, b: String): String = {
    val na = norm2(a)
    val nb = norm2(b)
    // NULLIF/COALESCE instead of a CASE guard so each norm fold is
    // REFERENCED ONCE — DuckDB does not reliably CSE across CASE
    // branches, and the duplicated folds nearly doubled per-pair oracle
    // cost. Semantics identical: zero denominator → NULL division →
    // 0.0, and the non-zero branch is the same dot/(√na·√nb) bits.
    s"COALESCE(${dot(a, b)} / NULLIF(sqrt($na) * sqrt($nb), 0.0), 0.0)"
  }

  /** `graft_lsh_bucket(a, nBits)`: nBits sign bits of dot products
    * against the LCG hyperplanes — coef(k) = ((k·1103515245 + 12345)
    * mod 2³¹)/2³¹ − ½ with k = j·64 + (i−1) — folded MSB-first
    * (`acc = acc·2 + bit`), over min(len, 64) dimensions. */
  def lshBucket(a: String, nBits: Int): String = {
    val coef = "(CAST(((j*64 + i - 1) * 1103515245 + 12345) % 2147483648 " +
      "AS DOUBLE) / 2147483648.0 - 0.5)"
    val dotJ = fold(s"list_transform(range(1, CAST(LEAST(len($a), 64) + 1 " +
      s"AS BIGINT)), i -> CAST($a[CAST(i AS INT)] AS DOUBLE) * $coef)")
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(0, $nBits), j -> " +
      s"CASE WHEN $dotJ > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) " +
      s"END)), (ac, b) -> ac * 2 + b)"
  }
}
