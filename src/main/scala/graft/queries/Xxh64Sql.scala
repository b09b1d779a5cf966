package graft.queries

/** DuckDB SQL rendering of Spark's XXH64 (seed 42) — the oracle-side twin
  * of `xxhash64` / [[graft.functions.ShingleHashes]] /
  * [[graft.functions.MinHashSignature]]'s hash algebra, so the LSH dedup
  * family's results can be driver-checked bit-for-bit instead of
  * rows-only (the round-11 verdict's top oracle ask).
  *
  * Same discipline as [[Scramble]]/[[FingerprintSql]]: ONE generator for
  * a cross-engine-exactness-critical definition. The rendering follows
  * the exact step structure of `o.a.s.sql.catalyst.expressions.XXH64`
  * (public Apache Spark code): 32-byte stripe accumulation, 8-byte tail
  * words, the 4-byte chunk, trailing bytes, avalanche — over the UTF-8
  * bytes, reading words LITTLE-ENDIAN (Spark reads via Platform.getLong,
  * native order on every supported target).
  *
  * Arithmetic domain: HUGEINT values in [0, 2^64). 64-bit wrap-around
  * multiplication is performed in 32-bit halves so no intermediate
  * exceeds 2^65 (DuckDB HUGEINT is 128-bit — headroom is ample, but
  * a full 64×64 product would NOT fit); xor goes through UBIGINT (the
  * only DuckDB integer type with defined 64-bit bitwise semantics at
  * this width); shifts are exact multiplies/divides by powers of two.
  * Each scalar step lands in a NAMED CTE column — expression-tree
  * nesting of the avalanche/merge steps would duplicate subtrees
  * exponentially (every wrap-multiply references its operand four
  * times).
  *
  * Equality with Spark is pinned end-to-end by the driver compare
  * itself: the three oracled LSH queries hash-match on candidate sets,
  * signatures, and band keys, and any single-bit divergence anywhere in
  * the algebra would cascade into a different pair list — the strongest
  * cross-engine check available, exercised at every sf. */
object Xxh64Sql {

  /** 2^64 as a SQL literal (HUGEINT domain). */
  val M64 = "18446744073709551616"

  // XXH64 primes (unsigned values, as BigInt so literals render decimal)
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Two64 = BigInt(1) << 64

  /** Wrapping 64-bit multiply by a constant, in 32-bit halves. */
  private def mulc(a: String, c: BigInt): String = {
    val lo = c & 0xFFFFFFFFL
    val hi = c >> 32
    s"((($a) % 4294967296)*$lo + (((($a) // 4294967296)*$lo + " +
      s"(($a) % 4294967296)*$hi) % 4294967296) * 4294967296) % $M64"
  }

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r}) % $M64 + ($x) // ${BigInt(1) << (64 - r)})"

  private def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(x: String, n: Int): String = s"(($x) // ${BigInt(1) << n})"

  private def add(a: String, b: String): String = s"((($a) + ($b)) % $M64)"

  /** XXH64 round(0, w) = rotl(w·P2, 31)·P1. */
  private def rnd0(w: String): String = mulc(rotl(mulc(w, P2), 31), P1)

  /** XXH64 round(acc, w) = rotl(acc + w·P2, 31)·P1. */
  private def rndv(acc: String, w: String): String =
    mulc(rotl(add(acc, mulc(w, P2)), 31), P1)

  private def mergeRound(h: String, v: String): String =
    add(mulc(xor(h, rnd0(v)), P1), P4.toString)

  /** Avalanche steps ending in a SIGNED BIGINT output column. */
  private def fmixSteps(pfx: String, h: String): Seq[(String, String)] = {
    val (f1, f2, f3) = (s"${pfx}_f1", s"${pfx}_f2", s"${pfx}_f3")
    Seq(
      f1 -> mulc(xor(h, shr(h, 33)), P2),
      f2 -> mulc(xor(f1, shr(f1, 29)), P3),
      f3 -> xor(f2, shr(f2, 32)),
      s"${pfx}_f4" ->
        s"CAST($f3 - $M64 * ($f3 // 9223372036854775808) AS BIGINT)")
  }

  /** Renders a (name, body) CTE list: chain scalar columns one CTE per
    * step (each step may reference all prior columns by name). */
  private def chain(pfx: String, from: String,
      cols: Seq[(String, String)], finalSel: String): Seq[(String, String)] = {
    val steps = cols.zipWithIndex.map { case ((name, expr), i) =>
      val src = if (i == 0) from else s"${pfx}_c${i - 1}"
      s"${pfx}_c$i" -> s"SELECT *, $expr AS $name FROM $src"
    }
    steps :+ (s"${pfx}_h" -> s"$finalSel FROM ${pfx}_c${cols.size - 1}")
  }

  /** u64 view of a signed BIGINT column/expr. */
  def u64(v: String): String =
    s"CAST($v AS HUGEINT) + CASE WHEN $v < 0 THEN CAST($M64 AS HUGEINT) ELSE 0 END"

  /** CTEs computing `out` = xxhash64(seed 42) of string column `scol` of
    * CTE `src`, carrying `keys` through; the last CTE is named
    * `<pfx>_h`. */
  def strHash(pfx: String, src: String, keys: Seq[String], scol: String,
      out: String): Seq[(String, String)] = {
    val k = keys.mkString(", ")
    val seed = BigInt(42)
    val v1c = (seed + P1 + P2) % Two64
    val v2c = (seed + P2) % Two64
    val v4c = (seed - P1 + Two64) % Two64
    val emptyH = (seed + P5) % Two64
    val w8term = (0 until 8).map { i =>
      if (i == 0) "b[CAST(8*j+1 AS INT)]"
      else s"b[CAST(8*j+${i + 1} AS INT)]*${BigInt(1) << (8 * i)}"
    }.mkString(" + ")
    val i4term = (0 until 4).map { i =>
      if (i == 0) "b[CAST(bs4+1 AS INT)]"
      else s"b[CAST(bs4+${i + 1} AS INT)]*${BigInt(1) << (8 * i)}"
    }.mkString(" + ")
    val svBody = (1 to 4).map { i =>
      s"'v$i': ${rndv(s"ac.v$i", s"w8[CAST(4*e.v1+$i AS INT)]")}"
    }.mkString(", ")
    val init = s"{'v1': CAST($v1c AS HUGEINT), 'v2': CAST($v2c AS HUGEINT), " +
      s"'v3': CAST($seed AS HUGEINT), 'v4': CAST($v4c AS HUGEINT)}"
    val elem = "{'v1': CAST(t AS HUGEINT), 'v2': CAST(0 AS HUGEINT), " +
      "'v3': CAST(0 AS HUGEINT), 'v4': CAST(0 AS HUGEINT)}"
    val mrg = add(add(rotl("sv.v1", 1), rotl("sv.v2", 7)),
      add(rotl("sv.v3", 12), rotl("sv.v4", 18)))
    val m0 = s"${pfx}_m0"
    def mstep(prev: String, lane: Int): String =
      s"CASE WHEN ln >= 32 THEN ${mergeRound(prev, s"sv.v$lane")} ELSE $prev END"
    val tailStep = add(mulc(rotl(xor("h", rnd0("w")), 27), P1), P4.toString)
    val byteStep = mulc(rotl(xor("h", mulc("c", P5)), 11), P1)
    val cols = Seq(
      m0 -> (s"CASE WHEN ln >= 32 THEN $mrg ELSE CAST($emptyH AS HUGEINT) END"),
      s"${pfx}_m1" -> mstep(m0, 1),
      s"${pfx}_m2" -> mstep(s"${pfx}_m1", 2),
      s"${pfx}_m3" -> mstep(s"${pfx}_m2", 3),
      s"${pfx}_m4" -> mstep(s"${pfx}_m3", 4),
      s"${pfx}_m5" -> add(s"${pfx}_m4", "ln"),
      s"${pfx}_tw" -> (s"list_reduce(list_prepend(${pfx}_m5, " +
        s"w8[CAST(4*ns+1 AS INT):CAST(ln//8 AS INT)]), (h, w) -> $tailStep)"),
      s"${pfx}_t4" -> (s"CASE WHEN ln % 8 >= 4 THEN " +
        add(mulc(rotl(xor(s"${pfx}_tw", mulc(i4term, P1)), 23), P2),
          P3.toString) + s" ELSE ${pfx}_tw END"),
      s"${pfx}_bt" -> (s"list_reduce(list_prepend(${pfx}_t4, " +
        "b[CAST(bs4 + CASE WHEN ln % 8 >= 4 THEN 4 ELSE 0 END + 1 AS INT):" +
        s"CAST(ln AS INT)]), (h, c) -> $byteStep)")
    ) ++ fmixSteps(pfx, s"${pfx}_bt")
    Seq(
      s"${pfx}_p1" -> (s"SELECT $k, hex($scol) AS hx, " +
        s"octet_length(encode($scol)) AS ln FROM $src"),
      s"${pfx}_p2" -> ("SELECT *, list_transform(range(1, ln+1), i -> " +
        "CAST(strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1))" +
        "*16 + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) " +
        s"- 17 AS HUGEINT)) AS b FROM ${pfx}_p1"),
      s"${pfx}_p3" -> ("SELECT *, list_transform(range(0, ln//8), j -> " +
        s"$w8term) AS w8, ln//32 AS ns, 8*(ln//8) AS bs4 FROM ${pfx}_p2"),
      s"${pfx}_p4" -> ("SELECT *, CASE WHEN ln >= 32 THEN " +
        s"list_reduce(list_prepend($init, list_transform(range(0, ns), " +
        s"t -> $elem)), (ac, e) -> {$svBody}) ELSE NULL END AS sv " +
        s"FROM ${pfx}_p3")
    ) ++ chain(pfx, s"${pfx}_p4", cols,
      s"SELECT $k, ${cols.last._1} AS $out")
  }

  /** CTEs computing `out` = XXH64.hashLong(vcol, seed) — the 8-byte
    * fixed-length path (what Spark's multi-arg `xxhash64` folds per long
    * child). `vcol` is a signed BIGINT column; `seedExpr` a u64 HUGEINT
    * expression (literal or prior column). Last CTE: `<pfx>_h`. */
  def longHash(pfx: String, src: String, keys: Seq[String], vcol: String,
      seedExpr: String, out: String): Seq[(String, String)] = {
    val k = keys.mkString(", ")
    val u = s"${pfx}_u"
    val h0 = add(s"${pfx}_seed", (P5 + 8).toString)
    val cols = Seq(
      s"${pfx}_r" -> mulc(rotl(mulc(u, P2), 31), P1),
      s"${pfx}_h1" -> xor(h0, s"${pfx}_r"),
      s"${pfx}_h2" -> add(mulc(rotl(s"${pfx}_h1", 27), P1), P4.toString)
    ) ++ fmixSteps(pfx, s"${pfx}_h2")
    (s"${pfx}_p0" ->
      s"SELECT $k, ${u64(vcol)} AS $u, $seedExpr AS ${pfx}_seed FROM $src") +:
      chain(pfx, s"${pfx}_p0", cols, s"SELECT $k, ${cols.last._1} AS $out")
  }

  /** Seed-independent prefix of hashLong — r = rotl(u64(v)·P2, 31)·P1,
    * the expensive 60% of the chain, a function of the VALUE only. The
    * k-lane MinHash rehash computes r once per distinct value and runs
    * only the short seeded tail per lane ([[longHashFromR]]) — the
    * restructure that took the sf0.1 LSH oracles from ~160 s to ~18 s. */
  def longHashPrefix(vcol: String): String =
    mulc(rotl(mulc(u64(vcol), P2), 31), P1)

  /** The seeded tail of hashLong given a precomputed [[longHashPrefix]]
    * column `rcol`: h = fmix(rotl(xor(seed + P5 + 8, r), 27)·P1 + P4). */
  def longHashFromR(pfx: String, src: String, keys: Seq[String], rcol: String,
      seedExpr: String, out: String): Seq[(String, String)] = {
    val k = keys.mkString(", ")
    val h0 = add(seedExpr, (P5 + 8).toString)
    val cols = Seq(
      s"${pfx}_h1" -> xor(h0, rcol),
      s"${pfx}_h2" -> add(mulc(rotl(s"${pfx}_h1", 27), P1), P4.toString)
    ) ++ fmixSteps(pfx, s"${pfx}_h2")
    chain(pfx, src, cols, s"SELECT $k, ${cols.last._1} AS $out")
  }

  /** Render a CTE list + final SELECT into one statement. */
  def render(steps: Seq[(String, String)], finalSelect: String): String =
    steps.map { case (n, q) => s"$n AS ($q)" }
      .mkString("WITH ", ", ", " " + finalSelect)
}
