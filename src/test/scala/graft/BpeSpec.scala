package graft

import scala.collection.mutable

import graft.operators.BpeMerges
import org.apache.spark.sql.functions._

/** The distributed BPE merge loop against an independent sequential
  * reference (the textbook algorithm on collected word counts), plus
  * planted fixtures for the two boundary rules the oracle also states:
  * greedy leftmost-non-overlapping merging within a word, and the
  * (max count, then lexicographically smallest pair) tie-break. */
class BpeSpec extends SparkSpec {

  /** Textbook BPE on a word-frequency map: symbol tuples per word,
    * argmax pair by (count desc, pair asc), greedy left-to-right merge.
    * Deliberately shares no code or representation with BpeMerges.
    * Codepoint-level initial symbols (not UTF-16 units), matching the
    * engine's split-by-codepoint — astral fixtures stay whole. */
  private def chars(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Codepoint-lexicographic compare — the engine's tie-break order
    * (UTF8String.compareTo = UTF-8 byte order = codepoint order; DuckDB
    * binary collation likewise). Scala's default String Ordering
    * compares UTF-16 units, which DIVERGES for ties between
    * U+E000..U+FFFF symbols and astral symbols (surrogates 0xD800..
    * sort below 0xE000 in UTF-16 but astral codepoints are larger) —
    * the reference must not inherit that. */
  private def cpCompare(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    var i = 0
    while (i < x.length && i < y.length) {
      if (x(i) != y(i)) return Integer.compare(x(i), y(i))
      i += 1
    }
    Integer.compare(x.length, y.length)
  }

  private val pairOrd: Ordering[((String, String), Long)] =
    (p, q) => {
      val c = java.lang.Long.compare(q._2, p._2) // higher count first
      if (c != 0) c
      else {
        val l = cpCompare(p._1._1, q._1._1)
        if (l != 0) l else cpCompare(p._1._2, q._1._2)
      }
    }

  private def referenceBpe(
      words: Map[String, Long], k: Int): Seq[(Int, String, String, String, Long)] = {
    val syms = mutable.Map[String, Vector[String]]() ++
      words.keys.map(w => w -> chars(w))
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val pc = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((w, cnt) <- words; Seq(x, y) <- syms(w).sliding(2))
        pc((x, y)) += cnt
      if (pc.isEmpty) done = true
      else {
        val ((a, b), n) = pc.min(pairOrd)
        out += ((r, a, b, a + b, n))
        for (w <- words.keys) {
          val s = syms(w)
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += s(i); i += 1 }
          }
          syms(w) = merged.result()
        }
        r += 1
      }
    }
    out.result()
  }

  private def learned(words: Map[String, Long], k: Int) = {
    import spark.implicits._
    val df = words.toSeq.toDF("word", "cnt")
      .select(col("cnt"), BpeMerges.initialSymbols(col("word")).as("s"))
    BpeMerges.learn(df, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
  }

  test("merge table equals the sequential reference on the corpus") {
    // same vocabulary predicate as the judged bpeWords: every token
    // except sentinel-bearing ones (none on this corpus)
    val words = Tables(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(BpeMerges.Sep))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = referenceBpe(words, 20)
    assert(ref.length == 20, "corpus must sustain 20 merges")
    val got = learned(words, 20)
    assert(got == ref,
      s"distributed merges drifted from the sequential reference:\n$got\nvs\n$ref")
  }

  test("greedy leftmost merge: aaa -> (aa)(a), aaaa -> (aa)(aa)") {
    // round 1 must merge (a,a) everywhere leftmost-non-overlapping; the
    // counts pin the pass shape: "aaa" contributes ONE (a,a) occurrence
    // post-merge view... pre-merge it counts 2 adjacent pairs, and the
    // rewrite leaves (aa, a) / (aa, aa) — round 2's counts see exactly
    // the post-greedy sequences.
    val m = learned(Map("aaa" -> 1L, "aaaa" -> 1L), 2)
    assert(m.head == ((1, "a", "a", "aa", 5L)))
    // after greedy: aaa=(aa,a), aaaa=(aa,aa) -> pairs (aa,a)=1, (aa,aa)=1
    // tie at n=1 -> lexicographically smallest pair is (aa,a)
    assert(m(1) == ((2, "aa", "a", "aaa", 1L)),
      s"post-merge sequences must reflect greedy non-overlapping merging: $m")
  }

  test("ties break to the lexicographically smallest pair") {
    // zq and ab both occur exactly twice; (a,b) < (z,q)
    val m = learned(Map("zq" -> 2L, "ab" -> 2L), 1)
    assert(m == Seq((1, "a", "b", "ab", 2L)))
  }

  test("applyMerges encoding equals the sequential reference's final state") {
    import spark.implicits._
    // encode must replay training exactly: the expression chain applied
    // to fresh character-level words yields the same symbol sequences as
    // the reference's in-place merge replay
    val words = Map("lower" -> 5L, "lowest" -> 2L, "newer" -> 6L,
      "wider" -> 3L, "new" -> 8L, "low" -> 7L)
    val k = 6
    val ref = referenceBpe(words, k)
    val refSyms = {
      val syms = scala.collection.mutable.Map[String, Vector[String]]() ++
        words.keys.map(w => w -> chars(w))
      for ((_, a, b, _, _) <- ref; w <- words.keys) {
        val s = syms(w)
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += s(i); i += 1 }
        }
        syms(w) = merged.result()
      }
      syms.toMap
    }
    val enc = BpeMerges.applyMerges(
      BpeMerges.initialSymbols(col("word")),
      ref.map(m => (m._2, m._3)))
    val S = BpeMerges.Sep
    val got = words.keys.toSeq.toDF("word")
      .select(col("word"), enc.as("s")).collect()
      .map(r => r.getString(0) ->
        r.getString(1).stripPrefix(S).stripSuffix(S).split(S + S).toVector)
      .toMap
    assert(got == refSyms,
      s"expression-chain encode drifted from the reference replay:\n$got\nvs\n$refSyms")
  }

  test("full alphabet: digits, punctuation, case, and the pre-round-8 ',' separator") {
    // ',' is an ordinary alphabet symbol since the U+0001 sentinel took
    // over as separator — words containing it train unescaped, and the
    // non-letter symbols tie-break in plain binary order: (a,',')=7 and
    // ('1','!')=7 tie, '1' (0x31) < 'a' (0x61) picks ('1','!').
    val words = Map("a,b" -> 4L, "a,c" -> 3L, "x1!" -> 5L, "X1!" -> 2L)
    val ref = referenceBpe(words, 4)
    val got = learned(words, 4)
    assert(got.head == ((1, "1", "!", "1!", 7L)),
      s"binary-order tie-break across digit/punct symbols broke: $got")
    assert(got == ref,
      s"full-alphabet merges drifted from the sequential reference:\n$got\nvs\n$ref")
  }

  test("multi-byte UTF-8 symbols: 2/3/4-byte codepoints merge whole") {
    // é (2-byte), ζ/ω (2-byte), 日/本 (3-byte), 😀 (4-byte astral — must
    // survive both engines' codepoint split without surrogate tearing);
    // (ζ,ω)=4 ties (日,本)=4 and UTF-8 byte order (CE B6 < E6 97 A5)
    // picks (ζ,ω)
    val words = Map("héé" -> 3L, "ζωζω" -> 2L, "日本" -> 4L, "x😀😀y" -> 1L)
    val ref = referenceBpe(words, 5)
    val got = learned(words, 5)
    assert(got.head._2 == "ζ" && got.head._3 == "ω",
      s"codepoint-order tie-break across multi-byte symbols broke: $got")
    assert(got == ref,
      s"multi-byte merges drifted from the sequential reference:\n$got\nvs\n$ref")
  }

  test("tie between a private-use symbol and an astral symbol breaks in codepoint order") {
    // the exact window where UTF-16 unit order and codepoint order
    // disagree: U+E000 (one unit, 0xE000) vs U+1F600 (surrogates
    // leading 0xD83D). UTF-16 says U+1F600 < U+E000; codepoints (and UTF-8
    // bytes, hence both engines) say U+E000 < U+1F600. The pairs
    // (U+E000, x) and (U+1F600, y) tie at n = 2 — the engine must pick
    // (U+E000, x), and the reference must agree.
    val words = Map("\ue000x" -> 2L, "😀y" -> 2L)
    val ref = referenceBpe(words, 1)
    val got = learned(words, 1)
    assert(got.head._2 == "\ue000" && got.head._3 == "x",
      s"engine must tie-break in codepoint order: $got")
    assert(got == ref, s"reference diverged from engine on the UTF-16/codepoint window:\n$got\nvs\n$ref")
  }

  test("loop stops early when no pairs remain") {
    val m = learned(Map("ab" -> 3L, "c" -> 9L), 5)
    assert(m == Seq((1, "a", "b", "ab", 3L)),
      "after the only merge every word is a single symbol; later rounds must emit nothing")
  }
}
