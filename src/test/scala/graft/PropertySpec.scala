package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized structural properties (fixed seeds — the scalatest-
  * scalacheck bridge isn't resolvable offline, so samples are drawn
  * manually like PipelineSpec does). These harden invariants the
  * corpus-based pins can't: the planted fixtures exercise one graph
  * shape and one text distribution; random inputs exercise the
  * operator's CONTRACT. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(Seed(2026L))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toSeq

  test("connected components equal driver-side union-find on random graphs") {
    import spark.implicits._
    // random multigraphs with self-loop-free edges, both orientations,
    // duplicates allowed — exactly what a near-dup pair stage emits
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(8, 28)
      m <- Gen.choose(5, 50)
      es <- Gen.listOfN(m,
        Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield es.filter(e => e._1 != e._2)
    val cases = samples(genEdges, 4).filter(_.nonEmpty)
    assert(cases.nonEmpty)
    for (edges <- cases) {
      // reference: union-find with union-by-min, so every root is its
      // component's minimum id — the exact contract minLabel promises
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      for ((a, b) <- edges) {
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = nodes.map(x => x -> find(x)).toMap
      val got = graft.operators.ConnectedComponents
        .minLabel(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect,
        s"min-label diverged from union-find on edges=$edges")
    }
  }

  // adversarial text: runs of spaces, empty tokens, multi-byte UTF-8
  // (2/3/4-byte sequences incl. astral emoji), single-char and empty
  // strings — the edges a byte-scanning native expression must get right
  private val genText: Gen[String] = {
    val token = Gen.oneOf("a", "bb", "héllo", "日本語", "x", "emoji🙂", "1",
      "", " ", "🙂", "€uro")
    for {
      k <- Gen.choose(0, 12)
      ts <- Gen.listOfN(k, token)
      sep <- Gen.oneOf(" ", "  ", "   ")
    } yield ts.mkString(sep)
  }

  private def textDf(texts: Seq[String]) =
    spark.createDataset(texts)(
      org.apache.spark.sql.Encoders.STRING).toDF("text")

  test("native shingle hashes equal the declarative form on adversarial strings") {
    val texts = samples(genText, 60).distinct
    val df = textDf(texts)
    val hof = df
      .select(col("text"),
        transform(Dedup.shingles(col("text")), x => xxhash64(x)).as("hs"))
      .orderBy("text").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
    val native = df
      .select(col("text"),
        graft.functions.GraftFunctions.shingleHashes(col("text")).as("hs"))
      .orderBy("text").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
    assert(native.sameElements(hof),
      "native shingle hashes diverged from the declarative formulation " +
        "on generated strings")
  }

  test("native fingerprint equals the declarative fold on corpus and adversarial strings") {
    // the HOF tower graft_fingerprint replaced, spelled out — ascii
    // (first codepoint) and length (codepoint count) semantics included
    def decl(c: org.apache.spark.sql.Column) = aggregate(
      transform(filter(split(c, " "), w => w =!= ""),
        w => (ascii(w) * 31 + length(w)).cast("long")),
      lit(0L), (a, x) => (a * 131 + x) % 1000000007L)
    val corpus = Tables(spark, sf).documents.select(col("text"))
    val gen = textDf(samples(genText, 60).distinct)
    for (df <- Seq(corpus, gen)) {
      val rows = df.select(decl(col("text")).as("d"),
        graft.functions.GraftFunctions.fingerprint(col("text")).as("n"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"fingerprint diverged: declarative ${r.getLong(0)} vs native ${r.getLong(1)}"))
    }
    // malformed UTF-8 (strings cast from binary): truncated multi-byte
    // tails, bare continuation bytes, overlong encodings, encoded
    // surrogates, out-of-range leads — the tower's split() decodes via
    // toString (U+FFFD replacement), so the native fallback must land on
    // exactly the replaced string's ascii/length, and never throw on a
    // sequence cut off at end-of-string
    val badHex = Seq(
      "FF", "80", "C2", "E282", "F09F", "F8A0A0A0", "C080", "E080AF",
      "EDA080", "F4908080", "41C2", "C2A9", "F09F9982",
      "414220C320414220E28220", "E2824120F0284142", "80414220C2C2")
    import spark.implicits._
    val badDf = badHex.toDF("hx")
      .select(expr("cast(unhex(hx) as string)").as("text"))
    val badRows = badDf.select(col("text"), decl(col("text")).as("d"),
      graft.functions.GraftFunctions.fingerprint(col("text")).as("n"))
      .collect()
    assert(badRows.length == badHex.length)
    badRows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"fingerprint diverged on malformed bytes ${r.getString(0)}: " +
        s"declarative ${r.getLong(1)} vs native ${r.getLong(2)}"))
  }

  test("native tokenizer and count-in equal the HOF towers, malformed bytes included") {
    // graft_tokens / graft_count_in replaced the CodegenFallback HOF
    // idioms catalog-wide (r18): filter(split(text," "), _ =!= "") and
    // size(filter(ws, isInCollection(...))). Exact array/int equality
    // on the corpus, generated strings, AND the fingerprint suite's
    // malformed-UTF-8 fixtures (the native byte path must reproduce
    // split()'s U+FFFD replacement semantics)
    import graft.functions.GraftFunctions.{graftTokens, countIn}
    val words = Seq("the", "a", "scan", "table")
    def hofToks(c: org.apache.spark.sql.Column) =
      filter(split(c, " "), w => w =!= "")
    def hofCount(c: org.apache.spark.sql.Column) =
      size(filter(hofToks(c), w => w.isInCollection(words)))
    val corpus = Tables(spark, sf).documents.select(col("text"))
    val gen = textDf(samples(genText, 60).distinct)
    import spark.implicits._
    val bad = Seq(
      "FF", "80", "C2", "E282", "F09F", "C080", "EDA080", "F4908080",
      "414220C320414220E28220", "E2824120F0284142", "80414220C2C2")
      .toDF("hx").select(expr("cast(unhex(hx) as string)").as("text"))
    for (df <- Seq(corpus, gen, bad)) {
      val rows = df.select(hofToks(col("text")).as("h"),
        graftTokens(col("text")).as("n"),
        hofCount(col("text")).as("hc"),
        countIn(graftTokens(col("text")), words).as("nc")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"tokens diverged: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        assert(r.getInt(2) == r.getInt(3),
          s"count-in diverged: ${r.getInt(2)} vs ${r.getInt(3)}")
      }
    }
  }

  test("salted join equals the plain join on random skewed data") {
    import spark.implicits._
    val genRows: Gen[(Int, List[Long])] = for {
      salts <- Gen.choose(2, 8)
      keys <- Gen.listOfN(60, Gen.frequency(
        6 -> Gen.const(1L), // one hot key dominating — salting's use case
        4 -> Gen.choose(2L, 9L)))
    } yield (salts, keys)
    for ((salts, keys) <- samples(genRows, 3)) {
      val big = keys.zipWithIndex
        .toDF("k", "line").select(col("k"), col("line").cast("long"))
      val small = (1L to 9L).map(k => (k, s"v$k")).toDF("sk", "v")
      val salted = graft.operators.SaltedJoin
        .inner(big, small, "k", "sk", salts, Seq(col("k"), col("line")))
        .select(col("k"), col("line"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      val plain = big.join(small, col("k") === col("sk"))
        .select(col("k"), col("line"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
      assert(salted == plain, s"salted join diverged at salts=$salts")
    }
  }
}
