package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-MULTIPLIER testdata generator for scale experiments beyond the
  * driver-provided sfs: reads an existing sf dir and writes an N×
  * corpus to a scratch dir (never touches /root/testdata).
  *
  *   sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1 10"
  *
  * Scaling shape (the realistic one): FACTS multiply, DIMENSIONS stay —
  * orders/lineitem/events/documents/embeddings get `mult` copies with
  * key offsets that preserve referential integrity (order keys shift in
  * lockstep across orders and lineitem), while region/nation/customer/
  * supplier/part copy through, so each customer simply has mult× the
  * orders. Copy 0 is the original corpus byte-for-byte, so planted
  * structures (duplicate clusters, near-dup pairs) survive at their
  * original density, and each copy's INTERNAL structure replicates
  * that density — near-dup mass grows linearly with the data, the way
  * a real corpus's does.
  *
  * COMPOSE-SAFE since round 13 (sf1 → sf10 → … without collisions):
  *
  *   - Key strides are DERIVED from the source's actual max key (next
  *     power of 10), not constants. The round-12 constant strides made
  *     a second application collide: `d + c0·1M` re-offset by `c1·1M`
  *     assigns copies (c0=1,c1=2) and (c0=2,c1=1) the same doc_id with
  *     different payloads — a broken primary key.
  *   - Document copies are decorrelated at the SHINGLE level by a
  *     DETERMINISTIC WORD SHUFFLE keyed on (doc_id, copy): the word
  *     MULTISET — token counts, vocabulary, heavy hitters, char mass —
  *     is preserved exactly (so token-level families scale perfectly
  *     linearly), while word-order shingles (3-grams, substring spans,
  *     minhash/simhash signatures) become unique per output document.
  *     Two earlier schemes failed measurably: the round-12 tail marker
  *     (`text || " cN"`) left copies ~0.95-Jaccard near-dups of each
  *     other (quadratic candidate pairs in mult), and the first
  *     round-13 fix (a per-copy token woven between every word) gave
  *     every copy-N document ultra-hot shared `(cN, w, cN)` shingles —
  *     whole copy classes collided in simhash/minhash bands and the sf1
  *     dedup bench blew up ~3×. Shuffling shares NOTHING across
  *     documents by construction. Near-dup structure lives in copy 0 at
  *     its original density (noted in SCALE.md: planted pair counts are
  *     constant under scaling, candidate/scan mass is what must scale
  *     linearly). n_chars is recomputed; double spaces survive the
  *     split/join round-trip as empty tokens, so char mass is exact.
  *   - BOTH decorrelation keys carry the table's key STRIDE as a
  *     generation-level salt (strides grow ×mult per level, so no two
  *     composition levels share one). A level-blind key aliases under
  *     composition — document copy (0, a) replays level-1's (a, 0)
  *     permutation on the same base text, and commutative sign-flip
  *     XORs alias (a,b)/(b,a) and cancel on the diagonal — measured on
  *     the pre-fix sf10 at exactly the predicted counts (45,008 dup
  *     text pairs, 180,000 twin embedding pairs; see the inline notes).
  *   - Embedding copies sign-flip on a 64-bit multiplicative mix of
  *     (dimension, copy) — every copy gets a DISTINCT flip pattern. The
  *     round-12 pattern `(j + 7·cp) mod 3` only depended on cp mod 3,
  *     so copies 3,6,9,… were byte-identical: ⌊mult/3⌋-sized groups of
  *     exact twins per vector, quadratic pair mass at mult ≥ 4. Flips
  *     are norm-preserving, and identical flips cancel inside a copy's
  *     dot products, so within-copy cosine structure is EXACTLY the
  *     original's (planted ANN neighborhoods replicate per copy) while
  *     cross-copy cosines shrink toward noise.
  */
object ScaleGen {

  /** Smallest power of 10 strictly greater than the column's max —
    * a human-readable collision-free stride at any composition depth. */
  private def stride(spark: SparkSession, path: String, key: String): Long = {
    val mx = spark.read.parquet(path)
      .agg(max(col(key).cast("long"))).head.getLong(0)
    var s = 1L
    while (s <= mx) s *= 10
    s
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset — a PARTIAL corpus
    // for targeted decade probes (e.g. documents,embeddings at sf1000,
    // where the full fact fan-out would not fit the scratch disk). The
    // scaling algebra per table is identical; skipped fact tables are
    // simply not written, and dimension tables always copy through so
    // any query touching only the subset runs unchanged.
    val only = args.lift(3)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // fail-fast on unknown subset names (round-15 advice): a typo like
    // 'document' used to be silently ignored, yielding a probe corpus
    // quietly missing the table — the probe then measures the wrong thing
    val knownFacts = Set("orders", "lineitem", "events", "documents",
      "embeddings")
    only.foreach { s =>
      val unknown = s -- knownFacts
      require(unknown.isEmpty,
        s"unknown table(s) in subset arg: ${unknown.mkString(", ")} — " +
          s"known fact tables: ${knownFacts.toSeq.sorted.mkString(", ")} " +
          "(dimension tables always copy through)")
    }
    def wanted(t: String) = only.forall(_(t))
    val spark = graft.Graft.builder("local[16]", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    val cp = spark.range(mult).toDF("cp")
    def fan(t: String) =
      spark.read.parquet(s"$src/$t.parquet").crossJoin(broadcast(cp))

    // orders and lineitem share the orderkey domain: one stride, shifted
    // in lockstep, keeps every lineitem pointing at its copy's order.
    // Strides are only computed for tables the subset will write (0 =
    // skipped): stride() scans the source table, wasted work otherwise.
    val ko = if (wanted("orders") || wanted("lineitem"))
      stride(spark, s"$src/orders.parquet", "o_orderkey") else 0L
    if (wanted("orders")) fan("orders")
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * ko)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    if (wanted("lineitem")) fan("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * ko)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val ke = if (wanted("events"))
      stride(spark, s"$src/events.parquet", "event_id") else 0L
    if (wanted("events")) fan("events")
      .withColumn("event_id", col("event_id") + col("cp") * ke)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val kd = if (wanted("documents"))
      stride(spark, s"$src/documents.parquet", "doc_id") else 0L
    if (wanted("documents")) fan("documents")
      .withColumn("text",
        when(col("cp") === 0, col("text"))
          // deterministic per-(doc, copy) word shuffle: sort words by
          // xxhash64(doc_id, cp, position, STRIDE) — multiset preserved,
          // order (hence every shingle) decorrelated from every other
          // doc. The stride term is the GENERATION-LEVEL salt (strides
          // grow ×mult per composition level, so no two levels share
          // one): without it, level-2 copy (0, a) re-shuffles the base
          // text with the exact key level-1 used for copy (a, 0) —
          // byte-identical text under two doc_ids. Measured on the
          // pre-fix sf10: 45,008 exact-dup text pairs = the predicted
          // 9 aliased (a,0)/(0,a) pairs × 5,000 base docs + the 8
          // planted dups (sf1, single-level, showed exactly the 8).
          .otherwise(array_join(
            transform(
              array_sort(
                zip_with(
                  split(col("text"), " "),
                  sequence(lit(0),
                    greatest(size(split(col("text"), " ")) - 1, lit(0))),
                  (w, i) => struct(
                    xxhash64(col("doc_id"), col("cp"), i, lit(kd)).as("k"),
                    w.as("w")))),
              s => s.getField("w")),
            " ")))
      .withColumn("doc_id", col("doc_id") + col("cp") * kd)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val kv = if (wanted("embeddings"))
      stride(spark, s"$src/embeddings.parquet", "vec_id") else 0L
    // xxhash64(j, cp, STRIDE) separates every (dimension, copy, LEVEL)
    // triple with a real 64-bit avalanche, so "hash mod 3" flips ~1/3 of
    // dimensions in a pattern unique to each copy (no residue-class
    // algebra can make two copies' patterns coincide, unlike the former
    // (j + 7·cp) mod 3). The stride term is the generation-level salt:
    // sign-flip COMPOSITION is an XOR of per-level patterns, and with a
    // level-blind key it commutes — copies (a,b)/(b,a) of one base
    // vector alias, and the diagonal (a,a) XORs its own pattern away,
    // reconstructing the ORIGINAL bytes under a fresh vec_id. Measured
    // on the pre-fix sf10: 180,000 exact-twin embedding pairs = the
    // predicted 90 aliased pairs (9 cross (a,0)/(0,a) + 36 symmetric
    // (a,b)/(b,a) + C(10,2) diagonal-vs-original) × 2,000 base vectors;
    // the single-level sf1 showed 0. Distinct per-level strides make
    // the XOR algebra collision-free at any composition depth.
    if (wanted("embeddings")) fan("embeddings")
      .withColumn("embedding",
        when(col("cp") === 0, col("embedding"))
          .otherwise(zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, j) => when(
              pmod(xxhash64(j, col("cp"), lit(kv)), lit(3)) === 0, -x)
              .otherwise(x))))
      .withColumn("vec_id", col("vec_id") + col("cp") * kv)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"SCALEGEN wrote ${mult}x of $src to $out " +
      s"(strides: orders=$ko events=$ke docs=$kd vecs=$kv)")
    spark.stop()
  }
}
