package graft

import graft.queries.Curation
import org.apache.spark.sql.functions._

/** Planted-case pins for the curation operators (the judged queries are
  * oracle-checked on the synthetic corpus; these prove the operator
  * semantics on adversarial inputs the corpus may not contain). */
class CurationSpec extends SparkSpec {

  test("decontamination flags a planted exact 5-gram leak and nothing else") {
    import spark.implicits._
    val docs = Seq(
      // eval doc (id 1): the benchmark
      (1L, "alpha bravo charlie delta echo foxtrot", "eval_src"),
      // leaked train doc: contains the eval 5-gram "bravo…foxtrot"
      (2L, "x y bravo charlie delta echo foxtrot z", "train_src"),
      // clean train doc: shares words but no 5-gram
      (3L, "alpha bravo charlie zulu delta echo", "train_src"),
      // too short to carry any 5-gram
      (4L, "alpha bravo", "train_src"),
    ).toDF("doc_id", "text", "source")
    val flagged = Curation.contaminated(docs, col("doc_id") === 1L)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L), s"expected only the planted leak: $flagged")
  }

  test("decontamination never flags eval docs themselves") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "s"),
      (2L, "a b c d e f", "s"), // identical text, both eval
    ).toDF("doc_id", "text", "source")
    val flagged = Curation.contaminated(docs, col("doc_id").isin(1L, 2L))
    assert(flagged.count() == 0)
  }

  test("packing is strictly greedy in doc order and per-shard independent") {
    import spark.implicits._
    // shard 0: 100+100+100 tokens at budget 150 -> each doc closes the
    // bin for the next (100+100 > 150), bins 0,1,2; shard 1: an
    // oversized doc gets its own bin, the next doc opens a fresh one
    val docs = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L),
      (10L, 1L, 999L), (11L, 1L, 1L),
    ).toDF("doc_id", "shard", "n_tok")
    val bins = Curation.packSequences(docs, budget = 150)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L),
      s"got $bins")
  }

  test("greedy packing never exceeds the budget (except a lone oversized doc)") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), (graft.queries.Scramble(col("doc_id")) % 8).as("shard"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
          .as("n_tok"))
    val budget = 256
    val maxDoc = docs.agg(max("n_tok")).head().getLong(0)
    val maxBin = Curation.packSequences(docs, budget)
      .groupBy("shard", "bin").agg(sum("n_tok").as("t"))
      .agg(max("t")).head().getLong(0)
    assert(maxBin <= math.max(budget, maxDoc),
      s"bin of $maxBin tokens breaks the strict greedy bound")
    // multi-doc bins are strictly within budget — only a lone oversized
    // doc may exceed it
    val overfullMulti = Curation.packSequences(docs, budget)
      .groupBy("shard", "bin")
      .agg(sum("n_tok").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > budget && col("n") > 1)
      .count()
    assert(overfullMulti == 0, s"$overfullMulti multi-doc bins over budget")
  }

  test("offset-binning variant bins by starting offset (streaming closed form)") {
    import spark.implicits._
    // same planted input as the greedy test: offset binning assigns by
    // floor(tokens-before / budget) — doc 2 lands in bin 0 (offset 100),
    // overflowing it to 200 tokens, the documented overflow-by-one-doc
    val docs = Seq(
      (1L, 0L, 100L), (2L, 0L, 100L), (3L, 0L, 100L),
      (10L, 1L, 999L), (11L, 1L, 1L),
    ).toDF("doc_id", "shard", "n_tok")
    val bins = Curation.packSequencesByOffset(docs, budget = 150)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 10L -> 0L, 11L -> 6L),
      s"got $bins")
  }

  test("PII redaction scrubs emails/phones/IPs and leaves look-alikes alone") {
    import spark.implicits._
    val cases = Seq(
      // each class mid-text, including a subdomained email
      ("mail me at jo.ann_x%9@dev.mail.example today",
       "mail me at <EMAIL> today"),
      ("dial 555-867-5309 or 555-000-1234 twice",
       "dial <PHONE> or <PHONE> twice"),
      ("node 192.168.0.1 and 10.0.255.42 are up",
       "node <IP> and <IP> are up"),
      // all three classes in one string, adjacent punctuation-free
      ("a@b.co 555-111-2222 1.2.3.4", "<EMAIL> <PHONE> <IP>"),
      // look-alikes that must survive: no-TLD at-sign, 3-octet version,
      // non-555 number shape, word-boundary-violating digit runs
      ("v1.2.3 of a@b stays; call 444-123-4567; id 1555-123-45678",
       "v1.2.3 of a@b stays; call 444-123-4567; id 1555-123-45678"),
      ("plain text with no pii at all", "plain text with no pii at all"),
    ).toDF("s", "expected")
    val bad = cases
      .withColumn("got", graft.queries.Curation.redactPii(col("s")))
      .filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, s"redaction drift:\n${bad.mkString("\n")}")
  }

  test("PII redaction is idempotent and counts match inserted placeholders") {
    // over the real planted corpus: redact(redact(x)) == redact(x) (the
    // placeholders contain no PII shapes), and each pattern's match
    // count equals the number of its placeholders in the redacted text
    // (replacement neither merges nor drops matches)
    val docs = Tables(spark, sf).documents
      .select(graft.queries.Curation.plantedPiiCol.as("pii"))
      .select(col("pii"),
        graft.queries.Curation.redactPii(col("pii")).as("red"))
    val bad = docs.filter(
      graft.queries.Curation.redactPii(col("red")) =!= col("red")).count()
    assert(bad == 0, s"$bad rows not idempotent under redaction")
    val drift = docs.select(
      (regexp_count(col("pii"), lit(graft.queries.Curation.EmailPat)) =!=
        size(split(col("red"), "<EMAIL>", -1)) - 1).as("e"),
      (regexp_count(col("pii"), lit(graft.queries.Curation.PhonePat)) =!=
        size(split(col("red"), "<PHONE>", -1)) - 1).as("p"),
      (regexp_count(col("pii"), lit(graft.queries.Curation.IpPat)) =!=
        size(split(col("red"), "<IP>", -1)) - 1).as("i"))
      .filter(col("e") || col("p") || col("i")).count()
    assert(drift == 0, s"$drift rows where match counts != placeholder counts")
  }

  test("native 5-gram hashes equal the declarative grams5 formulation") {
    // graft_shingle_hashes(text, 5) must reproduce
    // transform(grams5(text), xxhash64) as a set, or decontamination's
    // broadcast gram keys silently shift
    val docs = Tables(spark, sf).documents
    val hof = docs.select(col("doc_id"),
      transform(Curation.grams5(col("text")), x => xxhash64(x)).as("hs"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val native = docs.select(col("doc_id"),
      graft.functions.GraftFunctions.shingleHashes(col("text"), 5).as("hs"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    assert(native.sameElements(hof),
      "native 5-gram hashes diverged from the declarative formulation")
  }
}
