package graft

import graft.queries.Dedup
import org.apache.spark.sql.Row

/** Recall/precision pins for the approximate dedup operators, measured
  * against the exact n-gram-Jaccard pairs (which are themselves DuckDB-
  * oracle-checked). The synthetic corpus plants near-duplicate pairs at
  * Jaccard ≈ 0.96–0.99; with 8 bands × 2 rows the LSH miss probability at
  * that similarity is < 1e-10, so exact-recall assertions are safe. */
class DedupSpec extends SparkSpec {

  private def pairSet(rows: Array[Row]): Set[(Long, Long)] =
    rows.map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactPairs: Set[(Long, Long)] =
    pairSet(Dedup.qDedupNgramJaccard.run(spark, sf)
      .select("doc_a", "doc_b").collect())

  lazy val lshPairs: Set[(Long, Long)] =
    pairSet(Dedup.qDedupMinhashLsh.run(spark, sf)
      .select("doc_a", "doc_b").collect())

  test("planted near-dups exist in the corpus") {
    assert(exactPairs.nonEmpty)
  }

  test("minhash LSH recall of exact same-language pairs is 1.0") {
    assert(exactPairs.subsetOf(lshPairs),
      s"missed: ${exactPairs.diff(lshPairs)}")
  }

  test("minhash LSH pairs are all Jaccard-verified (precision 1.0)") {
    // by construction the query verifies 2*|I| >= |U|; re-check the
    // emitted counts for internal consistency
    val rows = Dedup.qDedupMinhashLsh.run(spark, sf).collect()
    assert(rows.forall(r => 2 * r.getInt(2) >= r.getInt(3)))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("minhash LSH is deterministic across runs") {
    assert(lshPairs == pairSet(Dedup.qDedupMinhashLsh.run(spark, sf)
      .select("doc_a", "doc_b").collect()))
  }

  test("simhash finds every identical-signature pair and respects the cutoff") {
    val rows = Dedup.qDedupSimhash.run(spark, sf).collect()
    assert(rows.forall(_.getLong(2) <= 4))
    assert(rows.nonEmpty)
    // pairs at Hamming <= 3 are pigeonhole-guaranteed by 4x16 blocking;
    // the planted 0-distance pairs must therefore appear
    val h0 = rows.filter(_.getLong(2) == 0)
    assert(h0.nonEmpty)
  }

  test("exact dedup removes nothing on a duplicate-free corpus") {
    val removed = Dedup.qDedupExact.run(spark, sf)
      .select("n_removed").collect().map(_.getLong(0)).sum
    assert(removed == 0)
  }
}
