package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.GraftColumnBridge.{column => exprCol, expression => colExpr}
import org.apache.spark.sql.types.BinaryType

/** The bloom build/probe pair used by every runtime-filter site
  * (q_join_bloom, q_dedup_incremental, q_stream_dedup_snapshot) —
  * defined ONCE (the Scramble discipline: hand-maintained copies of
  * internal-Catalyst plumbing WILL drift on the next Spark upgrade or
  * sizing change).
  *
  * Build is a distributed partial+final aggregate; only the KB-scale
  * serialized sketch crosses the driver. An EMPTY input yields a null
  * sketch; `mightContain` maps that to a literal FALSE — the "nothing
  * is in the set" reading — rather than passing null bytes to the
  * Catalyst probe, whose tri-valued NULL would make BOTH
  * `filter(probe)` and `filter(!probe)` drop every row (a negated
  * probe site, e.g. q_stream_dedup_snapshot's admit-fast path, would
  * silently admit nothing instead of everything). The probe is the
  * built-in codegen expression (never a ScalaUDF — it runs pre-shuffle
  * on the hottest scan, PlanSpec-gated at the join site). */
object BloomProbe {

  /** Distributed sketch of `key`'s values in `df`. */
  def sketch(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] =
    df.select(exprCol(new BloomFilterAggregate(
        new XxHash64(Seq(colExpr(key))), expectedItems)
      .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Codegen membership probe of `key` against a serialized sketch;
    * a null sketch (empty build input) is definitionally FALSE. */
  def mightContain(sketchBytes: Array[Byte], key: Column): Column =
    if (sketchBytes == null) org.apache.spark.sql.functions.lit(false)
    else exprCol(new BloomFilterMightContain(
      Literal(sketchBytes, BinaryType),
      new XxHash64(Seq(colExpr(key)))))

  /** Union of two serialized sketches — the nightly index-maintenance
    * operation: a bloom over A ∪ B is the bitwise OR of blooms over A
    * and B when both were sized identically (same expectedItems ⇒ same
    * bit width and hash count; `mergeInPlace` enforces compatibility).
    * Null/empty operands are the empty-set sketch — the other side
    * passes through. KB-scale work, never touches the indexed data. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || a.isEmpty) return b
    if (b == null || b.isEmpty) return a
    val fa = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(a))
    val fb = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}
