package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, functions}

/** Bounded-heap per-group top-k `Aggregator` — the scale-path alternative
  * to the `row_number() <= k` window pattern.
  *
  * The window formulation shuffles EVERY row to its group's partition and
  * sorts the whole group (O(n log n), shuffle payload = n rows). This
  * aggregator is a partial+final aggregate: each map task keeps a k-bounded
  * buffer per group, so the exchange carries at most k rows per group per
  * partition and no sort ever sees more than the buffered candidates —
  * O(n log k) work, shuffle payload ≈ k × partitions rows. On a 100 TB
  * fact with a handful of groups that is the difference between shuffling
  * the table and shuffling kilobytes.
  *
  * Ranking is (score DESC, id ASC) — the unique id tie-break keeps the
  * result deterministic at any parallelism, which is what lets a DuckDB
  * window-function oracle check this operator bit-for-bit.
  */
final case class TopKRow(score: Double, id: Long)

final class TopKAgg(k: Int) extends Aggregator[TopKRow, Seq[TopKRow], Seq[TopKRow]] {

  private val ord: Ordering[TopKRow] =
    Ordering.by((r: TopKRow) => (-r.score, r.id))

  // buffers stay sorted and k-bounded; insertion is O(k) on a tiny array —
  // cheaper in practice than heap bookkeeping for the k this is meant for
  private def bounded(rows: Seq[TopKRow]): Seq[TopKRow] =
    rows.sorted(ord).take(k)

  override def zero: Seq[TopKRow] = Vector.empty

  override def reduce(b: Seq[TopKRow], a: TopKRow): Seq[TopKRow] =
    if (b.size == k && ord.lteq(b.last, a)) b else bounded(b :+ a)

  override def merge(x: Seq[TopKRow], y: Seq[TopKRow]): Seq[TopKRow] =
    if (x.isEmpty) y else if (y.isEmpty) x else bounded(x ++ y)

  override def finish(b: Seq[TopKRow]): Seq[TopKRow] = b

  override def bufferEncoder: Encoder[Seq[TopKRow]] =
    ExpressionEncoder[Seq[TopKRow]]()
  override def outputEncoder: Encoder[Seq[TopKRow]] =
    ExpressionEncoder[Seq[TopKRow]]()
}

object TopKAgg {
  /** Untyped-Column form: `topK(3, score, id)` → array<struct<score,id>>.
    * (A product input encoder consumes one flattened column per field.) */
  def topK(k: Int, score: Column, id: Column): Column =
    functions.udaf(new TopKAgg(k), ExpressionEncoder[TopKRow]())
      .apply(score, id)
}
