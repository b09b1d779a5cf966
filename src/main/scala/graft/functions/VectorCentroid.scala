package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn, functions}

/** Custom UDAF (the `Aggregator` surface from SURVEY.md §2.B): per-group
  * centroid of `array<float>` embeddings.
  *
  * Accumulation is exact 1e-6 fixed point (each element rounded to a
  * micro-scaled Long, summed in Long): merge order across partitions can
  * never change the result, which both makes the operator deterministic
  * at any parallelism and lets a DuckDB decimal-sum oracle check it
  * bit-for-bit. Catalyst runs it as a partial (per-partition reduce) +
  * final (merge) aggregate — one tiny shuffle of (dim+1) longs per group.
  */
final case class CentroidBuf(sums: Array[Long], n: Long)

final class VectorCentroid extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  private def micros(v: Double): Long =
    new java.math.BigDecimal(v).movePointRight(6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)

  private def requireDim(expected: Int, got: Int): Unit =
    if (expected != got) throw new IllegalArgumentException(
      s"VectorCentroid: ragged embedding dimensions ($expected vs $got); " +
        "centroid over mixed-dimension vectors is undefined — filter or " +
        "pad upstream")

  override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
    val sums = if (b.sums.isEmpty) new Array[Long](a.length) else b.sums
    requireDim(sums.length, a.length) // fail fast, never silently truncate
    var i = 0
    while (i < a.length) {
      sums(i) += micros(a(i).toDouble); i += 1
    }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    // the zero buffer is identified by n == 0, not by empty sums: a buffer
    // that accumulated zero-length input vectors has empty sums with n > 0
    // and must still merge (and still hit requireDim against a non-empty
    // side) rather than be silently dropped
    if (x.n == 0) y
    else if (y.n == 0) x
    else {
      requireDim(x.sums.length, y.sums.length) // same rule as reduce
      val sums = new Array[Long](x.sums.length)
      var i = 0
      while (i < sums.length) { sums(i) = x.sums(i) + y.sums(i); i += 1 }
      CentroidBuf(sums, x.n + y.n)
    }
  }

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) Array.emptyDoubleArray
    else b.sums.map(s => s / 1e6 / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object VectorCentroid {
  /** Untyped-Column form for `DataFrame.agg`. */
  def centroid(c: Column): Column =
    functions.udaf(new VectorCentroid(), ExpressionEncoder[Array[Float]]())
      .apply(c)
}
