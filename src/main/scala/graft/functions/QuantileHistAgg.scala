package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions}

/** MERGEABLE QUANTILE SKETCH — a deterministic fixed-boundary histogram
  * as a partial+final `Aggregator` pair: [[QuantileHistAgg]] builds a
  * sketch from raw values (the update path), [[QuantileHistUnionAgg]]
  * unions already-built sketches (the merge path, exposed as its own
  * aggregate so PERSISTED per-shard sketches can roll up day-2 — the
  * q_agg_sketch_union economics applied to percentiles).
  *
  * Why fixed boundaries: GK/t-digest/KLL sketches are merge-ORDER-
  * dependent (their compaction decisions depend on insertion sequence),
  * so two equally-correct executions of the same query can emit
  * different sketches — fatal for a hash-checked oracle and for any
  * pipeline that diffs day-over-day artifacts. A fixed-boundary
  * histogram's merge is exact integer vector addition: associative,
  * commutative, parallelism-invariant, and the quantile read
  * (smallest bucket whose cumulative count reaches ⌈q·n⌉) is exact
  * integer arithmetic both engines state identically. The trade is
  * resolution — quantiles land on bucket boundaries (width-bounded
  * error, configured, never data-dependent) instead of exact order
  * statistics; that is the production trade every fixed-histogram
  * metrics system (HDR-histogram class) ships with.
  *
  * Scale shape: the sketch is a config-sized long vector (buckets ≤
  * 4096 = 32 KB); partial aggregation runs map-side, the exchange
  * carries one vector per (group × partition), and a 100 TB fact rolls
  * up to O(groups) rows — the quantile read then never touches raw
  * data. Bucketing is `min(buckets−1, max(0, ⌊v / width⌋))` — the
  * IEEE double divide+floor is bit-identical cross-engine, and the
  * clamp makes out-of-domain mass an explicit boundary bucket rather
  * than an error. */
final class QuantileHistAgg(buckets: Int, width: Double)
    extends Aggregator[Double, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](buckets)

  override def reduce(b: Array[Long], v: Double): Array[Long] = {
    val i = math.min(buckets - 1L,
      math.max(0L, math.floor(v / width).toLong)).toInt
    b(i) += 1L
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Sketch-of-sketches: exact elementwise sum of histogram vectors — the
  * union half of the pair. Input rows are sketches (array<long>, all
  * the same configured length); a length mismatch means two different
  * sketch configs were unioned — fail loudly, a silent truncation
  * would corrupt every quantile downstream. */
final class QuantileHistUnionAgg(buckets: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](buckets)

  override def reduce(b: Array[Long], s: Seq[Long]): Array[Long] = {
    require(s.length == buckets,
      s"quantile sketch union: got a ${s.length}-bucket sketch, " +
        s"this union is configured for $buckets")
    var i = 0
    val it = s.iterator
    while (it.hasNext) { b(i) += it.next(); i += 1 }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object QuantileHistAgg {
  /** The catalog's standard config: 4096 buckets of width 32 covers
    * [0, 131072) — every TPC-H lineitem extendedprice at any sf (the
    * price formula is sf-independent), with the top bucket catching
    * any overflow explicitly. */
  val Buckets: Int = 4096
  val Width: Double = 32.0

  /** Column-API entry point: `sketch($"v")` → array<long> histogram. */
  def sketch(v: Column): Column =
    functions.udaf(new QuantileHistAgg(Buckets, Width), Encoders.scalaDouble)
      .apply(v)

  /** Column-API entry point: `union($"sk")` → exact vector-sum union. */
  def union(sk: Column): Column =
    functions.udaf(new QuantileHistUnionAgg(Buckets),
      ExpressionEncoder[Seq[Long]]()).apply(sk)
}
