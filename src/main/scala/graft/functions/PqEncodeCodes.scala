package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for PRODUCT-QUANTIZATION ENCODING: the
  * 8 nearest-code ids of a vector's 8 subspace slices against a
  * config-sized codebook, as one fused per-row loop — the map-only
  * replacement for the explode → broadcast-join → two-hash-aggregation
  * encode plan (graft.queries.Similarity.pqEncoded).
  *
  * Why map-only is load-bearing at scale: the aggregate formulation
  * materializes n×subs×k distance rows (2.56 B at sf1000 / 20 M
  * vectors) and pushes them through two hash aggregations whose tables
  * exceed executor memory — PqProfile measured the encode stage at
  * 260 s (×41 per decade) with the family's 167 GB spill, the named
  * session-rot trigger. Encoding against a codebook that is CONFIG
  * -sized (8 subspaces × ≤16 codes) must not move the corpus: the
  * codebook rides as one broadcast row and every vector encodes in a
  * single codegen'd loop — no explode, no join, no aggregate, no
  * exchange, no allocation beyond the 8-int result.
  *
  * ARITHMETIC CONTRACT (load-bearing for the PQ oracles): per
  * (sub, code), the distance is the L2Squared fold — a 0.0-seeded,
  * index-ascending IEEE-double sum of squared element differences,
  * bit-identical to `graft_l2sq(slice(v), cslice)` and to DuckDB's
  * `list_reduce(list_transform(list_zip(…)))` — and the argmin keeps
  * the LOWEST code on exact ties (strict `<` over codes iterated in
  * ascending order), matching both the former `min(struct(dist, code))`
  * aggregate and the oracle's `ORDER BY dist ASC, code ASC`. Swapping
  * the plan shape changes NOTHING about the hash-checked results.
  *
  * Inputs: `vec` is the embedding (array of float32 or float64 —
  * each element widens to double exactly, as in [[L2Squared]]);
  * `cbflat` is the codebook flattened in (sub, code, dim) order to
  * array<double> with DENSE ascending codes per sub (the pqCodebook
  * contract) and equal k per sub — k is derived from its length.
  * A vector shorter than subs×dim encodes its available prefix per
  * slice (the `slice`+common-prefix semantics of the former plan). */
final case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  private val subs = PqEncodeCodes.Subs
  private val dim = PqEncodeCodes.Dim

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  // Analysis-time contract (closes the r17 ADVICE nit): a non-float/double
  // vec would be silently misread via getFloat, and a non-double codebook
  // would misdecode — fail analysis instead, like ShingleHashes/MinHash.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_pq_encode expects (array<float|double> vec, array<double> " +
          s"cbflat), got ($l, $r)")
    }

  private def vecIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val vd = vecIsDouble
    val vn = v.numElements()
    PqEncodeCodes.requireDense(cb.numElements())
    val k = cb.numElements() / (subs * dim)
    val codes = new Array[Int](subs)
    var s = 0
    while (s < subs) {
      val base = s * dim
      // common-prefix bound of this slice (mirrors slice() semantics)
      val jn = math.max(0, math.min(dim, vn - base))
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cbase = (s * k + c) * dim
        var acc = 0.0
        var j = 0
        while (j < jn) {
          val x = if (vd) v.getDouble(base + j) else v.getFloat(base + j).toDouble
          val d = x - cb.getDouble(cbase + j)
          acc += d * d
          j += 1
        }
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val vn = ctx.freshName("vn"); val jn = ctx.freshName("jn")
      val base = ctx.freshName("base"); val cbase = ctx.freshName("cbase")
      val best = ctx.freshName("best"); val bd = ctx.freshName("bd")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val codes = ctx.freshName("codes")
      val getV =
        if (vecIsDouble) s"$a.getDouble($base + $j)"
        else s"(double) $a.getFloat($base + $j)"
      s"""
         |int $vn = $a.numElements();
         |graft.functions.PqEncodeCodes.requireDense($b.numElements());
         |int $k = $b.numElements() / ${subs * dim};
         |int[] $codes = new int[$subs];
         |for (int $s = 0; $s < $subs; $s++) {
         |  int $base = $s * $dim;
         |  int $jn = java.lang.Math.max(0,
         |    java.lang.Math.min($dim, $vn - $base));
         |  int $best = 0;
         |  double $bd = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $cbase = ($s * $k + $c) * $dim;
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $jn; $j++) {
         |      double $d = $getV - $b.getDouble($cbase + $j);
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bd) { $bd = $acc; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

object PqEncodeCodes {

  /** Runtime guard shared by both eval paths: a codebook whose length is
    * not a whole number of (sub, code) blocks would silently misindex
    * (k from integer division) — fail loudly instead. One modulo per row,
    * negligible against the subs×k×dim fold it guards. */
  /** Block size of one (sub, code) codebook entry group: every dense
    * codebook is a whole number of these. Shared by requireDense (both
    * eval paths) and the codegen template so the guard cannot drift from
    * the layout if subs/dim ever change. */
  val Subs: Int = 8
  val Dim: Int = 8
  val SubsDim: Int = Subs * Dim // single source for the instance AND the guard

  def requireDense(cbLen: Int): Unit =
    if (cbLen <= 0 || cbLen % SubsDim != 0)
      throw new IllegalArgumentException(
        s"graft_pq_encode: cbflat length $cbLen is not a positive multiple " +
          s"of subs*dim = $SubsDim — codebook must be dense in (sub, code, dim) order")

  val ident: FunctionIdentifier = FunctionIdentifier("graft_pq_encode")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncodeCodes].getName, null, "graft_pq_encode",
    "graft_pq_encode(vec, cbflat) - per-subspace nearest PQ code ids",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => PqEncodeCodes(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_pq_encode expects 2 arguments, got ${other.size}")
  }
}
