package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for NEAREST-CENTROID ASSIGNMENT: the
  * argmax-by-cosine of a vector against a config-sized broadcast
  * centroid array, as one fused per-row loop — the codegen twin of the
  * `aggregate(carr, …, cosineSim(vec, c.ce) > acc.cos …)` HOF fold in
  * graft.queries.Similarity.ivfNearest.
  *
  * Why native is load-bearing at scale: Spark HOF lambdas are
  * CodegenFallback — the ENTIRE projection containing the fold runs as
  * an interpreted operator outside whole-stage codegen (the round-18
  * tokenizer-tower finding, one family over). Lloyd assignment + index
  * assignment run this fold over every corpus vector × k centroids:
  * the round-20 sf1000v profile measured the assignment stages at
  * ~1,000 CPU-s warm inside q_sim_ivfpq (20 M vectors × 16 interpreted
  * cosineSim evaluations each, lambda-dispatched per centroid). The
  * fused loop hoists the query norm (bit-identical — see below), reads
  * the flattened centroid table directly, and keeps the whole
  * projection inside codegen.
  *
  * ARITHMETIC CONTRACT (load-bearing for every IVF oracle): per
  * centroid, the cosine is EXACTLY [[CosineSimilarity]]'s fold — one
  * j-ascending pass accumulating dot/‖v‖²/‖c‖² over
  * n = min(|vec|, dim) elements, each element widened to double,
  * `denom == 0 → 0.0` — and the pick is a strict `>` over centroids in
  * ARRAY ORDER (the caller supplies cid-ascending entries), so exact
  * ties keep the LOWEST cid: identical to the fold's
  * `when(cos > acc.cos, …)` and to the oracle's
  * `ORDER BY cos DESC, cid`. ‖v‖² is hoisted out of the centroid loop:
  * with the uniform `dim` the flat layout enforces, every centroid's
  * fold sums the same n query elements in the same order, so the
  * hoisted value is bit-identical to recomputing it per centroid.
  *
  * Inputs: `vec` array<float|double>; `cids` array<long> (the centroid
  * ids, in the order their slices appear); `ceflat` the centroid
  * vectors flattened in that same order (array<float|double>, length =
  * k·dim — a non-multiple fails loudly, a silent misindex would
  * corrupt every assignment). Empty `cids` emits −1, the fold's seed. */
final case class IvfArgmax(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_ivf_argmax"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(LongType, _),
          ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_ivf_argmax expects (array<float|double> vec, array<long> " +
          s"cids, array<float|double> ceflat), got ($a, $b, $c)")
    }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cids = b.asInstanceOf[ArrayData]
    val flat = c.asInstanceOf[ArrayData]
    val (vd, cd) = (isDouble(first), isDouble(third))
    val k = cids.numElements()
    if (k == 0) return -1L
    IvfArgmax.requireDense(flat.numElements(), k)
    val dim = flat.numElements() / k
    val n = math.min(vec.numElements(), dim)
    var na = 0.0
    var j = 0
    while (j < n) {
      val x = if (vd) vec.getDouble(j) else vec.getFloat(j).toDouble
      na += x * x
      j += 1
    }
    var best = Double.NegativeInfinity
    var bestCid = -1L
    var ci = 0
    while (ci < k) {
      val base = ci * dim
      var dot = 0.0
      var nb = 0.0
      j = 0
      while (j < n) {
        val x = if (vd) vec.getDouble(j) else vec.getFloat(j).toDouble
        val y = if (cd) flat.getDouble(base + j)
          else flat.getFloat(base + j).toDouble
        dot += x * y
        nb += y * y
        j += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      if (cos > best) { best = cos; bestCid = cids.getLong(ci) }
      ci += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val k = ctx.freshName("k"); val dim = ctx.freshName("dim")
      val n = ctx.freshName("n"); val na = ctx.freshName("na")
      val j = ctx.freshName("j"); val ci = ctx.freshName("ci")
      val base = ctx.freshName("base"); val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      val cos = ctx.freshName("cos"); val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val getV = (i: String) =>
        if (isDouble(first)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getC = (i: String) =>
        if (isDouble(third)) s"$c.getDouble($i)" else s"(double) $c.getFloat($i)"
      s"""
         |int $k = $b.numElements();
         |long $bestCid = -1L;
         |if ($k > 0) {
         |  graft.functions.IvfArgmax.requireDense($c.numElements(), $k);
         |  int $dim = $c.numElements() / $k;
         |  int $n = java.lang.Math.min($a.numElements(), $dim);
         |  double $na = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $x = ${getV(j)};
         |    $na += $x * $x;
         |  }
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    int $base = $ci * $dim;
         |    double $dot = 0.0; double $nb = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      double $x = ${getV(j)};
         |      double $y = ${getC(s"$base + $j")};
         |      $dot += $x * $y;
         |      $nb += $y * $y;
         |    }
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    double $cos = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |    if ($cos > $best) { $best = $cos; $bestCid = $b.getLong($ci); }
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IvfArgmax = copy(first = f, second = s, third = t)
}

object IvfArgmax {

  def requireDense(flatLen: Int, k: Int): Unit =
    if (flatLen <= 0 || flatLen % k != 0)
      throw new IllegalArgumentException(
        s"graft_ivf_argmax: ceflat length $flatLen is not a positive " +
          s"multiple of k = $k centroids — slices must be uniform and dense")

  val ident: FunctionIdentifier = FunctionIdentifier("graft_ivf_argmax")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IvfArgmax].getName, null, "graft_ivf_argmax",
    "graft_ivf_argmax(vec, cids, ceflat) - nearest-centroid id by cosine",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c) => IvfArgmax(a, b, c)
    case other => throw new IllegalArgumentException(
      s"graft_ivf_argmax expects 3 arguments, got ${other.size}")
  }
}
