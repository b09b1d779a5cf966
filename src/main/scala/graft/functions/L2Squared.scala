package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for SQUARED L2 distance over two numeric
  * arrays — the hot inner loop of product-quantization encoding and ADC
  * lookup-table construction (graft.queries.Similarity.pqDists), emitted
  * straight into whole-stage codegen as a primitive double loop.
  *
  * ARITHMETIC CONTRACT (load-bearing for the PQ oracles): the loop is
  * bit-identical to the declarative fold it replaces —
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)` — i.e. a
  * 0.0-seeded, index-ascending sum of per-element squared differences
  * in IEEE double. DuckDB's `list_reduce(list_transform(list_zip(…)))`
  * computes the same chain, so swapping the interpreted HOF for this
  * expression changes NOTHING about the hash-checked results — only the
  * per-row cost (the q_sim_pq family evaluates it n×k×subspaces times;
  * the HOF tower allocated and dispatched per element). Elements may be
  * float32 (raw embeddings) or float64 (the unit-normalized corpus):
  * each side widens to double exactly, matching the fold's casts.
  *
  * Over length-mismatched inputs the loop runs the common prefix (the
  * zip_with semantics for the well-formed same-length case; slices here
  * are constructed equal-length by the caller). */
final case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_l2sq"

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val lf = elemIsDouble(left); val rf = elemIsDouble(right)
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) xs.getDouble(i) else xs.getFloat(i).toDouble
      val y = if (rf) ys.getDouble(i) else ys.getFloat(i).toDouble
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      def get(arr: String, fromDouble: Boolean) =
        if (fromDouble) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, elemIsDouble(left))} -
         |    ${get(b, elemIsDouble(right))};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  val ident: FunctionIdentifier = FunctionIdentifier("graft_l2sq")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[L2Squared].getName, null, "graft_l2sq",
    "graft_l2sq(a, b) - squared L2 distance of two numeric arrays",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => L2Squared(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_l2sq expects 2 arguments, got ${other.size}")
  }
}
