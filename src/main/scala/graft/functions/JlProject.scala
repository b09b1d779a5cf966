package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the 8-dim Johnson–Lindenstrauss sign
  * projection (round-18 twin of `Similarity.jlProjected`): per output
  * dim d, a 0.0-seeded index-ascending IEEE-double fold of
  * `x(j) · plane(d, j)` where
  * `plane(d, j) = ((4096 + 64·d + j)·1103515245 + 12345 mod 2³¹) / 2³¹ − 0.5`
  * — the LCG pseudo-plane family, offsets disjoint from the LSH
  * bucketer's.
  *
  * Why native: the HOF formulation (8 × aggregate(transform(…))) is
  * exactly the per-element arithmetic — but it evaluates through boxed
  * lambda dispatch outside whole-stage codegen, and the post-TopKAgg
  * q_embed_project profile showed the interpreted fold family carrying
  * most of the query's ~3900 CPU-s at 20 M vectors. This expression is
  * the identical IEEE operation sequence (same fold order, same LCG
  * integer algebra, elements widened exactly) as one fused codegen
  * loop; SimilaritySpec pins bit-equality against the HOF tower, and
  * the DuckDB oracle fold (`jlProjectSql`) is untouched. */
final case class JlProject(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_jl_project"

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jl_project expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    JlProject.project(input.asInstanceOf[ArrayData], isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JlProject.project($a, $isDouble);")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}

object JlProject {

  /** The fused fold both eval paths share. Arithmetic contract: per
    * dim, terms accumulate index-ascending onto a 0.0 seed; the plane
    * value is computed in the HOF's exact order — int offset sum,
    * widen to long, LCG multiply-add, positive `%`, widen to double,
    * divide by 2.147483648e9, subtract 0.5 — so every intermediate is
    * bit-identical to the `aggregate(transform(...))` tower and to the
    * DuckDB `list_reduce` rendering. */
  def project(v: ArrayData, isDouble: Boolean): GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Double](8)
    var d = 0
    while (d < 8) {
      val off = 4096 + d * 64
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble
        val lcg = ((off + j).toLong * 1103515245L + 12345L) % 2147483648L
        acc += x * (lcg.toDouble / 2.147483648e9 - 0.5)
        j += 1
      }
      out(d) = acc
      d += 1
    }
    new GenericArrayData(out)
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_jl_project")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JlProject].getName, null, "graft_jl_project",
    "graft_jl_project(vec) - 8-dim LCG-plane JL projection of a vector",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => JlProject(a)
    case other => throw new IllegalArgumentException(
      s"graft_jl_project expects 1 argument, got ${other.size}")
  }
}
