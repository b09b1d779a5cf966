package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the random-hyperplane LSH bucket of an
  * `array<float>` embedding — `nBits` sign bits of dot products against
  * deterministic LCG-generated hyperplanes, fused into one primitive
  * double loop inside whole-stage codegen.
  *
  * Replaces the interpreted `aggregate(sequence, …, zip_with(…))` HOF
  * tower, which evaluated nBits × 64 lambdas per row with no codegen and
  * no common-subexpression elimination (~100× slower — the round-2
  * bench's worst interpreter hotspot). The plane coefficients are
  * IDENTICAL to the HOF formulation — coef(j,i) = LCG(j·64+i) mapped to
  * [-0.5, 0.5) — and the fold order (i ascending within j ascending, bit
  * j=0 most significant) matches exactly, so every vector lands in the
  * same bucket as before: recall pins and multi-probe neighborhoods are
  * unchanged. Dimensions beyond 64 are ignored (the planes are 64-dim,
  * matching the corpus).
  */
final case class HyperplaneBucket(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_bucket"

  @transient private lazy val planes: Array[Double] =
    HyperplaneBucket.planes(nBits)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), 64)
    val p = planes
    var acc = 0L
    var j = 0
    while (j < nBits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += xs.getFloat(i).toDouble * p(j * 64 + i)
        i += 1
      }
      acc = acc * 2 + (if (dot > 0) 1L else 0L)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $acc = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * $p[$j * 64 + $i];
         |  }
         |  $acc = $acc * 2 + (($dot > 0) ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucket = copy(child = newChild)
}

object HyperplaneBucket {

  /** Plane coefficients, row-major [j][i] flattened: LCG(j·64+i) mapped
    * to [-0.5, 0.5). Pure integer recurrence — bit-identical on any JVM,
    * any engine, any cluster. */
  def planes(nBits: Int): Array[Double] = Array.tabulate(nBits * 64) { k =>
    ((k.toLong * 1103515245L + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_lsh_bucket")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HyperplaneBucket].getName, null, "graft_lsh_bucket",
    "graft_lsh_bucket(embedding, nBits) - random-hyperplane LSH bucket of a float array",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, IntArg(n)) => HyperplaneBucket(a, n)
    case other => throw new IllegalArgumentException(
      "graft_lsh_bucket expects (array<float>, constant integer), got " +
        other.mkString(", "))
  }
}
