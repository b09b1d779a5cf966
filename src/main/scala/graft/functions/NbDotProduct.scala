package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Naive-Bayes integer dot product:
  * Σ over a document's tokens of the token's model weight (binary
  * search in a SORTED vocabulary; out-of-vocabulary tokens contribute
  * exactly 0 — the top-V cap's contract), as one fused per-row loop.
  *
  * This is the graft_pq_encode pattern applied to the distilled
  * classifier (round-18; the r17 verdict's q_text_classify profiling
  * target): the model is CONFIG-sized (V ≤ 512 weights), so inference
  * against it must not move the corpus. The former plan exploded every
  * token (≈2 B rows at sf1000v), hash-joined the model, aggregated back
  * to doc grain, and then JOINED THE CORPUS BACK to itself by doc_id —
  * two corpus-keyed exchanges and a second full tokenization for a
  * per-row fold's worth of information. With the model riding as two
  * broadcast array columns (sorted tok list + aligned weights), every
  * document scores in a single codegen'd loop: ~|ws|·log₂(V) UTF8
  * comparisons per row, no explode, no join, no aggregate, no exchange.
  *
  * ARITHMETIC CONTRACT: the result is an exact 64-bit integer sum of
  * micro-log-odds weights — addition order is immaterial (integer, no
  * rounding), so the fold is bit-identical to the former
  * explode → join → SUM plan and to the DuckDB oracle's unnest + SUM at
  * any parallelism. Binary search requires `wtoks` sorted ascending in
  * UTF8 byte order with UNIQUE entries — callers build it with
  * `sort_array(collect_list(struct(tok, w)))` over the (grouped-by-tok)
  * weight table, which guarantees both. */
final case class NbDotProduct(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_nb_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _),
          ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_nb_dot expects (array<string> tokens, array<string> vocab, " +
          s"array<long> weights), got ($a, $b, $c)")
    }

  override protected def nullSafeEval(ws: Any, toks: Any, vals: Any): Any =
    NbDotProduct.dot(ws.asInstanceOf[ArrayData], toks.asInstanceOf[ArrayData],
      vals.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.NbDotProduct.dot($a, $b, $c);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NbDotProduct =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NbDotProduct {

  /** The per-row fold both eval paths share: for each token, binary
    * search the sorted vocabulary, add the aligned weight on a hit.
    * Null vocabulary entries cannot occur (grouped-by-tok origin);
    * null tokens inside `ws` contribute 0 like any OOV token. */
  def dot(ws: ArrayData, toks: ArrayData, vals: ArrayData): Long = {
    val n = ws.numElements()
    val v = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = ws.getUTF8String(i)
      if (t != null) {
        var lo = 0
        var hi = v - 1
        var found = false
        while (!found && lo <= hi) {
          val mid = (lo + hi) >>> 1
          val cmp = toks.getUTF8String(mid).compareTo(t)
          if (cmp == 0) { acc += vals.getLong(mid); found = true }
          else if (cmp < 0) lo = mid + 1
          else hi = mid - 1
        }
      }
      i += 1
    }
    acc
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_nb_dot")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NbDotProduct].getName, null, "graft_nb_dot",
    "graft_nb_dot(tokens, vocab, weights) - sum of weights of tokens found " +
      "in the sorted vocab (OOV = 0)",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b, c) => NbDotProduct(a, b, c)
    case other => throw new IllegalArgumentException(
      s"graft_nb_dot expects 3 arguments, got ${other.size}")
  }
}
