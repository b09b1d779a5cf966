package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: split on single spaces, drop empty tokens — the
  * bit-exact twin of the catalog-wide `toks()` idiom
  * `filter(split(text, " "), w => w =!= "")` and of the oracle's
  * `list_filter(string_split(text, ' '), x -> x <> '')`.
  *
  * Why native (round 18): Spark higher-order functions are
  * CodegenFallback, so EVERY projection containing the HOF tokenizer
  * is excluded from whole-stage codegen and runs row-at-a-time with
  * boxed lambda dispatch — measured at ~50 µs/doc on the classify
  * pipeline (the executed plan shows the `ws`/`pos` Projects outside
  * every `*(n)` span). The text family is tokenizer-bound at corpus
  * scale, so the tokenizer must live inside codegen. This expression
  * is one pass over the UTF8 bytes (tokens share the input's backing
  * bytes via substring slices — no per-char copying), emitted straight
  * into the enclosing codegen stage.
  *
  * Token semantics are IDENTICAL to the HOF form: split on the
  * single-space character only (consecutive spaces yield empty strings
  * that are dropped; tabs/newlines are NOT separators), so every
  * judged hash is unchanged. PropertySpec pins native ≡ HOF on the
  * corpus. */
final case class GraftTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects a string column, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    GraftTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GraftTokens.split($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

object GraftTokens {

  /** One pass, byte-level: UTF-8 guarantees 0x20 bytes only ever encode
    * U+0020, so splitting on the raw byte is exact. One getBytes per
    * row; token slices wrap the same array without copying.
    *
    * Malformed-input parity (the graft_fingerprint discipline): the
    * HOF `split(text, " ")` decodes through String, replacing invalid
    * sequences with U+FFFD — so tokens of a malformed input differ
    * from its raw bytes. Valid strings (the entire corpus, checked in
    * one cheap pass) take the zero-copy byte path; invalid ones
    * normalize via toString (same replacement) first, landing on
    * byte-identical tokens to the HOF form. PropertySpec pins both
    * paths, malformed fixtures included. */
  def split(s: UTF8String): GenericArrayData = {
    val sv = if (s.isValid) s else UTF8String.fromString(s.toString)
    val b = sv.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](16)
    var start = 0
    var i = 0
    while (i < n) {
      if (b(i) == 0x20) {
        if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    if (n > start) out.add(UTF8String.fromBytes(b, start, n - start))
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_tokens")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GraftTokens].getName, null, "graft_tokens",
    "graft_tokens(text) - space-separated non-empty tokens",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => GraftTokens(a)
    case other => throw new IllegalArgumentException(
      s"graft_tokens expects 1 argument, got ${other.size}")
  }
}

/** Native membership counter: how many elements of `arr` are in the
  * constant word set — the bit-exact twin of the marker-scoring idiom
  * `size(filter(ws, w => w.isInCollection(words)))` (langid rules, the
  * classify teacher). Same CodegenFallback motivation as
  * [[GraftTokens]]: five of these HOF towers per row kept the teacher
  * projection interpreted. The set is a constructor constant, so both
  * eval paths probe one shared hash set. */
final case class CountIn(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_count_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if words.isEmpty => TypeCheckResult.TypeCheckFailure(
      "graft_count_in needs a non-empty word set")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_count_in expects array<string>, got $other")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    CountIn.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    CountIn.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CountIn.count($a, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}

object CountIn {

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Null elements count as non-members, exactly like `isInCollection`
    * (null IN (...) is null → filter drops the row). */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && set.contains(t)) c += 1
      i += 1
    }
    c
  }
}
