package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the order-dependent rolling polynomial document
  * fingerprint — tokenize on single spaces (empties dropped), per token
  * `x = ascii(w)·31 + length(w)`, folded as `h = (h·131 + x) mod 1e9+7`
  * from 0 — in ONE compiled pass over the UTF-8 bytes.
  *
  * Bit-identical to the declarative fold it replaces
  * (`aggregate(transform(toks(text), w -> (ascii(w)*31 + length(w))::long),
  * 0L, (a, x) -> (a*131 + x) % 1000000007)`), which is also exactly the
  * DuckDB oracle's `list_reduce` formulation: Spark's `ascii` is the
  * first CODEPOINT (`substring(0,1).toString.codePointAt(0)` — full
  * astral codepoints, not UTF-16 halves) and `length` is the codepoint
  * count (`UTF8String.numChars`), both reproduced here from the raw
  * bytes (leading-byte count = codepoints; standard UTF-8 decode of the
  * first sequence = codePointAt of the first char). Byte-level scan is
  * UTF-8-safe: 0x20 never occurs inside a multi-byte sequence. Overflow-
  * free: h < 1e9+7, so h·131 + x < 1.4e11 ≪ 2^63, and
  * `ascii·31 + length` tops out near 3.4e7 for U+10FFFF.
  *
  * This removes the last interpreted HOF FOLD on a corpus-wide scan
  * path whose semantics a compiled pass can reproduce exactly (the
  * fingerprint ran an `aggregate`-over-`transform` tower per row).
  * Deliberate lambda sites remain: the exact-decimal verify towers in
  * Similarity (they exist precisely because codegen doubles cannot give
  * decimal-exact results, and they run only after candidate cuts — or,
  * for the norm columns, as one bounded pass the oracle itself mirrors)
  * and the single-lambda tokenize filters (`filter(split(...))`, one
  * cheap predicate, not a fold). PropertySpec pins equality with the
  * tower on the corpus and on adversarial strings. */
final case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects a string column, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Fingerprint.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Fingerprint = copy(child = newChild)
}

object Fingerprint {

  /** One-pass rolling fingerprint; static so generated code calls it
    * directly. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    var h = 0L
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val s0 = i
        var chars = 0
        while (i < n && bytes(i) != ' ') {
          if ((bytes(i) & 0xC0) != 0x80) chars += 1 // leading byte = 1 char
          i += 1
        }
        val b0 = bytes(s0) & 0xFF
        // first codepoint, standard UTF-8 decode (continuation bytes of a
        // valid sequence can never be 0x20, so they are inside the token)
        val cp =
          if (b0 < 0x80) b0
          else if ((b0 & 0xE0) == 0xC0)
            ((b0 & 0x1F) << 6) | (bytes(s0 + 1) & 0x3F)
          else if ((b0 & 0xF0) == 0xE0)
            ((b0 & 0x0F) << 12) | ((bytes(s0 + 1) & 0x3F) << 6) |
              (bytes(s0 + 2) & 0x3F)
          else
            ((b0 & 0x07) << 18) | ((bytes(s0 + 1) & 0x3F) << 12) |
              ((bytes(s0 + 2) & 0x3F) << 6) | (bytes(s0 + 3) & 0x3F)
        h = (h * 131L + (cp.toLong * 31L + chars)) % 1000000007L
      }
    }
    h
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_fingerprint")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Fingerprint].getName, null, "graft_fingerprint",
    "graft_fingerprint(text) - rolling polynomial token fingerprint mod 1e9+7",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => Fingerprint(a)
    case other => throw new IllegalArgumentException(
      s"graft_fingerprint expects 1 argument, got ${other.size}")
  }
}
