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
        while (i < n && bytes(i) != ' ') i += 1
        h = (h * 131L + tokenValue(bytes, s0, i)) % 1000000007L
      }
    }
    h
  }

  /** `ascii(tok)·31 + length(tok)` for the token bytes `[s0, end)`.
    *
    * Fast path: a single validating decode for strictly-valid UTF-8
    * (correct continuation bytes, no overlongs, no surrogates, ≤
    * U+10FFFF) — exactly the inputs on which a raw byte decode matches
    * Spark. Malformed tokens fall back to the replacement decode the
    * declarative tower actually sees: `StringSplit` splits on
    * `toString` (U+FFFD substitution, verified in the Spark 4.1.2
    * bytecode) and re-encodes each piece, so `ascii`/`length` there
    * observe the REPLACED string — reproduced below via
    * `codePointAt(0)` / `codePointCount` on the decoded token. A 0x20
    * byte can never be consumed into a malformed sequence (maximal
    * ill-formed subsequences contain only 0x80–0xBF continuations), so
    * token boundaries are the same under both decodings. */
  private def tokenValue(bytes: Array[Byte], s0: Int, end: Int): Long = {
    var chars = 0
    var cp0 = -1
    var j = s0
    var valid = true
    while (valid && j < end) {
      val b = bytes(j) & 0xFF
      var cp = 0
      var len = 0
      if (b < 0x80) { cp = b; len = 1 }
      else if (b >= 0xC2 && b <= 0xDF) { cp = b & 0x1F; len = 2 }
      else if (b >= 0xE0 && b <= 0xEF) { cp = b & 0x0F; len = 3 }
      else if (b >= 0xF0 && b <= 0xF4) { cp = b & 0x07; len = 4 }
      else valid = false // 0x80–0xC1 lead, 0xF5–0xFF: never valid
      if (valid && j + len <= end) {
        var k = 1
        while (valid && k < len) {
          val c = bytes(j + k) & 0xFF
          if ((c & 0xC0) != 0x80) valid = false
          else cp = (cp << 6) | (c & 0x3F)
          k += 1
        }
        if (valid &&
            ((len == 3 && (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF))) ||
             (len == 4 && (cp < 0x10000 || cp > 0x10FFFF)))) valid = false
      } else valid = false
      if (valid) {
        if (cp0 < 0) cp0 = cp
        chars += 1
        j += len
      }
    }
    if (valid) cp0.toLong * 31L + chars
    else {
      val s = UTF8String.fromBytes(bytes, s0, end - s0).toString
      val cp = if (s.isEmpty) 0 else s.codePointAt(0)
      cp.toLong * 31L + s.codePointCount(0, s.length)
    }
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
