package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: the distinct word-n-gram (default 3) shingle
  * hashes of a text column — tokenize on single spaces (empties
  * dropped), join each n consecutive tokens with one space, xxhash64 the
  * shingle, dedup — computed in ONE compiled pass per row with a reused
  * scratch buffer.
  *
  * Hash-compatible with the declarative formulation it replaces
  * (`transform(array_distinct(zip_with(zip_with(slice…))), x => xxhash64(x))`):
  * each shingle's hash is `XXH64.hashUnsafeBytes` over exactly the UTF-8
  * bytes `xxhash64(string)` hashes, so every downstream band key,
  * signature lane, and join key is unchanged (DedupSpec pins equality on
  * the corpus). The one semantic nuance: dedup happens on the HASHES,
  * not the strings — two distinct shingles colliding in 64 bits would
  * merge; at S shingles/doc that is a ~S²/2⁶⁵ event (~1e-13 here), the
  * same collision tolerance the MinHash/decontamination stages already
  * document. Texts shorter than n words yield an empty array, matching
  * the guarded slice formulation. Byte-level scan is UTF-8-safe: 0x20
  * never occurs inside a multi-byte sequence.
  *
  * The heavy lifting lives in [[ShingleHashes.compute]], called as ONE
  * static invocation from generated code — the scan stage that touches
  * every byte of a 100 TB corpus runs compiled either way, with no
  * per-element lambda interpretation and no intermediate string arrays.
  */
final case class ShingleHashes(child: Expression, gramSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if gramSize <= 0 => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes gram size must be positive, got $gramSize")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects a string column, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], gramSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $gramSize);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** Native expression: POSITIONAL word-n-gram hashes — one hash per gram
  * position, duplicates kept, document order preserved — the substring-
  * level dedup primitive (span occurrence `(doc, pos, hash)` tables need
  * positions; the distinct-set variant above erases them). Same
  * tokenizer, same per-gram bytes, same `xxhash64` seed as
  * [[ShingleHashes]], so a gram's hash is identical under both — the two
  * can join against each other. */
final case class GramHashes(child: Expression, gramSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if gramSize <= 0 => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes gram size must be positive, got $gramSize")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes expects a string column, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.computePositional(input.asInstanceOf[UTF8String], gramSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.computePositional($a, $gramSize);")

  override protected def withNewChildInternal(
      newChild: Expression): GramHashes = copy(child = newChild)
}

object GramHashes {

  val ident: FunctionIdentifier = FunctionIdentifier("graft_gram_hashes")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramHashes].getName, null, "graft_gram_hashes",
    "graft_gram_hashes(text[, n]) - positional xxhash64 values of word-n-grams (duplicates kept, in order)",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => GramHashes(a, 3)
    case Seq(a, IntArg(n)) => GramHashes(a, n)
    case other => throw new IllegalArgumentException(
      "graft_gram_hashes expects (text[, constant integer gram size]), got " +
        other.mkString(", "))
  }
}

object ShingleHashes {

  /** One-pass shingle hashing; static so generated code calls it
    * directly. Returns an UnsafeArrayData of distinct g-gram hashes in
    * first-occurrence order. */
  def compute(text: UTF8String, g: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token spans (start, end) over the byte array
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val s0 = i
        while (i < n && bytes(i) != ' ') i += 1
        if (t == starts.length) {
          starts = java.util.Arrays.copyOf(starts, t * 2)
          ends = java.util.Arrays.copyOf(ends, t * 2)
        }
        starts(t) = s0; ends(t) = i; t += 1
      }
    }
    if (t < g) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    var scratch = new Array[Byte](64)
    val out = new Array[Long](t - g + 1)
    // open-addressing long set (linear probe, load ≤ 0.5): 0 marks an
    // empty slot and a genuine 0 hash is tracked by the flag — the
    // per-shingle dedup stays allocation-free (one flat array, no boxing).
    // Power-of-two sizing is only safe while 2×shingles fits an Int; a
    // pathological single document with ≥2^29 shingles (a multi-GB text
    // of 1-char tokens) falls back to the boxed set rather than risking
    // a full table (non-terminating probe) — degrade to slow, never hang.
    val nShingles = t - g + 1
    val seen: Array[Long] =
      if (nShingles < (1 << 29)) {
        var cap = 4
        while (cap < nShingles * 2) cap <<= 1
        new Array[Long](cap)
      } else null
    val boxed: java.util.HashSet[java.lang.Long] =
      if (seen == null) new java.util.HashSet[java.lang.Long]() else null
    val mask = if (seen != null) seen.length - 1 else 0
    var seenZero = false
    var m = 0
    var j = 0
    while (j <= t - g) {
      var len = g - 1
      var w = j
      while (w < j + g) { len += ends(w) - starts(w); w += 1 }
      if (scratch.length < len) scratch = new Array[Byte](len * 2)
      var p = 0
      w = j
      while (w < j + g) {
        val l = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), scratch, p, l)
        p += l
        if (w < j + g - 1) { scratch(p) = ' '; p += 1 }
        w += 1
      }
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var fresh = false
      if (boxed != null) fresh = boxed.add(h)
      else if (h == 0L) { fresh = !seenZero; seenZero = true }
      else {
        var slot = (h ^ (h >>> 32)).toInt & mask
        while (seen(slot) != 0L && seen(slot) != h) slot = (slot + 1) & mask
        if (seen(slot) == 0L) { seen(slot) = h; fresh = true }
      }
      if (fresh) { out(m) = h; m += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** Positional variant: the g-gram hash at EVERY position, duplicates
    * kept, document order preserved (index k = gram starting at token
    * k). Same tokenizer, same gram bytes, same seed as [[compute]] —
    * hash values are interchangeable between the two. No dedup set at
    * all: the occurrence table this feeds wants the repeats. */
  def computePositional(text: UTF8String, g: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var t = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val s0 = i
        while (i < n && bytes(i) != ' ') i += 1
        if (t == starts.length) {
          starts = java.util.Arrays.copyOf(starts, t * 2)
          ends = java.util.Arrays.copyOf(ends, t * 2)
        }
        starts(t) = s0; ends(t) = i; t += 1
      }
    }
    if (t < g) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    var scratch = new Array[Byte](64)
    val out = new Array[Long](t - g + 1)
    var j = 0
    while (j <= t - g) {
      var len = g - 1
      var w = j
      while (w < j + g) { len += ends(w) - starts(w); w += 1 }
      if (scratch.length < len) scratch = new Array[Byte](len * 2)
      var p = 0
      w = j
      while (w < j + g) {
        val l = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), scratch, p, l)
        p += l
        if (w < j + g - 1) { scratch(p) = ' '; p += 1 }
        w += 1
      }
      out(j) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  val ident: FunctionIdentifier = FunctionIdentifier("graft_shingle_hashes")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, null, "graft_shingle_hashes",
    "graft_shingle_hashes(text[, n]) - distinct xxhash64 values of word-n-gram shingles",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a) => ShingleHashes(a, 3)
    case Seq(a, IntArg(n)) => ShingleHashes(a, n)
    case other => throw new IllegalArgumentException(
      "graft_shingle_hashes expects (text[, constant integer gram size]), got " +
        other.mkString(", "))
  }
}
