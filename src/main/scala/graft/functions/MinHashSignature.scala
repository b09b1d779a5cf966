package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the k-lane MinHash signature of a shingle
  * set — per shingle ONE string hash, then per lane one cheap long
  * re-hash and a compare, all fused into a single primitive loop inside
  * whole-stage codegen. Accepts `array<string>` (raw shingles, hashed
  * here) or `array<long>` (pre-hashed shingles from
  * [[ShingleHashes]] — the values ARE `xxhash64(string)`, so both input
  * forms yield identical signatures).
  *
  * Bit-identical to the HOF formulation it replaces
  * (`array((0 until k).map(j => array_min(transform(transform(s, x => xxhash64(x)), h => xxhash64(lit(j), h)))))`):
  * Spark's `XxHash64` folds its children left-to-right from seed 42, so
  * `xxhash64(s)` = `XXH64.hashUTF8String(s, 42)` and `xxhash64(j, h)` =
  * `XXH64.hashLong(h, XXH64.hashInt(j, 42))`; the per-lane seeds are
  * precomputed host-side. The interpreted tower evaluated k+1 lambda
  * closures per shingle and allocated k+1 intermediate arrays per row —
  * the same interpreter-on-the-scan-path defect class the round-2 LSH
  * bucket fix measured at ~100×. DedupSpec pins signature equality with
  * the tower on the real corpus.
  *
  * Empty input → null (callers filter empty shingle sets; a MinHash of
  * nothing has no meaningful value).
  */
final case class MinHashSignature(child: Expression, nHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if nHashes <= 0 || nHashes > 1024 => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash lane count must be in [1, 1024], got $nHashes")
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string> or array<long>, got $other")
  }

  @transient private lazy val seeds: Array[Long] =
    MinHashSignature.seeds(nHashes)

  @transient private lazy val preHashed: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val acc = Array.fill(nHashes)(Long.MaxValue)
    var i = 0
    var used = 0
    while (i < n) {
      // null elements are skipped (a null shingle is no shingle — and the
      // unsafe getters would NPE on strings / misread 0 on longs); an
      // array of ONLY nulls degrades to the empty-input null result
      if (!xs.isNullAt(i)) {
        val h = if (preHashed) xs.getLong(i)
          else XXH64.hashUTF8String(xs.getUTF8String(i), 42L)
        var k = 0
        while (k < nHashes) {
          val v = XXH64.hashLong(h, seeds(k))
          if (v < acc(k)) acc(k) = v
          k += 1
        }
        used += 1
      }
      i += 1
    }
    if (used == 0) return null
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("seeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      val hashElem =
        if (preHashed) s"$a.getLong($i)"
        else s"$xxh.hashUTF8String($a.getUTF8String($i), 42L)"
      val used = ctx.freshName("used")
      s"""
         |int $n = $a.numElements();
         |long[] $acc = new long[$nHashes];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |int $used = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  long $h = $hashElem;
         |  for (int $k = 0; $k < $nHashes; $k++) {
         |    long $v = $xxh.hashLong($h, $s[$k]);
         |    if ($v < $acc[$k]) $acc[$k] = $v;
         |  }
         |  $used++;
         |}
         |if ($used == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($acc);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {

  /** Per-lane seeds replicating `xxhash64(lit(k), h)`'s left fold: the
    * lane literal hashed first from the default seed 42. */
  def seeds(nHashes: Int): Array[Long] =
    Array.tabulate(nHashes)(k => XXH64.hashInt(k, 42L))

  val ident: FunctionIdentifier = FunctionIdentifier("graft_minhash")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, null, "graft_minhash",
    "graft_minhash(shingles, nHashes) - k-lane MinHash signature of a string array",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, IntArg(n)) => MinHashSignature(a, n)
    case other => throw new IllegalArgumentException(
      "graft_minhash expects (array<string>, constant integer), got " +
        other.mkString(", "))
  }
}
