package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-builder argument helper: extract a constant Int from any FOLDABLE
  * integral expression — a bare literal, a BIGINT literal, `1 + 3`, a
  * bound parameter — not just `Literal(_, IntegerType)`. Registered
  * function builders run post-analysis on resolved children, so
  * `foldable` + `eval()` is safe and matches how Spark's own builders
  * (e.g. `MakeDTInterval`) read constant args. */
private[functions] object IntArg {
  def unapply(e: Expression): Option[Int] =
    if (!e.foldable) None
    else
      try e.eval() match {
        case i: java.lang.Integer => Some(i.intValue)
        case l: java.lang.Long
            if l >= Int.MinValue && l <= Int.MaxValue => Some(l.intValue)
        case s: java.lang.Short => Some(s.intValue)
        case b: java.lang.Byte => Some(b.intValue)
        case _ => None
      } catch { case scala.util.control.NonFatal(_) => None }
}
