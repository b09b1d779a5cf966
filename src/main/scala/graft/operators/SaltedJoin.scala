package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (big) side into `salts`
  * sub-partitions per key and replicate the small side across every salt,
  * so one hot key spreads over `salts` tasks instead of stalling a single
  * reducer. Result is identical to the plain equi-join (spec-verified).
  *
  * AQE's skew-join handles moderate skew automatically; explicit salting
  * is the tool when one key dominates so heavily that even split shuffle
  * blocks overwhelm a task, or when AQE is unavailable (streaming joins).
  * The salt is derived deterministically from carried columns — never
  * rand() — so retried tasks and re-runs produce identical partitions.
  */
object SaltedJoin {

  /** Collision-safe salt column name: no sane input schema carries it, so
    * adding it never shadows a data column. */
  private val SaltCol = "__graft_salt__"

  /** @param saltSrc columns of `big` whose hash spreads rows of one key
    *                across salts (e.g. a line number); must be stable. */
  def inner(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int, saltSrc: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(saltSrc: _*), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    // keys resolved THROUGH each salted frame: bare col(...) is ambiguous
    // the moment both sides share the key name (the usual self-join case)
    val joined = saltedBig.join(replicatedSmall,
        saltedBig(SaltCol) === replicatedSmall(SaltCol) &&
          saltedBig(bigKey) === replicatedSmall(smallKey))
      .drop(SaltCol)
    // when both sides name the key identically (the usual self-join case)
    // the result would carry two same-named key columns and any downstream
    // string reference would be ambiguous — keep only the big side's
    if (bigKey == smallKey) joined.drop(replicatedSmall(smallKey)) else joined
  }
}
