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

  /** @param saltSrc columns of `big` whose hash spreads rows of one key
    *                across salts (e.g. a line number); must be stable. */
  def inner(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int, saltSrc: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig("__salt") === replicatedSmall("__salt") &&
          col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
