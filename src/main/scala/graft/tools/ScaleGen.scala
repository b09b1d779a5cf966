package graft.tools

import org.apache.spark.sql.functions._

/** sf-MULTIPLIER testdata generator for scale experiments beyond the
  * driver-provided sfs: reads an existing sf dir and writes an N×
  * corpus to a scratch dir (never touches /root/testdata).
  *
  *   sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 /tmp/graft_sf1 10"
  *
  * Scaling shape (the realistic one): FACTS multiply, DIMENSIONS stay —
  * orders/lineitem/events/documents/embeddings get `mult` copies with
  * key offsets that preserve referential integrity (order keys shift in
  * lockstep across orders and lineitem), while region/nation/customer/
  * supplier/part copy through, so each customer simply has mult× the
  * orders. Copy payloads are DECORRELATED so candidate densities stay
  * ~linear instead of every row gaining mult−1 synthetic twins:
  * document copies get a per-copy text marker (n_chars recomputed —
  * every closed-form media/text oracle derives from the text, so they
  * stay valid), and embedding copies get a deterministic sign-flip
  * pattern (norm-preserving, cosine-decorrelating). Copy 0 is the
  * original corpus byte-for-byte, so planted structures (duplicate
  * clusters, near-dup pairs) survive at their original density. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val mult = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.Graft.builder("local[16]", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    val cp = spark.range(mult).toDF("cp")
    def fan(t: String) =
      spark.read.parquet(s"$src/$t.parquet").crossJoin(broadcast(cp))

    val KO = 10000000L // order-key stride per copy (max sf0.1 key ~ 600 k)
    fan("orders")
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * KO)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    fan("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * KO)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    fan("events")
      .withColumn("event_id", col("event_id") + col("cp") * 100000000L)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    fan("documents")
      .withColumn("text",
        when(col("cp") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" c"), col("cp"))))
      .withColumn("doc_id", col("doc_id") + col("cp") * 1000000L)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    fan("embeddings")
      .withColumn("embedding",
        when(col("cp") === 0, col("embedding"))
          .otherwise(zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, j) => when((j + col("cp") * 7) % 3 === 0, -x).otherwise(x))))
      .withColumn("vec_id", col("vec_id") + col("cp") * 1000000L)
      .drop("cp")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"SCALEGEN wrote ${mult}x of $src to $out")
    spark.stop()
  }
}
