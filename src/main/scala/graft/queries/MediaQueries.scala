package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Judged surface for the multimodal plumbing (graft.multimodal.Media).
  * The metadata/frame queries are fully oracle-checked (integer/byte
  * arithmetic); the feature query is rows-only because the stub decoder's
  * byte histogram isn't reasonably expressible in ANSI SQL — MediaSpec
  * pins its values instead. */
object MediaQueries {

  /** Storage-schema sanity over the binary payload + typed metadata. */
  val qMediaMetadata: QueryDef = QueryDef.oracle(
    "q_media_metadata",
    """SELECT kind, COUNT(*) AS n, CAST(SUM(octet_length(payload)) AS BIGINT) AS sum_bytes,
      |  MIN(width) AS min_w, MAX(height) AS max_h,
      |  CAST(SUM(sample_rate) AS BIGINT) AS sum_sr
      |FROM (
      |  SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    encode(text) AS payload,
      |    CAST(n_chars % 640 + 16 AS INT) AS width,
      |    CAST(n_chars % 480 + 16 AS INT) AS height,
      |    CAST(8000 + (doc_id % 5) * 8000 AS INT) AS sample_rate
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Media.mediaTable(spark, dir).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("sum_bytes"),
        min(col("width")).as("min_w"), max(col("height")).as("max_h"),
        sum(col("sample_rate")).as("sum_sr"))
      .orderBy("kind")
  }

  /** Frame sampling (stride 3 over 64-byte blocks of video payloads);
    * per-media frame counts, oracle-checked by closed-form arithmetic. */
  val qMediaFrames: QueryDef = QueryDef.oracle(
    "q_media_frames",
    """SELECT doc_id AS media_id,
      |  ((octet_length(encode(text)) + 63) // 64 + 2) // 3 AS n_frames
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
  ) { (spark, dir) =>
    Media.sampleFrames(Media.mediaTable(spark, dir), 3).toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .orderBy("media_id")
  }

  /** Stubbed decode → 16-bin byte-histogram features, folded per kind
    * with exact-decimal sums (deterministic under any partitioning). */
  val qMediaFeatures: QueryDef = QueryDef.noOracle("q_media_features") {
    (spark, dir) =>
      Media.extractFeatures(Media.mediaTable(spark, dir)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"), max(col("dim")).as("dim"),
          sum(element_at(col("feature"), 1).cast("decimal(30,9)"))
            .cast("double").as("sum_f0"),
          sum(element_at(col("feature"), 16).cast("decimal(30,9)"))
            .cast("double").as("sum_f15"))
        .orderBy("kind")
  }

  val all: Seq[QueryDef] = Seq(qMediaMetadata, qMediaFrames, qMediaFeatures)
}
