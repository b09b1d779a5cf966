package graft

import graft.multimodal.Media

/** Golden tests for the multimodal plumbing: schema shape, stub-decoder
  * determinism, resize metadata lockstep, frame-sampling arithmetic. */
class MediaSpec extends SparkSpec {

  lazy val media = Media.mediaTable(spark, sf)

  test("media table schema: binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(Seq("width", "height", "sample_rate")
      .forall(sch(_).dataType.typeName == "integer"))
    assert(media.count() > 0)
  }

  test("feature extraction is deterministic and histogram sums to 1") {
    val f = Media.extractFeatures(media).collect()
    assert(f.forall(_.feature.length == 16))
    // histogram of payload bytes normalized by length → sums to ~1
    assert(f.forall(x => math.abs(x.feature.sum - 1f) < 1e-3))
    val again = Media.extractFeatures(media.repartition(7)).collect()
    assert(f.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq,
      "features must not depend on partitioning")
  }

  test("resize rewrites payload and metadata in lockstep") {
    val r = Media.resize(media, 32, 8).collect()
    assert(r.forall(m => m.payload.length == 32 * 8 && m.width == 32
      && m.height == 8))
  }

  test("media dedup: planted duplicate payloads recall 1.0, no false pairs") {
    import graft.multimodal.Media.MediaRow
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 40 distinct payloads, each putting a unique (bin, bin, 60/40) mass
    // shape on the 16-bin histogram — pairwise cosine ≤ ~0.92, far below
    // the 0.9999 verify threshold, so none of them may pair up
    def payloadFor(i: Int): Array[Byte] = {
      val a = i % 16
      val b0 = (a + 1 + i / 16) % 16
      val b = if (b0 == a) (a + 1) % 16 else b0
      (Array.fill(180)(a.toByte) ++ Array.fill(120)(b.toByte))
    }
    val distinct = (0 until 40).map(i =>
      MediaRow(i.toLong, "image", payloadFor(i), 16, 16, 8000))
    // planted EXACT duplicates: a pair and a triple sharing payload bytes
    val dupPair = Seq(101L, 102L).map(id =>
      MediaRow(id, "image", payloadFor(3), 16, 16, 8000))
    val dupTriple = Seq(201L, 202L, 203L).map(id =>
      MediaRow(id, "audio", payloadFor(7), 16, 16, 8000))
    val rows = spark.createDataset(distinct ++ dupPair ++ dupTriple)
    val feats = graft.multimodal.Media.extractFeatures(rows).toDF()
      .select(col("media_id"), col("feature"))
    val got = graft.queries.MediaQueries.mediaDedupPairs(feats)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical payloads also duplicate ids 3 and 7's histograms — the
    // planted copies ARE near-dups of their source rows by construction
    val expected = Set(
      (3L, 101L), (3L, 102L), (101L, 102L),
      (7L, 201L), (7L, 202L), (7L, 203L),
      (201L, 202L), (201L, 203L), (202L, 203L))
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("frame sampling matches closed-form count") {
    val frames = Media.sampleFrames(media, 3).collect()
    val byMedia = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    val expected = media.filter(_.kind == "video").collect().map { m =>
      val blocks = (m.payload.length + 63) / 64
      m.media_id -> (blocks + 2) / 3
    }.toMap
    assert(byMedia == expected)
    assert(frames.forall(_.frame_no % 3 == 0))
  }
}
