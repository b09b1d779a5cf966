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
