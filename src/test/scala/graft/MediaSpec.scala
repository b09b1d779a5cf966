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
    assert(r.forall(m => m.width == 32 && m.height == 8))
    // PPM images get a real resample: decoded dims = target, raster full
    r.filter(_.kind == "image").foreach { m =>
      val Some((w, h, px)) = Media.decodePpm(m.payload)
      assert(w == 32 && h == 8 && px.length == 32 * 8 * 3)
    }
    // codec-format payloads keep the stub byte-budget truncation
    assert(r.filter(_.kind != "image").forall(_.payload.length == 32 * 8))
  }

  test("corpus image payloads are well-formed PPM matching their metadata") {
    val imgs = media.filter(_.kind == "image").collect()
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      val dec = Media.decodePpm(m.payload)
      assert(dec.isDefined, s"media ${m.media_id} payload not decodable")
      val Some((w, h, px)) = dec
      assert(w == m.width && h == m.height && px.length == w * h * 3,
        s"media ${m.media_id}: decoded ${w}x$h vs metadata ${m.width}x${m.height}")
    }
  }

  test("PPM codec: encode/decode roundtrip, header grammar, malformed rejection") {
    val px = Array.tabulate(4 * 2 * 3)(i => (i * 7 % 251).toByte)
    val enc = Media.encodePpm(4, 2, px)
    assert(Media.decodePpm(enc).exists { case (w, h, p) =>
      w == 4 && h == 2 && p.sameElements(px) })
    // header grammar: comments and arbitrary whitespace runs
    val fancy = ("P6\n# a comment\n 4\t2 # inline\n255\n").getBytes("US-ASCII") ++ px
    assert(Media.decodePpm(fancy).exists { case (w, h, p) =>
      w == 4 && h == 2 && p.sameElements(px) })
    // a comment may stand directly after the magic, no whitespace first —
    // the netpbm grammar lets comments appear wherever whitespace may
    val magicComment = ("P6# tight\n4 2\n255\n").getBytes("US-ASCII") ++ px
    assert(Media.decodePpm(magicComment).exists { case (w, h, p) =>
      w == 4 && h == 2 && p.sameElements(px) })
    // malformed: wrong magic, short raster, maxval != 255, zero dims
    assert(Media.decodePpm("P5\n4 2\n255\n".getBytes ++ px).isEmpty)
    assert(Media.decodePpm("P6\n4 2\n255\n".getBytes ++ px.take(5)).isEmpty)
    assert(Media.decodePpm("P6\n4 2\n65535\n".getBytes ++ px).isEmpty)
    assert(Media.decodePpm("P6\n0 2\n255\n".getBytes).isEmpty)
  }

  test("image features are the decoded-raster histogram, not the payload bytes") {
    import graft.multimodal.Media.MediaRow
    import spark.implicits._
    // raster with a known histogram; the header bytes would pollute bins
    // ('P','6','\n','2','5', digits…) if the decode were skipped
    val px = (Array.fill(9)(0x10.toByte) ++ Array.fill(3)(0x21.toByte))
    val row = MediaRow(1L, "image", Media.encodePpm(2, 2, px), 2, 2, 8000)
    val f = Media.extractFeatures(spark.createDataset(Seq(row)))
      .collect().head.feature
    val expected = Array.tabulate(16)(b =>
      (if (b == 0) 9f else if (b == 1) 3f else 0f) / 12f)
    assert(f.toSeq == expected.toSeq,
      s"raster histogram ${f.toSeq} != closed form ${expected.toSeq}")
    // an undecodable image payload must fall back to the byte histogram
    val junk = MediaRow(2L, "image", Array.fill(10)(0x30.toByte), 2, 2, 8000)
    val g = Media.extractFeatures(spark.createDataset(Seq(junk)))
      .collect().head.feature
    assert(g(0) == 1f && g.sum == 1f)
  }

  test("nearest-neighbor resize samples the expected source pixels") {
    // 4x2 raster with per-pixel distinct values; downsample to 2x1:
    // target (x,y) reads source (x*4/2, y*2/1) = (0,0) and (2,0)
    val px = Array.tabulate(4 * 2 * 3)(i => i.toByte)
    import graft.multimodal.Media.MediaRow
    import spark.implicits._
    val row = MediaRow(1L, "image", Media.encodePpm(4, 2, px), 4, 2, 8000)
    val out = Media.resize(spark.createDataset(Seq(row)), 2, 1)
      .collect().head
    val Some((w, h, rp)) = Media.decodePpm(out.payload)
    assert(w == 2 && h == 1)
    assert(rp.toSeq == Seq(0, 1, 2, 6, 7, 8).map(_.toByte),
      s"resampled pixels ${rp.toSeq}")
  }

  test("WAV codec: encode/decode roundtrip, chunk walking, malformed rejection") {
    val samples = Array[Short](100, -200, 300, 0, -5, 32767, -32768)
    val enc = Media.encodeWavPcm16(16000, samples)
    assert(enc.length == 44 + samples.length * 2)
    assert(Media.decodeWavPcm16(enc).exists { case (sr, s) =>
      sr == 16000 && s.sameElements(samples) })
    // an unknown ODD-sized chunk between fmt and data must be skipped
    // with its RIFF pad byte
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val withChunk = enc.take(36) ++ extra ++ enc.drop(36)
    // fix the outer RIFF size for the inserted bytes
    val riffSize = withChunk.length - 8
    withChunk(4) = (riffSize & 0xff).toByte
    withChunk(5) = ((riffSize >> 8) & 0xff).toByte
    assert(Media.decodeWavPcm16(withChunk).exists(_._2.sameElements(samples)),
      "chunk walker must skip unknown chunks (with odd-size padding)")
    // rejections: truncated data, stereo, non-PCM, 8-bit, not-RIFF
    assert(Media.decodeWavPcm16(enc.dropRight(1)).isEmpty, "truncated data")
    val stereo = enc.clone(); stereo(22) = 2
    assert(Media.decodeWavPcm16(stereo).isEmpty, "stereo must fall to stub")
    val nonPcm = enc.clone(); nonPcm(20) = 3
    assert(Media.decodeWavPcm16(nonPcm).isEmpty, "non-PCM format")
    val eightBit = enc.clone(); eightBit(34) = 8
    assert(Media.decodeWavPcm16(eightBit).isEmpty, "8-bit")
    assert(Media.decodeWavPcm16("RIFFxxxxAVI ".getBytes("US-ASCII")).isEmpty,
      "non-WAVE RIFF")
    assert(Media.decodeWavPcm16(Array[Byte](1, 2, 3)).isEmpty, "garbage")
  }

  test("corpus audio payloads are well-formed WAV matching their metadata") {
    val clips = media.filter(_.kind == "audio").collect()
    assert(clips.nonEmpty)
    clips.foreach { m =>
      val dec = Media.decodeWavPcm16(m.payload)
      assert(dec.isDefined, s"media ${m.media_id} payload not decodable")
      val Some((sr, s)) = dec
      assert(sr == m.sample_rate,
        s"media ${m.media_id}: decoded rate $sr vs metadata ${m.sample_rate}")
      assert(m.payload.length == 44 + 2 * s.length,
        s"media ${m.media_id}: canonical-header length mismatch")
    }
  }

  test("audio features are exact through the encode→decode roundtrip") {
    // samples 100,-200,300,0,-5: peak 300; crossings (100,-200),(-200,300)
    // → zcr 2 (the 0 sample is sign-less: v·prev = 0 is not < 0);
    // sum_sq = 10000+40000+90000+0+25 = 140025 — the q_media_audio
    // feature math (Media.pcmFeatures) on the decoded clip, exactly
    val clip = Media.encodeWavPcm16(8000, Array[Short](100, -200, 300, 0, -5))
    val Some((sr, s)) = Media.decodeWavPcm16(clip)
    assert(sr == 8000 && s.length == 5)
    assert(Media.pcmFeatures(s) == ((300L, 2L, 140025L)))
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

  // --- DCT pHash perceptual pins (round 13) --------------------------
  // Fixtures: smooth triangle-wave textures at 48×32 — every channel
  // ≤ 190 so a +50 brightness shift never clamps; each (a, b, period)
  // combo below was numerically screened so the 13 fixtures sit
  // pairwise Hamming ≥ 16 apart AFTER the 8×8 pooling, while staying
  // low-frequency enough that a JPEG re-encode moves the hash by only a
  // few bits. (A 24×16 JPEG fixture is pathological — three 8×8 JPEG
  // blocks total — and measured Hamming 15; perceptual hashing of
  // thumbnail-sized JPEGs is genuinely out of scope.)
  private def texture(w: Int, h: Int, a: Int, b: Int, per: Int): Array[Byte] = {
    def tri(t: Int, p: Int): Int = {
      val m = t % (2 * p); if (m < p) m else 2 * p - m
    }
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 50 + tri(a * x + b * y, per) * 140 / per
        val i = 3 * (y * w + x)
        px(i) = v.toByte
        px(i + 1) = (230 - v).toByte
        px(i + 2) = (50 + (x * 140 / w + y * 140 / h) / 2).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  // screened pairwise-distant parameter set; head = the base texture
  private val textureParams = Seq(
    (1, 0, 12), (1, 1, 12), (1, 1, 18), (1, 1, 24), (1, 1, 36),
    (2, 1, 12), (2, 1, 18), (2, 1, 24), (2, 1, 36), (1, 2, 12),
    (1, 2, 18), (1, 2, 24), (1, 2, 36))

  test("pHash: a uniform brightness shift flips ZERO bits") {
    // the DctC row-sum argument, end-to-end: +δ on every channel moves
    // only the DC coefficient, and all 63 hash bits are AC
    val (w, h) = (48, 32)
    val base = texture(w, h, 1, 0, 12)
    for (delta <- Seq(5, 20, 50)) {
      val shifted = base.map(b => ((b & 0xff) + delta).min(255).toByte)
      assert(Media.pHash64(w, h, base) == Media.pHash64(w, h, shifted),
        s"brightness +$delta changed the pHash")
    }
  }

  test("media dedup image leg: perceptual duplicates recall 1.0") {
    import graft.multimodal.Media.MediaRow
    import spark.implicits._
    val (w, h) = (48, 32)
    val base = texture(w, h, 1, 0, 12)
    val bright = base.map(b => ((b & 0xff) + 20).toByte) // no clamp by design
    val rows = Seq(
      MediaRow(1L, "image", Media.encodeImage("png", w, h, base), w, h, 0),
      MediaRow(2L, "image", Media.encodePpm(w, h, bright), w, h, 0),
      // the LOSSY re-encode: decoded pixels differ from base, the hash
      // must not — this is the fixture the 16-bin histogram scheme fails
      MediaRow(3L, "image", Media.encodeImage("jpg", w, h, base), w, h, 0)) ++
      textureParams.tail.zipWithIndex.map { case ((a, b, p), i) =>
        MediaRow(10L + i, "image", Media.encodePpm(w, h, texture(w, h, a, b, p)),
          w, h, 0)
      }
    val got = graft.queries.MediaQueries.phashDedupPairs(
        Media.imagePhashes(spark.createDataset(rows)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L))
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("pair dedup: same-image-new-caption and same-caption-reencoded-image recall 1.0") {
    import spark.implicits._
    // the LAION post-filter composition, on planted fixtures: pair 1001
    // reuses pair 1's image (JPEG re-encode — phash near, not equal)
    // under a fresh caption; pair 2002 reuses pair 2's caption verbatim
    // over a brand-new image. Both MUST drop to their base pair; the
    // two unrelated base pairs must both survive.
    val (w, h) = (48, 32)
    val imgA = texture(w, h, 1, 0, 12)
    val imgB = texture(w, h, 2, 1, 36)
    val imgC = texture(w, h, 1, 2, 18)
    def ph(px: Array[Byte]) = Media.pHash64(w, h, px)
    def jpegPh(px: Array[Byte]) = {
      val Some((dw, dh, dec)) =
        Media.decodeImage(Media.encodeImage("jpg", w, h, px))
      Media.pHash64(dw, dh, dec)
    }
    val capA = "the quick brown fox jumps over the lazy dog tonight"
    val capB = "colorless green ideas sleep furiously under warm rain"
    val capC = "a completely fresh unrelated caption about mountain lakes"
    val caps = Seq(
      (1L, capA), (2L, capB),
      (1000000001L, capC), // same image as 1, new caption
      (2000000002L, capB)) // same caption as 2, new image
      .toDF("pair_id", "text")
    val imgs = Seq(
      (1L, ph(imgA)), (2L, ph(imgB)),
      (1000000001L, jpegPh(imgA)), (2000000002L, ph(imgC)))
      .toDF("media_id", "phash")
    val got = graft.queries.MediaQueries.pairDedupCensus(caps, imgs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("base") == ((2L, 0L, 0L)), s"bases must survive: $got")
    assert(got("img_dup") == ((1L, 1L, 1000000001L)),
      s"same-image-new-caption must drop: $got")
    assert(got("cap_dup") == ((1L, 1L, 2000000002L)),
      s"same-caption-new-image must drop: $got")
  }

  test("audio fingerprint: gain edits flip ZERO bits; dedup leg recall 1.0, no false pairs") {
    import spark.implicits._
    // a deterministic pseudo-speech clip: the corpus sample algebra on
    // a synthetic text, even values by the ×256 construction
    def clip(seed: Int, n: Int): Array[Short] =
      Array.tabulate(n)(i => (((seed + i * 31) % 256 - 128) * 256).toShort)
    val base = clip(7, 777)
    // gain-invariance, end-to-end: ÷2 and ÷4 are exact on even PCM and
    // must flip NOTHING (the pHash brightness argument, one modality over)
    for (g <- Seq(2, 4)) {
      val quiet = base.map(v => (v / g).toShort)
      assert(Media.audioFingerprint(base) == Media.audioFingerprint(quiet),
        s"gain 1/$g changed the fingerprint")
    }
    // a localized edit (one window zeroed out) flips only the windows
    // it touches — the near-dup regime the Hamming ≤ 6 verify admits
    val clipped = base.clone(); (0 until 12).foreach(i => clipped(i) = 0)
    val d = java.lang.Long.bitCount(
      Media.audioFingerprint(base) ^ Media.audioFingerprint(clipped))
    assert(d <= 6, s"localized edit moved $d bits")
    // dedup leg over planted edits + unrelated clips: exactly the
    // planted pairs, nothing else
    val prints = Seq(
      1L -> base, 2L -> base.map(v => (v / 2).toShort), 3L -> clipped,
      10L -> clip(101, 300), 11L -> clip(202, 500), 12L -> clip(55, 640))
      .map { case (id, s) => (id, Media.audioFingerprint(s)) }
      .toDF("media_id", "phash")
    val got = graft.queries.MediaQueries.phashDedupPairs(prints)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L))
    assert(got == expected,
      s"missing=${expected -- got} spurious=${got -- expected}")
  }

  test("histogram banding misses the perceptual duplicates pHash catches") {
    // the documented failure that motivated the round-13 replacement: a
    // +20 brightness shift moves every byte two 16-bins over and a JPEG
    // re-encode scatters bin mass, so neither duplicate survives the
    // histogram scheme's banded cells + cosine 0.9999 — while both are
    // perceptually the same image and pHash-caught above
    import graft.multimodal.Media.MediaRow
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val (w, h) = (48, 32)
    val base = texture(w, h, 1, 0, 12)
    val bright = base.map(b => ((b & 0xff) + 20).toByte)
    val rows = Seq(
      MediaRow(1L, "image", Media.encodeImage("png", w, h, base), w, h, 0),
      MediaRow(2L, "image", Media.encodePpm(w, h, bright), w, h, 0),
      MediaRow(3L, "image", Media.encodeImage("jpg", w, h, base), w, h, 0))
    val feats = Media.extractFeatures(spark.createDataset(rows)).toDF()
      .select(col("media_id"), col("feature"))
    val histGot = graft.queries.MediaQueries.mediaDedupPairs(feats)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(histGot.isEmpty,
      s"histogram banding unexpectedly paired: $histGot")
  }

  test("JPEG staging: decode-once rasters equal a fresh query-time decode") {
    // the q_media_jpeg judging premise, pinned directly: JPEG decode is
    // deterministic for a given JDK, so the staged raster table and a
    // fresh decode of the same containers are bit-identical. CAVEAT
    // (documented, not testable here): a DIFFERENT JDK's JPEG decoder
    // may legally produce different low bits — the oracle equality is
    // within-container-image, which is the driver's actual topology.
    val (w, h) = (48, 32)
    val base = texture(w, h, 1, 0, 12)
    val jpeg = Media.encodeImage("jpg", w, h, base)
    val d1 = Media.decodeImage(jpeg).get
    val d2 = Media.decodeImage(jpeg).get
    assert(d1._1 == d2._1 && d1._2 == d2._2)
    assert(java.util.Arrays.equals(d1._3, d2._3),
      "same-JVM JPEG decode is not deterministic")
    // and the encode is deterministic too (same input -> same container)
    assert(java.util.Arrays.equals(jpeg, Media.encodeImage("jpg", w, h, base)))
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

  test("multi-PPM container: frame walk, truncation, malformed tail, size change mid-stream") {
    val f0 = Array.tabulate[Byte](6)(i => i.toByte) // 2×1
    val f1 = Array.tabulate[Byte](6)(i => (100 + i).toByte)
    val seq = Media.encodeFrameSeq(2, 1, Seq(f0, f1))
    val got = Media.decodeFrames(seq)
    assert(got.map(_._1) == Vector(2, 2) && got.map(_._2) == Vector(1, 1))
    assert(got(0)._3.toSeq == f0.toSeq && got(1)._3.toSeq == f1.toSeq)
    // truncated mid-raster: the damaged frame drops, frames before keep
    val truncated = java.util.Arrays.copyOf(seq, seq.length - 2)
    assert(Media.decodeFrames(truncated).map(_._3.toSeq) == Vector(f0.toSeq))
    // malformed tail (not P6) after a complete frame: greedy walk stops
    // cleanly and keeps the good frame
    val frame0 = Media.encodePpm(2, 1, f0)
    assert(Media.decodeFrames(frame0 ++ "Xjunk".getBytes("US-ASCII"))
      .map(_._3.toSeq) == Vector(f0.toSeq))
    // size change mid-stream: each frame's own header wins
    val mixed = Media.encodePpm(2, 1, f0) ++ Media.encodePpm(1, 1, Array[Byte](9, 8, 7))
    assert(Media.decodeFrames(mixed).map(t => (t._1, t._2)) ==
      Vector((2, 1), (1, 1)))
    // empty payload → zero frames
    assert(Media.decodeFrames(Array.emptyByteArray).isEmpty)
  }

  test("frame temporal features are exact: deltas, scene cut threshold boundary") {
    val black = Array.fill[Byte](6)(0)
    val white = Array.fill[Byte](6)(-1) // 0xff
    // black→white: d = 6·255 = 1530, mean 255 > 63.75 → cut;
    // white→white: d = 0 → no cut
    val (sb, sd, md, cuts) = Media.frameFeatures(
      Media.decodeFrames(Media.encodeFrameSeq(2, 1, Seq(black, white, white))))
    assert(sb == 2 * 6 * 255L, s"sum_bytes $sb")
    assert(sd == 1530L && md == 1530L && cuts == 1L, s"($sd, $md, $cuts)")
    // threshold is STRICT: mean byte delta exactly 63.75 (4·d == 255·n)
    // must NOT count as a cut — one byte more must
    val at = Array.fill[Byte](6)(64) // |64−0|·6 = 384; 4·384 = 1536 > 1530 → cut
    val just = Array.tabulate[Byte](6)(i => if (i == 0) 63 else 64)
    // d(just) = 5·64+63 = 383; 4·383 = 1532 > 1530 → still a cut; build
    // the exact boundary instead: all-63.75 is not integral, so pin via
    // d = 1530/4 — not integral either; assert the strict form directly
    assert(4L * 382 < 255L * 6 && 4L * 383 > 255L * 6) // 382.5 boundary
    val db = Media.frameFeatures(Vector((2, 1, black), (2, 1, at)))
    assert(db._4 == 1L, "mean 64 > 63.75 must cut")
    val d382 = Array.tabulate[Byte](6)(i => if (i < 2) 63 else 64) // d = 382
    val dc = Media.frameFeatures(Vector((2, 1, black), (2, 1, d382)))
    assert(dc._2 == 382L && dc._4 == 0L, "d = 382 < 382.5 must not cut")
    val du = Media.frameFeatures(Vector((2, 1, black), (2, 1, just))) // d = 383
    assert(du._2 == 383L && du._4 == 1L, "d = 383 > 382.5 must cut")
  }

  test("corpus video containers decode to the closed-form frame count and size") {
    val vids = Media.videoTable(spark, sf).collect()
    assert(vids.nonEmpty)
    vids.foreach { m =>
      val frames = Media.decodeFrames(m.payload)
      assert(frames.length == m.sample_rate, // videoTable: sample_rate = F
        s"media ${m.media_id}: ${frames.length} frames, want ${m.sample_rate}")
      assert(frames.forall(f => f._1 == m.width && f._2 == m.height))
    }
  }

  test("ImageIO codecs: PNG/BMP lossless, GIF palette-exact, JPEG real decode") {
    val w = 13; val h = 7
    // a raster with many distinct colors (beyond any 256 palette)
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + i / 3) % 256).toByte)
    for (fmt <- Seq("png", "bmp")) {
      val enc = Media.encodeImage(fmt, w, h, px)
      val Some((dw, dh, dp)) = Media.decodeImage(enc)
      assert(dw == w && dh == h && dp.sameElements(px),
        s"$fmt roundtrip must be bit-lossless")
    }
    // GIF: palette container — lossless iff ≤256 distinct colors, so
    // use a grayscale raster (r=g=b per pixel, ≤251 distinct levels)
    val gray = new Array[Byte](w * h * 3)
    for (p <- 0 until w * h; c <- 0 until 3) gray(3 * p + c) = (p % 251).toByte
    val gif = Media.encodeImage("gif", w, h, gray)
    val Some((gw, gh, gp)) = Media.decodeImage(gif)
    assert(gw == w && gh == h && gp.sameElements(gray),
      "gif roundtrip of a <=256-color raster must be exact")
    // JPEG: real decode (dims + determinism + bounded distortion on a
    // smooth raster); exact pixel recovery is not a JPEG property
    val smooth = Array.tabulate(w * h * 3)(i => ((i / 3) % 64 + 96).toByte)
    val jpg = Media.encodeImage("jpg", w, h, smooth)
    val Some((jw, jh, jp)) = Media.decodeImage(jpg)
    assert(jw == w && jh == h && jp.length == w * h * 3)
    val Some((_, _, jp2)) = Media.decodeImage(jpg)
    assert(jp.sameElements(jp2), "JPEG decode must be deterministic")
    val meanErr = jp.indices.map(i =>
      math.abs((jp(i) & 0xff) - (smooth(i) & 0xff))).sum.toDouble / jp.length
    assert(meanErr < 16.0, s"smooth-raster JPEG mean error $meanErr")
    // PPM still routes through the fast byte parser under decodeImage
    assert(Media.decodeImage(Media.encodePpm(w, h, px))
      .exists(_._3.sameElements(px)))
    // garbage is data, not an exception
    assert(Media.decodeImage(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(Media.decodeImage(
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0, 0, 0)).isEmpty)
  }

  test("decodeImage never throws: random garbage behind every magic prefix is data") {
    // the malformed-media-is-data contract, fuzzed: random payloads —
    // bare, and behind each sniffed magic prefix (which routes them into
    // the JDK readers, whose failure modes include RuntimeExceptions) —
    // must decode to None or a valid raster, never an exception
    val rnd = new scala.util.Random(42)
    val magics = Seq(
      Array[Byte](0xFF.toByte, 0xD8.toByte),
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      "P6\n".getBytes("US-ASCII"),
      Array.emptyByteArray)
    for (_ <- 0 until 50; magic <- magics) {
      val body = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(body)
      val r = Media.decodeImage(magic ++ body) // must not throw
      r.foreach { case (w, h, px) => assert(px.length == w * h * 3) }
    }
  }

  test("codec table transcode is feature-invariant: ImageIO raster == PPM raster") {
    val codec = Media.codecMediaTable(spark, sf).collect()
    val ppmById = media.collect().map(m => m.media_id -> m).toMap
    assert(codec.count(m => m.kind == "image" &&
      m.payload.length >= 4 && m.payload(0) == 0x89.toByte) > 0,
      "PNG payloads must exist in the codec table")
    assert(codec.count(m => m.kind == "image" &&
      m.payload(0) == 'B' && m.payload(1) == 'M') > 0,
      "BMP payloads must exist in the codec table")
    codec.filter(_.kind == "image").foreach { m =>
      val Some((w, h, px)) = Media.decodeImage(m.payload)
      val Some((w0, h0, px0)) = Media.decodePpm(ppmById(m.media_id).payload)
      assert(w == w0 && h == h0 && px.sameElements(px0),
        s"media ${m.media_id}: transcoded raster must be bit-identical")
    }
  }
}
