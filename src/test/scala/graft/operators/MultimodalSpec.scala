package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("media schema: opaque binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 30)
  }

  test("image decode is REAL: PNG round-trips through javax.imageio exactly") {
    val img = Multimodal.renderImage(7L, 48, 32)
    val bytes = Multimodal.encodePng(img)
    assert(bytes.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "valid PNG magic")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(back.getWidth == 48 && back.getHeight == 32)
    // lossless: every pixel survives encode→decode bit-exactly
    for (y <- 0 until 32; x <- 0 until 48)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
  }

  test("image features are the decoded grid-mean luminances, not a hash") {
    // a uniform mid-gray image must featurize to ~0.5 in every cell —
    // only true if the decoder really reads pixels
    val gray = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) gray.setRGB(x, y, 0x808080)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((0L, "image", Multimodal.encodePng(gray)))
      .toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(df, dim = 16)
      .as[(Long, String, Seq[Float])].head()._3
    assert(feats.length == 16)
    feats.foreach(f => assert(math.abs(f - 128.0 / 255.0) < 1e-6, s"cell=$f"))
  }

  test("audio decode is REAL: WAV PCM round-trips through javax.sound") {
    val wav = Multimodal.encodeWav(3L, 2000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate == 16000.0f)
    assert(in.getFormat.getSampleSizeInBits == 16)
    val pcm = in.readAllBytes()
    assert(pcm.length == 4000, "2000 16-bit samples")
    // a pure tone has nonzero RMS in every window
    val feats = Multimodal.decode("audio", wav, 8)
    assert(feats.length == 8 && feats.forall(f => f > 0.1f && f < 1.0f), feats.toSeq)
  }

  test("m04 real resize: dims capped, aspect kept, luminance preserved-ish") {
    val rows = Multimodal.mediaResize(spark, sf)
      .select("media_id", "width", "height", "mean_lum_x1e6")
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, lum) =>
      assert(w <= 24 && h <= 24, s"media $id resized to $w x $h")
      // NN-subsampling of our smooth gradient keeps mean luminance near
      // mid-range; a hash-stub would be uniform-random per run
      assert(lum > 100000L && lum < 900000L, s"media $id mean lum $lum")
    }
    val again = Multimodal.mediaResize(spark, sf)
      .select("media_id", "width", "height", "mean_lum_x1e6")
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.toSeq == again.toSeq, "resize pipeline deterministic")
  }

  test("feature extraction is deterministic with the stubbed decoder") {
    val a = Multimodal.extractFeatures(media, dim = 16)
      .orderBy($"media_id").as[(Long, String, Seq[Float])].collect()
    val b = Multimodal.extractFeatures(media, dim = 16)
      .orderBy($"media_id").as[(Long, String, Seq[Float])].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._3.length == 16))
  }

  test("resizeImages keeps meta.width/height in lockstep with the re-encoded payload") {
    val resized = Multimodal.resizeImages(
      media.filter($"kind" === "image"), maxSide = 24)
    val rows = resized.select($"meta.width", $"meta.height", $"payload")
      .as[(Int, Int, Array[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mw, mh, payload) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(mw == img.getWidth && mh == img.getHeight,
        s"meta ($mw x $mh) diverges from payload (${img.getWidth} x ${img.getHeight})")
      assert(math.max(mw, mh) <= 24)
    }
  }

  test("resizeMeta caps the longest side, preserving other metadata") {
    val resized = Multimodal.resizeMeta(media, maxSide = 32)
    val bad = resized.filter(greatest($"meta.width", $"meta.height") > 32).count()
    assert(bad == 0)
    assert(resized.select($"meta.sample_rate").distinct().as[Int].head() == 16000)
  }

  test("MJPEG-AVI round trip: container walk recovers every frame byte-exactly") {
    val frames = (0 until 7).map(f =>
      Multimodal.encodeJpeg(Multimodal.renderImage(900L + f, 48, 32)))
    val avi = Multimodal.encodeAviMjpeg(frames, 48, 32)
    val got = Multimodal.aviMjpegFrames(avi)
    assert(got.length == 7)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // every recovered frame is a decodable JPEG with the right dims
    got.foreach { jpeg =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth == 48 && img.getHeight == 32)
    }
    // a foreign container yields no frames (callers fall back)
    assert(Multimodal.aviMjpegFrames(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Multimodal.aviMjpegFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("sampled video frames decode: real pixels, frame 0 differs from frame 5") {
    val sampled = Multimodal.sampleFrames(media, stride = 5)
      .filter($"frame".isNotNull)
    assert(sampled.count() > 0, "fixture videos must be real AVI containers")
    val one = sampled.filter($"frame_idx" === 5).limit(1)
      .select($"media_id").as[Long].head()
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === one), stride = 5)
      .orderBy($"frame_idx").select($"frame").as[Array[Byte]].collect()
    val imgs = frames.map(b => javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
    assert(imgs.forall(_ != null))
    // temporal content really varies (frames are not copies of frame 0)
    assert(!frames(0).sameElements(frames(1)))
  }

  test("frame sampling emits every stride-th frame for video rows only") {
    val frames = Multimodal.sampleFrames(media, stride = 5)
    val kinds = media.filter($"kind" === "video").count()
    assert(frames.count() >= kinds) // at least frame 0 per video
    val perVideo = frames.groupBy($"media_id").count()
    val expect = media.filter($"kind" === "video")
      .select($"media_id", (floor(($"meta.n_frames" - 1) / 5) + 1).as("exp"))
    val joined = perVideo.join(expect, "media_id")
      .filter($"count" =!= $"exp").count()
    assert(joined == 0)
  }

  test("content-hash dedup catches a planted duplicate payload") {
    val dup = media.limit(1).withColumn("media_id", lit(999L))
    val withDup = media.unionByName(dup)
    val groups = Multimodal.dedupByContent(withDup)
    assert(groups.filter($"n_copies" === 2).count() == 1)
    assert(groups.count() == 30)
  }

  test("end-to-end: multimodal features flow through the ANN operator") {
    val nn = Multimodal.nearestMedia(media, k = 3).collect()
    assert(nn.length == 5 * 3)
  }

  test("m05 binaryFile ingest: glob prunes decoys, decode matches the in-memory fixture") {
    val got = Multimodal.mediaIngest(spark, sf)
      .select("media_id", "n_bytes", "width", "height", "mean_lum_x1e6")
      .as[(Long, Long, Int, Int, Long)].collect()
    // exactly the 100 PNGs — the .dat decoys never entered the scan
    assert(got.length == 100)
    assert(got.map(_._1).toSeq == (0L until 100L))
    // dimensions and luminance agree with a direct decode of the same
    // deterministic renderer output (file round trip is lossless)
    got.foreach { case (id, nBytes, w, h, lum) =>
      val bytes = Multimodal.encodePng(Multimodal.renderImage(id, 32 + (id % 4).toInt * 16,
        32 + (id % 3).toInt * 16))
      assert(nBytes == bytes.length, s"img $id byte length")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(w == img.getWidth && h == img.getHeight, s"img $id dims")
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      }
      val n = img.getWidth.toLong * img.getHeight * 3 * 255
      assert(lum == math.round(sum.toDouble / n * 1e6), s"img $id luminance")
    }
  }

  test("m06 perceptual near-dup: planted variants recovered, exact hash blind to them") {
    val images = Multimodal.syntheticMedia(spark, 300).filter($"kind" === "image")
    val variants = Multimodal.perturbImages(images.filter($"media_id" < 60), delta = 8)
      .withColumn("media_id", $"media_id" + 2000L)
    // the perturbation changes EVERY payload: exact content dedup finds
    // zero copies across original ∪ variant
    val exact = Multimodal.dedupByContent(images.unionByName(variants))
      .filter($"n_copies" > 1)
    assert(exact.count() == 0)
    // ...but the perceptual pairs are exactly the 20 planted ones
    val pairs = Multimodal.mediaPerceptualDedup(spark, "unused").collect()
    assert(pairs.length == 20)
    pairs.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 2000L, r.toString)
      assert(r.getAs[Number]("hamming").longValue <= 3, r.toString)
    }
  }

  test("m07 audio near-dup: gain-changed re-encodes recovered, exact hash blind") {
    import spark.implicits._
    val audio = (0 until 100).map { i =>
      (i.toLong, Multimodal.encodeWavEnveloped(i.toLong, 4000))
    }.toDF("media_id", "payload")
    val variants = Multimodal.perturbAudio(audio.filter($"media_id" < 20), 7, 10)
      .withColumn("media_id", $"media_id" + 3000L)
    // 70% gain rewrites every sample: zero byte-identical payloads
    val exact = audio.unionByName(variants)
      .groupBy(xxhash64($"payload")).agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
    assert(exact.count() == 0)
    // the energy hash is gain-invariant: exactly the 20 planted pairs
    val pairs = Multimodal.mediaAudioDedup(spark, "unused").collect()
    assert(pairs.length == 20)
    pairs.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 3000L, r.toString)
      assert(r.getAs[Number]("hamming").longValue <= 3, r.toString)
    }
    // envelope structure separates distinct recordings: no original-
    // original pair collides (expected hamming ≈ 32 between profiles)
    assert(pairs.forall(r => r.getLong(0) < 20L))
  }

  test("m08 video near-dup: re-graded re-encodes recovered, exact hash blind") {
    import spark.implicits._
    val videos = Multimodal.syntheticMedia(spark, 300)
      .filter($"kind" === "video")
    val variants = Multimodal.perturbVideos(
        videos.filter($"media_id" < 90), delta = 8)
      .withColumn("media_id", $"media_id" + 4000L)
    // brightness shift + JPEG re-encode rewrites every byte: no
    // byte-identical payloads survive
    val exact = videos.unionByName(variants)
      .groupBy(xxhash64($"payload")).agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
    assert(exact.count() == 0)
    // the temporal hash is brightness-shift-invariant: every planted
    // (original, re-grade) pair surfaces within the Hamming budget
    val planted = videos.filter($"media_id" < 90).count()
    val pairs = Multimodal.mediaVideoDedup(spark, "unused").collect()
    val plantedPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 4000L)
    assert(plantedPairs.length == planted,
      s"expected $planted planted pairs, got ${plantedPairs.length} of ${pairs.length}")
    pairs.foreach(r => assert(r.getAs[Number]("hamming").longValue <= 3, r.toString))
  }

  test("golden decode digests: every media gate pins its decoded bytes to literals") {
    // GOLDEN values, harvested once from the deterministic fixtures.
    // These pin the decoded pixels/samples/frames BYTE-FOR-BYTE: a
    // codec regression that preserves row counts (the blind spot of a
    // rows-only driver gate) moves a digest and fails here — and for
    // the corpus_digest gates also flips a gate-visible column value.
    def corpusDigestOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select("corpus_digest").distinct().as[Long].collect() match {
        case Array(d) => d
        case other => fail(s"non-constant corpus_digest: ${other.toSeq}")
      }
    assert(corpusDigestOf(Multimodal.mediaAnn(spark, sf)) == -5485036059650784336L)
    assert(corpusDigestOf(Multimodal.mediaDedup(spark, sf)) == -6564337682782418519L)
    assert(corpusDigestOf(Multimodal.mediaPerceptualDedup(spark, sf)) == 2129255203832918759L)
    assert(corpusDigestOf(Multimodal.mediaAudioDedup(spark, sf)) == -5783958225204661091L)
    assert(corpusDigestOf(Multimodal.mediaVideoDedup(spark, sf)) == -8196483133408499214L)
    // per-media digests: spot-pin rows of each per-item gate
    val m3 = Multimodal.mediaFrameSample(spark, sf)
      .select("media_id", "digest").as[(Long, Long)].collect().toMap
    assert(m3(5L) == -237153225339989035L && m3(8L) == 4018627402996903084L)
    val m4 = Multimodal.mediaResize(spark, sf)
      .select("media_id", "digest").as[(Long, Long)].collect().toMap
    assert(m4(0L) == 3434350829934258765L && m4(3L) == 2730447647591412698L)
    val m5 = Multimodal.mediaIngest(spark, sf)
      .select("media_id", "digest").as[(Long, Long)].collect().toMap
    assert(m5(0L) == -5209383763847649939L && m5(1L) == -841123900711623507L)
  }
}
