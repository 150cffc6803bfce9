package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: media as opaque `binary` columns with typed metadata
  * structs, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Codec status (round 5): image and audio decode are REAL — the
  * fixture's image payloads are valid PNGs decoded with the JDK's
  * `javax.imageio` and its audio payloads are valid 16-bit PCM WAV
  * decoded with `javax.sound.sampled`; features are exact grid-mean
  * luminance / windowed RMS over the decoded samples, and the image
  * resize kernel decodes → nearest-neighbor resamples → re-encodes.
  * Only VIDEO decode remains a deterministic stub (`decodeStub`) — the
  * JDK ships no container/codec for mp4; the seam is one function and
  * is documented at the stub.
  */
object Multimodal {

  /** media row: opaque payload + typed metadata (the "multimodal column"). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),           // image | audio | video
    StructField("payload", BinaryType),        // opaque encoded bytes
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, n_frames: Int, format: String)

  /** Render the deterministic test image for media id `i`: every pixel
    * is a pure function of (id, x, y), so the PNG payload — and
    * everything decoded from it — is reproducible run-to-run.
    */
  private[operators] def renderImage(i: Long, w: Int, h: Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 7 + i * 13) % 256).toInt
        val g = ((y * 11 + i * 29) % 256).toInt
        val b = ((x + y + i * 41) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode a BufferedImage as PNG bytes (JDK `javax.imageio`;
    * lossless, deterministic — ImageIO's PNG writer emits no
    * timestamps).
    */
  private[operators] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode `n` samples of a deterministic sine-ish tone (frequency
    * derived from the id) as a 16-bit PCM mono WAV — a hand-built RIFF
    * header over exact integer samples, readable by any WAV decoder
    * including `javax.sound.sampled`.
    */
  private[operators] def encodeWav(i: Long, n: Int, rate: Int = 16000): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                  // PCM, mono
      .putInt(rate).putInt(rate * 2)            // byte rate
      .putShort(2).putShort(16)                 // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    // injective for id < 997 — distinct ids must yield distinct
    // payloads (content dedup tests plant their OWN duplicates)
    val freq = 100.0 + (i * 7 % 997)
    var t = 0
    while (t < n) {
      val v = math.sin(2.0 * math.Pi * freq * t / rate) * 12000.0
      buf.putShort(v.toShort)
      t += 1
    }
    buf.array()
  }

  /** Deterministic synthetic media fixture. Image payloads are REAL
    * PNGs, audio payloads are REAL WAVs (both JDK-codec round-trippable);
    * video payloads are an opaque hash stream (no mp4 codec in the JDK —
    * see [[decodeStub]]).
    */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val w = 32 + (i % 4) * 16
      val h = 32 + (i % 3) * 16
      val payload = kind match {
        case "image" => encodePng(renderImage(i.toLong, w, h))
        case "audio" => encodeWav(i.toLong, 2000)
        case _ => Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      }
      MediaRow(i.toLong, kind, payload, w, h,
        1 + i % 30, if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4")
    }
    rows.toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("width"), col("height"),
          lit(16000).as("sample_rate"), col("n_frames"),
          col("format")).as("meta"))
  }

  /** VIDEO DECODE STUB — the one remaining fake: the JDK has no mp4
    * container/codec, so video features derive deterministically from a
    * hash of the payload. Swap this body for an ffmpeg binding when the
    * environment has one; image/audio below are real.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real video codec goes here; deterministic fake below
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift64
      out(j) = (h.toDouble / Long.MaxValue).toFloat
      j += 1
    }
    out
  }

  /** REAL image decode + featurize: PNG → pixels (`javax.imageio`) →
    * `dim` grid-cell mean luminances in [0,1] (exact rational over the
    * decoded ints — deterministic).
    */
  /** Global mean luminance of a decoded image in millionths (rounded)
    * — one definition shared by the m04 re-decode check and the m05
    * ingest stats so the determinism contract can't silently diverge.
    */
  private[operators] def meanLumX1e6(img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight * 3 * 255
    math.round(sum.toDouble / n * 1e6)
  }

  private def imageFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val grid = math.sqrt(dim.toDouble).toInt max 1
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val x0 = gx * w / grid; val x1 = ((gx + 1) * w / grid) max (x0 + 1)
        val y0 = gy * h / grid; val y1 = ((gy + 1) * h / grid) max (y0 + 1)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
            x += 1
          }
          y += 1
        }
        out(gy * grid + gx) =
          (sum.toDouble / ((x1 - x0).toLong * (y1 - y0) * 3 * 255)).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** REAL audio decode + featurize: WAV → PCM frames
    * (`javax.sound.sampled`) → `dim` windowed RMS energies (normalized).
    */
  private def audioFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val bytes = in.readAllBytes()
    in.close()
    val nSamples = bytes.length / 2
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](dim)
    val win = (nSamples / dim) max 1
    var d = 0
    while (d < dim) {
      var acc = 0.0
      var k = 0
      while (k < win && d * win + k < nSamples) {
        val s = bb.getShort((d * win + k) * 2).toDouble / 32768.0
        acc += s * s
        k += 1
      }
      out(d) = math.sqrt(acc / win).toFloat
      d += 1
    }
    out
  }

  /** Modality dispatch: real codecs for image (PNG) and audio (WAV),
    * documented stub for video.
    */
  private[operators] def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float] =
    kind match {
      case "image" => imageFeatures(payload, dim)
      case "audio" => audioFeatures(payload, dim)
      case _ => decodeStub(payload, dim)
    }

  /** Feature extraction over the opaque payload: mapPartitions-style
    * batch shape (one decoder instance per partition — where a real
    * codec would amortize native init), emitting `array<float>`
    * embeddings alongside the id columns.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { rows =>
        // per-partition batch: a native codec would init here once;
        // ImageIO/AudioSystem are JVM-static so init is free
        rows.map { r =>
          org.apache.spark.sql.Row(r.getLong(0), r.getString(1),
            decode(r.getString(1), r.getAs[Array[Byte]](2), dim).toSeq)
        }
      }(enc)
  }

  /** REAL image resize: decode PNG → nearest-neighbor resample so the
    * longest side is `maxSide` (aspect preserved) → re-encode PNG.
    * Nearest-neighbor (not bilinear) keeps the kernel bit-deterministic
    * across JVMs. Non-image rows pass through untouched. Same
    * `mapPartitions` batch shape as [[extractFeatures]].
    */
  def resizeImages(media: DataFrame, maxSide: Int): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(
      StructType(media.schema.fields.toIndexedSeq))
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    // the meta struct must FOLLOW the payload: a consumer sizing
    // buffers from meta.width × meta.height would otherwise read
    // dimensions that disagree with the re-encoded pixels
    val metaIdx = media.schema.fieldNames.indexOf("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.getString(kindIdx) != "image") r
        else {
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
          val (w, h) = (src.getWidth, src.getHeight)
          val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val dst = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              dst.setRGB(x, y, src.getRGB(x * w / nw, y * h / nh))
              x += 1
            }
            y += 1
          }
          val vals = r.toSeq.toArray
          vals(payloadIdx) = encodePng(dst)
          if (metaIdx >= 0 && !r.isNullAt(metaIdx)) {
            // rebuild by FIELD NAME (a reordered/extended meta struct
            // must not silently shift values into the wrong slots);
            // width/height track the re-encoded payload
            val m = r.getStruct(metaIdx)
            val mSchema = m.schema
            vals(metaIdx) = org.apache.spark.sql.Row(
              mSchema.fieldNames.map {
                case "width"  => nw
                case "height" => nh
                case f        => m.get(mSchema.fieldIndex(f))
              }.toIndexedSeq: _*)
          }
          org.apache.spark.sql.Row(vals.toIndexedSeq: _*)
        }
      }
    }(enc)
  }

  /** Resize metadata transform (pure column math — a real resize would
    * also re-encode payload in the decode stub).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")))
    media.withColumn("meta",
      struct(
        ceil(col("meta.width") * scale).cast("int").as("width"),
        ceil(col("meta.height") * scale).cast("int").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames"),
        col("meta.format").as("format")))
  }

  /** Frame sampling for video rows: emit one row per sampled frame index
    * (every `stride`-th frame) — explode-based, shuffle-free.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(stride))))
      .select(col("media_id"), col("frame_idx"), col("payload"), col("meta"))

  /** 64-bit perceptual average-hash over DECODED pixels: 8×8 grid of
    * mean luminances (the [[imageFeatures]] grid at dim=64), bit i set
    * iff cell i's mean exceeds the global mean. Content-level identity
    * where [[dedupByContent]]'s byte hash is brittle: a re-encoded or
    * brightness-shifted copy keeps its aHash within a few bits while
    * sharing zero payload bytes.
    */
  private[operators] def averageHash64(payload: Array[Byte]): Long = {
    val cells = imageFeatures(payload, 64)
    var mean = 0.0
    cells.foreach(mean += _)
    mean /= 64.0
    var h = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Brightness-shift + re-encode perturbation (the classic near-dup
    * a pipeline must catch: same content, zero shared bytes). Clamped
    * per-channel add, PNG re-encode via the same JDK codec.
    */
  private[operators] def perturbImages(media: DataFrame, delta: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(
      StructType(media.schema.fields.toIndexedSeq))
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        val dst = new java.awt.image.BufferedImage(src.getWidth, src.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < src.getHeight) {
          var x = 0
          while (x < src.getWidth) {
            val p = src.getRGB(x, y)
            def c(v: Int) = math.min(255, math.max(0, v + delta))
            dst.setRGB(x, y,
              (c((p >> 16) & 0xFF) << 16) | (c((p >> 8) & 0xFF) << 8) | c(p & 0xFF))
            x += 1
          }
          y += 1
        }
        val vals = r.toSeq.toArray
        vals(payloadIdx) = encodePng(dst)
        org.apache.spark.sql.Row(vals.toIndexedSeq: _*)
      }
    }(enc)
  }

  /** Perceptual near-dup pairs over an image frame: aHash per image
    * (mapPartitions decode — one codec pass per payload), then the
    * SimHash banding scheme on the 64-bit hash (4×16-bit chunks: any
    * pair within Hamming ≤ 3 shares ≥1 exact chunk — pigeonhole),
    * verified by `bit_count(xor)`. The shuffle carries (id, 8-byte
    * hash) — never payload bytes; candidate volume is bounded by
    * bucket collisions exactly as in the text SimHash path (d04).
    */
  def perceptualPairs(images: DataFrame, maxHamming: Int = 3): DataFrame = {
    import images.sparkSession.implicits._
    val hashed = images.select(col("media_id"), col("payload"))
      .map(r => (r.getLong(0), averageHash64(r.getAs[Array[Byte]](1))))
      .toDF("id", "ahash")
    val banded = hashed.select(col("id"), col("ahash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("ahash"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("id").as("media_a"), col("ahash").as("h_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("media_b"), col("ahash").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("media_a") < col("media_b"))
      .dropDuplicates("media_a", "media_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_a"), col("media_b"), col("hamming"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** Content-hash dedup over the opaque payload (exact dedup works on
    * any modality without decoding).
    */
  def dedupByContent(media: DataFrame): DataFrame =
    media.groupBy(xxhash64(col("payload")).as("content_hash"))
      .agg(min(col("media_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** End-to-end: features → brute-force cosine top-k per media item
    * (exercises the multimodal embedding path through the ANN operator).
    */
  def nearestMedia(media: DataFrame, k: Int): DataFrame = {
    val feats = extractFeatures(media)
    Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 5),
      "media_id", "feature", k)
  }

  // — registered queries (rows-only: PNG/WAV byte streams and content
  //   hashes are not ANSI-SQL-derivable, though image/audio decode is
  //   REAL) — the binary-column plumbing runs inside the driver gate —

  /** m01: media → feature extraction (mapPartitions batch shape) → ANN
    * top-3 per probe item. The synthetic fixture stands in for a media
    * table; `dir` is unused.
    */
  def mediaAnn(spark: SparkSession, dir: String): DataFrame =
    nearestMedia(syntheticMedia(spark, 300), k = 3)

  /** m03: frame sampling for the video rows (every 5th frame index,
    * explode-based, shuffle-free) rolled up to a per-media frame count
    * — deterministic over the seeded fixture.
    */
  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(syntheticMedia(spark, 300), stride = 5)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("max_idx"))
      .orderBy(col("media_id"))

  /** m02: exact content dedup over opaque payloads with planted binary
    * duplicates (first 20 items re-ingested under new ids) — every
    * keeper is accounted for, dup groups have n_copies = 2.
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val media = syntheticMedia(spark, 300)
    val redelivered = media.filter(col("media_id") < 20)
      .withColumn("media_id", col("media_id") + 1000L)
    dedupByContent(media.unionByName(redelivered))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))
  }

  /** m06: perceptual near-dup — the content-level dedup m02's exact
    * byte hash CANNOT do. The first 20 images are brightness-shifted
    * (+8 per channel, clamped) and re-encoded under new ids: zero
    * shared payload bytes (planted-pair recovery and exact-hash
    * blindness asserted in `MultimodalSpec`), but each variant stays
    * within Hamming ≤ 3 of its original's average-hash and every
    * planted pair surfaces through the banded join. Rows-only (PNG
    * decode is not ANSI-SQL-derivable); the banding/verify shape is
    * the oracle-anchored d04 scheme applied to pixels.
    */
  def mediaPerceptualDedup(spark: SparkSession, dir: String): DataFrame = {
    val images = syntheticMedia(spark, 300).filter(col("kind") === "image")
    val variants = perturbImages(images.filter(col("media_id") < 60), delta = 8)
      .withColumn("media_id", col("media_id") + 2000L)
    perceptualPairs(images.unionByName(variants))
  }

  /** m04: the REAL image resize pipeline — decode PNG, nearest-neighbor
    * resample to maxSide=24, re-encode, decode AGAIN and report the
    * resized dimensions plus mean luminance (×1e6, rounded — integer
    * rows, fully deterministic). Proves the payload round-trips through
    * the codec twice, not just a metadata update.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val resized = resizeImages(
      syntheticMedia(spark, 300).filter(col("kind") === "image"), maxSide = 24)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_lum_x1e6", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val payloadIdx = resized.schema.fieldIndex("payload")
    val idIdx = resized.schema.fieldIndex("media_id")
    resized.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](payloadIdx)))
        org.apache.spark.sql.Row(r.getLong(idIdx), img.getWidth, img.getHeight,
          meanLumX1e6(img))
      }
    }(enc).orderBy(col("media_id"))
  }

  /** m05: media ingestion from a FILE TREE via Spark's built-in
    * `binaryFile` source — how a 100 TB media lake actually enters the
    * engine: `spark.read.format("binaryFile")` lists the tree
    * distributed, emits (path, modificationTime, length, content) rows,
    * prunes by `pathGlobFilter` at the listing (non-matching files are
    * never opened), and the same real-codec decode as m01-m04 runs on
    * the content column. The m01-m04 fixture arrives as an in-memory
    * DataFrame; this closes the missing first hop — files on disk →
    * binary column.
    *
    * The fixture (100 deterministic PNGs, one file each) is written to a
    * session-scoped scratch dir once per call; output is
    * path-independent (media_id parsed from the FILENAME, stats from the
    * decoded pixels), so the result is deterministic wherever the
    * scratch dir lands — rows-only in the gate (PNG bytes are not
    * ANSI-SQL-derivable).
    *
    * SINGLE-NODE ASSUMPTION (fixture generation only): the PNG fixture
    * is written with driver-local java.nio.file and read back via
    * `binaryFile`, which requires executors to share the driver's
    * filesystem — true in local mode / shared-FS clusters, NOT on a
    * real multi-node cluster with node-local scratch. The OPERATOR
    * itself (binaryFile listing + glob pruning + codec decode) is
    * cluster-valid against any shared store; only this test harness's
    * fixture materialization is local-mode-bound.
    */
  def mediaIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mediaDir = graft.util.Scratch.dir(spark, "m05_files", dir)
    java.nio.file.Files.createDirectories(mediaDir)
    (0 until 100).foreach { i =>
      val w = 32 + (i % 4) * 16
      val h = 32 + (i % 3) * 16
      java.nio.file.Files.write(
        mediaDir.resolve(f"img_$i%04d.png"),
        encodePng(renderImage(i.toLong, w, h)))
      // decoys the glob filter must skip without opening
      java.nio.file.Files.write(
        mediaDir.resolve(f"skip_$i%04d.dat"), Array[Byte](1, 2, 3))
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(mediaDir.toString)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_lum_x1e6", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    files
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1).cast("long").as("media_id"),
        col("length"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](2)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          org.apache.spark.sql.Row(r.getLong(0), r.getLong(1),
            img.getWidth, img.getHeight, meanLumX1e6(img))
        }
      }(enc)
      .orderBy(col("media_id"))
  }
}
