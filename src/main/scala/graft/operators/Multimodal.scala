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
  * The Spark-side plumbing — schema, partition-friendly batch shape,
  * typed Dataset transform signatures — is real and tested; the codec
  * kernels are STUBBED with a deterministic fake (this container ships
  * no image/audio libraries): `fakeDecode` derives pixel/sample values
  * from a seeded hash of the payload, so outputs are reproducible and
  * downstream stages (embedding, dedup by content hash, ANN) exercise
  * real code paths. Swap `decodeStub` for a real codec (e.g. javax
  * imageio / ffmpeg bindings) without touching any plan shape.
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

  /** Deterministic synthetic media fixture (seeded; payload bytes are a
    * hash stream) — stands in for a real media table.
    */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt().toByte)
      MediaRow(i.toLong, kind, payload, 32 + (i % 4) * 16, 32 + (i % 3) * 16,
        1 + i % 30, if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4")
    }
    rows.toDF()
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("width"), col("height"),
          lit(16000).as("sample_rate"), col("n_frames"),
          col("format")).as("meta"))
  }

  /** DECODE STUB: a real implementation would decode `payload` with a
    * codec; the deterministic fake derives `dim` float features from
    * xxhash64 of the payload bytes. Plan shape (binary in → float array
    * out, per-row, no shuffle) is identical either way.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
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
        // per-partition decoder init happens here (stubbed)
        rows.map { r =>
          org.apache.spark.sql.Row(r.getLong(0), r.getString(1),
            decodeStub(r.getAs[Array[Byte]](2), dim).toSeq)
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

  // — registered queries (rows-only: payload decode is the documented
  //   stub, and content hashes are engine-specific) — the binary-column
  //   plumbing itself runs inside the driver gate —

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
}
