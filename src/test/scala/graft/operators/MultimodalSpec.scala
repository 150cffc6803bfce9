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

  test("feature extraction is deterministic with the stubbed decoder") {
    val a = Multimodal.extractFeatures(media, dim = 16)
      .orderBy($"media_id").as[(Long, String, Seq[Float])].collect()
    val b = Multimodal.extractFeatures(media, dim = 16)
      .orderBy($"media_id").as[(Long, String, Seq[Float])].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(_._3.length == 16))
  }

  test("resizeMeta caps the longest side, preserving other metadata") {
    val resized = Multimodal.resizeMeta(media, maxSide = 32)
    val bad = resized.filter(greatest($"meta.width", $"meta.height") > 32).count()
    assert(bad == 0)
    assert(resized.select($"meta.sample_rate").distinct().as[Int].head() == 16000)
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
}
