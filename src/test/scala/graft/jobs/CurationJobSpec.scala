package graft.jobs

import graft.SparkSpec

class CurationJobSpec extends SparkSpec {
  import spark.implicits._

  test("curation drops low-quality, exact-dup, and near-dup docs; report reconciles") {
    val docs = Seq(
      (0L, "The quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),  // exact dup (case)
      (2L, "The quick brown fox, jumps over the lazy dog near the river bank today!"), // exact dup (punct)
      (3L, "The quick brown fox jumps over the sleepy dog near the river bank today"), // near dup
      (4L, "ok"),                                                 // too short
      (5L, "the a of and to in is it that for the a of and to"),  // all stopwords
      (6L, "completely different text about medieval castle architecture and moats"),
    ).toDF("doc_id", "text")

    val (curated, report) = CurationJob.run(docs, "doc_id", "text")
    val ids = curated.select($"doc_id").as[Long].collect().toSet

    assert(report.input == 7)
    assert(report.afterQuality == 5)        // 4 (short) and 5 (stopwords) gone
    assert(report.afterExact == 3)          // 1,2 collapse into 0
    assert(report.afterNearDup == 2)        // 3 dropped as near-dup of 0
    assert(ids == Set(0L, 6L))
  }

  test("curating the fixture corpus keeps the distinct docs") {
    val (curated, report) = CurationJob.run(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    assert(report.input == 500)
    assert(report.afterNearDup > 0 && report.afterNearDup <= report.afterExact)
    assert(curated.count() == report.afterNearDup)
  }
}
