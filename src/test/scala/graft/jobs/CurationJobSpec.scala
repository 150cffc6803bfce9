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

  test("curateExact: deterministic, bounded to the slice, and strictly curating") {
    val a = CurationJob.curateExact(spark, sf)
    val ids = a.select($"doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "ordered by doc_id")
    assert(ids.nonEmpty && ids.forall(_ < 250L), "bounded to the id slice")
    assert(ids.length < 250, "at least one doc dropped by a pipeline stage")
    val b = CurationJob.curateExact(spark, sf).select($"doc_id").as[Long].collect()
    assert(ids.sameElements(b), "two runs identical")
  }

  test("curating the fixture corpus keeps the distinct docs") {
    val (curated, report) = CurationJob.run(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    assert(report.input == 500)
    assert(report.afterNearDup > 0 && report.afterNearDup <= report.afterExact)
    assert(curated.count() == report.afterNearDup)
  }
}
