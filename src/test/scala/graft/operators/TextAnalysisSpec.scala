package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textMatch ranks by tf-idf: rare-term hit outranks common-term hit") {
    val docs = Seq(
      (0L, "join join join hash tables"),          // 3x join + 1x hash
      (1L, "a join of two relations"),             // 1x join (common term)
      (2L, "the stream never sleeps"),             // 1x stream (rare term)
      (3L, "join the parade"),                     // 1x join
      (4L, "nothing relevant whatsoever"),         // no hits → excluded
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/graft_textmatch_test/documents.parquet")
    val out = TextAnalysis.textMatch(spark, "/tmp/graft_textmatch_test")
      .as[(Long, Long, Double)].collect()

    val ids = out.map(_._1).toSet
    assert(!ids.contains(4L), "doc with no hits must be excluded")
    assert(out.head._1 == 0L, s"heaviest-hitting doc first, got ${out.toSeq}")
    // idf: df(join)=3, df(stream)=1 → one stream hit (5/1) outscores one
    // join hit (5/3)
    val score = out.map(t => t._1 -> t._3).toMap
    assert(score(2L) > score(1L) && score(2L) > score(3L),
      s"rare term must outrank common term: $score")
    // n_hits is a plain integer hit count
    assert(out.find(_._1 == 0L).get._2 == 4L)
  }

  test("winnowing digest is deterministic and order-sensitive") {
    val r1 = TextAnalysis.winnowingFingerprints(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val r2 = TextAnalysis.winnowingFingerprints(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
    assert(r1.forall(_._2 >= 0), "fingerprint counts are non-negative")
  }
}
