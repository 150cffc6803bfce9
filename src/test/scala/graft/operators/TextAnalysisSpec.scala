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

  test("bm25 ranking: tf monotone, rare terms weighted up, long docs normalized down") {
    val docs = Seq(
      (0L, "join join alpha beta"),               // tf(join)=2, dl=4
      (1L, "join alpha beta gamma"),              // tf(join)=1, dl=4
      (2L, "join alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"), // tf=1, dl=12
      (3L, "stream alpha beta gamma"),            // tf(stream)=1, dl=4 — rare term
      (4L, "join whatever else here"),            // pushes df(join) up
      (5L, "nothing matching at all"),
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/graft_bm25_test/documents.parquet")
    val score = TextAnalysis.bm25Rank(spark, "/tmp/graft_bm25_test")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap

    assert(!score.contains(5L), "doc with no query term must be excluded")
    assert(score(0L) > score(1L), s"higher tf must score higher: $score")
    assert(score(1L) > score(2L),
      s"same tf in a longer doc must score lower (length normalization): $score")
    // df(join)=4, df(stream)=1 → one stream hit outweighs one join hit
    assert(score(3L) > score(1L), s"rarer term must outweigh common term: $score")
    assert(score.values.forall(s => s > 0 && !s.isNaN))
  }

  test("textMatch with an absent query term keeps scores finite (df=0 guard)") {
    val docs = Seq((0L, "join things"), (1L, "other stuff")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/graft_df0_test/documents.parquet")
    val out = TextAnalysis.textMatch(spark, "/tmp/graft_df0_test",
      terms = Seq("join", "zzznotincorpus"))
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(0L))
    assert(out.forall(r => !r._3.isNaN && r._3 > 0), out.toSeq.toString)
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
