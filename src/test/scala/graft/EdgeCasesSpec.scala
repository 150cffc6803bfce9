package graft

import graft.functions.{HashFns, TextFns, VectorFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Margin-case behavior pinned down explicitly. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("dot/cosine expressions use the common prefix for unequal-length vectors") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(10f, 10f))).toDF("a", "b")
      .select($"a".cast(ArrayType(FloatType)).as("a"), $"b".cast(ArrayType(FloatType)).as("b"))
    assert(df.select(VectorFns.dot($"a", $"b")).as[Double].head() == 30.0)
    // HOF reference requires equal lengths (zip_with null-pads) — the
    // codegen'd expression is the defined semantic
    val c = df.select(VectorFns.cosineSim($"a", $"b")).as[Double].head()
    assert(!c.isNaN)
  }

  test("wordShingles on token arrays shorter than n yields one whole-array shingle") {
    val sh = Seq(Seq("only", "two")).toDF("t")
      .select(TextFns.wordShingles($"t", 3)).as[Seq[String]].head()
    assert(sh == Seq("only two"))
  }

  test("normalizeText on empty / whitespace-only / punctuation-only input") {
    val out = Seq("", "   ", ",,,!!", "\r\r").toDF("t")
      .select(TextFns.normalizeText($"t")).as[String].collect().toSeq
    assert(out == Seq("", "", "", ""))
  }

  test("minhash of the empty string is defined and deterministic") {
    val a = Seq("").toDF("t").select(HashFns.minhashSig($"t", 5, 8)).as[Seq[Long]].head()
    val b = Seq("").toDF("t").select(HashFns.minhashSig($"t", 5, 8)).as[Seq[Long]].head()
    assert(a == b && a.length == 8)
  }

  test("winnow on text shorter than k returns empty fingerprints") {
    val fp = Seq("abc").toDF("t")
      .select(HashFns.winnowFingerprints($"t", 8, 4)).as[Seq[Long]].head()
    assert(fp.isEmpty)
  }

  test("simhash of an empty token array is the zero signature") {
    val s = Seq(Seq.empty[String]).toDF("t")
      .select(HashFns.simhash($"t")).as[Long].head()
    assert(s == 0L)
  }

  test("hashingTf of an empty token array is the zero vector (no NaN from 0-norm)") {
    val v = Seq(Seq.empty[String]).toDF("t")
      .select(HashFns.hashingTfVec($"t", 8)).as[Seq[Float]].head()
    assert(v.length == 8 && v.forall(_ == 0f))
  }

  test("interleave16 uses only the low 16 bits of each input (explicit truncation)") {
    val r = Seq((65536L + 3L, 0L), (3L, 0L), (-1L, 0L))
      .toDF("a", "b")
      .select(graft.operators.Layout.interleave16($"a", $"b").as("z"))
      .as[Long].collect()
    assert(r(0) == r(1), "bit 16+ must not leak into the z-value")
    assert(r(2) == 0xAAAAAAAAL, "negative input truncates to its low 16 bits")
  }

  test("weighted mix extremes: weight 0 keeps nothing, 256 keeps everything") {
    val docs = Seq((1L, "en"), (2L, "fr"), (3L, "zh")).toDF("doc_id", "lang")
    val dir = graft.util.Scratch.dir(spark, "mix_edge_docs", "planted")
    docs.withColumn("text", lit("x"))
      .write.parquet(dir.resolve("documents.parquet").toString)
    val kept = graft.operators.Curation
      .weightedMix(spark, dir.toString, weights256 = Map("en" -> 256, "fr" -> 0),
        default256 = 0)
      .select($"lang").as[String].collect().toSeq
    assert(kept == Seq("en"), kept)
  }

  test("repetition signals on an empty-text doc are defined (no NaN/div-zero)") {
    val dir = graft.util.Scratch.dir(spark, "rep_edge_docs", "planted")
    Seq((0L, "")).toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val r = graft.operators.TextAnalysis.repetitionSignals(spark, dir.toString)
      .as[(Long, Long, Double, Double)].head()
    assert(r._2 == 1L) // split("", " ") = [""] — one empty token
    assert(!r._3.isNaN && !r._4.isNaN && r._3 == 0.0 && r._4 == 1.0)
  }

  test("upsertById with all-null dates keeps exactly one deterministic row per id") {
    val df = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDF("id", "payload")
      .withColumn("dateActualisation", lit(null).cast("timestamp"))
    val up = graft.sources.Offres.upsertById(df)
    assert(up.count() == 2)
    val first = up.filter($"id" === "a").select($"payload").as[String].head()
    val second = graft.sources.Offres.upsertById(df)
      .filter($"id" === "a").select($"payload").as[String].head()
    assert(first == second) // tuple-hash tiebreak ⇒ stable across runs
  }
}
