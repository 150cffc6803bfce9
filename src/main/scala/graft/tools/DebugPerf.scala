package graft.tools

import graft.Tables
import graft.functions.{HashFns, TextFns}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the driver contract). */
object DebugPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[perf] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("doc_id").as("id"),
      TextFns.normalizeText(col("text")).as("text_norm"))
    val sig = base.select(col("id"),
      HashFns.minhashSig(col("text_norm"), 5, 32).as("sig"))
    time("signatures")(sig.count())
    val banded = sig.select(col("id"),
        explode(array((0 until 8).map { b =>
          struct(lit(b).as("band"),
                 hash(slice(col("sig"), b * 4 + 1, 4)).as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("id"))
    val a = banded.select(col("band"), col("bkey"), col("id").as("doc_a"))
    val bb = banded.select(col("band"), col("bkey"), col("id").as("doc_b"))
    val raw = a.join(bb, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
    time("raw band join")(println("n_raw=" + raw.count()))
    val cand = Dedup.lshCandidates(sig, 8, 4)
    time("candidates")(println("n_cand=" + cand.count()))
    val shingled = base.select(col("id"),
      TextFns.charShingles(col("text_norm"), 5).as("sh"))
    time("shingling")(shingled.count())
    // decompose d03 warm
    val docs01 = Tables.documents(spark, dir)
    val base2 = docs01.select(col("doc_id").as("id"),
      TextFns.normalizeText(col("text")).as("text_norm"))
    val sig2 = base2.select(col("id"),
      HashFns.minhashSig(col("text_norm"), 5, 32).as("sig")).persist()
    val pref = Dedup.lshCandidates(sig2, 8, 4)
      .join(sig2.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig2.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v).cast("double") / 32)
      .filter(col("est") >= 0.4)
      .select(col("doc_a"), col("doc_b"))
    time("prefiltered")(println("n_pref=" + pref.count()))
    val candA = Dedup.lshCandidatesRaw(sig2, 8, 4) // the shipped d03/d05 path
    time("cand self-join x3")((1 to 3).foreach(_ => candA.count()))
    val candB = Dedup.lshCandidatesViaBuckets(sig2, 8, 4)
    time("cand buckets x3")((1 to 3).foreach(_ => candB.count()))
    println("bucket n_cand=" + candB.count())
    time("full d03 cold")(Dedup.minHashDedup(spark, dir).count())
    time("full d03 warm")(Dedup.minHashDedup(spark, dir).count())
    time("full d05")(Dedup.ngramJaccardDedup(spark, dir).count())
    time("full d06")(Dedup.embeddingNearDup(spark, dir).count())

    time("e02 cold")(graft.operators.Similarity.knnLsh(spark, dir).count())
    time("e02 warm")(graft.operators.Similarity.knnLsh(spark, dir).count())
    time("e04 warm")(graft.operators.Similarity.knnIvf(spark, dir).count())

    // 10x replicated corpus (ids offset per copy): scaling sanity — a
    // near-linear time rise means no hidden quadratic stage. NB every
    // doc gains 9 exact dups, so pair counts explode by design; we cap
    // verification to the count.
    val docs10 = (0 until 10).map { i =>
      Tables.documents(spark, dir)
        .select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)
    time("d03 on 10x corpus")(
      println("pairs10x=" + Dedup.minHashLshPairs(docs10, "doc_id", "text").count()))
    spark.stop()
  }
}
