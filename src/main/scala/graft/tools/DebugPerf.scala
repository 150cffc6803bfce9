package graft.tools

import graft.Tables
import graft.functions.TextFns
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

    // ---- d12 decomposition -------------------------------------------
    val n = 8
    val toks = TextFns.tokens(TextFns.normalizeText(col("text")))
    val docs = Tables.documents(spark, dir)
    time("docs scan only")(docs.count())
    val tokenized = docs.select(col("doc_id"), toks.as("toks"))
    time("tokenize only")(tokenized.count())
    val shingled = docs.select(col("doc_id"),
      explode(TextFns.wordShingles(toks, n)).as("sh"))
    time("shingle explode")(println("sh rows=" + shingled.count()))
    val keyed = shingled.select(col("doc_id"), md5(col("sh").cast("binary")).as("shkey"))
    time("shingle+md5")(keyed.count())
    val evalKeys = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(TextFns.wordShingles(slice(toks, 6, 20), n)).as("sh"))
      .select(md5(col("sh").cast("binary")).as("shkey")).distinct()
    time("eval keys")(println("eval keys=" + evalKeys.count()))
    time("join+agg")(keyed.join(broadcast(evalKeys), "shkey")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_eval_hits")).count())
    time("d12 shipped x3")((1 to 3).foreach(_ =>
      graft.operators.Curation.decontaminate(spark, dir).count()))

    spark.stop()
  }
}
