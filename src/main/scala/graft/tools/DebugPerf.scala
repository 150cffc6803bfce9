package graft.tools

import graft.Tables
import graft.functions.{HashFns, TextFns}
import graft.operators.{Dedup, Relational}
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

    // ---- d08 decomposition -------------------------------------------
    val sh = Tables.documents(spark, dir)
      .filter(col("doc_id") < 250L)
      .select(col("doc_id"),
        HashFns.sortedShingleSet(TextFns.normalizeText(col("text")), 5).as("sh"))
    time("d08 shingles (250 docs)")(sh.localCheckpoint(true).count())
    val shc = sh.localCheckpoint(true)
    println("avg shingle set size: " +
      shc.select(avg(size(col("sh")))).collect()(0))
    val a = shc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a"))
    val b = shc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      size(col("sh")).as("n_b"))
    val pairsAll = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
    time("d08 merge all pairs")(println("pairs=" + pairsAll
      .withColumn("j", HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.25).count()))
    val ratio = pairsAll.filter(
      least(col("n_a"), col("n_b")).cast("double") /
        greatest(col("n_a"), col("n_b")) >= 0.25)
    time("d08 merge ratio-pruned")(println("pairs=" + ratio
      .withColumn("j", HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("j") >= 0.25).count()))
    println("pairs surviving ratio prefilter: " + ratio.count() + " / " +
      pairsAll.count())
    time("d08 shipped x2")((1 to 2).foreach(_ =>
      Dedup.jaccardExactPairs(spark, dir).count()))

    // ---- d04 decomposition -------------------------------------------
    val docs = Tables.documents(spark, dir)
    val sig = docs.select(col("doc_id").as("id"),
      HashFns.simhash(TextFns.tokens(TextFns.normalizeText(col("text")))).as("sig"))
    time("d04 signatures")(sig.count())
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { bnd =>
        struct(lit(bnd).as("band"),
          shiftright(col("sig"), bnd * 16).bitwiseAND(0xFFFFL).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    println("top band buckets:")
    banded.groupBy(col("band"), col("bkey")).count()
      .orderBy(col("count").desc).limit(5).collect()
      .foreach(r => println("  " + r))
    val aa = banded.select(col("band"), col("bkey"), col("id").as("doc_a"), col("sig").as("sig_a"))
    val bb = banded.select(col("band"), col("bkey"), col("id").as("doc_b"), col("sig").as("sig_b"))
    val rawPairs = aa.join(bb, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
    time("d04 raw band join")(println("n_raw=" + rawPairs.count()))
    time("d04 dedup+verify")(println("n=" + rawPairs
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3).count()))
    time("d04 shipped x2")((1 to 2).foreach(_ =>
      Dedup.simHashDedup(spark, dir).count()))

    // ---- q33 ----------------------------------------------------------
    time("q33 shipped x3")((1 to 3).foreach(_ =>
      Relational.priorityWithBigLines(spark, dir).count()))
    Relational.priorityWithBigLines(spark, dir).explain("formatted")

    spark.stop()
  }
}
