package graft.tools

import java.nio.file.Files

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N-append-cycle LONGEVITY probe for the persisted LSH index — the
  * production nightly runs hundreds of increments, not the one that
  * p06/s19 prove. This harness re-slices the fixture delta into N
  * equal id-range increments and drives the real append path
  * ([[Dedup.appendLshDetect]]) through all of them, measuring per
  * cycle:
  *
  *  - detect+append wall (must stay flat: per-batch cost is the batch
  *    hash + collision fan-in, never the corpus);
  *  - the size-partials read (sum over the append-only partials — the
  *    per-probe overhead that grows with cycle count until compaction
  *    merges it);
  *  - live parquet file counts under bands/ and sizes/ (the append-only
  *    accretion compaction exists to reclaim).
  *
  * Then it COMPACTS ([[Dedup.compactLshIndex]]) and re-measures: the
  * post-compaction detect of a fixed probe slice must be row-identical
  * to the pre-compaction detect (parity printed as a hard check), the
  * file counts collapse to the compaction target, and the sizes read
  * drops to a single-partial lookup.
  *
  * Usage: `runMain graft.tools.IndexLifecycle [sfDir] [nCycles]`
  * (defaults /root/testdata/sf0.1, 10). Prints one [lifecycle] line per
  * cycle; paste the table into PLANS.md.
  */
object IndexLifecycle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-index-lifecycle")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val split = Dedup.incrementalSplit.toLong
    val idxDir = Files.createTempDirectory("graft_lifecycle_idx").toString
    val outDir = Files.createTempDirectory("graft_lifecycle_out").toString
    def secs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def fileCount(table: String): Int = {
      val d = new java.io.File(s"$idxDir/$table")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    // the per-probe overhead a grown partials table adds: one full
    // sizes read+merge, timed cold (no caching in lshIndexSizes)
    def sizesReadSec(): Double =
      secs(spark.read.parquet(s"$idxDir/sizes")
        .groupBy(col("band"), col("bkey")).agg(sum(col("bsz")))
        .count())._2

    val (_, buildSec) = secs(
      Dedup.buildLshIndex(docs.filter(col("doc_id") < split),
        "doc_id", "text", idxDir))
    println(f"[lifecycle] build history=[0,$split) wall=$buildSec%.2fs " +
      f"bands_files=${fileCount("bands")} sizes_files=${fileCount("sizes")}")

    val step = math.max(1L, (maxId - split) / n)
    println("[lifecycle] | cycle | delta ids | append+detect s | sizes read s | bands files | sizes files |")
    println("[lifecycle] |---|---|---|---|---|---|")
    (0 until n).foreach { i =>
      val lo = split + i * step
      val hi = if (i == n - 1) maxId else lo + step
      val (_, wall) = secs(Dedup.appendLshDetect(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
        "doc_id", "text", idxDir, outDir))
      println(f"[lifecycle] | ${i + 1} | [$lo,$hi) | $wall%.2f | ${sizesReadSec()}%.2f " +
        f"| ${fileCount("bands")} | ${fileCount("sizes")} |")
    }

    // compaction parity: a fixed probe slice must detect identically
    // against the uncompacted and the compacted index. The probe slice
    // was itself appended in cycle N, so its ids exist in BOTH the
    // index and the probe batch — the verify join would emit each
    // collided pair once per (index copy × batch copy); dedup to the
    // true PAIR SET so the printed count is detections, not join
    // multiplicity (parity holds either way, the count is evidence)
    val probe = docs.filter(col("doc_id") >= maxId - step)
    def detectProbe(): Seq[(Long, Long, Double)] =
      Dedup.detectDeltaPairs(probe, "doc_id", "text", idxDir)
        .dropDuplicates("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    val (before, preSec) = secs(detectProbe())
    // fixture-sized compaction target (a cluster run sizes this by
    // bytes; the fixture's point is the file-count collapse)
    val (_, compactSec) = secs(Dedup.compactLshIndex(spark, idxDir, targetFiles = 4))
    val (after, postSec) = secs(detectProbe())
    require(before == after,
      s"COMPACTION PARITY FAILED: ${before.size} pairs before vs ${after.size} after")
    println(f"[lifecycle] compact wall=$compactSec%.2fs — " +
      f"bands_files=${fileCount("bands")} sizes_files=${fileCount("sizes")} " +
      f"sizes_read=${sizesReadSec()}%.2fs")
    println(f"[lifecycle] probe parity OK (${before.size} pairs): " +
      f"detect pre-compact=$preSec%.2fs post-compact=$postSec%.2fs")
    graft.util.Scratch.rmTree(java.nio.file.Paths.get(idxDir))
    graft.util.Scratch.rmTree(java.nio.file.Paths.get(outDir))

    // — the IVF half: the SAME longevity question for the e13 index —
    // N frozen-centroid append cycles (per-cycle assign+append wall,
    // query-from-loaded-index wall, assignments file count), then the
    // in-place RETRAIN (e22's op) with a query-parity check against a
    // from-scratch rebuild.
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val vMax = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val vSplit = Similarity.indexBaseSplit.toLong
    val ivfDir = Files.createTempDirectory("graft_lifecycle_ivf").toString
    def ivfFiles(): Int = {
      val d = new java.io.File(s"$ivfDir/assignments")
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    val queries = emb.filter(col("vec_id") < 10)
    def querySec(): Double =
      secs(Similarity.queryIvfIndexFixedPoint(spark, ivfDir, queries,
        "vec_id", "embedding", k = 5).count())._2
    val (_, ivfBuild) = secs(Similarity.buildIvfIndexFixedPoint(
      emb.filter(col("vec_id") < vSplit), "vec_id", "embedding", ivfDir))
    println(f"[lifecycle] IVF build base=[0,$vSplit) wall=$ivfBuild%.2fs " +
      f"assign_files=${ivfFiles()}")
    val vStep = math.max(1L, (vMax - vSplit) / n)
    println("[lifecycle] | cycle | delta ids | append s | query s | assign files |")
    println("[lifecycle] |---|---|---|---|---|")
    (0 until n).foreach { i =>
      val lo = vSplit + i * vStep
      val hi = if (i == n - 1) vMax else lo + vStep
      val (_, wall) = secs(Similarity.appendIvfIndexFixedPoint(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi),
        "vec_id", "embedding", ivfDir))
      println(f"[lifecycle] | ${i + 1} | [$lo,$hi) | $wall%.2f | ${querySec()}%.2f " +
        f"| ${ivfFiles()} |")
    }
    // retrain (e22's op): in-place staged swap; query parity vs a
    // from-scratch full-corpus rebuild, and the file accretion resets
    val (_, retrainSec) = secs(Similarity.retrainIvfIndexFixedPoint(
      emb, "vec_id", "embedding", ivfDir))
    val postRetrain = Similarity.queryIvfIndexFixedPoint(spark, ivfDir, queries,
      "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    val fresh = Similarity.kmeansIvfTopKFixedPoint(emb, queries,
      "vec_id", "embedding", k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    require(postRetrain == fresh,
      s"RETRAIN PARITY FAILED: ${postRetrain.size} rows vs rebuild ${fresh.size}")
    println(f"[lifecycle] IVF retrain wall=$retrainSec%.2fs - " +
      f"assign_files=${ivfFiles()} query=${querySec()}%.2fs " +
      f"(parity with from-scratch rebuild OK, ${postRetrain.size} rows)")
    graft.util.Scratch.rmTree(java.nio.file.Paths.get(ivfDir))
    spark.stop()
  }
}
