package graft.tools

import org.apache.spark.sql.SparkSession

/** Probes the batched BPE trainer's per-round cost across batch
  * shapes — the evidence that rounds (and so wall) scale with k/m
  * while each round's cost stays vocab-bound:
  * `runMain graft.tools.BpeScaleProbe [sfDir]` times
  * (rounds, m, cand) ∈ {(8,8,64), (8,16,128), (16,16,128),
  * (16,32,256)} — the last is the 512-merge real-vocab-segment shape —
  * and prints one JSON line per shape with total merges, wall,
  * sec/merge, and merge yield per round (selected/m, the disjointness-
  * saturation signal `bpeTrainBatched` logs per round). Point sfDir at
  * a ScaleStress output dir for the 10× row. (The registered t33 gate
  * stays pinned at (8,8,64) for oracle parity; this tool is how the
  * "m is the knob" claim is measured.)
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shapes = Seq((8, 8, 64), (8, 16, 128), (16, 16, 128), (16, 32, 256))
    // untimed warmup (JIT + parquet footers)
    graft.operators.TextAnalysis.bpeTrainBatched(spark, sfDir, 2, 8, 64)
    graft.Bench.dropAllStorage(spark)
    shapes.foreach { case (rounds, m, cand) =>
      val t0 = System.nanoTime()
      val merges =
        graft.operators.TextAnalysis.bpeTrainBatched(spark, sfDir, rounds, m, cand)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.dropAllStorage(spark)
      // a shape that exhausts candidates before its first selection
      // yields zero merges — emit nulls, not Infinity/NaN (which would
      // make the probe line unparseable JSON)
      val perMerge =
        if (merges.isEmpty) "null" else f"${dt / merges.size}%.4f"
      val yieldPct =
        if (merges.isEmpty) "null"
        else f"${merges.size * 100.0 / (rounds.toLong * m)}%.1f"
      println(f"""{"probe":"bpe_batched","rounds":$rounds,"m":$m,"cand":$cand,"merges":${merges.size},"sec":$dt%.2f,"sec_per_merge":$perMerge,"sec_per_round":${dt / rounds}%.3f,"yield_pct":$yieldPct,"sf":"$sfDir"}""")
    }
    // The fixture corpus saturates at ~90 merges (its distinct-word
    // vocabulary fully merges — candidates dry to zero), so a REAL
    // 512-merge segment needs a richer symbol space: adjacent-word
    // compounds (wordA_wordB), deterministically derived from the same
    // corpus — tens of thousands of distinct long tokens, the shape of
    // a real subword-vocab run.
    locally {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFns.{normalizeText, tokens}
      val rich = graft.Tables.documents(spark, sfDir)
        .select(filter(tokens(normalizeText(col("text"))),
          t => length(t) > 0).as("ts"))
        .select(explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => concat(a, lit("_"), b))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .select(regexp_replace(col("w"), "(.)", " $1 ").as("s"), col("cnt"))
        .localCheckpoint()
      // 24 rounds, not 16: measured per-round yield at m=32 is ~74%
      // (the disjointness filter's real cost), so crossing 512 merges
      // needs the extra rounds — exactly the saturation effect this
      // probe exists to measure
      val (rounds, m, cand) = (24, 32, 256)
      val t0 = System.nanoTime()
      val merges = graft.operators.TextAnalysis
        .bpeTrainBatchedFrom(rich, rounds, m, cand)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.dropAllStorage(spark)
      println(f"""{"probe":"bpe_batched_rich","rounds":$rounds,"m":$m,"cand":$cand,"merges":${merges.size},"sec":$dt%.2f,"sec_per_merge":${if (merges.isEmpty) "null" else f"${dt / merges.size}%.4f"},"sec_per_round":${dt / rounds}%.3f,"yield_pct":${if (merges.isEmpty) "null" else f"${merges.size * 100.0 / (rounds.toLong * m)}%.1f"},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
