package graft.tools

import org.apache.spark.sql.SparkSession

/** Probes the batched BPE trainer's per-round cost across batch
  * shapes — the evidence that rounds (and so wall) scale with k/m
  * while each round's cost stays vocab-bound:
  * `runMain graft.tools.BpeScaleProbe [sfDir]` times
  * (rounds, m, cand) ∈ {(8,8,64), (8,16,128), (16,16,128)} and prints
  * one JSON line per shape with total merges, wall, and sec/merge.
  * (The registered t33 gate stays pinned at (8,8,64) for oracle
  * parity; this tool is how the "m is the knob" claim is measured.)
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
    val shapes = Seq((8, 8, 64), (8, 16, 128), (16, 16, 128))
    // untimed warmup (JIT + parquet footers)
    graft.operators.TextAnalysis.bpeTrainBatched(spark, sfDir, 2, 8, 64)
    graft.Bench.dropAllStorage(spark)
    shapes.foreach { case (rounds, m, cand) =>
      val t0 = System.nanoTime()
      val merges =
        graft.operators.TextAnalysis.bpeTrainBatched(spark, sfDir, rounds, m, cand)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Bench.dropAllStorage(spark)
      println(f"""{"probe":"bpe_batched","rounds":$rounds,"m":$m,"cand":$cand,"merges":${merges.size},"sec":$dt%.2f,"sec_per_merge":${dt / merges.size}%.4f,"sec_per_round":${dt / rounds}%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
