package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the e12-vs-e17 pair agreement that calibrates
  * `Similarity.knnJoinAgreeFloorPct`:
  * `runMain graft.tools.DebugAgree [sfDir]`.
  * Measured: ≈47% at sf0.01, ≈50% at sf0.1 (disagreement concentrates
  * on low-cosine noise neighbors, where band membership is
  * hash-family-specific). Re-run before changing the floor.
  */
object DebugAgree {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = graft.operators.Similarity.knnJoinQuery(spark, dir).cache()
    val b = graft.operators.Similarity.knnJoinQueryPortable(spark, dir).cache()
    val na = a.count(); val nb = b.count()
    val agree = a.join(b.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_semi").count()
    println(s"[debugagree] adaptive=$na anchor=$nb agree=$agree pct=${agree * 100.0 / nb}")
    spark.stop()
  }
}
