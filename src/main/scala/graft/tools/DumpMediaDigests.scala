package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the m09 golden-digest oracle rows:
  * `runMain graft.tools.DumpMediaDigests [outFile]`
  * prints (and optionally writes) the literal `VALUES` tuples that
  * [[graft.operators.Multimodal.mediaDigestsOracleSql]] pins. Run this
  * ONLY to re-pin after a deliberate fixture or JDK-codec change — the
  * whole point of the gate is that these values never move otherwise.
  */
object DumpMediaDigests {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Multimodal.mediaDigests(spark, "").collect()
    val tuples = rows.map { r =>
      s"(${r.getLong(0)}, '${r.getString(1)}', ${r.getLong(2)})"
    }.mkString(",\n")
    args.headOption match {
      case Some(out) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          tuples.getBytes("UTF-8"))
        println(s"[dumpmediadigests] wrote ${rows.length} tuples to $out")
      case None => println(tuples)
    }
    spark.stop()
  }
}
