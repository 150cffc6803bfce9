package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** clearCache only unpersists cached datasets; localCheckpoint blocks
    * (eagerly-materialized pair sets etc.) live as persistent RDDs
    * outside the cache manager — drop those too so no query runs with a
    * predecessor's storage resident.
    */
  def dropAllStorage(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    // blocking: the next timed window must not overlap async eviction
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup on the smallest fixture: JIT + codegen + parquet
    // footer caches, so the first timed query doesn't absorb JVM startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      // per-query guard: one failing query must not abort warmup for
      // the rest
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // The hash-kernel queries (minhash/shingle/vector loops) need more
    // iterations than sf0.001 provides before C2 compiles the hot loops
    // — without this, whichever of them is timed first absorbs 2-3x JIT
    // cost (and profiles gathered on tiny inputs can deoptimize at the
    // target size). One extra untimed warmup pass at the TARGET scale
    // factor: the timed runs then measure steady state.
    SparkEntry.queries
      .filter { case (name, _) => name.startsWith("d") || name.startsWith("e") ||
        name == "t07_doc_similarity" }
      .foreach { case (_, fn) =>
        try fn(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    // drop warmup persists BEFORE timing — otherwise query 1 runs with
    // the whole warmup cache footprint (or outright hits it when sfDir
    // is the warmup fixture) while queries 2..N run cold
    dropAllStorage(spark)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      dropAllStorage(spark) // drop per-query persists + checkpoint blocks (untimed)
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
