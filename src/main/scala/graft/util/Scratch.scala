package graft.util

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Session-scoped scratch directories for operators that materialize
  * through the filesystem (file-format round trips, streaming drains).
  *
  * Deterministic per (tag, input dir, Spark application): repeated
  * gate/bench/verify repetitions reuse ONE directory — wiped at the
  * start of each call — instead of leaking a fresh copy of the data per
  * invocation, and the applicationId discriminator keeps two concurrent
  * sessions pointed at the same fixture dir from wiping each other's
  * in-flight output.
  */
object Scratch {

  // every path handed out (or registered) this JVM, removed by one
  // shutdown hook — without this, the applicationId discriminator would
  // leak one full data copy per JVM run into the tmpdir
  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(p => try rmTree(p) catch { case _: Exception => () })
    }, "graft-scratch-cleanup"))
  }

  /** The scratch path for `tag` over `inputDir`, WITHOUT wiping it —
    * for code (specs, file-count evidence) that inspects a dir some
    * operator already populated.
    */
  def resolve(spark: SparkSession, tag: String, inputDir: String): Path =
    Paths.get(System.getProperty("java.io.tmpdir")).resolve(
      s"graft_${tag}_${spark.sparkContext.applicationId}_${math.abs(inputDir.hashCode)}")

  /** Resolve (and wipe) the scratch dir for `tag` over `inputDir`. */
  def dir(spark: SparkSession, tag: String, inputDir: String): Path = {
    val p = resolve(spark, tag, inputDir)
    rmTree(p)
    created.add(p)
    p
  }

  /** Register an externally-created session-scoped path (e.g. a managed
    * table's warehouse dir) for the same at-exit cleanup.
    */
  def registerForCleanup(p: Path): Unit = created.add(p)

  /** Recursive delete; closes the directory stream (it holds an FD). */
  def rmTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.iterator().asScala.foreach(rmTree)
      finally listing.close()
    }
    Files.deleteIfExists(p)
  }
}
