package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: deterministic train/val/test splits,
  * per-group balanced sampling, and priority-source deduplication.
  *
  * All three are CONTENT-DETERMINISTIC (keyed on md5, which is
  * bit-identical across engines) rather than seeded-random: re-running
  * the pipeline on a grown corpus keeps every previously-assigned
  * document in the same split/sample, which is what a training pipeline
  * needs for leak-free eval sets. md5 is the cross-engine-stable choice
  * here (the oracle reproduces it exactly); the intra-engine fast path
  * would be xxhash64.
  */
object Curation {

  /** Lexicographic md5-hex of a long id — deterministic, uniform, and
    * identical in Spark and DuckDB (both emit lowercase hex).
    */
  private def idHash(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** q41: deterministic train/val/test assignment by hash prefix.
    * First hex nibble < 'c' → train (12/16 = 75%), < 'e' → val
    * (2/16 = 12.5%), else test (12.5%). Pure per-row expression — no
    * shuffle, no driver state; scales as a map-only stage and is stable
    * under corpus growth (adding documents never reassigns old ones —
    * the property that keeps eval sets leak-free across pipeline runs).
    */
  def deterministicSplit(spark: SparkSession, dir: String): DataFrame = {
    val nib = substring(idHash(col("doc_id")), 1, 1)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(nib < "c", "train").when(nib < "e", "val").otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** q42: balanced per-group sampling — cap each language at `cap`
    * documents, chosen by hash order (deterministic "random" sample).
    * One shuffle on the group key; the per-group top-`cap` is a
    * rank-filter, so each reducer holds one group's stream, not the
    * corpus. Skewed group sizes are bounded by the same salting tools
    * as any hot-key aggregate ([[Skew]]); at 100 TB the win is that the
    * payload shuffled is (id, lang, 32-byte hash), never the text.
    */
  def balancedSample(spark: SparkSession, dir: String, cap: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), idHash(col("doc_id")).as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** q54: weighted corpus mixing — downsample each group to a target
    * fraction (the "mixture weights" stage of training-data assembly:
    * e.g. keep all English, half of everything else). The keep decision
    * compares the doc's hash prefix against the group's weight
    * threshold: map-only, no shuffle, and — like [[deterministicSplit]]
    * — stable under corpus growth, so re-mixing an extended corpus
    * never flips previously-kept documents. Weights are expressed in
    * 256ths via the first hash byte (hex chars 1-2).
    */
  def weightedMix(spark: SparkSession, dir: String,
                  weights256: Map[String, Int] = Map("en" -> 256, "fr" -> 192),
                  default256: Int = 128): DataFrame = {
    // two-char lowercase hex compares lexicographically == numerically,
    // so the keep test is a pure string comparison that is literally
    // identical in the oracle; w ≥ 256 = keep-all ("g" > every hex pair)
    def hx(w: Int): String = if (w >= 256) "g" else f"$w%02x"
    val byte0 = substring(idHash(col("doc_id")), 1, 2)
    val threshold = weights256.toSeq.sortBy(_._1)
      .foldLeft(lit(hx(default256))) { case (acc, (lang, w)) =>
        when(col("lang") === lang, hx(w)).otherwise(acc)
      }
    Tables.documents(spark, dir)
      .filter(byte0 < threshold)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** d09: priority-source deduplication — when the same content arrives
    * from several sources, keep the copy from the most-trusted source
    * (here: lang as the source surrogate, en > fr > rest; ties broken
    * by lowest id). The group key is md5(normalized text) — a 32-byte
    * surrogate, so the shuffle carries (key, priority, id, lang) and
    * never the document body: the d02 fingerprint-dedup shape with a
    * priority policy on top.
    */
  def priorityDedup(spark: SparkSession, dir: String): DataFrame = {
    val prio = when(col("lang") === "en", 0)
      .when(col("lang") === "fr", 1)
      .otherwise(2)
    val w = Window.partitionBy(col("ckey")).orderBy(col("prio"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), prio.as("prio"),
        md5(normalizeText(col("text")).cast("binary")).as("ckey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("ckey"))))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("keeper_id"), col("lang"), col("n_copies"))
      .orderBy(col("keeper_id"))
  }
}
