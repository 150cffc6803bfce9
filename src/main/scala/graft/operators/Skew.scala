package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation utilities (SURVEY §4 "adaptive partitioning / skew
  * handling").
  *
  * AQE's skew-join split handles most shuffle skew at runtime; these
  * cover the two places it can't:
  *  - a single hot GROUP BY key saturating one reducer →
  *    [[saltedAggregate]] does a two-phase aggregation (partial over
  *    (key, salt), final over key). Correct for any algebraic aggregate
  *    expressed as (partial, merge) pairs.
  *  - a broadcast-ineligible join with a hot key on the probe side →
  *    [[saltedJoin]] replicates each build-side row `salt` times and
  *    scatters probe rows across the replicas, so one hot key spreads
  *    over `salt` tasks.
  *
  * Salting is deterministic (hash of a caller-chosen scatter column, or
  * a stable row hash) — results are reproducible run to run.
  */
object Skew {

  /** Per-row salt independent of row CONTENT: identical duplicate rows
    * (the classic hot-key shape) must still spread across buckets, so a
    * content hash won't do — `monotonically_increasing_id` assigns by
    * physical position. Any assignment is equally correct (the second
    * aggregation phase / the join predicate absorbs it).
    */
  private def rowSalt(salt: Int): Column =
    pmod(monotonically_increasing_id(), lit(salt.toLong))

  /** Two-phase salted count/sum aggregation on a possibly-skewed key.
    * `sums` maps output column name → column to sum (count = sum of 1).
    */
  def saltedAggregate(df: DataFrame, key: Column, salt: Int,
                      sums: Map[String, Column]): DataFrame = {
    val saltCol = rowSalt(salt)
    val partials = sums.toSeq.map { case (name, c) => sum(c).as(name) }
    val finals = sums.keys.toSeq.map(name => sum(col(name)).as(name))
    df.groupBy(key.as("key"), saltCol.as("salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("key"))
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join: `large` (skewed probe side) joined to `small`
    * (build side, replicated `salt`×). Equivalent to
    * `large.join(small, largeKey === smallKey)` for any data; the win is
    * that a hot `largeKey` value fans across `salt` reducers.
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: Column, smallKey: Column, salt: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", rowSalt(salt))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLarge.join(saltedSmall,
        largeKey === smallKey && saltedLarge("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
