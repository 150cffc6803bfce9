package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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
  * Two salt strategies, with a real tradeoff:
  *  - [[SaltStrategy.Content]] (default): hash of the whole row —
  *    retry-deterministic (a recomputed map task reassigns identical
  *    salts, the SPARK-23207 requirement for expressions feeding a
  *    shuffle key), but byte-identical duplicate rows all land in one
  *    bucket, so it cannot spread a hot key made of exact duplicates.
  *  - [[SaltStrategy.Positional]]: `monotonically_increasing_id`-based —
  *    spreads even identical rows, but the assignment depends on
  *    physical row position, so a partial map-task recomputation after
  *    a shuffle-fetch failure may re-salt rows differently (double
  *    count / loss on that failure path). Use when duplicates dominate
  *    the hot key AND the job can tolerate retry-window inconsistency
  *    (or runs with full-stage retry).
  */
object Skew {

  sealed trait SaltStrategy
  object SaltStrategy {
    case object Content extends SaltStrategy
    case object Positional extends SaltStrategy
  }

  private[operators] def saltColumn(df: DataFrame, strategy: SaltStrategy,
                                    salt: Int): Column = strategy match {
    case SaltStrategy.Content =>
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(salt.toLong))
    case SaltStrategy.Positional =>
      pmod(monotonically_increasing_id(), lit(salt.toLong))
  }

  /** Two-phase salted count/sum aggregation on a possibly-skewed key.
    * `sums` maps output column name → column to sum (count = sum of 1).
    */
  def saltedAggregate(df: DataFrame, key: Column, salt: Int,
                      sums: Map[String, Column],
                      strategy: SaltStrategy = SaltStrategy.Content): DataFrame = {
    val saltCol = saltColumn(df, strategy, salt)
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
                 largeKey: Column, smallKey: Column, salt: Int,
                 strategy: SaltStrategy = SaltStrategy.Content): DataFrame = {
    val saltedLarge = large.withColumn("__salt", saltColumn(large, strategy, salt))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLarge.join(saltedSmall,
        largeKey === smallKey && saltedLarge("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  // — registered queries: salting must be INVISIBLE in the result, so
  //   both are oracle-checked against the plain (unsalted) SQL —

  /** q35: two-phase salted aggregation over lineitem's 3-value
    * returnflag — the worst-case hot-key shape (every row is one of 3
    * keys; an unsalted final agg puts a third of the table on one
    * reducer; the salted partial spreads it over 8× as many).
    */
  def saltedReturnflagAgg(spark: SparkSession, dir: String): DataFrame =
    saltedAggregate(graft.Tables.lineitem(spark, dir), col("l_returnflag"),
      salt = 8,
      sums = scala.collection.immutable.ListMap(
        "n" -> lit(1L),
        "sum_qty" -> col("l_quantity")))
      .select(col("key").as("l_returnflag"), col("n"), col("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** q36: salted equi-join lineitem ⋈ supplier + revenue rollup —
    * result identical to the plain join (oracle), with the hot probe
    * keys fanned across salt replicas.
    */
  def saltedSupplierRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val sup = graft.Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
    saltedJoin(li, sup, col("l_suppkey"), col("s_suppkey"), salt = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy(col("s_name"))
  }
}
