package graft.operators

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** As-of join — for every left row, the latest right row with
  * `right.time <= left.time` on the same key. Spark has no native ASOF
  * join; per the extension ladder this composes from built-ins
  * (preference (a)): tag both sides, union, and carry the right-side
  * payload forward with a `last(_, ignoreNulls)` running window.
  *
  * One shuffle on (key), one sort on (time, side) — the same cost as a
  * sort-merge join, with no range-explosion. Right rows sort BEFORE
  * left rows at equal timestamps, giving inclusive `<=` semantics.
  *
  * At 100 TB this is the shape that works: both sides shuffle once by
  * key, each partition is a single time-ordered sweep, and state per
  * key is one row (the last-seen right payload) — contrast with the
  * naive `left.join(right, key && rt <= lt)` + max-window, which
  * explodes to O(|left|·|right per key|) intermediate rows.
  */
object AsOf {

  /** @param rightPayload right-side columns to carry onto left rows
    *                     (null when no right row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // normalize both sides to: key, time, side-tag, left cols…, payload…
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)

    // ordering includes ALL payload columns so ties among multiple
    // right rows at the same (key, time) resolve deterministically
    // (payload types must be orderable); safe for empty payload lists.
    // NOTE: this picks the MAX payload at an exact (key, time) tie;
    // SQL ASOF JOIN engines (e.g. DuckDB, the q31 oracle) leave that
    // tie choice unspecified, so oracle agreement on tie-heavy data is
    // not guaranteed — the nanos-timestamp fixture is effectively
    // tie-free, which is what keeps q31 green. Canonicalize the right
    // side (one row per key,time) upstream if ties matter.
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col(time), col("__side")) ++
        rightPayload.map(c => col(s"__r_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((Seq(col(key), col(time), col("__side")) ++
        leftCols.filterNot(c => c == key || c == time).map(col) ++
        rightPayload.map(c => last(col(s"__r_$c"), ignoreNulls = true)
          .over(w).as(s"__r_$c"))): _*)

    carried.filter(col("__side") === 1).drop("__side")
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__r_$c").as(s"prior_$c")): _*)
  }

  /** Bounded range join via time-bucketing: events of one type joined
    * to events of another within ±window on the same key. The naive
    * formulation (`a.join(b, key && abs(at - bt) <= w)`) degenerates to
    * a per-key cross product; bucketing each probe row into the
    * ceil(2w/bucket)+1 coarse buckets its window can touch turns it
    * into an equi-join on (key, bucket) whose output is already
    * window-bounded — the standard scalable shape for interval joins.
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
                     time: String, windowSec: Long): DataFrame = {
    val bucket = windowSec // bucket width = window → probe touches 3 buckets
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / bucket).cast("long")
    val l = left
      .withColumn("__b", explode(array(Seq(-1, 0, 1).map(d => bucketOf(col(time)) + d): _*)))
    val r = right
      .withColumn("__b", bucketOf(col(time)))
      .select(col(key), col("__b"), col(time).as("__rt"))
    l.join(r, Seq(key, "__b"))
      .filter(abs(unix_timestamp(col(time)) - unix_timestamp(col("__rt"))) <= windowSec)
      .drop("__b")
  }

  /** Range-join query: for each purchase, how many clicks the same user
    * made within ±1 hour.
    */
  def purchaseClickProximity(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    rangeJoinCount(purchases, clicks, "user_id", "ts", 3600L)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy(col("event_id"))
  }

  /** Flagship as-of query: each purchase enriched with the user's latest
    * prior (or simultaneous) click event id.
    */
  def purchasesWithPriorClick(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("prior_click_id"))
      .orderBy(col("event_id"))
  }
}
