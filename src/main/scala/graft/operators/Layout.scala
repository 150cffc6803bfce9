package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data-layout utilities — the two storage-side levers that
  * decide whether a 100 TB join/scan shuffles (SURVEY §4):
  *
  *  - **bucketing**: write both fact tables bucketed by the join key →
  *    the join plans with zero `Exchange` (bucket-local sort-merge);
  *    the shuffle is paid once at write time, amortized over every
  *    subsequent join.
  *  - **partitioned layout**: write partitioned by a coarse key
  *    (e.g. event date) → predicates on that key prune whole
  *    directories at planning time (`PartitionFilters`, no I/O).
  */
object Layout {

  /** Write `df` as a bucketed managed table (requires a warehouse dir;
    * bucket count should target HDFS-block-sized buckets at scale).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-local join of two tables previously written with
    * [[writeBucketed]] on the same key/count: no Exchange in the plan.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  /** Write partitioned by a derived date column; queries filtering on
    * `p_date` prune partitions at plan time.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("p_date").parquet(path)

  def readPartitionPruned(spark: SparkSession, path: String,
                          date: String): DataFrame =
    spark.read.parquet(path).filter(col("p_date") === lit(date))
}
