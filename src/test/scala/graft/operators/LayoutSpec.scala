package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without any Exchange (co-located sort-merge)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Layout.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 4)
      Layout.writeBucketed(
        Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = Layout.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey", "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // the whole point of bucketing
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("date-partitioned layout prunes partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Layout.writeDatePartitioned(Tables.events(spark, sf), "ts", dir)
    val all = spark.read.parquet(dir)
    val dates = all.select($"p_date").distinct().count()
    assert(dates > 1)

    val oneDay = Layout.readPartitionPruned(spark, dir, "2024-01-01")
    oneDay.collect()
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("p_date"), scan)
    // pruned scan reads strictly fewer files than the full table
    val prunedCount = oneDay.count()
    assert(prunedCount > 0 && prunedCount < all.count())
  }
}
