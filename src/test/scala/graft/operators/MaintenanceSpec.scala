package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Warehouse-maintenance semantics: MERGE (q47) and SCD2 history (q48). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("merge applies update, delete, and insert clauses") {
    val out = Relational.mergeUpsert(spark, sf)
    val base = Tables.customer(spark, sf)
    val merged = out.as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap

    // INSERT: every supplier arrived under its offset key
    val nSupp = Tables.supplier(spark, sf).count()
    assert(merged.keys.count(_ >= 1000000L) == nSupp)

    // DELETE: machinery customers without urgent orders are gone
    val urgent = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val deleted = base.filter($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey").as[Long].collect().filterNot(urgent)
    assert(deleted.nonEmpty && deleted.forall(!merged.contains(_)))

    // UPDATE: a customer with urgent orders gained exactly 10·n_urgent
    val sample = base.join(Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey")
      .groupBy($"c_custkey", $"c_acctbal").agg(count(lit(1)).as("n"))
      .as[(Long, Double, Long)].head()
    val expect = BigDecimal(sample._2).setScale(2) + BigDecimal(sample._3 * 10)
    assert(BigDecimal(merged(sample._1)._3).setScale(2) == expect,
      s"${merged(sample._1)._3} vs $expect")

    // UNTOUCHED: non-machinery, non-urgent customers keep their balance
    val untouched = base
      .filter($"c_mktsegment" =!= "MACHINERY" && !$"c_custkey".isInCollection(urgent))
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)].collect()
    assert(untouched.nonEmpty)
    untouched.foreach { case (k, bal) => assert(merged(k)._3 == bal) }
  }

  test("scd2 intervals chain per key: valid_to = next valid_from, one open row") {
    val rows = Relational.scd2Intervals(spark, sf)
      .select($"user_id", $"valid_from_us", $"valid_to_us")
      .as[(Long, Long, Option[Long])].collect()
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, hist) =>
      val sorted = hist.sortBy(_._2)
      // exactly one current (open) row per key, and it is the last one
      assert(sorted.count(_._3.isEmpty) == 1, s"user $u open rows")
      assert(sorted.last._3.isEmpty)
      // intervals chain without gaps or overlaps
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"user $u gap: $a -> $b")
        case _ => ()
      }
    }
  }

  test("q60 incremental refresh equals the full recompute; base partials materialized") {
    val got = Relational.incrementalAgg(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    val full = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")).as("total_cents"))
      .orderBy($"o_custkey")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == full)
    // the stored-partials MV exists and is per-customer (≪ base rows):
    // the refresh read THESE, not the base orders slice
    val baseDir = graft.util.Scratch.resolve(spark, "q60_base", sf)
    val stored = spark.read.parquet(baseDir.toString)
    assert(stored.count() <= Tables.customer(spark, sf).count())
    assert(stored.columns.toSet == Set("o_custkey", "n_orders", "cents"))
  }
}
