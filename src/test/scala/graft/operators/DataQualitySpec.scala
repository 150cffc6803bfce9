package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile matches directly-computed column stats") {
    val prof = DataQuality.profileOrders(spark, sf)
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val o = Tables.orders(spark, sf)
    val n = o.count()
    assert(prof.values.forall(_._2 == n))
    assert(prof("o_orderkey")._4 == o.select($"o_orderkey").distinct().count())
    assert(prof("o_orderkey")._3 == 0)
    assert(prof("o_totalprice")._5.get == o.agg(min($"o_totalprice")).as[Double].head())
    assert(prof("o_orderpriority")._5.isEmpty) // no numeric min for a string col
  }

  test("constraint checks: clean fixture yields zero violations, planted dirt is counted") {
    val clean = DataQuality.constraintChecks(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(clean.size == 4 && clean.values.forall(_ == 0L), clean)

    // planted dirty tables through the same rule expressions
    val dirtyO = Seq((1L, 10L, "1-URGENT"), (1L, 11L, "2-HIGH"), (2L, 999L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val dirtyC = Seq((10L, Some(1.0)), (11L, None: Option[Double]))
      .toDF("c_custkey", "c_acctbal")
    val fkViol = dirtyO.join(broadcast(dirtyC.select($"c_custkey")),
      $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(fkViol == 1) // custkey 999 is an orphan
    val dupViol = dirtyO.groupBy($"o_orderkey").count().filter($"count" > 1).count()
    assert(dupViol == 1) // orderkey 1 appears twice
    assert(dirtyC.filter($"c_acctbal".isNull).count() == 1)
  }

  test("snapshot diff change types reconcile with the merge clauses") {
    val diff = DataQuality.snapshotDiff(spark, sf).as[(String, Long)].collect().toMap
    val base = Tables.customer(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val nSupp = Tables.supplier(spark, sf).count()
    val nDeleted = base.filter($"c_mktsegment" === "MACHINERY")
      .select($"c_custkey").as[Long].collect().count(!urgent(_))
    assert(diff("inserted") == nSupp, diff)
    assert(diff("deleted") == nDeleted, diff)
    assert(diff("updated") == base.select($"c_custkey").as[Long].collect().count(urgent), diff)
    assert(diff.values.sum ==
      base.count() + nSupp) // every key accounted for exactly once
  }
}
