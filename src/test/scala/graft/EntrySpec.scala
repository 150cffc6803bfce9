package graft

import org.apache.spark.sql.functions._

/** Driver-contract guards: entry smoke, every registered query runs
  * non-empty on the smallest fixture, oracle keys point at real queries,
  * and the scan plans keep pushdown/broadcast properties (SURVEY §4).
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("every oracle key has a matching query") {
    val dangling = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }

  test("filter + projection are pushed into the parquet scan (P1/P2)") {
    val plan = operators.Relational.filterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("o_orderpriority"), plan)
    // pruned read schema: only the 4 projected columns are read
    assert(!plan.contains("o_orderdate"), plan)
  }

  test("dimension joins broadcast (J1); no shuffle of the fact side for dims") {
    val plan = operators.Relational.customersPerRegion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = operators.Relational.topKOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("pricing summary stays inside WholeStageCodegen with partial aggregation") {
    val df = operators.Relational.pricingSummary(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan)      // map-side combine
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(plan).isDefined, plan) // *(n) = codegen span
  }
}
