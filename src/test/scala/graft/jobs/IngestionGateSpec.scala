package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The i01/i02 driver-gate entries at sf0.001: result equals the
  * customer-derived expectation (the Spark-side mirror of the DuckDB
  * oracle), and the reconciliation ledger balances with the planted
  * malformed rows dead-lettered.
  */
class IngestionGateSpec extends SparkSpec {

  test("i01: DSv2 ingestion over HTTP lands exactly the customer-derived offers") {
    val got = IngestionGate.ingestOffres(spark, sf)
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .select(
        col("c_custkey").cast("string").as("id"),
        col("c_name").as("intitule"),
        concat(col("c_name"), lit(" ("), col("c_mktsegment"), lit(")")).as("description"),
        col("c_mktsegment").as("romeCode"),
        concat(lit("R"), col("c_custkey") % 3).as("region"),
        concat(lit("R"), col("c_custkey") % 3, lit("D"), col("c_custkey") % 2)
          .as("departement"))
    assert(got.count() == 150)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "landed offres must equal the derivation exactly (no loss, no dups)")
  }

  test("i03: a no-match pushed region filter scans empty and counts zero") {
    val got = IngestionGate.ingestEmptyFilter(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("empty_scan_rows", 0L)))
  }

  test("P6: the planner yields ZERO input partitions for a no-match pushed filter") {
    import graft.sources.{StubOffre, StubOffresServer}
    val offers = Seq(
      StubOffre(Some("1"), "a", "a (x)", "x", "R0", "R0D1"),
      StubOffre(Some("2"), "b", "b (y)", "y", "R1", "R1D0"))
    val server = new StubOffresServer(offers, Map("k1" -> "s-k1"))
    try {
      val scanned = spark.read.format("graft.sources.OffresSource")
        .options(Map(
          "endpoint" -> server.base, "authUrl" -> server.authUrl,
          "secrets" -> "k1:s-k1", "maxPerFilter" -> "400", "pageSize" -> "150"))
        .load()
        .filter(col("region") === "R9")
      // the pushed predicate narrows the plan to region R9, the count
      // probe returns 0, and planInputPartitions short-circuits to an
      // EMPTY partition array — no page is ever fetched
      assert(scanned.rdd.getNumPartitions == 0)
      assert(scanned.count() == 0L)
    } finally server.stop()
  }

  test("i02: reconciliation ledger balances with planted malformed rows") {
    val rows = IngestionGate.ingestReconciliation(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 custkeys 0..149 → 0, 50, 100 are id-less
    assert(rows == Map(
      "collected" -> 147L, "dead_letter" -> 3L,
      "expected" -> 150L, "accounted" -> 1L), rows.toString)
  }
}
