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

  test("i02: reconciliation ledger balances with planted malformed rows") {
    val rows = IngestionGate.ingestReconciliation(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sf0.001 custkeys 0..149 → 0, 50, 100 are id-less
    assert(rows == Map(
      "collected" -> 147L, "dead_letter" -> 3L,
      "expected" -> 150L, "accounted" -> 1L), rows.toString)
  }
}
