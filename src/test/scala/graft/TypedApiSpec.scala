package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The typed Dataset surface: case-class Encoders over the dimension
  * tables, compile-time field checks, typed joins/aggregations — the
  * `Dataset[T]` side of the engine's API (SURVEY §1 "typed vs untyped").
  */
case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
case class Region(r_regionkey: Int, r_name: String)

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("dimension tables load as typed Datasets with case-class encoders") {
    val nations: Dataset[Nation] = Tables.nation(spark, sf).as[Nation]
    val regions: Dataset[Region] = Tables.region(spark, sf).as[Region]
    assert(nations.count() == 25 && regions.count() == 5)
    // typed transform: compile-time field access
    val names = nations.filter(_.n_regionkey == 0).map(_.n_name).collect()
    assert(names.nonEmpty && names.forall(_.startsWith("NATION_")))
  }

  test("typed join + typed aggregation") {
    val nations = Tables.nation(spark, sf).as[Nation]
    val regions = Tables.region(spark, sf).as[Region]
    val joined: Dataset[(Nation, Region)] =
      nations.joinWith(regions, nations("n_regionkey") === regions("r_regionkey"))
    val perRegion = joined.groupByKey(_._2.r_name).count().collect().toMap
    assert(perRegion.values.sum == 25)
    assert(perRegion.keySet == Set("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
  }
}
