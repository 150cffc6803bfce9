package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest right row at-or-before each left row, per key") {
    val purchases = Seq(
      (1L, t("2024-01-01 10:30:00"), 100L),
      (1L, t("2024-01-01 12:00:00"), 101L),
      (2L, t("2024-01-01 09:00:00"), 102L), // before any click → null
      (3L, t("2024-01-01 10:00:00"), 103L)  // user with no clicks at all
    ).toDF("user_id", "ts", "event_id")
    val clicks = Seq(
      (1L, t("2024-01-01 10:00:00"), 900L),
      (1L, t("2024-01-01 10:30:00"), 901L), // simultaneous with purchase 100 → inclusive
      (1L, t("2024-01-01 11:00:00"), 902L),
      (2L, t("2024-01-01 09:30:00"), 903L)
    ).toDF("user_id", "ts", "click_id")

    val got = AsOf.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_id"))
      .select($"event_id", $"prior_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(901L)) // <= is inclusive
    assert(got(101L).contains(902L)) // latest prior, not first
    assert(got(102L).isEmpty)        // click came after
    assert(got(103L).isEmpty)        // key never seen on the right
  }

  test("bucketed range join equals the naive inequality join") {
    val purchases = graft.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").select($"user_id", $"ts", $"event_id")
    val clicks = graft.Tables.events(spark, sf)
      .filter($"event_type" === "click").select($"user_id", $"ts")
    val bucketed = AsOf.rangeJoinCount(purchases, clicks, "user_id", "ts", 3600L)
      .groupBy($"event_id").count().as[(Long, Long)].collect().toMap
    val naive = purchases.alias("p")
      .join(clicks.alias("c"),
        $"p.user_id" === $"c.user_id" &&
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.unix_timestamp($"p.ts") -
          org.apache.spark.sql.functions.unix_timestamp($"c.ts")) <= 3600)
      .groupBy($"event_id").count().as[(Long, Long)].collect().toMap
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("asof join equals a driver-side reference on randomized data") {
    val rnd = new scala.util.Random(17)
    val lefts = (0 until 300).map { i =>
      (rnd.nextInt(8).toLong, new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), i.toLong)
    }
    val rights = (0 until 300).map { i =>
      (rnd.nextInt(8).toLong, new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L), 1000L + i)
    }
    val got = AsOf.asofJoin(
      lefts.toDF("user_id", "ts", "event_id"),
      rights.toDF("user_id", "ts", "click_id"),
      "user_id", "ts", Seq("click_id"))
      .select($"event_id", $"prior_click_id")
      .as[(Long, Option[Long])].collect().toMap
    val exp = lefts.map { case (k, lt, id) =>
      val candidates = rights.filter(r => r._1 == k && !r._2.after(lt))
      // ties at equal (key, ts) resolve to the max payload (window keeps
      // the LAST row in (ts, side, payload) order)
      val best = candidates.sortBy(r => (r._2.getTime, r._3)).lastOption
      id -> best.map(_._3)
    }.toMap
    assert(got == exp)
  }

  test("asof enrichment over the fixture events is total on the left side") {
    val out = AsOf.purchasesWithPriorClick(spark, sf)
    val purchases = graft.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(out.count() == purchases) // left-join semantics: every purchase kept
    assert(out.filter($"prior_click_id".isNotNull).count() > 0)
  }
}
