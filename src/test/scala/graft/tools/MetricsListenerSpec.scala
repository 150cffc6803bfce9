package graft.tools

import graft.SparkSpec

class MetricsListenerSpec extends SparkSpec {
  import spark.implicits._

  test("listener captures per-query wall time and success for executed actions") {
    val l = MetricsListener.install(spark)
    try {
      l.clear()
      graft.Tables.orders(spark, sf).count()
      Seq(1, 2, 3).toDF("x").collect()
      // listener callbacks run async on the listener bus; poll briefly
      var tries = 0
      while (l.snapshot(spark).count() < 2 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val rows = l.snapshot(spark)
        .select($"fn", $"duration_ns", $"succeeded")
        .as[(String, Long, Boolean)].collect()
      assert(rows.count(_._3) >= 2)
      assert(rows.filter(_._3).forall(_._2 > 0))
    } finally spark.listenerManager.unregister(l)
  }
}
