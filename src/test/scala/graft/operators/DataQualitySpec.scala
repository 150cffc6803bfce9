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

    // planted dirty tables flow through the PRODUCTION rule expressions
    val dirtyO = Seq((1L, 10L, "1-URGENT"), (1L, 11L, "2-HIGH"), (2L, 999L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val dirtyC = Seq((10L, Some(1.0)), (11L, None: Option[Double]))
      .toDF("c_custkey", "c_acctbal")
    val dirtyLi = Seq((1L, 10.0), (1L, -3.0), (2L, 51.0))
      .toDF("l_orderkey", "l_quantity")
    val dirty = DataQuality.constraintChecksOn(dirtyO, dirtyC, dirtyLi)
      .as[(String, Long)].collect().toMap
    assert(dirty("orders_custkey_fk") == 1, dirty)        // custkey 999 orphan
    assert(dirty("orders_orderkey_unique") == 2, dirty)   // orderkey 1 twice
    assert(dirty("lineitem_quantity_range") == 2, dirty)  // -3 and 51
    assert(dirty("customer_acctbal_notnull") == 1, dirty)
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

  test("observed profile (q66) equals a direct aggregate over orders") {
    val got = DataQuality.observedProfile(spark, sf)
      .as[(Long, Double, String, String)].head()
    val want = Tables.orders(spark, sf).agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(
          $"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.min($"o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.max($"o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .as[(Long, Double, String, String)].head()
    assert(got == want)
  }

  test("q88 power-sum moments agree with Spark's built-in var_samp/stddev/corr/regr_slope") {
    val got = DataQuality.statsMoments(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        var_samp($"l_quantity").as("v"), stddev_samp($"l_quantity").as("s"),
        corr($"l_quantity", $"l_extendedprice").as("c"),
        regr_slope($"l_extendedprice", $"l_quantity").as("b"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (flag, (n, v, s, c, b)) =>
      val (rn, rv, rs, rc, rb) = ref(flag)
      assert(n == rn)
      // built-ins accumulate floats in partition order; the power-sum
      // epilogue is algebraically identical, so only ULP-noise differs
      assert(math.abs(v - rv) / rv < 1e-9, s"$flag var $v vs $rv")
      assert(math.abs(s - rs) / rs < 1e-9)
      assert(math.abs(c - rc) < 1e-9)
      assert(math.abs(b - rb) / math.abs(rb) < 1e-9)
    }
  }

  test("observed profile on an EMPTY input yields a null-row profile, not a crash") {
    // sum/min/max observe as null on zero rows; the profile must read
    // them null-safely and emit one all-null row (count 0), because a
    // profiling operator is exactly the thing pointed at unknown inputs
    val empty = Tables.orders(spark, sf).limit(0)
    val row = DataQuality.observedProfileOf(empty).head()
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("q92 outliers are exactly the rows beyond k sigma of their group") {
    // cross-check against a direct two-pass computation with plain
    // double stats (tolerant compare — the operator's exact-decimal
    // path must agree with textbook z-scores on which rows are out)
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value").collect()
    val byType = ev.groupBy(_.getString(1)).toSeq
    val expected = byType.flatMap { case (t, rows) =>
      val xs = rows.map(r => math.rint(r.getDouble(2) * 100) / 100)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      rows.zip(xs).collect {
        case (r, x) if (x - mean) * (x - mean) > 9.0 * variance =>
          (t, r.getLong(0))
      }
    }.toSet
    val got = DataQuality.valueOutliers(spark, sf)
      .select($"event_type", $"event_id").as[(String, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty, "heavy-tailed fixture must have 3-sigma outliers")
  }

  test("q94 MAD outliers match a driver-side discrete-median recompute") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    def discMed(xs: Seq[(BigDecimal, Long)]): BigDecimal = {
      val sorted = xs.sortBy(identity)
      sorted(((sorted.length + 1) / 2) - 1)._1
    }
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (t, rows) =>
      val med = discMed(rows.map(r => (r._3, r._1)).toSeq)
      val devs = rows.map(r => (r._1, (r._3 - med).abs))
      val mad = discMed(devs.map { case (id, d) => (d, id) }.toSeq)
      devs.collect { case (id, d) if d > mad * 3 => (t, id) }
    }.toSet
    val got = DataQuality.madOutliers(spark, sf)
      .select($"event_type", $"event_id").as[(String, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // MAD is the robust complement: on this heavy tail it must flag a
    // superset-sized set vs the 3-sigma gate (sigma is inflated by the
    // very outliers it should detect)
    val zCount = DataQuality.valueOutliers(spark, sf).count()
    assert(got.size > zCount)
  }

  test("q96 sampled quantiles land within 0.1 rank-fraction of the target") {
    val full = Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val rows = DataQuality.sampledQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, q, est) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val xs = full(t)
      // realized rank fraction of the estimate in the FULL distribution
      val frac = xs.count(_ <= est).toDouble / xs.length
      assert(math.abs(frac - q) <= 0.1,
        s"$t q=$q est=$est realized-rank=$frac")
    }
  }
}
