package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 2000).map { i =>
    val k = if (i % 10 == 0) s"k${i % 7}" else "HOT"
    (k, i.toDouble)
  }.toDF("k", "v")

  test("saltedAggregate equals plain aggregation on a hot-key distribution") {
    val salted = Skew.saltedAggregate(skewed, $"k", salt = 8,
      Map("total" -> $"v", "n" -> lit(1L)))
      .select($"key", $"total", $"n")
      .orderBy($"key").collect().toSeq
    val plain = skewed.groupBy($"k".as("key"))
      .agg(sum($"v").as("total"), sum(lit(1L)).as("n"))
      .orderBy($"key").collect().toSeq
    // counts exact; double sums compared with tolerance (salting changes
    // the float addition order, as any repartition would)
    assert(salted.map(r => (r.getString(0), r.getLong(2))) ==
           plain.map(r => (r.getString(0), r.getLong(2))))
    salted.zip(plain).foreach { case (s, p) =>
      assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
    }
  }

  test("saltedJoin equals the plain equi-join") {
    val dim = Seq(("HOT", "hot dim"), ("k0", "zero"), ("k3", "three")).toDF("dk", "label")
    val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", salt = 8)
      .select($"k", $"v", $"label")
      .orderBy($"k", $"v").collect().toSeq
    val plain = skewed.join(dim, $"k" === $"dk")
      .select($"k", $"v", $"label")
      .orderBy($"k", $"v").collect().toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salting spreads even BYTE-IDENTICAL hot rows across buckets") {
    // identical rows defeat content-hash salting; positional salt must
    // still fan them out
    val identical = (1 to 1000).map(_ => ("HOT", 1.0)).toDF("k", "v")
    val spread = Skew.saltedAggregate(identical, $"k", salt = 8,
      Map("n" -> lit(1L)))
    val total = spread.select($"n").as[Long].head()
    assert(total == 1000)
    val buckets = identical
      .select(pmod(monotonically_increasing_id(), lit(8L)).as("salt"))
      .distinct().count()
    assert(buckets == 8)
  }
}
