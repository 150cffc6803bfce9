package graft.operators

import graft.SparkSpec
import graft.operators.Skew.SaltStrategy
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 2000).map { i =>
    val k = if (i % 10 == 0) s"k${i % 7}" else "HOT"
    (k, i.toDouble)
  }.toDF("k", "v")

  test("saltedAggregate equals plain aggregation on a hot-key distribution") {
    Seq(SaltStrategy.Content, SaltStrategy.Positional).foreach { strategy =>
      val salted = Skew.saltedAggregate(skewed, $"k", salt = 8,
        Map("total" -> $"v", "n" -> lit(1L)), strategy)
        .select($"key", $"total", $"n")
        .orderBy($"key").collect().toSeq
      val plain = skewed.groupBy($"k".as("key"))
        .agg(sum($"v").as("total"), sum(lit(1L)).as("n"))
        .orderBy($"key").collect().toSeq
      // counts exact; double sums compared with tolerance (salting changes
      // the float addition order, as any repartition would)
      assert(salted.map(r => (r.getString(0), r.getLong(2))) ==
             plain.map(r => (r.getString(0), r.getLong(2))), strategy.toString)
      salted.zip(plain).foreach { case (s, p) =>
        assert(math.abs(s.getDouble(1) - p.getDouble(1)) < 1e-6)
      }
    }
  }

  test("saltedJoin equals the plain equi-join under both strategies") {
    val dim = Seq(("HOT", "hot dim"), ("k0", "zero"), ("k3", "three")).toDF("dk", "label")
    val plain = skewed.join(dim, $"k" === $"dk")
      .select($"k", $"v", $"label")
      .orderBy($"k", $"v").collect().toSeq
    Seq(SaltStrategy.Content, SaltStrategy.Positional).foreach { strategy =>
      val salted = Skew.saltedJoin(skewed, dim, $"k", $"dk", salt = 8, strategy)
        .select($"k", $"v", $"label")
        .orderBy($"k", $"v").collect().toSeq
      assert(salted == plain && salted.nonEmpty, strategy.toString)
    }
  }

  test("positional salt spreads BYTE-IDENTICAL hot rows; content salt cannot") {
    val identical = (1 to 1000).map(_ => ("HOT", 1.0)).toDF("k", "v")
    val spreadPositional = identical
      .select(Skew.saltColumn(identical, SaltStrategy.Positional, 8).as("s"))
      .distinct().count()
    val spreadContent = identical
      .select(Skew.saltColumn(identical, SaltStrategy.Content, 8).as("s"))
      .distinct().count()
    assert(spreadPositional == 8) // production salt path spreads duplicates
    assert(spreadContent == 1)    // and the content hash provably cannot
  }
}
