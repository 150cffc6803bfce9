package graft.functions

import graft.SparkSpec
import graft.functions.TextFns._
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries sketch on a skewed stream finds the hot items with tight estimates") {
    val k = 8
    // 3 hot items dominate a long uniform tail
    val stream = (Seq.fill(5000)("hot1") ++ Seq.fill(3000)("hot2") ++
      Seq.fill(2000)("hot3") ++ (0 until 4000).map(i => s"tail${i % 400}"))
    val ds = spark.sparkContext.parallelize(stream, 16).toDS()
    val n = stream.size.toLong
    val sketch = ds.select(Aggregators.frequentItems(k).toColumn.name("items"))
      .collect().head.toMap
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    // every term with true frequency > n/(k+1) must survive
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(sketch.contains(t), s"heavy hitter $t missing from $sketch")
    }
    // estimates never overcount and are within the MG bound
    sketch.foreach { case (t, est) =>
      val truth = exact(t)
      assert(est <= truth, s"$t overcounted: est=$est true=$truth")
      assert(est >= truth - bound, s"$t under bound: est=$est true=$truth bound=$bound")
    }
    assert(sketch.size <= k)
  }

  test("Misra-Gries guarantees hold on the fixture corpus against exact counts") {
    val k = 16
    val terms = graft.Tables.documents(spark, sf)
      .select(explode(tokens(normalizeText($"text"))).as("term"))
      .filter(length($"term") > 0)
    val n = terms.count()
    val exact = terms.groupBy($"term").count()
      .as[(String, Long)].collect().toMap
    val sketch = graft.operators.TextAnalysis.heavyHitters(spark, sf, k)
      .as[(String, Long)].collect().toMap
    val bound = n / (k + 1)
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(sketch.contains(t), s"heavy hitter $t missing")
    }
    sketch.foreach { case (t, est) =>
      assert(est <= exact(t) && est >= exact(t) - bound,
        s"$t: est=$est true=${exact(t)} bound=$bound")
    }
  }

  test("top-k aggregator emits each group's k largest tags in order") {
    val ds = (1 to 500).map(i => ((i % 5).toString, i.toDouble, i.toLong)).toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(Aggregators.topK(3).toColumn.name("top"))
      .collect().toMap
    // group "4": values 4,9,...,499 → top tags 499, 494, 489
    assert(got("4") == Seq(499L, 494L, 489L), got.toString)
    assert(got.values.forall(_.size == 3))
  }
}
