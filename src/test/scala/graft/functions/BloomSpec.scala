package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBits(keys: Seq[Long]): Array[Long] =
    keys.toDF("k").as[Long]
      .select(Bloom.bloomAgg.toColumn.name("bits")).head()

  test("scala-side positions match the Column expression bit-for-bit") {
    // probe a filter that contains ONLY key `k`: the Column path agrees
    // with the Scala-side build for every sampled key iff both sides
    // compute identical (h1 + i·h2) positions
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    keys.foreach { k =>
      val bits = buildBits(Seq(k))
      val hit = Seq(k).toDF("k")
        .select(Bloom.mightContain($"k", bits).as("m")).as[Boolean].head()
      assert(hit, s"key $k missed its own singleton filter")
    }
  }

  test("fused BloomContains agrees with the composed built-in formulation") {
    val inserted = (0L until 2000L).map(_ * 7919L)
    val bits = buildBits(inserted)
    val probes = (-5000L to 5000L).toDF("k")
    val disagree = probes
      .select($"k", Bloom.containsCol($"k", bits).as("fused"),
        Bloom.mightContain($"k", bits).as("composed"))
      .filter($"fused" =!= $"composed").count()
    assert(disagree == 0)
  }

  test("null keys are dropped by both the fused and composed prefilter forms") {
    val bits = buildBits(Seq(1L, 2L, 3L))
    val df = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("k")
    assert(df.filter(Bloom.containsCol($"k", bits)).count() == 2)
    assert(df.filter(Bloom.mightContain($"k", bits)).count() == 2)
  }

  test("no false negatives over the aggregated build") {
    val keys = (0L until 5000L).map(_ * 7919L)
    val bits = buildBits(keys)
    val misses = keys.toDF("k")
      .filter(!Bloom.mightContain($"k", bits)).count()
    assert(misses == 0, s"$misses false negatives")
  }

  test("false-positive rate on disjoint keys stays within the design bound") {
    val inserted = (0L until 5000L).map(_ * 7919L)
    val bits = buildBits(inserted)
    val insertedSet = inserted.toSet
    val probes = (1L to 20000L).map(_ * 104729L + 13L).filterNot(insertedSet)
    val fp = probes.toDF("k")
      .filter(Bloom.mightContain($"k", bits)).count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.02, s"fpr=$rate") // design: ~0.3% at 5k keys / 64k bits
  }

  test("bloom-prefiltered join equals the plain join (q55 identity)") {
    val plain = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.supplier(spark, sf).filter($"s_nationkey" < 5),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").count()
      .as[(String, Long)].collect().toMap
    val viaBloom = graft.operators.Relational.bloomFilteredRevenue(spark, sf)
      .select($"s_name", $"n_items").as[(String, Long)].collect().toMap
    assert(viaBloom == plain)
  }
}
