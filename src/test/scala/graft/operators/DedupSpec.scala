package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 0/1 exact dups (modulo punctuation), 2/3 near dups,
  // 4..9 unrelated
  private lazy val planted = Seq(
    (0L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox, jumps over the lazy dog near the river bank today!"),
    (2L, "spark engines process massive parquet datasets with columnar scans and pushdown filters enabled"),
    (3L, "spark engines process massive parquet datasets with columnar scans and pushdown predicates enabled"),
    (4L, "completely unrelated text about gardening tulips and watering schedules in spring"),
    (5L, "another document concerning medieval castle architecture and defensive moats"),
    (6L, "recipes for sourdough bread require patience starter flour water and salt"),
    (7L, "orbital mechanics of low earth satellites depend on atmospheric drag models"),
    (8L, "financial derivatives pricing uses stochastic calculus and monte carlo methods"),
    (9L, "deep learning optimizers like adam combine momentum with adaptive rates"),
  ).toDF("doc_id", "text")

  test("exact dedup groups the punctuation-variant duplicates") {
    val pairs = Dedup.minHashLshPairs(planted, "doc_id", "text", threshold = 0.6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"missing exact-dup pair, got $pairs")
    assert(pairs.contains((2L, 3L)), s"missing near-dup pair, got $pairs")
    assert(!pairs.exists(p => p._1 >= 4L), s"false positives: $pairs")
  }

  test("simhash flags the near-dup pair within hamming budget") {
    val pairs = Dedup.simHashPairs(planted, "doc_id", "text", maxHamming = 10)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
  }

  test("word-ngram jaccard finds near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(planted, "doc_id", "text", n = 3, threshold = 0.4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 >= 4L))
  }

  test("embedding near-dup finds planted almost-parallel vectors") {
    val rnd = new scala.util.Random(11)
    def v(): Array[Float] = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val base = v()
    val near = base.map(x => x + 0.01f * (rnd.nextFloat() - 0.5f))
    val rows = Seq((0L, base.toSeq), (1L, near.toSeq)) ++
      (2L until 40L).map(i => (i, v().toSeq))
    val emb = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast(ArrayType(FloatType)).as("embedding"))
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      dim = 32, threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
  }

  test("bucket-collect candidate generation agrees with the band self-join") {
    import graft.functions.{HashFns, TextFns}
    val sig = graft.Tables.documents(spark, sf)
      .select($"doc_id".as("id"),
        HashFns.minhashSig(TextFns.normalizeText($"text"), 5, 32).as("sig"))
    val a = Dedup.lshCandidates(sig, 8, 4)
      .as[(Long, Long)].collect().toSet
    val b = Dedup.lshCandidatesViaBuckets(sig, 8, 4)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("dupClusters collapses transitive chains to one cluster root") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L)) // chain collapses
    assert(clusters(10L) == 10L && clusters(11L) == 10L)  // separate cluster
  }

  test("distributed label propagation agrees with driver union-find") {
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 60).map(_ => (rnd.nextInt(30).toLong, 30L + rnd.nextInt(30)))
      .toDF("doc_a", "doc_b")
    val local = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.dupClusters(pairs, localLimit = 0L) // force iterative path
      .as[(Long, Long)].collect().toMap
    assert(local == dist && local.nonEmpty)
  }

  test("d10 gate entry: cluster labels are component minima over the exact pairs") {
    val pairs = Dedup.jaccardExactPairs(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val labels = Dedup.dupClustersQuery(spark, sf)
      .as[(Long, Long)].collect().toMap
    // every endpoint of a pair is labeled, label ≤ id, label is in the map
    pairs.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.foreach { case (id, c) =>
      assert(c <= id && labels(c) == c, s"label $c of $id is not a root")
    }
  }

  test("fingerprint dedup counts match exact dedup on the fixture corpus") {
    val a = Dedup.exactDedup(spark, sf).count()
    val b = Dedup.fingerprintDedup(spark, sf).count()
    assert(a == b)
  }

  test("exact jaccard pairs are a superset of LSH pairs at the same threshold") {
    // d08 is the ground truth d03 approximates: every LSH-verified pair
    // within the id slice must appear in the exact pair set, with the
    // identical jaccard value (same shingling, same normalize chain)
    val exact = Dedup.jaccardExactPairs(spark, sf, maxId = 300L, threshold = 0.6)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Dedup.minHashLshPairs(
        graft.Tables.documents(spark, sf).filter($"doc_id" < 300), "doc_id", "text",
        threshold = 0.6)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(lsh.nonEmpty, "fixture should contain planted near-dups under id 300")
    lsh.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j), s"pair $pair: exact=${exact.get(pair)} lsh=$j")
    }
  }
}
