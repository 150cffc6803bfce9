package graft.operators

import graft.Tables
import graft.functions.TextFns._
import graft.functions.VectorFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash group), MinHash+LSH banding, SimHash, n-gram Jaccard and
  * embedding-cosine near-dup.
  *
  * Scale design: every signature (minhash, simhash, fingerprint) is a
  * pure per-row expression — computed map-side with zero shuffle. The
  * only shuffles are (a) the LSH band groupBy, whose key cardinality is
  * tunable via `bands` and whose per-bucket size is bounded by banding
  * probability, and (b) the final candidate-pair verification join,
  * which is keyed by doc id. No O(n²) stage anywhere; brute-force
  * verification only runs over LSH candidates.
  */
object Dedup {

  /** Exact dedup by normalized-text group: deterministic keeper =
    * min(doc_id) (the reference's `_id`-keyed idempotent upsert, S6).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(normalizeText(col("text")).as("text_norm"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  /** Exact dedup via 64-bit fingerprint — the cheap-join-key variant
    * (group by 8-byte long instead of full text; at 100 TB the shuffle
    * carries hashes, not documents).
    */
  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(fingerprint64(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))

  /** MinHash signature as a pure expression: for seed i, sig[i] =
    * min over shingles of murmur3(shingle, seed=i). No explode, no
    * shuffle — one array traversal per seed.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => hash(s, lit(i))))
    }: _*)

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → minhash(numHashes) → band into `bands` groups of
    * `numHashes/bands` rows → candidates = pairs sharing a band bucket →
    * verified by exact Jaccard over shingle sets.
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 5, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.6): DataFrame = {
    val rows = numHashes / bands
    val sig = docs.select(
      col(idCol).as("id"),
      charShingles(normalizeText(col(textCol)), shingleLen).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band key: hash of the band's slice of the signature
    val banded = sig.select(col("id"), col("sh"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
                 hash(slice(col("sig"), b * rows + 1, rows)).as("bkey"))
        }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val a = banded.select(col("band"), col("bkey"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("doc_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def minHashDedup(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** 64-bit SimHash: custom codegen'd expression (one token-array pass;
    * see [[graft.functions.HashFns.SimHash64]]).
    */
  def simhash64(toks: Column): Column = graft.functions.HashFns.simhash(toks)

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any pair within Hamming distance 3 shares ≥1 exact chunk —
    * pigeonhole), then verify with bit_count(xor) <= maxHamming.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"),
      simhash64(tokens(normalizeText(col(textCol)))).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def simHashDedup(spark: SparkSession, dir: String): DataFrame =
    simHashPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** Word n-gram Jaccard near-dup: shingle (n tokens) sets compared for
    * LSH candidates only (reuses the MinHash banding for candidate
    * generation — exact Jaccard on word shingles as the verdict).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val withShingles = docs.select(
      col(idCol).as("id"),
      wordShingles(tokens(normalizeText(col(textCol))), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), 16))
    val banded = withShingles.select(col("id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * 4 + 1, 4)).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def ngramJaccardDedup(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** Embedding-cosine near-dup: banded random-hyperplane LSH (multi-
    * probe — a pair is a candidate if ANY band's bit-signature matches),
    * exact cosine verdict on candidates only. Seeded, deterministic.
    * Recall at similarity s per band ≈ (1 - acos(s)/π)^bitsPerBand,
    * amplified across bands; cost is bounded by bucket collision rate.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            bands: Int = 16, bitsPerBand: Int = 6,
                            seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val bandCols = (0 until bands).map { b =>
      val planes = Array.fill(bitsPerBand)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      val sigBits = planes.zipWithIndex.map { case (p, i) =>
        VectorFns.hyperplaneBit(col("v"), p) * (1 << i)
      }.reduce(_ + _)
      struct(lit(b).as("band"), sigBits.as("bkey"))
    }
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = sig.select(col("band"), col("bkey"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("band"), col("bkey"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", VectorFns.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
      dim = 64, threshold = 0.25)
}
