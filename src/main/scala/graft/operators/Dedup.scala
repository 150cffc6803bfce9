package graft.operators

import graft.Tables
import graft.functions.TextFns._
import graft.functions.{HashFns, VectorFns}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash group), MinHash+LSH banding, SimHash, n-gram Jaccard and
  * embedding-cosine near-dup. The exact path generalizes the
  * reference's `_id`-keyed idempotent bulk upsert
  * (`ingestion-francetravail/ingestion-elasticsearch.py:36-55`); the
  * near-dup family serves its NLP-prep goal (`README.md:10`) at corpus
  * scale.
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

  /** The d21 base/delta boundary — ONE constant shared by the
    * operator, the interpolated oracle SQL (`SparkEntry`), and
    * `DedupSpec`, so a fixture resize cannot silently desynchronize
    * them (e.g. an empty delta making the gate vacuous).
    */
  val incrementalSplit = 250

  /** d21: INCREMENTAL dedup against a persisted fingerprint index —
    * the production "daily increment" shape (the q60 incremental-
    * maintenance pattern applied to dedup): the already-curated corpus
    * is represented ONLY by its stored md5-key index (built once,
    * appended per batch); a new delta batch dedups (a) internally and
    * (b) against the index via one key join — the historical corpus is
    * NEVER rescanned or re-normalized. At 100 TB the index is a
    * fraction of corpus size (one 16-byte key + id per kept doc) and
    * the per-batch cost scales with the DELTA, not the corpus. The
    * oracle recomputes full-corpus dedup from scratch and keeps only
    * delta-batch keepers — result equality proves increment ≡ rebuild.
    *
    * Split rule (closed-form, oracle-mirrored): base = doc_id <
    * [[incrementalSplit]], delta = the rest. Output: delta docs that
    * survive (their text is new corpus-wide AND they are the first
    * occurrence within the delta), with their key.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idxDir = graft.util.Scratch.dir(spark, "d21_idx", dir).toString
    // one-time index build over the base slice: key + keeper id only
    docs.filter(col("doc_id") < incrementalSplit)
      .groupBy(fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"))
      .write.mode("overwrite").parquet(idxDir)
    // the incremental batch: dedup within the delta, then anti-join
    // the stored index — the base corpus itself is never touched
    val index = spark.read.parquet(idxDir)
    docs.filter(col("doc_id") >= incrementalSplit)
      .groupBy(fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .join(index.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("keeper_id"), col("n_copies"))
      .orderBy(col("keeper_id"))
  }

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

  /** LSH candidate-pair generation from a (id, sig array<long>) frame:
    * band the signature, shuffle ONLY (band, bkey, id) — never the
    * payload (shingle sets / vectors stay out of the LSH shuffle; at
    * 100 TB that is the difference between shuffling 8×|corpus| ids and
    * 8×|corpus| documents). Payloads are re-joined by id afterwards.
    */
  private[graft] def lshCandidates(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    lshCandidatesRaw(sig, bands, rows).dropDuplicates("doc_a", "doc_b")

  /** Candidate pairs WITHOUT the cross-band dedup shuffle: only a few
    * percent of candidates collide in more than one band, so pipelines
    * that verify candidates anyway dedup AFTER the (much smaller)
    * verified set instead of shuffling the full candidate stream.
    */
  private[graft] def lshCandidatesRaw(sig: DataFrame, bands: Int, rows: Int,
                                      maxBucket: Int = 10000): DataFrame =
    // payload-free banded frame → bare pairs, same hot-bucket guard as
    // the portable chains (see [[guardedBandedSelfJoin]])
    guardedBandedSelfJoin(
      sig.select(col("id"),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
                   hash(slice(col("sig"), b * rows + 1, rows)).as("bkey"))
          }: _*)).as("bb"))
        .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("id")),
      maxBucket)
      .select(col("doc_a"), col("doc_b"))

  /** Alternative candidate generation: one shuffle (groupBy bucket →
    * collect ids → emit in-bucket pairs) instead of a self-join (which
    * shuffles the banded frame twice). Wins when buckets are small;
    * `maxBucket` guards the pathological hot bucket (a bucket that big
    * means the band is degenerate — its pairs are overwhelmingly false
    * candidates, and the remaining bands still cover true pairs).
    */
  private[graft] def lshCandidatesViaBuckets(sig: DataFrame, bands: Int, rows: Int,
                                             maxBucket: Int = 10000): DataFrame = {
    val banded = sig.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
                 hash(slice(col("sig"), b * rows + 1, rows)).as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"), col("id"))
    banded
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** MinHash+LSH near-duplicate pairs.
    *
    * One-pass minhash signature (custom expression, byte 5-gram
    * shingles) → band → candidates = pairs sharing a band bucket →
    * verified by exact Jaccard over char-shingle sets (payload joined
    * back by id).
    *
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    */
  /** @param preNormalized when true, `textCol` is already the output of
    *                      [[graft.functions.TextFns.normalizeText]] and
    *                      the chain is not re-applied — lets a pipeline
    *                      that already carries normalized text (e.g.
    *                      [[graft.jobs.CurationJob]]) skip a second
    *                      5-regex pass over the corpus.
    *
    * The result is materialized eagerly (localCheckpoint) so the
    * internal signature/shingle caches can be released before returning
    * — callers get a small, lineage-free pair set and no leaked cache
    * entries. Pair sets are the OUTPUT of dedup (tiny vs the corpus),
    * so eager materialization is the right default at any scale. Pass
    * `materialize = false` for the lazy plan (plan inspection / callers
    * that manage caching themselves — the sig cache is then theirs to
    * release).
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleLen: Int = 5, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.6,
                      preNormalized: Boolean = false,
                      materialize: Boolean = true): DataFrame = {
    val rows = numHashes / bands
    val normed = if (preNormalized) col(textCol) else normalizeText(col(textCol))
    val base = docs.select(col(idCol).as("id"), normed.as("text_norm"))
    // sig feeds four plan branches (both sides of the band self-join + the
    // two prefilter joins): persist so normalize+minhash run once, not
    // four times. At cluster scale this is the standard
    // persist-signatures step of a MinHash pipeline.
    // sigb: the signature packed to one byte per component — the
    // prefilter joins ship 32 bytes per side instead of 32×8 (byte
    // false-equality adds ~(1−j)/256 to the estimate, absorbed by the
    // prefilter margin; the exact verify decides membership anyway)
    val sig = base.select(col("id"),
      HashFns.minhashSig(col("text_norm"), shingleLen, numHashes).as("sig"))
      .withColumn("sigb", HashFns.sigBytes(col("sig")))
      .persist()
    // sorted HASHED shingle sets → exact jaccard is one primitive-long
    // merge pass (8 bytes/shingle through the verify joins and a
    // one-branch comparator; string-set jaccard is identical absent
    // 64-bit collisions — the d08 oracle anchor keeps the string
    // kernel). NOT persisted even though the verification join reads
    // it twice: caching the arrays deserialized costs more (memory +
    // GC) than re-running the fused one-pass kernel.
    val shingled = base.select(col("id"),
      HashFns.sortedShingleHashSet(col("text_norm"), shingleLen).as("sh"))

    // Cheap signature-estimate prefilter (fraction of matching minhash
    // components ≈ jaccard, σ≈1/√k): kills the low-similarity bulk of
    // the candidate set before the expensive exact set comparison.
    // Margin 0.2 ≈ 2.3σ below threshold → <1% missed true pairs.
    // raw candidates: duplicate (a,b) pairs from multi-band collisions
    // are verified redundantly (a few %) and deduped at the END, where
    // the set is hundreds of rows — not shuffled at candidate volume
    val prefiltered = lshCandidatesRaw(sig, bands, rows)
      .join(sig.select(col("id").as("doc_a"), col("sigb").as("sig_a")), "doc_a")
      .join(sig.select(col("id").as("doc_b"), col("sigb").as("sig_b")), "doc_b")
      .withColumn("est", HashFns.signatureMatchFractionBytes(col("sig_a"), col("sig_b")))
      .filter(col("est") >= threshold - 0.2)
      .select(col("doc_a"), col("doc_b"))

    val lazyPairs = prefiltered
      .join(shingled.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSortedLong(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
    if (!materialize) lazyPairs
    else {
      val pairs = lazyPairs.localCheckpoint(true)
      sig.unpersist()
      pairs
    }
  }

  def minHashDedup(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** The portable chains' banding step: band key = the signature
    * components THEMSELVES joined as a string (no engine hash — no
    * cross-value collisions), signatures carried on the band rows for
    * the map-side estimate prefilter.
    */
  private[graft] def portableBanded(hashed: DataFrame, bands: Int, rows: Int): DataFrame =
    hashed.select(col("id"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
                 array_join(slice(col("sig"), b * rows + 1, rows), "-").as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
              col("id"), col("sig"))

  /** [[portableBanded]] with the BYTE-PACKED signature riding instead
    * of the 32×8-byte array — band keys still come from the exact
    * signature slices; only the payload narrows (264 B → 32 B per band
    * row). NOT used by the shipped chains: the two-stage form this
    * enables was A/B'd same-JVM and REJECTED (see
    * [[graft.functions.HashFns.sigMatchCountBytes]] and the
    * `DebugPerf d28ab` harness, which keeps measuring it as the
    * negative control).
    */
  private[graft] def portableBandedBytes(hashed: DataFrame, bands: Int,
                                         rows: Int): DataFrame =
    hashed.select(col("id"), HashFns.sigBytes(col("sig")).as("sigb"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
                 array_join(slice(col("sig"), b * rows + 1, rows), "-").as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
              col("id"), col("sigb"))

  /** The shared banded candidate self-join of the portable LSH chains
    * (d03 minhash, d05 word-n-gram), WITH the hot-bucket guard — the
    * classic LSH skew killer at 100 TB: one degenerate band key
    * (boilerplate-heavy shard, adversarial low-entropy text) makes the
    * plain (band, bkey) self-join O(bucket²) IN ONE TASK, invisible at
    * fixture scale. Unlike the candidate-dropping cap in
    * [[lshCandidatesViaBuckets]], this guard is SEMANTICS-PRESERVING:
    * buckets wider than `maxBucket` are split into
    * g = ceil(size/maxBucket) groups by the type-agnostic key
    * `xxhash64(id) mod g`, and the join runs over the g×g group
    * cells — the a-side replicates each member across its row of
    * cells, the b-side across its column, so every in-bucket pair is
    * still produced in EXACTLY one cell (ANY deterministic per-row
    * key has that property, so correctness never depends on the key
    * choice). The registered DuckDB oracles therefore hold
    * bit-for-bit even when the guard fires, while per-join-key width
    * is bounded by ~maxBucket and the (inherent) quadratic work
    * parallelizes across the cluster instead of landing on one
    * straggler. The hot-key side is broadcast — ≤ |banded|/maxBucket
    * rows by construction (hot keys are few BECAUSE they are wide).
    * The split key hashes the id rather than taking it numerically:
    * the public chains (simHashPairs, *Portable, lshCandidatesRaw)
    * accept STRING ids too, where a raw `id mod g` implicit-casts to
    * null and would silently drop every hot-bucket pair — the exact
    * at-scale condition the guard exists for. The hash split balances
    * binomially (cell width concentrates at bsz/g ≤ maxBucket within
    * ~3·sqrt(maxBucket) w.h.p. — a few % at the default 10000), which
    * bounds task width just as well as an exact split. Returns
    * candidate pairs (doc_a < doc_b) with both signatures.
    */
  /** The guard's cell assignment over ALL rows (cold rows get g=1),
    * exposed for the width-bound spec: banded rows + (g, gid) where
    * g = ceil(bucket/maxBucket) and gid = xxhash64(id) mod g is the
    * row's group within its bucket — the same g/gid expressions the
    * hot path of [[guardedBandedSelfJoin]] applies.
    */
  private[graft] def hotBucketCells(banded: DataFrame, maxBucket: Int): DataFrame =
    banded.join(
        broadcast(banded.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") > maxBucket)),
        Seq("band", "bkey"), "left_outer")
      .withColumn("g", coalesce(
        ceil(col("bsz").cast("double") / maxBucket).cast("int"), lit(1)))
      .withColumn("gid",
        pmod(xxhash64(col("id")), col("g").cast("long")).cast("int"))

  /** INPUT CONTRACT: `banded`'s expensive ancestry (shingling,
    * signing, tokenizing — anything heavier than the banding explode
    * itself) MUST be persisted or checkpointed by the caller. The
    * eager sizing probe below is a full pass over `banded`, and the
    * plain self-join reads it twice more — an unpersisted expensive
    * input silently runs its lineage three times (spec-pinned by the
    * "sizing probe does not re-execute a persisted input" DedupSpec
    * case). Every in-repo chain persists the (id, sig[, hs]) frame and
    * bands on top of the cache; banding itself is a cheap explode and
    * deliberately NOT persisted (bands × corpus rows of cache for one
    * re-read is a bad trade).
    */
  private[graft] def guardedBandedSelfJoin(banded: DataFrame,
                                           maxBucket: Int = 10000): DataFrame = {
    // payload columns (signatures, hashes) ride both join sides with
    // _a/_b suffixes; a payload-free banded frame (the raw candidate
    // chain) yields bare (doc_a, doc_b) pairs
    val payload = banded.columns.toSeq.filterNot(Set("band", "bkey", "id"))
    def sideCols(suffix: String) =
      col("id").as(s"doc_$suffix") +: payload.map(c => col(c).as(s"${c}_$suffix"))
    val cols = ("doc_a" +: "doc_b" +: payload.flatMap(c =>
      Seq(s"${c}_a", s"${c}_b"))).map(col)
    def plainPairs(src: DataFrame) =
      src.select(col("band") +: col("bkey") +: sideCols("a"): _*)
        .join(src.select(col("band") +: col("bkey") +: sideCols("b"): _*),
              Seq("band", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
    // Sizing runs EAGERLY and pulls the hot keys to the driver — a
    // bounded pull by construction (hot keys are FEW because they are
    // WIDE: ≤ |banded| / maxBucket rows). At sane density the set is
    // EMPTY and the plain 2-key self-join IS the guarded join — no
    // anti-filter, no hot legs, no union in the plan (r12: the always-
    // planned guard cost ~0.3-0.5s of dead stages per chain at fixture
    // scale; this makes the cold path literally free).
    val hotAgg = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucket)
    if (hotAgg.isEmpty) return plainPairs(banded).select(cols: _*)
    // hot path engaged: keep the hot-key table as the lazy broadcast
    // AGG SUBQUERY, not a collected literal — feeding the literal back
    // in degrades the downstream join strategies (measured 240→913s on
    // the 20k-cluster stress corpus when the propagated tiny estimate
    // flipped the grid joins away from their shuffled plans)
    val hotKeys = broadcast(hotAgg)
    // cold path — buckets ≤ maxBucket: the plain join behind a
    // broadcast anti-filter (a bucket is entirely hot or entirely
    // cold, so no pair crosses the two paths)
    val cold = banded.join(hotKeys.select(col("band"), col("bkey")),
                           Seq("band", "bkey"), "left_anti")
    // hot path — each wide bucket splits into the g×g cells (a-side
    // replicated across its row of cells, b-side its column: every
    // in-bucket pair lands in EXACTLY one cell)
    val sized = banded.join(hotKeys, Seq("band", "bkey"))
      .withColumn("g",
        ceil(col("bsz").cast("double") / maxBucket).cast("int"))
      .withColumn("gid",
        pmod(xxhash64(col("id")), col("g").cast("long")).cast("int"))
    val hotA = sized.select(Seq(col("band"), col("bkey"),
        col("gid").as("cell_a"),
        explode(sequence(lit(0), col("g") - 1)).as("cell_b")) ++ sideCols("a"): _*)
    val hotB = sized.select(Seq(col("band"), col("bkey"),
        explode(sequence(lit(0), col("g") - 1)).as("cell_a"),
        col("gid").as("cell_b")) ++ sideCols("b"): _*)
    val hotPairs = hotA.join(hotB, Seq("band", "bkey", "cell_a", "cell_b"))
      .filter(col("doc_a") < col("doc_b"))
    plainPairs(cold).select(cols: _*).unionByName(hotPairs.select(cols: _*))
  }

  /** TWO-SIDED analog of [[guardedBandedSelfJoin]] for batch-vs-index
    * collision joins — the s19/p06 ingest shape, where an arriving
    * delta probes the PERSISTED band buckets of everything already
    * accepted. The skew killer is identical (one degenerate band key —
    * a boilerplate-heavy historical shard — makes the plain (band,
    * bkey) join O(|bucket_l|·|bucket_r|) in one task), and so is the
    * cure: a key hot on EITHER side splits into a gl×gr cell grid
    * (gl = ⌈lsz/maxBucket⌉, gr = ⌈rsz/maxBucket⌉; each left row sits at
    * lcell = xxhash64(id) mod gl and replicates across its gr rcells,
    * each right row symmetrically), so every (l, r) pair lands in
    * EXACTLY one cell and per-task width is bounded by ~maxBucket a
    * side. Cold keys (≤ maxBucket on both sides) take the plain join
    * behind a broadcast anti-filter — a key is entirely hot or
    * entirely cold, so no pair crosses the paths and the output is the
    * plain join's, row for row.
    *
    * `rightSizes` lets a persisted index supply its (band, bkey, bsz)
    * table as a LOOKUP (maintained with the index by
    * [[buildLshIndex]]/[[appendLshDetect]]) instead of re-aggregating
    * the historical bands every micro-batch — per-batch guard cost
    * then scales with the batch, not the corpus. Left (batch) sizes
    * are always aggregated in-flight: the batch is the small side by
    * construction. Output columns: left's suffixed `_n`, right's `_o`
    * (the ingest-path naming), plus nothing else — callers project.
    */
  private[graft] def guardedBandedJoin(left: DataFrame, right: DataFrame,
                                       maxBucket: Int = 10000,
                                       rightSizes: Option[DataFrame] = None)
      : DataFrame = {
    def sideCols(df: DataFrame, suffix: String) = {
      val payload = df.columns.toSeq.filterNot(Set("band", "bkey"))
      payload.map(c => col(c).as(s"${c}_$suffix"))
    }
    def sizesOf(df: DataFrame) = df.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
    val outCols = (left.columns.toSeq.filterNot(Set("band", "bkey")).map(c => s"${c}_n") ++
      right.columns.toSeq.filterNot(Set("band", "bkey")).map(c => s"${c}_o")).map(col)
    def plainJoin(l: DataFrame, r: DataFrame) =
      l.select(col("band") +: col("bkey") +: sideCols(left, "n"): _*)
        .join(r.select(col("band") +: col("bkey") +: sideCols(right, "o"): _*),
          Seq("band", "bkey"))
    // Eager emptiness probe (the self-join guard's r12 shape): the
    // LEFT (batch) side aggregates in-flight — the batch is the small
    // side by construction; the RIGHT side reads the PERSISTED size
    // table a maintained index supplies (a lookup, never a
    // re-aggregation of history). At sane density both hot sets are
    // EMPTY and the plain join IS the guarded join — zero guard stages
    // in the per-batch plan. When hot, the key table stays a lazy
    // broadcast subquery (not a collected literal — see the self-join
    // guard's note on estimate-poisoned join strategies).
    val lAgg = sizesOf(left).filter(col("bsz") > maxBucket)
    val rAgg = rightSizes.getOrElse(sizesOf(right))
      .filter(col("bsz") > maxBucket)
    if (lAgg.isEmpty && rAgg.isEmpty)
      return plainJoin(left, right).select(outCols: _*)
    // a side under maxBucket on a key the other side made hot keeps
    // g = 1: one cell on that axis, no split
    val hotKeys = broadcast(
      lAgg.select(col("band"), col("bkey"), col("bsz").as("lsz"))
        .join(rAgg.select(col("band"), col("bkey"), col("bsz").as("rsz")),
          Seq("band", "bkey"), "full_outer")
        .select(col("band"), col("bkey"),
          greatest(lit(1),
            ceil(coalesce(col("lsz"), lit(0L)).cast("double") / maxBucket)
              .cast("int")).as("gl"),
          greatest(lit(1),
            ceil(coalesce(col("rsz"), lit(0L)).cast("double") / maxBucket)
              .cast("int")).as("gr")))
    val coldL = left.join(hotKeys.select(col("band"), col("bkey")),
      Seq("band", "bkey"), "left_anti")
    val coldR = right.join(hotKeys.select(col("band"), col("bkey")),
      Seq("band", "bkey"), "left_anti")
    val hotL = left.join(hotKeys, Seq("band", "bkey"))
      .select(Seq(col("band"), col("bkey"),
        pmod(xxhash64(col("id")), col("gl").cast("long")).cast("int").as("lcell"),
        explode(sequence(lit(0), col("gr") - 1)).as("rcell")) ++
        sideCols(left, "n"): _*)
    val hotR = right.join(hotKeys, Seq("band", "bkey"))
      .select(Seq(col("band"), col("bkey"),
        explode(sequence(lit(0), col("gl") - 1)).as("lcell"),
        pmod(xxhash64(col("id")), col("gr").cast("long")).cast("int").as("rcell")) ++
        sideCols(right, "o"): _*)
    val hotPairs = hotL.join(hotR, Seq("band", "bkey", "lcell", "rcell"))
    plainJoin(coldL, coldR).select(outCols: _*)
      .unionByName(hotPairs.select(outCols: _*))
  }

  /** ENGINE-PORTABLE MinHash+LSH near-duplicate pairs — the registered
    * d03 gate, hash-checked against a DuckDB oracle that reproduces
    * every stage bit-for-bit (the t08 move applied to the full LSH
    * pipeline). Same pipeline shape as [[minHashLshPairs]] — persist
    * signatures, band, candidate self-join, estimate prefilter, ONE
    * exact-jaccard verify, dedup at verified volume — but every
    * engine-local choice swapped for a value both engines compute
    * identically:
    *
    *  - gram hash: first 60 bits of MD5 of the codepoint 5-gram
    *    (`HashFns.md5Gram60` ≡ DuckDB `('0x'||substr(md5(s),1,15))::bigint`)
    *  - permutations: (a·h + b) mod 2^61−1 with shared 31-bit
    *    constants (`HashFns.permuteM61` ≡ HUGEINT `%` — exact integer
    *    algebra on both sides)
    *  - band key: the 4 signature components THEMSELVES (joined as a
    *    string), not an engine hash of them — no cross-value collisions
    *  - prefilter: integer component-match count ≥ 13
    *    (= ceil((0.6−0.2)·32) — no doubles), computed map-side from
    *    signatures carried on the band rows, BEFORE the pair dedup
    *    (the d04 verify-before-dedup shape: the dedup shuffle carries
    *    only plausible pairs)
    *  - verify: the thresholded merge kernel
    *    ([[graft.functions.HashFns.jaccardSortedLongAtLeast]]) — exact
    *    jaccard for survivors, early bail for candidates provably
    *    below threshold; emitted rows bit-identical to the plain merge
    *  - verify: jaccard over the SAME md5-60-bit hashed shingle sets
    *    on both engines (not string sets) — the ratio of the same two
    *    ints, so the final doubles are bit-identical
    *
    * [[minHashLshPairs]] (XXH64 one-pass kernel) remains the
    * throughput scale path, spec-pinned in `DedupSpec`; this portable
    * variant is what CI gates, and its per-shingle cost is one MD5 +
    * 32 fused long-ops — measured within noise of the XXH64 kernel at
    * 10× stress density.
    */
  def minHashLshPairsPortable(docs: DataFrame, idCol: String, textCol: String,
                              shingleLen: Int = 5, numHashes: Int = 32,
                              bands: Int = 8, threshold: Double = 0.6,
                              preNormalized: Boolean = false,
                              maxBucket: Int = 10000): DataFrame = {
    val rows = numHashes / bands
    val minMatch = math.ceil((threshold - 0.2) * numHashes).toInt
    val normed = if (preNormalized) col(textCol) else normalizeText(col(textCol))
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableShingleHashSet(normed, shingleLen).as("hs"))
      .withColumn("sig", HashFns.portableMinhashSig(col("hs"), numHashes))
      .persist()
    // one-stage exact prefilter, signatures riding the band rows. A
    // two-stage form (32-byte packed sigs on the band rows, exact
    // count re-applied in the verify join) was built and REJECTED on a
    // same-JVM A/B (r13, `DebugPerf d28ab`): at the 16×2 density the
    // byte pre-gate's false equalities admit the large near-threshold
    // (11-12-of-32) population into the dedup shuffle and the hs-array
    // verify join — 29→44s at 10×, while the 8×4 gain was ~1.2×.
    val candidates = guardedBandedSelfJoin(
        portableBanded(hashed, bands, rows), maxBucket)
      // the exact count-and-compare, deliberately: an early-exit
      // `matchAtLeast` predicate was A/B'd same-JVM and REJECTED — its
      // data-dependent branches defeat the JIT on the branch-light
      // count loop at enumeration volume (`DebugPerf d28ab`, r13)
      .filter(HashFns.signatureMatchCount(col("sig_a"), col("sig_b")) >= minMatch)
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val pairs = candidates
      .join(hashed.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(hashed.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      // thresholded merge kernel: candidates provably below threshold
      // bail partway through the hs merge (sentinel -1.0 fails the
      // filter); survivors carry the EXACT jaccard — emitted rows are
      // bit-identical to the plain kernel's, and the verify stage (the
      // d28 geometry's wall at density) stops paying full merges for
      // the mid-similarity bulk
      .withColumn("jaccard",
        HashFns.jaccardSortedLongAtLeast(col("hs_a"), col("hs_b"), threshold))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    hashed.unpersist()
    pairs
  }

  def minHashDedupPortable(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairsPortable(Tables.documents(spark, dir), "doc_id", "text")

  /** d28: the d03 chain at the ALTERNATE band geometry 16 bands × 2
    * rows over the same 32 permutations — the recall-leaning shape a
    * curation owner tunes toward when misses cost more than candidate
    * volume (P[collide] = 1−(1−j²)¹⁶ vs 1−(1−j⁴)⁸: a j=0.6 pair is
    * ~99.8% vs ~67% caught). Same signatures, prefilter and verify —
    * only the banding differs, threaded through the SAME parameterized
    * chain on both engines (`minHashLshPairsPortable(bands=16)` here,
    * `portableLshCtesFor(16, 2, ...)` in the oracle): CI proof the
    * geometry surface is genuinely open, the e20/t36 pattern applied
    * to LSH.
    */
  def minHashDedupPortableAlt(spark: SparkSession, dir: String): DataFrame =
    minHashLshPairsPortable(Tables.documents(spark, dir), "doc_id", "text",
      bands = 16)


  // — persisted LSH index (s19): dedup-on-ingest for a document
  //   stream. The e13/s13 build/append split applied to TEXT: the
  //   historical corpus's band buckets and hashed shingle sets persist
  //   once; each arriving micro-batch is checked against the index
  //   (and itself) and then appended — ingest never re-shingles the
  //   historical corpus, per-batch cost scales with the batch and its
  //   collision fan-in. All numerics are the d03-portable family, so
  //   the drained pair set is engine-reproducible. —

  private val lshBands = 8
  private val lshNumHashes = 32
  private val lshThreshold = 0.6
  private def lshMinMatch: Int =
    math.ceil((lshThreshold - 0.2) * lshNumHashes).toInt

  /** (id, hs, sig) — the portable shingle-hash set + MinHash signature
    * of each doc, the shared numeric base of build/append/detect.
    */
  private def lshHashedPortable(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        HashFns.sortedPortableShingleHashSet(
          normalizeText(col(textCol)), 5).as("hs"))
      .withColumn("sig", HashFns.portableMinhashSig(col("hs"), lshNumHashes))

  /** (band, bkey, id, sig) band rows — signature components as the key
    * (the d03 contract), signature riding for the map-side prefilter.
    */
  private def lshBandedOf(hashed: DataFrame): DataFrame = {
    val rows = lshNumHashes / lshBands
    hashed.select(col("id"), col("sig"),
        explode(array((0 until lshBands).map { b =>
          struct(lit(b).as("band"),
                 array_join(slice(col("sig"), b * rows + 1, rows), "-").as("bkey"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bkey").as("bkey"),
              col("id"), col("sig"))
  }

  /** Build the persisted LSH index over the base corpus: `hashes`
    * (id, hs, sig) for exact-jaccard verification, `bands`
    * (band, bkey, id, sig) for collision detection, and `sizes`
    * (band, bkey, bsz) — the bucket-size table the ingest guard reads
    * as a LOOKUP (maintained incrementally by [[appendLshDetect]]), so
    * per-batch hot-key detection never re-aggregates the historical
    * bands. All parquet — loadable by any later session (the e13
    * property, for text).
    */
  def buildLshIndex(docs: DataFrame, idCol: String, textCol: String,
                    indexDir: String): Unit = {
    val hashed = lshHashedPortable(docs, idCol, textCol)
      .localCheckpoint(true)
    hashed.write.mode("overwrite").parquet(s"$indexDir/hashes")
    val bands = lshBandedOf(hashed).localCheckpoint(true)
    bands.write.mode("overwrite").parquet(s"$indexDir/bands")
    bands.groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("bsz"))
      .write.mode("overwrite").parquet(s"$indexDir/sizes")
  }

  /** The index's bucket sizes, summed over the append-only partials
    * ([[appendLshDetect]] appends each batch's own agg — no
    * read-modify-write cycle per batch; compact by rewriting when the
    * partial count grows). Over-counting from a replayed batch only
    * LOWERS the guard's split threshold — the cell split is
    * semantics-preserving for any g, so idempotence is preserved.
    */
  private def lshIndexSizes(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/sizes")
      .groupBy(col("band"), col("bkey")).agg(sum(col("bsz")).as("bsz"))

  /** One ingest step: detect near-dup pairs between `batch` and the
    * index (PLUS within the batch itself), append verified pairs to
    * `outDir`, then append the batch to the index. Detect-THEN-append
    * keeps the batch out of its own index probe (in-batch pairs come
    * from the explicit self-join), so there is no read-after-write
    * ordering hazard; a replayed batch re-emits the same pairs (the
    * drain dedups) and re-appends duplicate index rows (harmless for
    * detection — pairs dedup before verify).
    *
    * Emission is exactly-once per pair under any batch split: a pair
    * (a < b) surfaces in the batch of whichever member is PROCESSED
    * second (the other is already in the index), or once via the
    * self-join when both share a batch — so the drained set is the
    * closed-form "all portable-LSH pairs with at least one delta
    * member", which is what the DuckDB oracle recomputes.
    */
  def appendLshDetect(batch: DataFrame, idCol: String, textCol: String,
                      indexDir: String, outDir: String): Unit = {
    val spark = batch.sparkSession
    val hashed = lshHashedPortable(batch, idCol, textCol)
      .localCheckpoint(true)
    // RESURRECT-ON-APPEND, and BEFORE the batch's rows land: re-ingesting
    // a tombstoned id clears its tombstone (the sink's delete-then-upsert
    // rule applied to the index — without this, rows appended after a
    // takedown would be hidden at probe time and silently ERASED by the
    // next compaction fold). Clearing first keeps a crash window safe:
    // worst case the doc is visible with only its pre-takedown rows, never
    // permanently lost. NOTE the id-granularity contract this implies:
    // resurrection unhides the id's PRIOR band rows too, so a re-ingest
    // that CHANGES the text should compact (physically folding the old
    // rows) before re-appending, or use a fresh id — the single-writer
    // maintenance discipline, documented at [[compactLshIndex]].
    lshTombstones(spark, indexDir).foreach { tomb =>
      val remaining = tomb.join(hashed.select(col("id")), Seq("id"), "left_anti")
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(root, "tombstones_tmp")
      remaining.write.mode("overwrite").parquet(tmp.toString)
      val live = new org.apache.hadoop.fs.Path(root, "tombstones")
      fs.delete(live, true)
      require(fs.rename(tmp, live),
        s"tombstone resurrect swap failed under $indexDir")
    }
    detectLshPairs(hashed, indexDir)
      .write.mode("append").parquet(outDir)
    hashed.write.mode("append").parquet(s"$indexDir/hashes")
    val newBands = lshBandedOf(hashed)
    newBands.write.mode("append").parquet(s"$indexDir/bands")
    // append the batch's OWN bucket counts as a size-table partial —
    // readers sum partials ([[lshIndexSizes]]); maintenance is one
    // batch-sized agg + append, never a rewrite of the key universe
    newBands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bsz"))
      .write.mode("append").parquet(s"$indexDir/sizes")
  }

  /** Retire docs from the persisted index — the takedown/GDPR path the
    * reference's `_id`-keyed store implies (replacement-by-id,
    * ingestion-elasticsearch.py:48): append the ids to the index's
    * tombstone table. Detection ([[detectLshPairs]]) anti-joins the
    * tombstones at probe time, so a retired doc stops matching
    * IMMEDIATELY; the physical rows are reclaimed lazily by the next
    * [[compactLshIndex]], which folds the tombstones in and clears the
    * table. Appending an id twice, or an id the index never held, is
    * harmless (the anti-join is set semantics). RE-INGESTING a
    * tombstoned id through [[appendLshDetect]] RESURRECTS it — the
    * append clears the id's tombstone before its rows land (the
    * delete-then-upsert rule of the keyed sink applied to the index),
    * which also unhides the id's pre-takedown rows; a re-ingest with
    * CHANGED text should compact first or use a fresh id.
    */
  def tombstoneLshDocs(ids: DataFrame, indexDir: String): Unit =
    ids.select(col(ids.columns.head).as("id"))
      .write.mode("append").parquet(s"$indexDir/tombstones")

  /** The index's live tombstone set, None when no takedown ever ran. */
  private def lshTombstones(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString).select(col("id")))
    else None
  }

  /** COMPACT the persisted index in place — the maintenance pass a
    * nightly at 100 TB runs after N append cycles, closing the two
    * ways the append-only layout accretes cost:
    *
    *  - the `sizes` table is N+1 per-batch PARTIALS (readers sum at
    *    every probe — [[lshIndexSizes]]); compaction merges them into
    *    one row per live (band, bkey);
    *  - `hashes`/`bands` carry one parquet file-set per append (file
    *    count grows linearly in cycles; scan planning and open cost
    *    with it); compaction coalesces each to `targetFiles`.
    *
    * Tombstones fold in here: tombstoned ids are physically dropped
    * from `hashes` and `bands`, `sizes` is recomputed from the
    * compacted bands (so the guard's thresholds reflect live rows, not
    * retired ones), and the tombstone table is cleared.
    *
    * Write discipline: all three compacted tables are fully written to
    * `.compact_*` staging paths FIRST (reads and writes never share a
    * path), then swapped in via delete+rename. The swap assumes a
    * single writer and no concurrent reader mid-swap — the maintenance-
    * window contract of log-less compaction (a transactional table
    * format would lift it; out of scope here). Detection output is
    * invariant under compaction: rows are preserved except tombstoned
    * ones, and bucket sizes only feed the guard's split factor, which
    * is semantics-preserving for any g (spec-pinned parity, and the
    * registered d29 gate hash-checks a build→append→compact→append
    * cycle against the closed-form oracle).
    */
  def compactLshIndex(spark: SparkSession, indexDir: String,
                      targetFiles: Int = 32): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // not materialized: the set is read twice (two anti-joins) but it
    // is a tiny parquet scan + distinct — cheaper to re-run than to
    // hold checkpoint blocks through the maintenance pass
    val tomb = lshTombstones(spark, indexDir).map(_.distinct())
    def dropTombstoned(df: DataFrame): DataFrame =
      tomb.fold(df)(t => df.join(t, Seq("id"), "left_anti"))
    // staging dirs deliberately NOT dot-prefixed (hidden-path filters
    // would skip them in recursive listings); index readers address
    // $indexDir/<table> directly and never see them, and a crashed
    // compaction's leftovers are overwritten by the next run
    def stage(table: String)(df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$indexDir/compact_tmp_$table")
    stage("hashes")(dropTombstoned(spark.read.parquet(s"$indexDir/hashes"))
      .coalesce(targetFiles))
    stage("bands")(dropTombstoned(spark.read.parquet(s"$indexDir/bands"))
      .coalesce(targetFiles))
    // sizes recomputed from the COMPACTED bands (read back from the
    // staged files — exact, and never re-runs the anti-join): one agg
    // over the index at maintenance time buys every subsequent probe a
    // single-partial lookup with live counts
    stage("sizes")(spark.read.parquet(s"$indexDir/compact_tmp_bands")
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("bsz"))
      .coalesce(math.max(1, targetFiles / 4)))
    Seq("hashes", "bands", "sizes").foreach { table =>
      val live = new Path(root, table)
      fs.delete(live, true)
      require(fs.rename(new Path(root, s"compact_tmp_$table"), live),
        s"compaction swap failed for $table under $indexDir")
    }
    fs.delete(new Path(root, "tombstones"), true)
  }

  /** The detection half of one ingest step, shared by the streaming
    * drain (s19) and the batch incremental-refresh capstone (p06):
    * near-dup pairs between a pre-hashed batch (id, hs, sig) and the
    * persisted index, PLUS within the batch itself. Both collision
    * joins run behind the hot-bucket guard — batch × index through the
    * two-sided [[guardedBandedJoin]] with the index's PERSISTED size
    * table as the right-side lookup (per-batch guard cost scales with
    * the batch, not the corpus), batch × batch through
    * [[guardedBandedSelfJoin]] — so a degenerate band key in the
    * historical corpus (the boilerplate-shard 100 TB case) splits into
    * bounded cells instead of one O(bucket²) task. Pairs are unchanged
    * (the guards are semantics-preserving), so the s19 oracle holds
    * verbatim.
    */
  /** [[detectLshPairs]] over raw documents — shingle/sign the delta,
    * then detect against the persisted index (p06's batch entry; the
    * streaming path hashes per micro-batch in [[appendLshDetect]]).
    */
  def detectDeltaPairs(docs: DataFrame, idCol: String, textCol: String,
                       indexDir: String, maxBucket: Int = 10000): DataFrame =
    detectLshPairs(lshHashedPortable(docs, idCol, textCol).localCheckpoint(true),
      indexDir, maxBucket)

  /** Second slice point for the d29 lifecycle gate: delta₁ = [split,
    * midSplit), delta₂ = [midSplit, ∞) — both non-empty at every
    * fixture scale factor (≥500 docs).
    */
  val midSplit = incrementalSplit + incrementalSplit / 2

  /** d29: the index LIFECYCLE as one hash-checked gate —
    * build(history) → append+detect(delta₁) → COMPACT → append+detect
    * (delta₂), drain read back as the output. What it pins: the
    * append-only accretion (size partials, per-append file sets) and
    * the compaction rewrite in the middle change NOTHING about what
    * the index detects — the drained pair set is exactly the
    * closed-form "every portable-LSH pair whose doc_b is in the delta"
    * (the s19/p06 emission rule: a pair surfaces in the batch of its
    * second-processed member), which the DuckDB oracle recomputes from
    * the d03 CTE chain at `doc_b ≥ split`. Production shape: the
    * nightly append cycle with its maintenance pass, end to end.
    */
  def indexCompactionCycle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val idxDir = graft.util.Scratch.dir(spark, "d29_idx", dir).toString
    val outDir = graft.util.Scratch.dir(spark, "d29_out", dir).toString
    buildLshIndex(docs.filter(col("doc_id") < incrementalSplit),
      "doc_id", "text", idxDir)
    appendLshDetect(docs.filter(col("doc_id") >= incrementalSplit &&
        col("doc_id") < midSplit), "doc_id", "text", idxDir, outDir)
    compactLshIndex(spark, idxDir)
    appendLshDetect(docs.filter(col("doc_id") >= midSplit),
      "doc_id", "text", idxDir, outDir)
    spark.read.parquet(outDir)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Modulus/residues selecting the d30 takedown set among history
    * docs: ids ≡ 3 (mod 7) are tombstoned then FOLDED by compaction
    * (physical removal), ids ≡ 5 (mod 7) stay LIVE tombstones
    * (probe-time anti-join) — one gate covers both retirement paths.
    */
  val tombstoneResidues: Seq[Int] = Seq(3, 5)

  /** d30: DELETE/TOMBSTONE semantics as one hash-checked gate — the
    * reference's `_id`-upsert store implies replacement/retirement
    * (ingestion-elasticsearch.py:48,253-262); at 100 TB takedowns and
    * GDPR erasure are a routine operation a dedup index must honor.
    * Build the history index, tombstone ids ≡3 (mod 7), compact (which
    * physically folds them out), tombstone ids ≡5 (mod 7) (which stay
    * live in the tombstone table), then probe the full delta: a
    * retired doc must stop matching through EITHER path. Oracle = the
    * d03 CTE chain at `doc_b ≥ split` minus pairs whose index-side
    * member is tombstoned — closed-form, since retiring a doc removes
    * exactly the pairs it participates in (per-pair independence of
    * the banded collision join).
    */
  def indexTombstoneCycle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val history = docs.filter(col("doc_id") < incrementalSplit)
    val idxDir = graft.util.Scratch.dir(spark, "d30_idx", dir).toString
    buildLshIndex(history, "doc_id", "text", idxDir)
    tombstoneLshDocs(history.filter(col("doc_id") % 7 === tombstoneResidues.head)
      .select(col("doc_id").as("id")), idxDir)
    compactLshIndex(spark, idxDir)
    tombstoneLshDocs(history.filter(col("doc_id") % 7 === tombstoneResidues(1))
      .select(col("doc_id").as("id")), idxDir)
    detectDeltaPairs(docs.filter(col("doc_id") >= incrementalSplit),
      "doc_id", "text", idxDir)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // debug accessors for tools.DebugPerf (private internals surfaced
  // for profiling only)
  private[graft] def lshHashedPortableDebug(docs: DataFrame): DataFrame =
    lshHashedPortable(docs, "doc_id", "text")
  private[graft] def lshBandedOfDebug(hashed: DataFrame): DataFrame =
    lshBandedOf(hashed)
  private[graft] def guardedBandedJoinDebug(left: DataFrame, right: DataFrame,
      maxBucket: Int, rightSizes: Option[DataFrame]): DataFrame =
    guardedBandedJoin(left, right, maxBucket, rightSizes)

  private[graft] def detectLshPairs(hashed: DataFrame, indexDir: String,
                                    maxBucket: Int = 10000): DataFrame = {
    val spark = hashed.sparkSession
    val newBands = lshBandedOf(hashed)
    // a tombstoned (retired) doc must stop matching from the moment of
    // the takedown, not the next compaction: anti-join the index's
    // band rows at probe time (filtering bands alone suffices — a doc
    // with no band rows can never reach the verify join). The size
    // table keeps counting tombstoned rows until compaction folds them
    // out, which only LOWERS the guard's split threshold — the cell
    // split is semantics-preserving for any g (the replayed-batch
    // argument at [[lshIndexSizes]])
    val idxBands = lshTombstones(spark, indexDir).foldLeft(
      spark.read.parquet(s"$indexDir/bands"))(
      (b, t) => b.join(t, Seq("id"), "left_anti"))
    val idxSizes = lshIndexSizes(spark, indexDir)
    // cross pairs (batch × index) + in-batch pairs (batch × batch);
    // the self-join emits doc_a < doc_b directly, the cross join via
    // least/greatest (index and batch ids interleave arbitrarily)
    val cross = guardedBandedJoin(newBands, idxBands, maxBucket, Some(idxSizes))
      .filter(col("id_n") =!= col("id_o"))
      .select(least(col("id_n"), col("id_o")).as("doc_a"),
              greatest(col("id_n"), col("id_o")).as("doc_b"),
              col("sig_n"), col("sig_o"))
      .filter(HashFns.signatureMatchCount(col("sig_n"), col("sig_o")) >= lshMinMatch)
      .select(col("doc_a"), col("doc_b"))
    val within = guardedBandedSelfJoin(newBands, maxBucket)
      .filter(HashFns.signatureMatchCount(col("sig_a"), col("sig_b")) >= lshMinMatch)
      .select(col("doc_a"), col("doc_b"))
    val collided = cross.unionByName(within)
      .dropDuplicates("doc_a", "doc_b")
    val allHs = spark.read.parquet(s"$indexDir/hashes")
      .select(col("id"), col("hs"))
      .unionByName(hashed.select(col("id"), col("hs")))
    collided
      .join(allHs.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(allHs.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSortedLong(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= lshThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash: custom codegen'd expression (one token-array pass;
    * see [[graft.functions.HashFns.SimHash64]]).
    */
  def simhash64(toks: Column): Column = graft.functions.HashFns.simhash(toks)

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (any pair within Hamming distance 3 shares ≥1 exact chunk —
    * pigeonhole), then verify with bit_count(xor) <= maxHamming. The
    * signature is 8 bytes, so it rides along in the band shuffle.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    // persisted: the guard's eager sizing probe + the self-join's two
    // sides would otherwise each re-run normalize+tokenize+simhash over
    // the corpus (the guard's documented input contract); the cached
    // frame is 16 bytes/doc
    val sig = docs.select(col(idCol).as("id"),
      simhash64(tokens(normalizeText(col(textCol)))).as("sig"))
      .persist()
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    // same hot-bucket guard as the minhash chains: a degenerate 16-bit
    // band key (boilerplate-heavy shard) is the identical skew killer
    val pairs = guardedBandedSelfJoin(banded, maxBucket)
      // verify BEFORE deduping multi-band collisions: the hamming test
      // is map-side (both 8-byte sigs ride the band rows), so the
      // dedup shuffle carries only true near-dup pairs — at adversarial
      // density the raw candidate set is orders of magnitude larger
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
      // eager materialize + release the sig cache — the
      // minHashLshPairs contract: the pair set is tiny, the cache is not
      .localCheckpoint(true)
    sig.unpersist()
    pairs
  }

  def simHashDedup(spark: SparkSession, dir: String): DataFrame =
    simHashPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** ENGINE-PORTABLE SimHash near-dup pairs — the registered d04 gate,
    * hash-checked end-to-end (the d03-portable move applied to
    * SimHash). Token hash = md5-60-bit ([[graft.functions.HashFns.md5TokenHashes]]),
    * signature = 60-bit majority vote with the integer tie rule
    * 2·cnt_j > n, bands = 4×15 bits (pigeonhole still covers Hamming
    * ≤ 3), verify = bit_count(xor) ≤ 3 — every stage integer algebra
    * DuckDB reproduces exactly. Same verify-before-dedup shuffle shape
    * as [[simHashPairs]], which remains the XXH64 64-bit scale path.
    */
  def simHashPairsPortable(docs: DataFrame, idCol: String, textCol: String,
                           maxHamming: Int = 3,
                           maxBucket: Int = 10000): DataFrame = {
    // persisted for the same reason as [[simHashPairs]]: probe + two
    // join sides must read a cached 16-byte/doc frame, not re-run the
    // md5 token hashing three times
    val sig = docs.select(col(idCol).as("id"),
      HashFns.portableSimhash(
        HashFns.md5TokenHashCol(tokens(normalizeText(col(textCol))))).as("sig"))
      .persist()
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 15).bitwiseAND(0x7FFFL).as("bkey"))
      }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val pairs = guardedBandedSelfJoin(banded, maxBucket)
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    sig.unpersist()
    pairs
  }

  def simHashDedupPortable(spark: SparkSession, dir: String): DataFrame =
    simHashPairsPortable(Tables.documents(spark, dir), "doc_id", "text")

  /** Word n-gram Jaccard near-dup: shingle (n tokens) sets compared for
    * LSH candidates only (reuses the MinHash banding for candidate
    * generation — exact Jaccard on word shingles as the verdict).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      tokens(normalizeText(col(textCol))).as("toks"))
    val numHashes = 16
    val sig = base.select(col("id"),
      HashFns.minhashWordSig(col("toks"), n, numHashes).as("sig"))
      .persist()
    // not persisted — same rationale as the char-shingle variant: the
    // shingle expression is cheaper to re-run than to cache
    val shingled = base.select(col("id"),
      array_sort(wordShingles(col("toks"), n)).as("sh"))

    val prefiltered = lshCandidatesRaw(sig, bands = 4, rows = 4)
      .join(sig.select(col("id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sig.select(col("id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est", HashFns.signatureMatchFraction(col("sig_a"), col("sig_b")))
      .filter(col("est") >= threshold - 0.25)
      .select(col("doc_a"), col("doc_b"))

    // eager materialize + release internals — same contract as
    // [[minHashLshPairs]]: the pair set is small, the caches are not
    val pairs = prefiltered
      .join(shingled.select(col("id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingled.select(col("id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    sig.unpersist()
    pairs
  }

  def ngramJaccardDedup(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** ENGINE-PORTABLE word n-gram Jaccard near-dup pairs — the
    * registered d05 gate, hash-checked end-to-end. Same shape as
    * [[ngramJaccardPairs]] (which stays the XXH64 scale path) with
    * every stage swapped portable, exactly as in
    * [[minHashLshPairsPortable]]: n-gram hash = md5-60-bit of the
    * space-joined window ([[graft.functions.HashFns.sortedPortableWordShingleHashes]]
    * mirrors `TextFns.wordShingles`' window rule), 16 mod-M61
    * permutations banded 4×4, integer ≥3-of-16 estimate prefilter
    * before the pair dedup, exact jaccard over the same hashed n-gram
    * sets on both engines.
    */
  def ngramJaccardPairsPortable(docs: DataFrame, idCol: String, textCol: String,
                                n: Int = 3, threshold: Double = 0.4,
                                maxBucket: Int = 10000): DataFrame = {
    val numHashes = 16
    val bands = 4
    val rows = numHashes / bands
    val minMatch = math.ceil((threshold - 0.25) * numHashes).toInt
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableWordShingleHashSet(
          tokens(normalizeText(col(textCol))), n).as("hs"))
      .withColumn("sig", HashFns.portableMinhashSig(col("hs"), numHashes))
      .persist()
    val candidates = guardedBandedSelfJoin(
        portableBanded(hashed, bands, rows), maxBucket)
      // the exact count-and-compare, deliberately: an early-exit
      // `matchAtLeast` predicate was A/B'd same-JVM and REJECTED — its
      // data-dependent branches defeat the JIT on the branch-light
      // count loop at enumeration volume (`DebugPerf d28ab`, r13)
      .filter(HashFns.signatureMatchCount(col("sig_a"), col("sig_b")) >= minMatch)
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val pairs = candidates
      .join(hashed.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(hashed.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSortedLong(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    hashed.unpersist()
    pairs
  }

  def ngramJaccardDedupPortable(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsPortable(Tables.documents(spark, dir), "doc_id", "text")

  /** Exact char-shingle Jaccard threshold pairs over a bounded id slice —
    * the DuckDB-checkable oracle anchor for the MinHash/LSH family:
    * [[minHashLshPairs]] (d03) approximates exactly this semantic (same
    * normalize chain, same 5-char shingle sets, same ≥-threshold pair
    * predicate), so a green hash-match here pins the family's ground
    * truth. Deliberately O(n²) over ≤`maxId` docs — the text analog of
    * [[graft.operators.Similarity.cosinePairsExact]]; the LSH paths are
    * the scale story.
    */
  def jaccardExactPairs(spark: SparkSession, dir: String, maxId: Long = 250L,
                        shingleLen: Int = 5, threshold: Double = 0.25): DataFrame = {
    // materialize the (≤maxId-row) shingled frame BEFORE the self cross
    // join: without the barrier Catalyst pushes the projection past the
    // join and re-evaluates normalize+shingle+sort once per PAIR
    // (O(n²) expression evaluations) instead of once per row
    val sh = Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId)
      .select(col("doc_id"),
        HashFns.sortedShingleSet(normalizeText(col("text")), shingleLen).as("sh"))
      .localCheckpoint(true)
    // the pushed id<maxId scan arrives as ONE split, so without this
    // the whole O(maxId²) intersection stage runs as a single task
    // (the nested-loop join inherits the LEFT side's partitioning; the
    // right side is the broadcast build). 250 rows shuffled is free;
    // maxId²/parallelism pairs per task is the shape that scales.
    val a = sh.repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup: banded random-hyperplane LSH (multi-
    * probe — a pair is a candidate if ANY band's bit-signature matches),
    * exact cosine verdict on candidates only. Seeded, deterministic.
    * Recall at similarity s per band ≈ (1 - acos(s)/π)^bitsPerBand,
    * amplified across bands; cost is bounded by bucket collision rate.
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            bands: Int = 8, bitsPerBand: Int = 6,
                            seed: Long = 42L): DataFrame = {
    // shared plane generator (VectorFns.hyperplanes); one fused
    // expression emits every band key (VectorFns.bandKeys)
    val planes = VectorFns.hyperplanes(bands, bitsPerBand, dim, seed)
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sig = vecs
      .select(col("id"),
        posexplode(VectorFns.bandKeys(col("v"), planes, bitsPerBand))
          .as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("id"))
    val a = sig.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = sig.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", VectorFns.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Connected components over near-dup pairs: assigns every doc in a
    * dup cluster the cluster's minimum id (label propagation to fixed
    * point). Handles transitive chains (a~b, b~c ⇒ {a,b,c} one cluster)
    * that pairwise drops miss.
    *
    * Each iteration is one join + aggregate on the edge list (both
    * shuffles keyed by id); iterations needed = graph diameter, which
    * for near-dup clusters is small. Intermediate results persist so an
    * iteration reads the previous labels, not the whole lineage.
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 10,
                  localLimit: Long = 5000000L): DataFrame = {
    // Near-dup edge lists are tiny relative to the corpus (pairs are the
    // OUTPUT of dedup, not the input): below `localLimit` edges, a
    // driver-side union-find over the collected pairs beats ~diameter
    // shuffle rounds by orders of magnitude. The iterative path remains
    // for adversarial corpora where the pair set itself is huge.
    val spark = pairs.sparkSession
    val edgesRaw = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")).persist()
    val nEdges = edgesRaw.count()
    if (nEdges <= localLimit) {
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val collected = edgesRaw.as[(Long, Long)].collect()
      edgesRaw.unpersist()
      collected.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val ids = collected.flatMap(p => Seq(p._1, p._2)).distinct
      return ids.toSeq.map(id => (id, find(id))).toDF("doc_id", "cluster_id")
    }
    // undirected edge list + self edges. localCheckpoint (not persist)
    // on every iteration: the label frame is referenced twice per round
    // (propagation + convergence check), so without lineage truncation
    // the logical plan doubles each iteration — exponential plan growth.
    val edges = edgesRaw
      .union(edgesRaw.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    edgesRaw.unpersist() // checkpointed copy owns the data from here on
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jumping: also adopt the label OF the current label —
      // propagation distance doubles per round, so convergence takes
      // O(log diameter) rounds instead of O(diameter)
      val next = stepped.alias("a")
        .join(stepped.select(col("id").as("lid"), col("label").as("llabel")),
          col("a.label") === col("lid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.label"), coalesce(col("llabel"), col("a.label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding",
      dim = 64, threshold = 0.25)

  /** ENGINE-PORTABLE embedding near-dup — the registered d06 gate.
    * Same pipeline as [[embeddingNearDupPairs]] with the two
    * engine-local pieces swapped portable: hyperplanes are md5-derived
    * Rademacher ±1 vectors ([[graft.functions.VectorFns.rademacherBandKeys]]
    * — DuckDB derives the identical sign table from
    * `md5(b||'-'||j||'-'||i)`, and ±1 projections are signed sums both
    * engines accumulate identically in doubles), and the output is the
    * verified PAIR SET (ids only, the e03 oracle convention — the
    * cosine stays internal to the threshold predicate, where both
    * engines agree at fixture margins). The Gaussian-hyperplane kernel
    * stays the spec'd scale path.
    */
  def embeddingNearDupPairsPortable(emb: DataFrame, idCol: String, vecCol: String,
                                    dim: Int, threshold: Double = 0.25,
                                    bands: Int = 8, bitsPerBand: Int = 6): DataFrame = {
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val sig = vecs
      .select(col("id"),
        posexplode(VectorFns.rademacherBandKeys(col("v"), bands, bitsPerBand, dim))
          .as(Seq("band", "bkey")))
      .select(col("band"), col("bkey"), col("id"))
    val a = sig.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = sig.select(col("band"), col("bkey"), col("id").as("id_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", VectorFns.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def embeddingNearDupPortable(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairsPortable(Tables.embeddings(spark, dir), "vec_id", "embedding",
      dim = 64, threshold = 0.25)

  /** d10: dup-cluster resolution through the driver gate — connected
    * components ([[dupClusters]]) over the DETERMINISTIC exact-jaccard
    * edge list of [[jaccardExactPairs]], so the transitive-closure
    * semantics themselves are oracle-checked (DuckDB recursive CTE over
    * the identical edges). Emits (doc_id, cluster_id = min id in the
    * component) for every doc that has at least one near-dup partner.
    */
  def dupClustersQuery(spark: SparkSession, dir: String): DataFrame =
    dupClusters(jaccardExactPairs(spark, dir))
      .orderBy(col("doc_id"))

  /** d24: CLUSTER-WEIGHTED SAMPLING — the probabilistic complement of
    * hard dedup for a training mix. Hard dedup (d09) keeps the single
    * best doc per near-dup cluster; this keeps each doc with
    * probability 1/|cluster| (singletons always), so every cluster
    * contributes ~ONE EXPECTED survivor while WHICH near-duplicate
    * survives stays hash-random — the "discount duplicated content,
    * don't collapse its diversity" weighting step of web-scale
    * curation pipelines, run after cluster resolution.
    *
    * Fully portable and deterministic: the acceptance draw is the t08
    * md5-60-bit integer of the doc id, kept iff
    * h < floor(2^60 / unit_size) (integer division in BOTH engines —
    * h·size would overflow BIGINT, h < 2^60/size cannot). Units are
    * q59's: the d10 cluster id for clustered docs, the doc's own id
    * otherwise — so the DuckDB oracle is the d10 recursive-CTE chain
    * plus one count and one filter.
    *
    * Scale shape: cluster resolution is [[dupClusters]] (pointer
    * jumping above the collect bound); unit sizes are one map-side-
    * combined groupBy; the acceptance filter is per-row map-side. The
    * only join is doc→size on the unit key (size table ≤ one row per
    * doc, auto-broadcast at fixture scale, plain shuffle join at 100 TB
    * — both correct).
    */
  /** The d24/d27 sampling step, parameterized by the cluster source:
    * cluster-or-self units, one map-side-combined size count, the
    * md5-60-bit integer acceptance draw against floor(2^60/size).
    */
  private def weightedSampleFromClusters(docs: DataFrame,
                                         clusters: DataFrame): DataFrame = {
    val units = docs.join(clusters.withColumnRenamed("cluster_id", "cid"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("unit"))
    val sizes = units.groupBy(col("unit"))
      .agg(count(lit(1)).as("unit_size"))
    units.join(sizes, Seq("unit"))
      .withColumn("h", expr(
        "cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 15), 16, 10) as bigint)"))
      .filter(col("h") < expr("cast(1152921504606846976 as bigint) div unit_size"))
      .select(col("doc_id"), col("unit"), col("unit_size"))
      .orderBy(col("doc_id"))
  }

  def clusterWeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSampleFromClusters(
      Tables.documents(spark, dir).select(col("doc_id")),
      dupClusters(jaccardExactPairs(spark, dir)))

  /** d27: [[clusterWeightedSample]] on the path a 100 TB run actually
    * takes — clusters resolved from the PORTABLE MinHash-LSH pairs
    * (d03's chain: signature-only shuffles, no all-pairs kernel, no
    * bounded-id anchor) instead of d24's exact-jaccard anchor. Same
    * sampling step, same keep rule; what changes is only where the
    * edges come from, which is exactly the claim d24 left ungated:
    * the composition `dupClusters(minHashLshPairsPortable(...))` is
    * generic, and this registers it hash-checked end-to-end (the LSH
    * chain, the cluster closure, the size counts and the acceptance
    * draw are all integer-portable — the oracle is d03's CTE chain
    * feeding d10's recursive closure feeding d24's filter).
    */
  def clusterWeightedSampleLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    weightedSampleFromClusters(docs.select(col("doc_id")),
      dupClusters(minHashLshPairsPortable(docs, "doc_id", "text")
        .select(col("doc_a"), col("doc_b"))))
  }

  // — cross-document substring duplication (d13) —

  /** One row per `k`-char span at every `stride`-step position of every
    * document: the shingle stream behind [[substringDupSpans]]. Pure
    * per-row expressions (`sequence` + `transform` + `substr`, all
    * codegen'd) — computed map-side, zero shuffle.
    */
  private def spanExploded(docs: DataFrame, idCol: String, textCol: String,
                           k: Int, stride: Int): DataFrame =
    docs.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        explode(transform(
          sequence(lit(1), length(col(textCol)) - (k - 1), lit(stride)),
          i => col(textCol).substr(i, lit(k)))).as("span"))

  /** Duplicated substring spans across documents — the char-level
    * analog of suffix-based substring dedup (the "repeated 50-token
    * substring" pass an LLM data pipeline runs before training): slide
    * a `k`-char window with `stride` over each document and keep every
    * span occurring in ≥ `minDocs` DISTINCT documents. The reference's
    * nearest capability is its exact `_id` dedup
    * (`ingestion-francetravail/ingestion-elasticsearch.py:36-55`);
    * this catches partial, not just whole-document, duplication.
    *
    * The only shuffle is the span groupBy. This variant groups on the
    * RAW span so the DuckDB oracle can reproduce it bit-exactly; at
    * 100 TB use [[substringDupSpansHashed]], whose shuffle carries a
    * 16-byte hash pair instead of `k`-char strings (2.5× lighter at the
    * default k=40, and collision-safe where a single 64-bit key isn't).
    */
  def substringDupSpans(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 40, stride: Int = 10, minDocs: Int = 2): DataFrame =
    spanExploded(docs, idCol, textCol, k, stride)
      .groupBy(col("span"))
      .agg(countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** The 100 TB path of [[substringDupSpans]]: identical semantics, but
    * the shuffle carries a 16-byte hash pair per occurrence instead of
    * `k` chars, and the surviving hash set is exactly what a downstream
    * span-removal filter joins against. The key is 128-bit — TWO
    * independent xxhash64 values (plain, and salted through a second
    * hashed column): a single 64-bit key hits its birthday bound at
    * ~√2⁶⁴ ≈ 4·10⁹ distinct spans — ~10⁵ expected collisions at a
    * 100 TB corpus's ~10¹² spans, each one merging unrelated spans so a
    * downstream removal filter deletes clean text. At 128 bits the
    * expected collision count at 10¹² spans is ~10⁻¹⁴.
    */
  def substringDupSpansHashed(docs: DataFrame, idCol: String, textCol: String,
                              k: Int = 40, stride: Int = 10, minDocs: Int = 2): DataFrame =
    spanExploded(docs, idCol, textCol, k, stride)
      // salt FIRST: Spark chains multi-arg xxhash64 (the running hash
      // seeds the next child), so xxhash64(span, salt) would be a pure
      // function of xxhash64(span) — zero extra entropy. With the salt
      // as the first argument the span is hashed under an independent
      // effective seed, making the pair a real 128-bit key.
      .select(col("id"), xxhash64(col("span")).as("span_hash"),
        xxhash64(lit(0x9E3779B9L), col("span")).as("span_hash2"))
      .groupBy(col("span_hash"), col("span_hash2"))
      .agg(countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .select(col("span_hash"), col("span_hash2"), col("n_docs"), col("n_occ"))

  /** d13: cross-document duplicated 40-char spans over the documents
    * table (stride 10), oracle-checked span-for-span against DuckDB's
    * lateral-unnest re-derivation.
    */
  def substringDups(spark: SparkSession, dir: String): DataFrame =
    substringDupSpans(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("span"))

  /** Per-document duplicated-span coverage — the ACTIONABLE filter on
    * top of [[substringDupSpans]]: for each document, the fraction of
    * its span windows whose text also occurs in ≥ `minDocs` documents.
    * The drop policy ("remove docs whose dup coverage exceeds X%") is
    * then a plain filter on `dup_frac`.
    *
    * Scale shape: the dup-span set is the (much smaller) output of the
    * span aggregation; marking is one keyed join on the span — or on
    * its xxhash64 in the hashed variant — followed by a per-doc count.
    * `dup_frac` is a ratio of two exact counts evaluated in one IEEE
    * division, so it is bit-identical in the oracle.
    */
  def substringDupCoverage(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 40, stride: Int = 10, minDocs: Int = 2): DataFrame = {
    // the span stream is deliberately re-derived on both branches
    // rather than persisted: spans are many short strings per row, and
    // caching that shape deserialized was measured (shingle variant,
    // [[minHashLshPairs]]) to cost more in memory+GC than re-running
    // the fused per-row expressions — the double map-side pass wins.
    val spans = spanExploded(docs, idCol, textCol, k, stride)
    val dups = substringDupSpans(docs, idCol, textCol, k, stride, minDocs)
      .select(col("span"), lit(1L).as("is_dup"))
    spans.join(dups, Seq("span"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
           sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows").cast("double") / col("n_windows")).as("dup_frac"))
  }

  /** d15: duplicated-span coverage per document over the documents
    * table — oracle-checked including the IEEE-exact `dup_frac` ratio.
    */
  def substringCoverage(spark: SparkSession, dir: String): DataFrame =
    substringDupCoverage(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  // — fuzzy (edit-distance) near-dup pairs with prefix blocking (d14) —

  /** Fuzzy near-dup pairs by bounded edit distance over a title prefix,
    * with prefix blocking: only documents whose first `blockLen` chars
    * match exactly are candidates, and candidates are pairs when their
    * first `titleLen` chars are within `maxDist` Levenshtein edits.
    *
    * Scale shape: the block key is an EQUI-join key, so this plans as a
    * hash join whose fan-out is bounded by block size — never an
    * all-pairs cross. Levenshtein runs only inside blocks and uses
    * Spark's thresholded kernel (`levenshtein(l, r, threshold)`), which
    * abandons a pair as soon as the distance provably exceeds
    * `maxDist` — O(maxDist·titleLen) per pair, not O(titleLen²).
    * Unit-cost edit distance is engine-portable, so the result is
    * oracle-exact (DuckDB `levenshtein`).
    */
  def fuzzyPrefixPairs(docs: DataFrame, idCol: String, textCol: String,
                       blockLen: Int = 10, titleLen: Int = 60,
                       maxDist: Int = 8): DataFrame = {
    val t = docs.select(col(idCol).as("id"),
      substring(col(textCol), 1, titleLen).as("title"),
      substring(col(textCol), 1, blockLen).as("blk"))
    val a = t.select(col("blk"), col("id").as("doc_a"), col("title").as("title_a"))
    val b = t.select(col("blk"), col("id").as("doc_b"), col("title").as("title_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("title_a"), col("title_b"), maxDist).cast("long").as("dist"))
      .filter(col("dist") =!= -1L)
  }

  /** d14: fuzzy title-prefix pairs over the documents table (block on
    * first 10 chars, Levenshtein ≤ 8 over first 60), oracle-exact vs
    * DuckDB `levenshtein`.
    */
  def fuzzyTitleDedup(spark: SparkSession, dir: String): DataFrame =
    fuzzyPrefixPairs(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  // — EXACT set-similarity join via prefix filtering (d22) —

  /** Slack subtracted inside every CANDIDATE-side bound of d22/d23
    * (prefix length, size filter, PPJoin positional filter) before a
    * ceil or a >=. The bounds' exact values are rationals (tau*sz,
    * tau/(1+tau)*(szA+szB)) whose IEEE evaluation can land an ulp
    * ABOVE the true value when tau*sz is an exact integer — which
    * would shorten a prefix / strengthen a filter by one element and
    * silently drop a qualifying pair for thresholds beyond the
    * shipped ones. Subtracting eps makes every filter err only toward
    * ADMITTING candidates (fl error here is < 1e-12 for any sz <
    * 1e4, and real decision margins are >= 1/(sz*(1+tau)) >> eps), so
    * completeness holds for ANY threshold; the exact verify pass
    * discards the few extra candidates, so results are unchanged.
    */
  private val FilterEps = 1e-7


  /** d22: EXACT Jaccard-threshold set-similarity self-join via PREFIX
    * FILTERING (the AllPairs/PPJoin family — Chaudhuri et al. ICDE'06,
    * Bayardo et al. WWW'07) over hashed word n-gram shingle sets — the
    * same element space the MinHash gate (d05) estimates over, but with
    * a DETERMINISTIC completeness guarantee instead of a probabilistic
    * one: every pair with Jaccard ≥ τ is emitted, no recall caveat.
    *
    * Prefix-filtering principle: under one global total order on
    * elements, if |A∩B| ≥ α then the (|A|−α+1)-prefixes of A and B
    * must share an element (else the intersection fits inside a
    * suffix of size α−1 — pigeonhole). Jaccard ≥ τ implies
    * |A∩B| ≥ τ·|A∪B| ≥ τ·max(|A|,|B|), so a prefix of length
    * |x| − ⌈τ·|x|⌉ + 1 per set suffices. Elements are ordered
    * RAREST-FIRST (document frequency asc, hash asc): prefixes carry a
    * set's most selective members, so candidate volume per element h
    * is bounded by df(h)² over only the rare tail — common elements
    * never join.
    *
    * Scale shape (all shuffles keyed, no all-pairs stage): one
    * map-side-combined groupBy for element document frequencies, one
    * equi-join element→df, one per-doc window (partitioned by doc id —
    * bounded by set size) to take the rarity-ordered prefix, one
    * candidate equi-join on prefix elements with the τ-feasibility
    * length filter (τ·|A| ≤ |B| ≤ |A|/τ), then one exact verify over
    * candidates via the sorted-array merge kernel. The DuckDB oracle
    * brute-forces all pairs — result equality at the fixture proves
    * the filter exact, while the Spark plan is the one that survives
    * 100 TB (the naive O(n²) oracle does not).
    */
  def setSimJoinPrefix(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       materialize: Boolean = true): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableWordShingleHashSet(
          tokens(normalizeText(col(textCol))), n).as("hs"))
      .withColumn("sz", size(col("hs")))
      .filter(col("sz") > 0)
      .persist()
    // global element rarity: document frequency over distinct-per-doc
    // elements (hs is already a distinct set per doc)
    val el = hashed.select(col("id"), col("sz"), explode(col("hs")).as("h"))
    val dfreq = el.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // per-doc prefix: the p = sz - ceil(tau*sz) + 1 rarest elements
    // under the global (df, h) order, POSITIONS kept for the PPJoin
    // positional filter below
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val prefix = el.join(dfreq, "h")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(FilterEps)) + lit(1))
      .select(col("h"), col("id"), col("sz"), col("rk"))
    val a = prefix.select(col("h"), col("id").as("doc_a"),
      col("sz").as("sz_a"), col("rk").as("rk_a"))
    val b = prefix.select(col("h"), col("id").as("doc_b"),
      col("sz").as("sz_b"), col("rk").as("rk_b"))
    val candidates = a.join(b, Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      // Jaccard >= tau forces tau*|A| <= |B| <= |A|/tau — prune
      // infeasible sizes before the dedup shuffle
      .filter(col("sz_b").cast("double") >= lit(threshold) * col("sz_a") - lit(FilterEps) &&
              col("sz_a").cast("double") >= lit(threshold) * col("sz_b") - lit(FilterEps))
      // PPJoin POSITIONAL filter (Xiao et al. WWW'08): a match at
      // ranks (rk_a, rk_b) bounds the overlap by 1 + min(remaining
      // suffix on each side), while Jaccard >= tau forces overlap >=
      // tau/(1+tau)·(|A|+|B|). Every qualifying pair's EARLIEST
      // common element (which the prefix principle puts inside both
      // prefixes) satisfies the bound, so filtering per matched row
      // before the pair dedup is lossless — spec'd prefix ≡ naive.
      .filter(lit(1.0) +
        least(col("sz_a") - col("rk_a"), col("sz_b") - col("rk_b"))
          .cast("double") >=
        lit(threshold / (1.0 + threshold)) * (col("sz_a") + col("sz_b")) -
          lit(FilterEps))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val built = candidates
      .join(hashed.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(hashed.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("jaccard", HashFns.jaccardSortedLong(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    if (!materialize) return built
    val pairs = built.localCheckpoint(true)
    hashed.unpersist()
    pairs
  }

  /** Reference brute-force for [[setSimJoinPrefix]] (spec cross-check
    * only — O(n²), never registered): exact Jaccard over ALL pairs.
    */
  private[operators] def setSimJoinNaive(docs: DataFrame, idCol: String,
                                         textCol: String, n: Int = 3,
                                         threshold: Double = 0.5): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableWordShingleHashSet(
          tokens(normalizeText(col(textCol))), n).as("hs"))
      .filter(size(col("hs")) > 0)
    val a = hashed.select(col("id").as("doc_a"), col("hs").as("hs_a"))
    val b = hashed.select(col("id").as("doc_b"), col("hs").as("hs_b"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", HashFns.jaccardSortedLong(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def setSimDedup(spark: SparkSession, dir: String): DataFrame =
    setSimJoinPrefix(Tables.documents(spark, dir), "doc_id", "text")

  // — EXACT containment join via one-sided prefix filtering (d23) —

  /** d23: EXACT containment-threshold join — ordered pairs (A, B) with
    * |A∩B|/|A| ≥ c over hashed word n-gram shingle sets: "most of A's
    * content appears inside B". This is the ASYMMETRIC relative of d22
    * — the decontamination/quotation primitive (a benchmark prompt
    * embedded in a training doc scores high containment but low
    * Jaccard when the host doc is large), exact where d12/d16 key on
    * whole-chunk equality.
    *
    * One-sided prefix filtering: containment ≥ c forces
    * |A∩B| ≥ ⌈c·|A|⌉ — a bound on A ALONE — so only the contained
    * side needs a prefix: if A∩B avoided A's (|A|−⌈c·|A|⌉+1)-prefix
    * it would fit inside the remaining ⌈c·|A|⌉−1 elements
    * (pigeonhole). The probe side B joins with its FULL element list;
    * candidate volume is Σ df(h) over A-prefix elements only — the
    * rarest-first order keeps that sum near-linear. The
    * |B| ≥ c·|A| size filter prunes infeasible candidates before the
    * pair dedup.
    *
    * Scale shape mirrors [[setSimJoinPrefix]] minus one prefix pass;
    * the DuckDB oracle brute-forces all ordered pairs — equality
    * proves the one-sided filter loses nothing.
    */
  def containmentJoinPrefix(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, c: Double = 0.9,
                            materialize: Boolean = true): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableWordShingleHashSet(
          tokens(normalizeText(col(textCol))), n).as("hs"))
      .withColumn("sz", size(col("hs")))
      .filter(col("sz") > 0)
      .persist()
    val el = hashed.select(col("id"), col("sz"), explode(col("hs")).as("h"))
    val dfreq = el.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("h"))
    val prefixA = el.join(dfreq, "h")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <=
        col("sz") - ceil(lit(c) * col("sz") - lit(FilterEps)) + lit(1))
      .select(col("h"), col("id").as("doc_a"), col("sz").as("sz_a"))
    val allB = el.select(col("h"), col("id").as("doc_b"), col("sz").as("sz_b"))
    val candidates = prefixA.join(allB, Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("sz_b").cast("double") >= lit(c) * col("sz_a") - lit(FilterEps))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val built = candidates
      .join(hashed.select(col("id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(hashed.select(col("id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("containment",
        HashFns.intersectCountSortedLong(col("hs_a"), col("hs_b"))
          .cast("double") / size(col("hs_a")))
      .filter(col("containment") >= c)
      .select(col("doc_a"), col("doc_b"), col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
    if (!materialize) return built
    val pairs = built.localCheckpoint(true)
    hashed.unpersist()
    pairs
  }

  /** Reference brute-force for [[containmentJoinPrefix]] (spec only). */
  private[operators] def containmentJoinNaive(docs: DataFrame, idCol: String,
                                              textCol: String, n: Int = 3,
                                              c: Double = 0.9): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
        HashFns.sortedPortableWordShingleHashSet(
          tokens(normalizeText(col(textCol))), n).as("hs"))
      .filter(size(col("hs")) > 0)
    val a = hashed.select(col("id").as("doc_a"), col("hs").as("hs_a"))
    val b = hashed.select(col("id").as("doc_b"), col("hs").as("hs_b"))
    a.crossJoin(b).filter(col("doc_a") =!= col("doc_b"))
      .withColumn("containment",
        HashFns.intersectCountSortedLong(col("hs_a"), col("hs_b"))
          .cast("double") / size(col("hs_a")))
      .filter(col("containment") >= c)
      .select(col("doc_a"), col("doc_b"), col("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def containmentDedup(spark: SparkSession, dir: String): DataFrame =
    containmentJoinPrefix(Tables.documents(spark, dir), "doc_id", "text")

  // — semantic dedup via embedding clustering (d17) —

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embedding space (bounded cosine-metric training
    * sample — the [[graft.operators.Similarity.kmeansIvfTopK]] build),
    * then WITHIN each cluster greedily keep the lowest-id vector of every
    * semantic neighborhood: a vector is dropped iff its cosine to an
    * already-kept vector of the same cluster is ≥ `threshold`.
    *
    * This is the capability LSH near-dup (d06) cannot express: LSH finds
    * PAIRS above a similarity floor; SemDeDup prunes REDUNDANCY — one
    * survivor per semantic neighborhood — which is how web-scale image/
    * text corpora are thinned for training efficiency.
    *
    * Scale shape: centroids train on a bounded sample and ride into
    * codegen as literals; assignment is one map-only expression pass; the
    * corpus shuffles ONCE on cell id; the greedy sweep is sequential only
    * WITHIN a cluster (exactly as in the paper) and parallel across them.
    * A cluster holds ≈ |corpus|/nCells rows — at 100 TB, nCells scales
    * with the corpus (SemDeDup uses 50k clusters for LAION) so per-group
    * state stays bounded; the sweep's comparison partner set is only the
    * KEPT representatives, which the threshold keeps far below the
    * cluster size on redundant data.
    */
  def semanticDedupKeep(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double = 0.4, nCells: Int = 16,
                        seed: Long = 42L, trainFraction: Double = 0.25): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    // nCells == 1 degenerates to a single global sweep (the brute-force
    // reference shape, and what specs pin the sweep against) — MLlib
    // KMeans rejects k < 2, and training would be pointless anyway
    val assigned =
      if (nCells == 1)
        emb.select(col(idCol).as("id"), col(vecCol).as("v"), lit(1).as("cell"))
      else {
        // Zero-norm (or denormal-underflow) vectors make cosine distance
        // undefined and the KMeans fit THROW; the sweep side tolerates
        // them (cosineScalar returns 0) but the trainer must not see
        // them. aggregate-of-squares > 0 filters map-side.
        val train = emb.sample(withReplacement = false, trainFraction, seed)
          .where(expr(s"aggregate($vecCol, 0D, (a, x) -> a + double(x) * double(x)) > 0"))
          .select(array_to_vector(col(vecCol)).as("features"))
        val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
          .setDistanceMeasure("cosine")
          .setFeaturesCol("features").fit(train)
        val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
        emb.select(col(idCol).as("id"), col(vecCol).as("v"))
          .withColumn("sims", graft.functions.VectorFns.centroidSimsCol(col("v"), centroids))
          .withColumn("cell", expr("array_position(sims, array_max(sims))").cast("int"))
      }
    val cells = assigned
      .select(col("id").cast("long").as("id"), col("v"), col("cell"))
      .as[(Long, Array[Float], Int)]
    cells.groupByKey(_._3)
      .flatMapGroups { (cell: Int, rows: Iterator[(Long, Array[Float], Int)]) =>
        // deterministic sweep order = ascending id (the paper keeps one
        // representative per neighborhood; WHICH one is policy — lowest
        // id matches the d01/d09 keeper convention)
        val sorted = rows.toArray.sortBy(_._1)
        val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        val cos = graft.functions.VectorFns.cosineScalar _
        sorted.foreach { case (id, v, _) =>
          if (!kept.exists(kv => cos(kv, v) >= threshold)) {
            kept += v
            out += ((id, cell))
          }
        }
        out
      }
      .toDF("vec_id", "cell")
  }

  /** The float-MLlib d17 kernel (cosine k-means cells + float-cosine
    * sweep) — since r8 the spec'd scale path behind the portable
    * registered gate; the greedy-sweep semantics are spec-verified
    * against a brute-force reference on a planted corpus.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupKeep(Tables.embeddings(spark, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  /** d17 PORTABLE similarity floor: a pair is "same neighborhood" iff
    * the integer dot of its floor(nv·2^20)-quantized L2-normalized
    * vectors is ≥ this — the integer image of cosine ≥ 0.4
    * (0.4·2^40 = 439804651110.4, floored; the quantized dot is a
    * deterministic ≈cos·2^40, so this is a sharp integer threshold
    * BOTH engines evaluate identically — the e11 discipline applied
    * to the SemDeDup drop rule).
    */
  val semanticTauInt = 439804651110L

  /** d17 (registered gate since r8): PORTABLE SemDeDup — the same
    * cluster-then-sweep shape with every decision an integer
    * comparison, so the survivor set hash-checks:
    *
    *  - cells = the e06 fixed-point integer Lloyd over
    *    floor(x·2^20)-quantized RAW components
    *    ([[Similarity.trainCentroidsFixedPoint]] — md5-seeded,
    *    order-independent integer sums);
    *  - the within-cell ascending-id greedy sweep drops a vector iff
    *    its INTEGER quantized-normalized dot to an already-kept
    *    vector of the same cell is ≥ [[semanticTauInt]].
    *
    * The oracle reproduces the sweep with a RECURSIVE CTE carrying
    * the kept-id list per cell (kept ids are strictly increasing, so
    * each round appends the smallest id above the last kept that is
    * not adjacent to any kept — exactly the sequential sweep). The
    * float cosine-k-means kernel ([[semanticDedupKeep]]) stays the
    * spec'd scale path. Same scale shape: one cell shuffle, sweep
    * sequential only within a cell, parallel across cells.
    */
  def semanticDedupPortable(emb: DataFrame, idCol: String, vecCol: String,
                            tauInt: Long = semanticTauInt,
                            nCells: Int = Similarity.ivfKmeansCells,
                            iters: Int = Similarity.ivfKmeansIters): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val trainSet = Similarity.quantized(emb, idCol, vecCol).persist()
    val cents = Similarity.trainCentroidsFixedPoint(trainSet, idCol, nCells, iters)
    trainSet.unpersist()
    val cells = Similarity.assignCellsFixedPoint(emb, idCol, vecCol, cents)
      .select(col("neighbor_id").as("id"), col("cell"))
    val qn = Similarity.quantizedNormalized(emb, idCol, vecCol, "id")
    cells.join(qn, Seq("id"))
      .select(col("id").cast("long"), col("cell"), col("qn"))
      .as[(Long, Int, Array[Long])]
      .groupByKey(_._2)
      .flatMapGroups { (cell: Int, rows: Iterator[(Long, Int, Array[Long])]) =>
        def dot(a: Array[Long], b: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        val sorted = rows.toArray.sortBy(_._1)
        val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
        sorted.foreach { case (id, _, v) =>
          if (!kept.exists(kv => dot(kv, v) >= tauInt)) {
            kept += v
            out += ((id, cell))
          }
        }
        out
      }
      .toDF("vec_id", "cell")
  }

  def semanticDedupPortableGate(spark: SparkSession, dir: String): DataFrame =
    semanticDedupPortable(Tables.embeddings(spark, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  /** DuckDB chain reproducing [[semanticDedupPortableGate]]: the e06
    * coarse CTEs (quantized raw, integer Lloyd) for cells, the e07
    * quantized-normalized rows for the similarity floor, an in-cell
    * adjacency self-join (DuckDB-side only — the Spark kernel never
    * materializes pairs, its sweep compares against KEPT survivors),
    * and the greedy sweep as a recursive CTE appending the smallest
    * eligible id per cell per round.
    */
  def semanticDedupOracleSql(dim: Int = 64,
                             tauInt: Long = semanticTauInt,
                             nCells: Int = Similarity.ivfKmeansCells,
                             iters: Int = Similarity.ivfKmeansIters): String = {
    val scale = Similarity.fixedPointScale
    def assignSql(cTab: String): String =
      s"SELECT q.vec_id, c.cn, row_number() OVER (PARTITION BY q.vec_id\n" +
      s"    ORDER BY sum((q.qd - c.cd)*(q.qd - c.cd)), c.cn) AS r\n" +
      s"  FROM q JOIN $cTab c ON q.d = c.d GROUP BY q.vec_id, c.cn"
    val iterBlocks = (1 to iters).map { i =>
      s"a$i AS (\n" +
      s" SELECT vec_id, cn AS cell FROM (\n  ${assignSql(s"c${i - 1}")}) WHERE r = 1),\n" +
      s"u$i AS (\n" +
      s" SELECT a.cell AS cn, q.d, CAST(sum(q.qd) AS BIGINT) // count(*) AS cd\n" +
      s" FROM a$i a JOIN q ON q.vec_id = a.vec_id GROUP BY a.cell, q.d),\n" +
      s"c$i AS (\n" +
      s" SELECT c.cn, c.d, coalesce(u.cd, c.cd) AS cd\n" +
      s" FROM c${i - 1} c LEFT JOIN u$i u ON u.cn = c.cn AND u.d = c.d),"
    }.mkString("\n")
    s"WITH RECURSIVE q AS (\n" +
    s" SELECT e.vec_id, d, CAST(floor(CAST(e.embedding[d] AS DOUBLE) * $scale) AS BIGINT) AS qd\n" +
    s" FROM embeddings e, range(1, ${dim + 1}) t(d)),\n" +
    s"seed AS (\n" +
    s" SELECT vec_id AS cid, row_number() OVER (ORDER BY h, vec_id) AS cn FROM (\n" +
    s"  SELECT vec_id, ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h\n" +
    s"  FROM embeddings)),\n" +
    s"c0 AS (SELECT s.cn, q.d, q.qd AS cd FROM seed s JOIN q ON q.vec_id = s.cid WHERE s.cn <= $nCells),\n" +
    s"$iterBlocks\n" +
    s"asg AS (\n" +
    s" SELECT vec_id AS id, cn AS cell FROM (\n  ${assignSql(s"c$iters")}) WHERE r = 1),\n" +
    s"nrm AS (\n" +
    s" SELECT vec_id, CASE WHEN list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) = 0 THEN 1.0 ELSE sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) END AS nv\n" +
    s" FROM embeddings),\n" +
    s"qn AS (\n" +
    s" SELECT e.vec_id, d,\n" +
    s"  CAST(floor(CAST(CAST(e.embedding[d]::DOUBLE / n.nv AS REAL) AS DOUBLE) * $scale) AS BIGINT) AS qd\n" +
    s" FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id, range(1, ${dim + 1}) t(d)),\n" +
    s"adj AS (\n" +
    s" SELECT a1.cell, a1.id AS lo, a2.id AS hi\n" +
    s" FROM asg a1 JOIN asg a2 ON a2.cell = a1.cell AND a2.id > a1.id\n" +
    s" JOIN qn x ON x.vec_id = a1.id\n" +
    s" JOIN qn y ON y.vec_id = a2.id AND y.d = x.d\n" +
    s" GROUP BY a1.cell, a1.id, a2.id\n" +
    s" HAVING sum(x.qd * y.qd) >= $tauInt),\n" +
    s"keep AS (\n" +
    s" SELECT cell, [min(id)] AS ks FROM asg GROUP BY cell\n" +
    s" UNION ALL\n" +
    s" SELECT cell, list_append(ks, nxt) AS ks FROM (\n" +
    s"  SELECT k.cell, k.ks, min(c.id) AS nxt\n" +
    s"  FROM keep k JOIN asg c ON c.cell = k.cell AND c.id > k.ks[-1]\n" +
    s"  WHERE NOT EXISTS (SELECT 1 FROM adj a\n" +
    s"    WHERE a.cell = k.cell AND a.hi = c.id AND list_contains(k.ks, a.lo))\n" +
    s"  GROUP BY k.cell, k.ks)\n" +
    s" WHERE nxt IS NOT NULL)\n" +
    s"SELECT unnest(ks) AS vec_id, cell FROM (\n" +
    s" SELECT cell, ks, row_number() OVER (PARTITION BY cell ORDER BY len(ks) DESC) AS rn\n" +
    s" FROM keep) WHERE rn = 1\n" +
    s"ORDER BY vec_id"
  }

  /** Canonicalize a URL column — the normalization every web-crawl
    * pipeline applies before URL-keyed dedup, built on Spark's
    * `parse_url` (scheme-case, host-case, `www.` prefix, default-port,
    * trailing-slash, tracking-parameter and fragment differences all
    * collapse):
    *  - scheme → https is assumed canonical here (the crawl norm);
    *    host lowercased, leading `www.` stripped, port dropped
    *    (`parse_url(…, 'HOST')` excludes it)
    *  - path: trailing `/` stripped
    *  - query: `utm_*` / `ref=` tracking params dropped, the rest
    *    SORTED (param order is not identity) and rejoined; fragment
    *    discarded (`QUERY` excludes it)
    * Pure per-row expression chain — map-side, zero shuffle; the dedup
    * that follows is one groupBy on the canonical key.
    */
  def canonicalizeUrl(url: Column): Column = {
    val host = regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")
    val path = regexp_replace(parse_url(url, lit("PATH")), "/$", "")
    val params = filter(split(parse_url(url, lit("QUERY")), "&"),
      p => !(p.startsWith("utm_") || p.startsWith("ref=") || p === ""))
    val keptQ = array_join(array_sort(params), "&")
    concat(lit("https://"), host, path,
      when(keptQ.isNull || keptQ === "", lit(""))
        .otherwise(concat(lit("?"), keptQ)))
  }

  /** d18: URL-keyed dedup — the cheapest, highest-yield dedup layer of
    * a web-scale training pipeline (CCNet/C4 both dedup by URL before
    * touching content): canonicalize, groupBy the canonical key, keep
    * min(doc_id), count the collapsed variants.
    *
    * The fixture's `source` column carries no URLs, so a deterministic
    * pseudo-URL is derived from (source, doc_id) with every
    * canonicalization hazard planted (mixed-case scheme/host, `WWW.`,
    * `:443`, trailing slash, `utm_`/`ref` tracking params, fragments);
    * the ORACLE derives the canonical form closed-form from the same
    * arithmetic — a hash match pins the entire parse/normalize chain
    * against its specification, not against a re-implementation.
    *
    * Scale shape: derivation + canonicalization are map-side; the one
    * shuffle is the groupBy on the canonical key (exactly d01's shape
    * with the canonical URL as the normalized key).
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val url = concat(
      when(col("doc_id") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://"),
      when(col("doc_id") % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
      col("source"), lit(".Example.COM"),
      when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
      lit("/docs/"), (col("doc_id") % 25).cast("string"),
      when(col("doc_id") % 5 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&page="), (col("doc_id") % 3).cast("string"),
      when(col("doc_id") % 7 === 0, lit("&ref=rss")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0, lit("#frag")).otherwise(lit("")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), canonicalizeUrl(url).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
           count(lit(1)).as("n_variants"))
      .orderBy(col("canonical_url"))
  }

  /** One row per non-overlapping `words`-token chunk of every document:
    * `(id, pos, chunk)` with 0-based chunk position. Pure per-row
    * expressions (`split` + `sequence` + `transform` + `slice`, all
    * codegen'd) — map-side, zero shuffle. The paragraph stream behind
    * [[paragraphDedupDocs]]; the fixture's `text` has no newlines, so
    * fixed-width word windows stand in for the paragraph boundary a
    * web corpus would split on.
    */
  private def chunkExploded(docs: DataFrame, idCol: String, textCol: String,
                            words: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol).as("id"),
        posexplode(transform(
          sequence(lit(0), ceil(size(toks).cast("double") / words).cast("int") - 1),
          i => array_join(slice(toks, i * words + 1, lit(words)), " "))))
      .toDF("id", "pos", "chunk")
  }

  /** Corpus-wide paragraph-level dedup — the CCNet/C4 shape: hash every
    * paragraph, keep each distinct paragraph's FIRST occurrence
    * (ordered by `(doc id, position)`), and reassemble each document
    * from its surviving paragraphs. Whole-document dedup (d01) misses
    * boilerplate shared across different pages; this removes it while
    * keeping the unique remainder of every document.
    *
    * Scale shape — deliberately aggregate+join, NOT a window over the
    * paragraph key: the keeper of a paragraph is `min(struct(id, pos))`,
    * an algebraic aggregate, so map-side combine collapses each
    * partition's occurrences of a boilerplate paragraph ("subscribe to
    * our newsletter" × 10⁹) to ONE pre-shuffle row — a
    * `row_number() OVER (PARTITION BY chunk)` window would instead sort
    * every occurrence of the hottest paragraph in a single task. The
    * keeper set IS the aggregate output (no join back on the text);
    * the remaining shuffles are keyed by doc id (no skew). At 100 TB,
    * group on the 128-bit hash pair of the chunk (the
    * [[substringDupSpansHashed]] key design) so the shuffle carries
    * 16 bytes per distinct paragraph instead of the text.
    */
  def paragraphDedupDocs(docs: DataFrame, idCol: String, textCol: String,
                         words: Int = 10): DataFrame = {
    val chunks = chunkExploded(docs, idCol, textCol, words)
    // keeper per distinct paragraph = earliest (id, pos); the agg output
    // already carries everything needed downstream — no re-join on chunk
    val kept = chunks
      .groupBy(col("chunk"))
      .agg(min(struct(col("id"), col("pos"))).as("k"))
      .select(col("k.id").as("id"), col("k.pos").as("pos"), col("chunk"))
    val keptPerDoc = kept
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("text_dedup"))
    // left join: a doc whose every paragraph first appeared elsewhere
    // still gets a row (n_kept=0, empty text) — the drop decision is
    // the caller's filter, not silent row loss
    chunks.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
      .join(keptPerDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** d19: paragraph-dedup'd documents table (10-word chunks),
    * oracle-checked chunk-for-chunk — counts AND the reassembled text —
    * against DuckDB's lateral-unnest + window re-derivation.
    */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedupDocs(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** The 100 TB path of [[paragraphDedupDocs]]: identical semantics
    * (spec-asserted equal on the fixture), but the corpus-wide keeper
    * shuffle carries the d13-style 128-bit hash PAIR per chunk — 16
    * bytes — instead of the paragraph text; the text only rides the
    * id-keyed reassembly shuffle it has to ride anyway. The keeper
    * aggregate emits `(id, pos)` addresses, and a semi-join on the
    * chunk ADDRESS (not its content) marks survivors — both sides of
    * that join are keyed by `(id, pos)`, so no text moves on the
    * chunk key at all. Same collision math as
    * [[substringDupSpansHashed]]: ~10⁻¹⁴ expected collisions at 10¹²
    * distinct paragraphs.
    */
  def paragraphDedupDocsHashed(docs: DataFrame, idCol: String, textCol: String,
                               words: Int = 10): DataFrame = {
    val chunks = chunkExploded(docs, idCol, textCol, words)
    val kept = chunks
      .select(col("id"), col("pos"),
        xxhash64(col("chunk")).as("h1"),
        xxhash64(lit(0x9E3779B9L), col("chunk")).as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("id"), col("pos"))).as("k"))
      .select(col("k.id").as("id"), col("k.pos").as("pos"))
    val keptPerDoc = chunks.join(kept, Seq("id", "pos"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk")), " ").as("text_dedup"))
    chunks.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"))
      .join(keptPerDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Gate-visible recall floors for the d26 audit — a method whose
    * slice recall drops below its floor VANISHES from the gate's row
    * set (the e08 pattern: `spark_rows` moves, not just a spec).
    * Floors leave one-miss headroom on the 4-pair fixture anchor;
    * d04's is lower by design — SimHash detects cosine-like token
    * similarity, a different notion than char-shingle jaccard, so its
    * overlap with the jaccard anchor is structurally partial (measured
    * 50 at sf0.01).
    */
  val dedupRecallFloors: Seq[(String, Long)] = Seq(
    "d03_minhash_lsh" -> 75L,
    "d04_simhash" -> 25L,
    "d05_ngram_jaccard" -> 75L)

  /** d26: dedup recall audit — e08's gate-visible-calibration pattern
    * applied to the DEDUP family: each near-dup method's pair set,
    * restricted to the bounded exact-anchor slice (`doc_id < 250`, the
    * d08 oracle kernel), scored as integer recall×100 against the
    * exact char-jaccard ≥ 0.6 pairs, emitted ONLY at/above its floor.
    * The methods are themselves hash-checked end-to-end (d03/d04/d05);
    * what this gate pins is their CALIBRATION — that the banding and
    * threshold constants actually recover the true pairs — as a fact
    * the correctness gate sees. Oracle composes the four proven chains
    * (the e08Sql pattern).
    *
    * Each method runs over the ANCHOR SLICE of the corpus (`doc_id <
    * 250`), not the full table: a pair with both ids in the slice is a
    * function of those two docs alone (per-doc shingling/signing, same
    * band keys, per-pair prefilter and verify — no stage reads a third
    * doc), so slicing the INPUT yields exactly the full run's pairs
    * restricted to the slice, at 1/corpus of the cost. The DuckDB
    * oracle keeps the full-corpus-then-filter form — values agree by
    * the same argument. (Before r12 this gate re-shingled the whole
    * corpus three times and was the bench's #2 query.)
    */
  def dedupRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = jaccardExactPairs(spark, dir)
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val total = exact.count()
    // zero-guarded like e08: an empty anchor reads as recall 0 — every
    // method then fails its floor and only the anchor_pairs sentinel
    // (value 0) remains, which says exactly that
    def recallPct(hits: Long): Long =
      if (total == 0L) 0L else hits * 100L / total
    val sliced = Tables.documents(spark, dir).filter(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val methods: Seq[(String, () => DataFrame)] = Seq(
      "d03_minhash_lsh" -> (() => minHashLshPairsPortable(sliced, "doc_id", "text")),
      "d04_simhash" -> (() => simHashPairsPortable(sliced, "doc_id", "text")),
      "d05_ngram_jaccard" -> (() => ngramJaccardPairsPortable(sliced, "doc_id", "text")))
    val floors = dedupRecallFloors.toMap
    // the three method legs are independent DAGs over the checkpointed
    // slice/anchor — submit concurrently (the e08 audit pattern, via
    // the shared runner: a failed leg cancels its siblings' jobs, a
    // wedged leg times out loudly); results re-assembled in method
    // order, output unchanged
    val rows = graft.util.Audits.concurrently(spark, "d26",
      methods.map { case (name, fn) => () => {
        val slice = fn().select(col("doc_a"), col("doc_b"))
        (name, recallPct(exact.join(slice, Seq("doc_a", "doc_b")).count()),
          floors(name))
      }})
    // sentinel first: the anchor's own pair count at floor 0, so the
    // gate is NEVER empty-by-rows — at scale factors where the anchor
    // slice has no ≥0.6 pairs (sf0.1) every METHOD row still vanishes
    // (recall 0 < floor), but `spark_rows ≥ 1` distinguishes "floors
    // tripped / anchor empty" from "gate broken"
    (("anchor_pairs", total, 0L) +:
        rows.filter { case (_, r, floor) => r >= floor })
      .toDF("method", "recall_x100", "floor")
      .orderBy(col("method"))
  }
}
