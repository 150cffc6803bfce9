package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text-analysis operators over the `documents` fixture — the engine's
  * re-expression of the reference's text-normalization pipelines
  * (`logstash/pipeline/csv-tech.conf`) plus the LLM-data-pipeline text
  * metrics (language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is a pure per-row expression chain (no UDFs, no
  * shuffles except the final aggregations), so it scales linearly with
  * input splits and stays inside WholeStageCodegen.
  */
object TextAnalysis {

  val enStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** The csv-tech pipeline shape over documents: IN-list filter +
    * projection + normalization chain (P1+P2+F1-F5), deterministic order.
    */
  def normalizePipeline(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "fr"))
      .select(col("doc_id"), col("lang"), normalizeText(col("text")).as("text_norm"))
      .orderBy(col("doc_id"))

  /** t20: the registered-SQL-FUNCTION surface through the gate — the
    * same fused `normalize_text` codegen kernel as t01, but invoked
    * from `spark.sql` TEXT after `GraftFunctions.registerAll`, i.e.
    * the path a SQL-only user takes (`spark.sql.extensions=graft.
    * GraftExtensions` gives the identical registry with zero code).
    * Hash-matching t01's oracle proves the registry builder, the
    * SQL-side argument binding, and the kernel agree bit-for-bit with
    * the Column-API route the rest of the gate exercises.
    */
  def sqlTextKernels(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql("""
      SELECT doc_id, lang, normalize_text(text) AS text_norm
      FROM documents WHERE lang IN ('en', 'fr') ORDER BY doc_id""")
  }

  /** Per-document quality metrics: token count, mean token length,
    * stopword ratio, char count — the length/punct/stopword quality
    * signals of a training-data filter.
    */
  def docQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // project the token array once; the metric expressions share it
      // instead of re-running normalize+split per metric
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        tokens(normalizeText(col("text"))).as("toks"))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        meanTokenLen(col("toks")).as("mean_token_len"),
        stopwordRatio(col("toks"), enStopwords).as("stopword_ratio"))
      .orderBy(col("doc_id"))

  /** Whitespace + BPE-ish token counts per document. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("ws_tokens"),
        bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus term frequencies: explode tokens → count — top 25 terms.
    * explode + partial agg: the shuffle carries one row per *distinct*
    * (partition, term), not per token occurrence.
    */
  def termFrequencies(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(normalizeText(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(25)

  /** Heuristic language-ID vs the labelled lang column: per-language
    * accuracy-ish confusion counts.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), tokens(normalizeText(col("text"))).as("toks"))
      .select(col("lang"), langId(col("toks")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_guess"))

  /** Text → embedding bridge: hashing-trick TF vectors over normalized
    * tokens, fed straight into the ANN operator — content-similar
    * documents for the first 5 doc ids (top-3 each). The whole text
    * modality plugs into the vector operators through one expression.
    */
  def docSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.HashFns.hashingTfVec(
          tokens(normalizeText(col("text"))), 64).as("vec"))
    Similarity.bruteForceTopK(vecs, vecs.filter(col("doc_id") < 5),
      "doc_id", "vec", k = 3)
  }

  /** ENGINE-PORTABLE doc similarity — the registered t07 gate. Same
    * semantic as [[docSimilarity]] (hashing-trick TF vectors →
    * brute-force cosine top-3 for the first 5 docs) made hash-checkable
    * by keeping EVERY value integer until one exact final division:
    * TF buckets come from md5-60-bit token hashes masked to 64 dims
    * ([[graft.functions.HashFns.md5TfCounts]]), and ranking uses
    * dot²/(‖q‖²·‖c‖²) instead of cosine — monotone-identical for
    * non-negative TF dots, and with corpus-bounded products < 2^53 the
    * division of exact ints yields bit-identical doubles in Spark and
    * DuckDB, so `row_number` orders identically (ties broken by
    * neighbor_id). The float `hashingTfVec → bruteForceTopK` bridge
    * stays the spec'd ANN-integration path.
    */
  def docSimilarityPortable(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HashFns
    val vecs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        HashFns.md5TfVec(tokens(normalizeText(col("text"))), 64).as("vec"))
      .withColumn("nsq", HashFns.dotLong(col("vec"), col("vec")))
    val q = vecs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("vec").as("q_vec"), col("nsq").as("na"))
    val scored = vecs
      .select(col("doc_id").as("neighbor_id"), col("vec").as("c_vec"), col("nsq").as("nb"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", HashFns.dotLong(col("q_vec"), col("c_vec")))
      .withColumn("score",
        (col("dot") * col("dot")).cast("double") / (col("na") * col("nb")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Analyzed full-text term match with relevance scoring — the
    * ES-analyzed-`text`-field capability the reference's store provides
    * via dynamic mapping (its Logstash query uses `.keyword` precisely
    * to BYPASS the analyzer — `csv-tech.conf:15` — implying the analyzed
    * default; Kibana search, `docker-compose.yml:63-74`). Query terms
    * are matched against the analyzed (normalize+tokenize) document
    * body; per-doc relevance = Σ_t tf(t,d) · (N / df(t)) — tf-idf with a
    * rational idf so the score stays float-exact across engines (no
    * transcendentals, fixed left-assoc summation order).
    *
    * Scale shape: tf columns are per-row expressions; corpus stats
    * (N, df) are one partial-agg reduce broadcast back — no
    * single-partition window, no shuffle of the corpus.
    */
  def textMatch(spark: SparkSession, dir: String,
                terms: Seq[String] = Seq("join", "hash", "stream")): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(normalizeText(col("text"))).as("toks"))
    val withTf = base.select(col("doc_id") +: terms.map(t =>
      size(filter(col("toks"), x => x === t)).cast("long").as(s"tf_$t")): _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    withTf.crossJoin(broadcast(stats))
      .withColumn("n_hits", terms.map(t => col(s"tf_$t")).reduce(_ + _))
      .filter(col("n_hits") > 0)
      // df=0 guard: an absent term must contribute 0, not 0·(N/0)=NaN
      .withColumn("score", terms.map(t =>
        when(col(s"df_$t") > 0,
          col(s"tf_$t").cast("double") *
            (col("n_docs").cast("double") / col(s"df_$t").cast("double")))
          .otherwise(lit(0.0)))
        .reduce(_ + _))
      .select(col("doc_id"), col("n_hits"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  /** BM25 document ranking (rational-idf variant) — the full
    * search-engine relevance function over the analyzed corpus:
    * score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    * with k1=1.2, b=0.75 and idf(t) = (N−df+0.5)/(df+0.5) — BM25's idf
    * WITHOUT the log so every operation is rational arithmetic on
    * corpus integers: both engines produce bit-identical doubles and
    * the ranking is fully oracle-checked (monotone in the standard
    * log-idf score for a single term; for multi-term queries the
    * weighting is steeper on rare terms, which is the useful direction).
    *
    * Same scale shape as [[textMatch]]: per-row tf/dl expressions, one
    * broadcast stats row, no corpus shuffle.
    */
  def bm25Rank(spark: SparkSession, dir: String,
               terms: Seq[String] = Seq("join", "hash", "stream")): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(normalizeText(col("text"))).as("toks"))
    val withTf = base.select(
      col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        terms.map(t => size(filter(col("toks"), x => x === t)).cast("long").as(s"tf_$t")): _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    def idf(t: String) =
      (col("n_docs").cast("double") - col(s"df_$t").cast("double") + lit(0.5)) /
        (col(s"df_$t").cast("double") + lit(0.5))
    def tfNorm(t: String) =
      (col(s"tf_$t").cast("double") * lit(2.2)) /
        (col(s"tf_$t").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
    withTf.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .withColumn("score", terms.map(t => idf(t) * tfNorm(t)).reduce(_ + _))
      .select(col("doc_id"), col("dl"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  /** Approximate heavy hitters over corpus terms via the Misra-Gries
    * typed Aggregator ([[graft.functions.Aggregators.FrequentItemsAgg]]):
    * each partition holds ≤k counters, the shuffle carries ≤k counters
    * per partition — the sketch-shaped alternative to the exact
    * explode→groupBy of [[termFrequencies]] when |distinct terms| is too
    * large to shuffle (the ES `terms` agg `shard_size` analog).
    * Registered rows-only: estimates depend on partition merge order;
    * the MG guarantees (never overcounts, every >n/(k+1) term survives)
    * are asserted against exact counts in `AggregatorsSpec`.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, dir)
      .select(explode(tokens(normalizeText(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .as[String]
    terms
      .select(graft.functions.Aggregators.frequentItems(k).toColumn.name("items"))
      .toDF("items")
      .withColumn("item", explode(col("items")))
      .select(col("item._1").as("term"), col("item._2").as("est_count"))
      .orderBy(col("est_count").desc, col("term"))
  }

  /** Document fingerprints (md5 of normalized text) — the exact-dedup /
    * provenance key.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (shift-robust MOSS selection): per doc,
    * the count of selected fingerprints plus a digest of the selected
    * set — localizable duplication evidence at a fraction of
    * shingle-set size.
    *
    * ORACLE-PORTABLE variant: the selection algorithm (minimum of each
    * window of w consecutive k-gram hashes; degenerate short-text
    * window included) is exactly the MOSS rule, but the gram hash is
    * the first 60 bits of md5 — a hash BOTH engines compute
    * identically — instead of the engine-local Rabin-Karp rolling
    * hash, and the digest is md5 over the SORTED distinct selected
    * values (order-insensitive, so selection-order bookkeeping cannot
    * produce false mismatches). That turns the whole selection
    * semantics into a DuckDB-hash-checkable gate. The O(1)-per-position
    * rolling-hash kernel (`HashFns.winnowFingerprints`) remains the
    * production scale path, pinned by `HashFnsSpec`/`EdgeCasesSpec`;
    * per-window min and dedup behavior here and there are the same
    * rule on different gram hashes.
    */
  def winnowingFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val k = 8; val w = 4
    Tables.documents(spark, dir)
      .select(col("doc_id"), normalizeText(col("text")).as("nt"))
      .withColumn("ng", greatest(length(col("nt")) - (k - 1), lit(0)))
      // 60-bit md5 gram hashes at positions 1..ng (nothing when the
      // doc is shorter than one gram)
      .withColumn("hs", when(col("ng") >= 1, expr(
        s"""transform(sequence(1, ng),
           | i -> cast(conv(substr(md5(cast(substr(nt, i, $k) as binary)), 1, 15), 16, 10) as bigint))""".stripMargin)))
      // window starts 1..max(ng-w+1, 1); slice() clips at the array
      // end, so the ng<=w degenerate case reduces to one global min —
      // the same rule as the rolling-hash kernel
      .withColumn("sel", coalesce(
        when(col("ng") >= 1, expr(
          s"""array_sort(array_distinct(transform(
             | sequence(1, greatest(ng - ${w - 1}, 1)),
             | p -> array_min(slice(hs, p, $w)))))""".stripMargin)),
        expr("cast(array() as array<bigint>)")))
      .select(col("doc_id"),
        size(col("sel")).cast("long").as("n_fingerprints"),
        md5(array_join(col("sel"), ",").cast("binary")).as("fps_digest"))
      .orderBy(col("doc_id"))
  }

  /** t28: CONTENT-DEFINED CHUNKING (the Rabin/FastCDC family) — chunk
    * boundaries chosen by document CONTENT, not fixed offsets, so an
    * insertion or deletion reshuffles only the chunks it touches while
    * every other chunk (and its hash) survives byte-identical. That is
    * the property fixed-size chunking (t16) lacks and the reason CDC
    * underlies storage dedup and incremental-sync systems: chunk-hash
    * dedup across document versions keeps working after edits.
    *
    * Portable formulation (the t08 numeric family): position i of the
    * normalized text is a cut iff the 60-bit md5 hash of the 8-char
    * gram starting at i ≡ 0 (mod 64) — expected chunk ≈ 64 chars. The
    * boundary decision is a pure per-position predicate, so chunking
    * is embarrassingly parallel WITHIN a document (no sequential scan
    * state) and bit-identical across engines. Production CDC adds
    * min/max chunk bounds and a rolling (not per-position md5) hash —
    * `HashFns` rolling kernels are that scale path; min/max clamping
    * reintroduces sequential dependence, which is why the registered
    * gate pins the stateless core.
    *
    * Output: one row per chunk (doc_id, chunk_idx, chunk_len,
    * chunk_hash) — the chunk-hash table IS the dedup index.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val k = 8; val mask = 64
    // the cut predicate costs one md5 PER CHARACTER POSITION — a
    // CPU-heavy map chain. A small corpus arriving as one parquet
    // file is one input split, which would serialize all that
    // hashing on a single core (measured: 1× on the single-file
    // fixture ran SLOWER than 10× on a 32-file corpus). One cheap
    // shuffle of the raw text fans the hash work across the cluster.
    // The partition count is EXPLICIT — AQE would coalesce a bare
    // repartition(col) of a ~600 KB text corpus back to one
    // partition, re-serializing the hash work (the cost is CPU per
    // position, invisible to byte-based coalescing heuristics) — but
    // DERIVED from the session, not a literal: defaultParallelism is
    // total executor cores on a real cluster (1000-core cluster →
    // 1000-way fan-out), 32 on this local[32] harness. A
    // REPARTITION_BY_NUM exchange is never elided, so pinning it to
    // the cluster width is what keeps this correct at scale.
    val fanOut = spark.sparkContext.defaultParallelism
    Tables.documents(spark, dir)
      .repartition(fanOut, col("doc_id"))
      .select(col("doc_id"), normalizeText(col("text")).as("nt"))
      .withColumn("ln", length(col("nt")))
      .filter(col("ln") >= 1)
      // cut positions 2..ng (1 is always a chunk start); gram hash =
      // the t08 md5-60-bit kernel, boundary iff hash % mask == 0
      .withColumn("ng", greatest(col("ln") - (k - 1), lit(0)))
      .withColumn("cuts", when(col("ng") >= 2, expr(
        s"""filter(sequence(2, ng),
           | i -> cast(conv(substr(md5(cast(substr(nt, i, $k) as binary)), 1, 15), 16, 10) as bigint) % $mask = 0)""".stripMargin))
        .otherwise(expr("cast(array() as array<int>)")))
      .withColumn("bounds",
        concat(array(lit(1)), col("cuts"), array(col("ln") + 1)))
      .withColumn("ch", explode(expr(
        """transform(sequence(1, size(bounds) - 1),
          | k -> struct(k AS ci,
          |   element_at(bounds, k + 1) - element_at(bounds, k) AS cl,
          |   substring(nt, element_at(bounds, k),
          |     element_at(bounds, k + 1) - element_at(bounds, k)) AS ck))""".stripMargin)))
      .select(col("doc_id"),
        col("ch.ci").cast("long").as("chunk_idx"),
        col("ch.cl").cast("long").as("chunk_len"),
        md5(col("ch.ck").cast("binary")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** t12: EXACT heavy hitters via sketch-prefilter + recount — the
    * two-pass pattern that makes the MG sketch ([[heavyHitters]])
    * production-grade at 100 TB. Pass 1 runs the k-counter sketch
    * (shuffle ≤k counters per partition) and collects the ≤k candidate
    * terms to the driver — bounded, like an IVF centroid sample. Pass 2
    * recounts ONLY the candidates exactly (the IN-list filter drops
    * every other term map-side, so the shuffle carries ≤k keys) and
    * keeps terms with `count·k > n`. MG guarantees every term above
    * n/k survives pass 1, so the result equals the exact heavy-hitter
    * query — which is precisely what the oracle computes, with no
    * sketch at all.
    */
  def heavyHittersExact(spark: SparkSession, dir: String, k: Int = 32): DataFrame = {
    import spark.implicits._
    val candidates: Seq[String] =
      heavyHitters(spark, dir, k).select(col("term")).as[String].collect().toSeq
    val terms = Tables.documents(spark, dir)
      .select(explode(tokens(normalizeText(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
    val total = terms.agg(count(lit(1)).as("n_total"))
    terms
      .filter(col("term").isin(candidates: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("n_count"))
      .crossJoin(broadcast(total))
      // integer-exact threshold: count > n/k without a double division
      .filter(col("n_count") * k > col("n_total"))
      .select(col("term"), col("n_count"))
      .orderBy(col("n_count").desc, col("term"))
  }

  // — PII redaction (t13): the scrubbing stage of a training-data
  //   pipeline. Patterns are written in the common Java-regex/RE2
  //   subset (character classes, bounded repetition, \b) so the oracle
  //   applies the literally-identical pattern. —
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\+\\d{1,3}[ ]\\d(?:[ ]?\\d){7,}"

  /** t13: PII detection + redaction. The fixture text carries no PII,
    * so the query plants a deterministic contact line derived from
    * doc_id (same expression in the oracle), then counts and redacts
    * emails → phone numbers → IPs in that order (emails first — they
    * embed digits the broader patterns could claim). Pure per-row
    * regex chain: map-only, codegen'd, linear at any scale. The
    * registered output pins the redacted text via md5 so the compare
    * stays scalar.
    */
  def piiRedaction(spark: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com tel +33 6 12 34 56 "),
      lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
      lit(" host 10.0."), pmod(col("doc_id"), lit(256)), lit(".7"))
    val redacted =
      regexp_replace(regexp_replace(regexp_replace(planted,
        emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(planted, lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(planted, lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        size(regexp_extract_all(planted, lit(ipRe), lit(0))).cast("long").as("n_ips"),
        md5(redacted.cast("binary")).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** q50: MATERIALIZED inverted index — the actual data structure
    * behind the reference store's full-text search (Elasticsearch is an
    * inverted index): a (term, doc_id) posting table, term-clustered on
    * disk (repartition + sortWithinPartitions on term) so a term lookup
    * is a pushed-down point predicate that row-group-skips to the
    * matching postings instead of scanning every document's text. Index
    * build is one explode + shuffle, paid once and amortized over every
    * query; the query side joins ONLY posting rows (term, id) — never
    * the text. The oracle recomputes the same answer by brute-force
    * token scan, pinning index == scan.
    */
  def invertedIndexQuery(spark: SparkSession, dir: String,
                         terms: Seq[String] = Seq("join", "hash", "stream")): DataFrame = {
    val idx = graft.util.Scratch.dir(spark, "q50_idx", dir).toString
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(tokens(normalizeText(col("text"))))).as("term"))
      .filter(length(col("term")) > 0)
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.parquet(idx)
    spark.read.parquet(idx)
      .filter(col("term").isin(terms: _*)) // pushed to the posting scan
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms_matched"),
        array_join(sort_array(collect_set(col("term"))), ",").as("terms"))
      .orderBy(col("doc_id"))
  }

  /** t15: collocation mining — corpus-level bigram association scores
    * (the phrase-detection stage of a tokenizer/corpus pipeline). The
    * score is the RATIONAL pointwise-mutual-information core
    * `P(ab)/(P(a)P(b)) = n_ab·N_uni² / (N_bi·n_a·n_b)` with no
    * logarithm, so every arithmetic step is integer-derived and the
    * doubles are bit-identical across engines (the log is monotone —
    * ranking is unchanged). Two explode→count aggregates + two
    * broadcast joins of tiny count tables onto the bigram counts;
    * min-count 5 prunes the long tail before the joins.
    */
  def collocations(spark: SparkSession, dir: String, minCount: Long = 5L): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(tokens(normalizeText(col("text"))).as("toks"))
      .select(expr("filter(toks, t -> length(t) > 0)").as("toks"))
    // uni feeds two broadcast joins + the total, bi feeds the join
    // spine + its total — materialize each ONCE (they are tiny count
    // tables: |vocab| and |bigrams ≥ minCount| rows) or every consumer
    // re-tokenizes the whole corpus
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
      .localCheckpoint(true)
    // adjacent pairs via zip_with over two shifted slices — measured
    // ~15× faster than the indexed `transform(sequence(...),
    // i -> element_at(toks, i)...)` formulation (per-index element_at
    // inside an HOF lambda is the slow path); empty/1-token docs fall
    // out naturally (zero-length slices)
    val bi = toks
      .select(expr(
        """zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
          |         slice(toks, 2, greatest(size(toks) - 1, 0)),
          |         (x, y) -> struct(x AS a, y AS b))""".stripMargin).as("bgs"))
      .select(explode(col("bgs")).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .localCheckpoint(true)
    val nUni = uni.agg(sum(col("n_tok")).as("n_uni_total"))
    val nBi = bi.agg(sum(col("n_ab")).as("n_bi_total"))
    bi.join(broadcast(uni.select(col("tok").as("a"), col("n_tok").as("n_a"))), Seq("a"))
      .join(broadcast(uni.select(col("tok").as("b"), col("n_tok").as("n_b"))), Seq("b"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("assoc",
        (col("n_ab").cast("double") * col("n_uni_total").cast("double") * col("n_uni_total").cast("double"))
          / (col("n_bi_total").cast("double") * col("n_a").cast("double") * col("n_b").cast("double")))
      .select(col("a"), col("b"), col("n_ab"), col("assoc"))
      .orderBy(col("assoc").desc, col("a"), col("b"))
      .limit(25)
  }

  /** t14: repetition signals — the Gopher-style quality heuristics for
    * machine-generated/boilerplate text: the fraction of duplicate word
    * bigrams and the frequency share of the single most-common token.
    * Both are rational functions of integer counts (fixed single
    * division), so the doubles are bit-identical across engines. All
    * array work is per-row over a ~100-token list — map-only at scale.
    */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        // zip_with over shifted slices — see collocations: the indexed
        // element_at-in-HOF formulation is ~15× slower
        expr(
          """zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
            |         slice(toks, 2, greatest(size(toks) - 1, 0)),
            |         (x, y) -> concat(x, ' ', y))""".stripMargin).as("bigrams"),
        expr("array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))")
          .as("top_tok"))
      .select(col("doc_id"), col("n_tokens"),
        when(size(col("bigrams")) > 0,
          (size(col("bigrams")) - size(array_distinct(col("bigrams")))).cast("double")
            / size(col("bigrams")).cast("double"))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        (col("top_tok").cast("double") / col("n_tokens").cast("double")).as("top_token_frac"))
      .orderBy(col("doc_id"))

  /** t16: sliding-window document chunking — the RAG / long-context
    * preprocessing step: each document's token stream becomes
    * overlapping `window`-token chunks every `stride` tokens (stride <
    * window ⇒ the overlap guarantees no token run is split across a
    * boundary unseen). Emits (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_fp) with an md5 fingerprint instead of the chunk text, so
    * the result stays narrow and cross-engine hashable.
    *
    * Scale shape: pure per-row expressions + one explode — map-only, no
    * shuffle; chunk count per doc is ⌈(len−window)/stride⌉+1, linear in
    * corpus tokens.
    */
  def chunkDocuments(spark: SparkSession, dir: String,
                     window: Int = 64, stride: Int = 48): DataFrame = {
    val toks = split(normalizeText(col("text")), " ")
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        // start bound n-(window-stride): guarantees the LAST window end
        // reaches n (tail tokens never dropped) without emitting a
        // window that earlier windows already fully cover
        explode(sequence(lit(1),
          greatest(size(col("toks")) - (window - stride), lit(1)), lit(stride))).as("s"),
        col("toks"))
      .select(col("doc_id"),
        ((col("s") - 1) / stride).cast("long").as("chunk_idx"),
        size(slice(col("toks"), col("s"), lit(window))).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("s"), lit(window))).cast("binary"))
          .as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Per-language quantile-threshold quality filter (t17): drop the
    * bottom quartile of documents by token count within each language —
    * the quality-pruning stage of a training-data pipeline ("keep the
    * top 75% per language", so low-resource languages aren't wiped out
    * by a global threshold).
    *
    * The per-group exact quantile comes from a value HISTOGRAM
    * (`groupBy(lang, n_tokens)`), not from buffering every value the
    * way `percentile` does: the aggregation shuffle carries one row per
    * distinct (language, token-count) pair — bounded by the range of
    * document sizes, not by corpus row count — so the exact threshold
    * stays computable at 100 TB. The per-language thresholds (a few
    * rows) broadcast back; the corpus side is filtered map-side off
    * that broadcast and is never shuffled by the filter itself.
    *
    * Threshold definition (integer-exact, tie-safe): with n docs in a
    * language, drop-count k = n div 4 and the threshold is the
    * (k+1)-th smallest token count; every doc with n_tokens >= that
    * value is kept. The verdict depends only on integer values — no FP
    * quantile interpolation, no tie-order sensitivity — so Spark and
    * the DuckDB oracle agree bit-for-bit.
    */
  def qualityQuantileFilter(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(tokens(normalizeText(col("text")))).cast("long").as("n_tokens"))
    val hist = scored.groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("lang").orderBy("n_tokens")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    val thresholds = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      // min value whose cumulative count reaches rank k+1 = the
      // (k+1)-th smallest value in the language
      .filter(col("cum") >= expr("n div 4") + 1)
      .groupBy(col("lang")).agg(min(col("n_tokens")).as("thr"))
    scored.join(broadcast(thresholds), Seq("lang"))
      .filter(col("n_tokens") >= col("thr"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** t19: linear quality-classifier scoring — the fastText-style "model
    * quality filter" stage of a training-data pipeline (a trained linear
    * model over interpretable document features), expressed so the score
    * is EXACT integer arithmetic and therefore oracle-checkable:
    * features are integer counts off one shared token-array projection,
    * weights are integer milli-units, and the decision is a threshold on
    * the integer score. Swapping the frozen weights for trained ones
    * changes constants, not the plan.
    *
    * Features (per document): chars, tokens, distinct tokens, stopword
    * hits, repeated-token mass (n_tokens − n_distinct, the word-soup /
    * boilerplate penalty). score_x1000 = 2·chars + 15·tokens +
    * 120·distinct + 500·stop − 60·repeat; keep iff ≥ 4000 (≈ the fixture
    * median, so both classes are populated at every scale factor).
    *
    * Scale shape: a pure per-row expression chain over one corpus scan —
    * no shuffle at all before the output sort; linear in splits.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        tokens(normalizeText(col("text"))).as("toks"))
      .select(col("doc_id"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        size(filter(col("toks"), t => t.isin(enStopwords: _*))).cast("long").as("n_stop"))
      .withColumn("score_x1000",
        lit(2L) * col("n_chars") + lit(15L) * col("n_tokens") +
          lit(120L) * col("n_distinct") + lit(500L) * col("n_stop") -
          lit(60L) * (col("n_tokens") - col("n_distinct")))
      .withColumn("label",
        when(col("score_x1000") >= 4000L, lit("keep")).otherwise(lit("drop")))
      .select(col("doc_id"), col("score_x1000"), col("label"))
      .orderBy(col("doc_id"))

  /** Hybrid-retrieval rank fusion (t18): reciprocal-rank fusion (RRF,
    * Cormack et al. — score = Σ 1/(60+rank)) of the BM25 (t10) and
    * tf·idf (t09) shortlists. This is the fusion stage of a hybrid
    * search stack (lexical + second ranker → one list for the
    * reranker/RAG context builder).
    *
    * Scale shape: RRF in production fuses top-k SHORTLISTS, never full
    * corpora — both inputs here are already `LIMIT 50` outputs of
    * distributed rankers (TakeOrderedAndProject), so the global
    * `row_number` windows and the full-outer join run on ≤50 rows each
    * and cost nothing regardless of corpus size. Ranks are integers and
    * the RRF sum is two fixed-order IEEE divisions, so the result is
    * bit-identical across engines (rank 0 = absent from that list).
    */
  def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = Window.orderBy(col("score").desc, col("doc_id"))
    def ranked(df: DataFrame, as: String): DataFrame =
      df.select(col("doc_id"), row_number().over(byScore).cast("long").as(as))
    val bm = ranked(bm25Rank(spark, dir), "r_bm")
    val tm = ranked(textMatch(spark, dir), "r_tm")
    val rrfTerm: Column => Column = r =>
      coalesce(lit(1.0) / (lit(60.0) + r.cast("double")), lit(0.0))
    bm.join(tm, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r_bm"), lit(0L)).as("bm25_rank"),
        coalesce(col("r_tm"), lit(0L)).as("tfidf_rank"),
        (rrfTerm(col("r_bm")) + rrfTerm(col("r_tm"))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
  }

  /** t22: accent folding proven by round trip — the fixture corpus has
    * no diacritics, so the query PLANTS them closed-form (the d18
    * hazard pattern: six base letters become six French accented
    * forms) and then folds with the real
    * [[graft.functions.TextFns.foldAccents]] kernel. The oracle is the
    * ORIGINAL text verbatim — any gap in the fold map (a letter
    * missed, a wrong base mapping) leaves a stray accent and breaks
    * the hash. Ligature expansion (œ/æ, two-char targets `translate`
    * can't express) is spec-pinned on literals in `TextAnalysisSpec`.
    * Map-side only: one translate to plant, regexps + translate to
    * fold, zero shuffles.
    */
  def accentFoldRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        foldAccents(translate(col("text"), "aeiouc", "àéîôûç"))
          .as("text_folded"))
      .orderBy(col("doc_id"))

  /** t23: Unicode NFC normalization proven by planted decomposition
    * (the t22 pattern one level deeper): every 'e' becomes the
    * DECOMPOSED pair e + U+0301 (combining acute), then
    * [[graft.functions.TextFns.nfc]] recomposes. The oracle writes the
    * PRECOMPOSED replacement (é = U+00E9) directly — a hash match
    * proves the engine's canonical composition agrees with Unicode,
    * not merely with itself. Map-side, no UDF (JDK Normalizer behind a
    * codegen expression with an isNormalized fast path).
    */
  def nfcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFns.nfc(
          regexp_replace(col("text"), "e", "é")).as("text_nfc"))
      .orderBy(col("doc_id"))

  /** t21: bigram novelty profile — the LM-shaped corpus statistic that
    * stays integer-exact. Per document: how many of its word bigrams
    * exist, how familiar they are corpus-wide (sum/max of corpus
    * bigram frequency over its positions), and how many are hapax
    * (corpus count 1 — unique to this document). `novelty` is one
    * fixed-order division of two integers, so the double is
    * bit-identical to the oracle; there is no grouped float sum
    * anywhere (the order-dependent shape that can't hash-match).
    *
    * This is the cheap screen for both memorized/boilerplate text
    * (novelty→0: every bigram is common) and noise (novelty→1) before
    * any model-based scoring. Scale shape: the bigram stream is the
    * t15 shifted-slice kernel (map-side), corpus counts are one
    * groupBy on the bigram key, and the count join back is a plain
    * equi-join on that same key — two shuffles on surrogate-sized
    * rows, linear in corpus size.
    */
  def bigramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(normalizeText(col("text"))).as("tk"))
      .select(col("doc_id"),
        expr("filter(tk, t -> length(t) > 0)").as("tk"))
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)),
          |         slice(tk, 2, greatest(size(tk) - 1, 0)),
          |         (x, y) -> concat(x, ' ', y))""".stripMargin)).as("bg"))
    val cf = bg.groupBy(col("bg")).agg(count(lit(1)).as("cf"))
    bg.join(cf, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("cf")).as("sum_bigram_freq"),
        sum(when(col("cf") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        max(col("cf")).as("max_bigram_freq"))
      .withColumn("novelty",
        col("n_hapax").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** t24: corpus domain shift — exact total-variation distance between
    * the unigram term distributions of every pair of language slices.
    * The drift monitor of a training-data pipeline: TV(P,Q) ∈ [0,1]
    * quantifies how far two corpus slices diverge before mixing them
    * (0 = identical term mix, 1 = disjoint vocabularies).
    *
    * Exactness design: TV = ½·Σ|p−q| over terms is normally an
    * order-dependent float sum (engine-dependent → not oracle-able).
    * Rewriting each |n_a/T_a − n_b/T_b| as |n_a·T_b − n_b·T_a| /
    * (T_a·T_b) moves the summation into EXACT integer arithmetic —
    * Σ|n_a·T_b − n_b·T_a| is a decimal(38,0) sum, order-independent —
    * and the single final division is one deterministic IEEE op. The
    * same trick BM25 (t10) uses for its rational idf. Products are
    * carried as decimal(38,0) so counts up to ~1e18 tokens per slice
    * cannot overflow (BIGINT would cap at n·T ≤ 9e18).
    *
    * Scale shape: tokenize→explode is map-side; one groupBy(term)
    * builds the per-term per-slice counts with partial aggregation
    * (the conditional sums pivot the lang dimension INTO columns, so
    * there is no per-(term,lang) shuffle key — the row count after the
    * shuffle is |vocabulary|, not |vocabulary|·|langs|); the totals
    * row is a scalar broadcast; the 6 pair sums reduce in one final
    * single-row aggregate, unpivoted with stack(). Two shuffles total,
    * both on vocabulary-sized data.
    */
  def domainShift(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr")
    val perTerm = Tables.documents(spark, dir)
      .filter(col("lang").isin(langs: _*))
      .select(col("lang"), explode(tokens(normalizeText(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(sum(when(col("lang") === langs.head, 1L).otherwise(0L))
          .as(s"n_${langs.head}"),
        langs.tail.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"n_$l")): _*)
    val withTotals = perTerm.crossJoin(broadcast(
      perTerm.agg(
        sum(col(s"n_${langs.head}")).as(s"t_${langs.head}"),
        langs.tail.map(l => sum(col(s"n_$l")).as(s"t_$l")): _*)))
    val pairs = for {
      i <- langs.indices; j <- langs.indices if i < j
    } yield (langs(i), langs(j))
    val sums = withTotals.agg(
      sum(expr(s"abs(cast(n_${pairs.head._1} as decimal(19,0)) * t_${pairs.head._2}" +
        s" - cast(n_${pairs.head._2} as decimal(19,0)) * t_${pairs.head._1})"))
        .as(s"s_${pairs.head._1}_${pairs.head._2}"),
      (pairs.tail.map { case (a, b) =>
        sum(expr(s"abs(cast(n_$a as decimal(19,0)) * t_$b" +
          s" - cast(n_$b as decimal(19,0)) * t_$a)")).as(s"s_${a}_$b")
      } ++ pairs.map { case (a, b) =>
        sum(when(col(s"n_$a") > 0 || col(s"n_$b") > 0, 1L).otherwise(0L))
          .as(s"k_${a}_$b")
      } ++ langs.map(l => max(col(s"t_$l")).as(s"t_$l"))): _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'$a', '$b', cast(s_${a}_$b as double) /" +
        s" (2.0 * cast(t_$a as double) * cast(t_$b as double)), k_${a}_$b"
    }.mkString(", ")
    sums.select(expr(
        s"stack(${pairs.size}, $stackArgs) as (lang_a, lang_b, tv_distance, n_terms)"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  /** t25: CCNet-style unigram-LM quality score — the mean corpus
    * frequency of a document's tokens, low = rare-token-heavy (OCR
    * noise, boilerplate hashes, code dumps), the cheap proxy for the
    * KenLM perplexity filter of a web-scale curation pipeline.
    *
    * INTEGER-EXACT until two fixed-order divisions: per-doc
    * `cnt_sum` (sum of corpus unigram counts over the doc's tokens)
    * and `dl` are exact BIGINTs, and `score = (cnt_sum / dl) /
    * n_total` divides exact-integer-valued doubles left-to-right —
    * bit-identical IEEE results in any engine, which is what makes a
    * frequency-JOIN query hash-checkable where a log-prob sum (order-
    * dependent float reduction) never is.
    *
    * Scale shape: the frequency table is explode → partial-agg (the
    * shuffle carries distinct (partition, term) rows, not token
    * occurrences). The token→frequency join is keyed by TERM — the
    * most skewed key there is (Zipf: the top word alone is percents of
    * the stream) — so it is split skew-aware: the `headK` heaviest
    * terms (found by the t11 Misra-Gries sketch pass, a bounded
    * collect like t12's) are mapped via a broadcast literal map with
    * NO shuffle, and only the long tail — whose per-term multiplicity
    * is bounded by the head threshold — shuffle-joins. At 100 TB the
    * tail join is well-conditioned by construction and the head never
    * moves.
    */
  /** t26: readability scoring (Flesch reading ease) — the classic
    * curation-pipeline quality gate for prose: 206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/words), with the syllable count
    * proxied by vowel-group runs (`[aeiouy]+`) — the standard
    * dictionary-free approximation. Every count is an exact integer
    * and the three-term formula is fixed-order double arithmetic, so
    * the score hash-checks (the t14/t19 rational-metric pattern).
    *
    * The synthetic fixture has no sentence punctuation, so the query
    * PLANTS it closed-form (the d18/t22 hazard pattern): every ` s` →
    * `. s` — a real per-doc sentence-length distribution; the
    * normalizer strips the planted periods, so word and syllable
    * counts are untouched and only the sentence rule sees them.
    * Map-only expression chain, zero shuffles before the output sort.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("replace(text, ' s', '. s')").as("planted"))
      .select(col("doc_id"), col("planted"),
        normalizeText(col("planted")).as("nt"))
      .select(col("doc_id"),
        size(filter(tokens(col("nt")), t => length(t) > 0))
          .cast("long").as("n_words"),
        (size(regexp_extract_all(col("planted"), lit("[.!?]+"), lit(0))) + lit(1))
          .cast("long").as("n_sentences"),
        size(regexp_extract_all(col("nt"), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch",
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double")))
      .orderBy(col("doc_id"))

  def rareTokenScore(spark: SparkSession, dir: String, headK: Int = 32): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(normalizeText(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
    val freqs = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val totals = tok.agg(count(lit(1)).as("n_total"))

    // head split: ≤headK (term, cnt) pairs — bounded driver state, the
    // same two-pass shape as heavyHittersExact (sketch would bound the
    // first pass at scale; exact top-k over the already-aggregated
    // frequency table is one TakeOrdered here)
    val head: Array[(String, Long)] = freqs
      .orderBy(col("cnt").desc, col("term")).limit(headK)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val headCnt: Column =
      if (head.isEmpty) lit(null).cast("long")
      else element_at(
        map(head.flatMap { case (t, c) => Seq(lit(t), lit(c)) }: _*), col("term"))

    val withHead = tok.withColumn("head_cnt", headCnt)
    val headRows = withHead.filter(col("head_cnt").isNotNull)
      .select(col("doc_id"), col("head_cnt").as("cnt"))
    val tailRows = withHead.filter(col("head_cnt").isNull)
      .select(col("doc_id"), col("term"))
      .join(freqs, Seq("term"))
      .select(col("doc_id"), col("cnt"))

    headRows.unionByName(tailRows)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), sum(col("cnt")).as("cnt_sum"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("dl"), col("cnt_sum"),
        (col("cnt_sum").cast("double") / col("dl").cast("double") /
          col("n_total").cast("double")).as("score"))
      .orderBy(col("doc_id"))
  }

  /** t27: exact PHRASE search over positional postings — the IR
    * capability tf·idf/BM25 term matching (t09/t10) cannot express:
    * "these words ADJACENT, in this order". Postings = (doc, pos,
    * term) from one tokenize pass (q50's inverted index grown a
    * position column — at 100 TB the postings table is built once and
    * persisted); the phrase is an n-way self-join on doc with the
    * position chained `pos + i`, each leg pre-filtered to its term
    * BEFORE joining, so the join touches only the phrase terms'
    * postings (rare-term-first ordering bounds the intermediate at
    * scale). Output: per-doc occurrence counts — all-integer,
    * hash-checked.
    */
  def phraseSearch(spark: SparkSession, dir: String,
                   phrase: Seq[String] = Seq("hash", "join")): DataFrame = {
    require(phrase.nonEmpty)
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(tokens(normalizeText(col("text")))).as(Seq("pos", "tok")))
    val first = postings.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        val leg = postings.filter(col("tok") === w)
          .select(col("doc_id"), col("pos").as("npos"))
        acc.join(leg, Seq("doc_id"))
          .filter(col("npos") === col("pos") + i)
          .drop("npos")
    }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** t29: n-gram language-model quality scoring — the CCNet/KenLM
    * perplexity-filter stage (the one LLM-curation text signal the
    * rule-based t19 classifier and the rare-token t25 score do not
    * cover: "does this doc read like the reference corpus?"). The
    * corpus is split by `doc_id % 10` into a TRAIN side (0-7) whose
    * normalized-token bigram counts form the LM, and a SCORE side
    * (8-9) whose documents are scored
    *
    *   lm_score = Σ over doc bigrams present in the LM of
    *              (1 + floor(log2(count)))
    *
    * with out-of-vocabulary bigrams tallied separately. The per-bigram
    * contribution is monotone in log P(w2|w1)'s numerator, which is
    * what a perplexity FILTER needs (ranking, not calibrated nats) —
    * and `1 + floor(log2 c)` is `length(bin(c))`, a pure integer/string
    * expression with identical semantics in Spark and DuckDB, so the
    * whole gate hash-checks with no float anywhere (same fixed-point
    * discipline as the e06/e07 integer kernels).
    *
    * Scale shape: one tokenize pass; bigrams via `zip_with` over two
    * array slices (no posexplode self-join); the LM is a
    * map-side-combinable count over (t1,t2); scoring is ONE equi-join
    * bigrams⋈LM — at fixture scale AQE broadcasts the LM, at 100 TB it
    * degrades gracefully to a shuffle hash join keyed on the bigram.
    * Zero-bigram scored docs (<2 tokens) are re-attached by a left
    * join so the output is total over the score side.
    */
  def bigramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        filter(tokens(normalizeText(col("text"))), t => length(t) > 0).as("toks"))
    lmDocScores(docs, col("doc_id") % 10 < 8, col("doc_id") % 10 >= 8)
      .orderBy(col("doc_id"))
  }

  /** The t29 scoring kernel, reusable (p02 scores the FULL corpus with
    * `scorePred = true`): per-doc `(n_bigrams, oov_bigrams, lm_score)`
    * for the docs matching `scorePred`, against an LM of bigram counts
    * from the `trainPred` side. `docs` must carry `(doc_id, toks)`.
    * Output is TOTAL over the score side (zero-bigram docs included).
    */
  private[graft] def lmDocScores(docs: DataFrame, trainPred: Column,
                                 scorePred: Column): DataFrame =
    lmScoreAgainst(docs.filter(scorePred), lmCounts(docs.filter(trainPred)))

  /** Adjacent-pair bigrams `(doc_id, t1, t2)` from a `(doc_id, toks)`
    * frame; slice lengths floor at 0 so <2-token docs yield an empty
    * array instead of a negative-length slice error.
    */
  private[graft] def bigramPairs(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(expr(
      """zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
        |         slice(toks, 2, greatest(size(toks) - 1, 0)),
        |         (a, b) -> struct(a AS t1, b AS t2))""".stripMargin)).as("bg"))
    .select(col("doc_id"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))

  /** The LM itself: corpus bigram counts `(t1, t2, cnt)` — a trained
    * artifact (s21 builds it ONCE from the reference split and scores
    * the ingest stream against it).
    */
  private[graft] def lmCounts(train: DataFrame): DataFrame =
    bigramPairs(train).groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("cnt"))

  /** Scores a `(doc_id, toks)` frame against a prepared LM. A doc's
    * score depends only on its own bigrams and the LM, so the result
    * is complete within whatever slice (or micro-batch) carries the
    * doc — the property s21's stream-static apply rests on.
    */
  private[graft] def lmScoreAgainst(docs: DataFrame, lm: DataFrame): DataFrame = {
    val perDoc = bigramPairs(docs)
      .join(lm, Seq("t1", "t2"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("oov_bigrams"),
        sum(when(col("cnt").isNull, 0L)
          .otherwise(length(bin(col("cnt"))).cast("long"))).as("lm_score"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        coalesce(col("lm_score"), lit(0L)).as("lm_score"))
  }

  /** t30: BPE tokenizer TRAINING — the first `k` merge rules learned
    * from the corpus (Sennrich et al. 2016), the vocabulary-building
    * step every LLM data pipeline runs before token counting means
    * anything. Output = the merge table `(merge_rank, left_sym,
    * right_sym, pair_count)` — all integers and symbols, hash-checked.
    *
    * Distributed-BPE architecture (how production trainers scale):
    * the CORPUS is touched exactly once, reduced to the word-count
    * vocabulary table (the classic shuffle); every merge round then
    * runs on the VOCAB (≪ corpus — Heaps' law), so training cost is
    * rounds × vocab, not rounds × corpus. Per round: adjacent-pair
    * weighted counts (one map-side-combinable agg over vocab), argmax
    * by `(count DESC, pair ASC)` (a single-row collect — the bounded
    * e06-centroid pattern), and a map-side merge apply.
    *
    * Engine-portable by representation: a word's symbol sequence is
    * the string `␣s₁␣␣s₂␣…` (each symbol wrapped in single spaces, so
    * adjacent symbols meet as a DOUBLE space). Greedy left-to-right
    * BPE merging is then literally `replace(s, ' a  b ', ' ab ')` —
    * Spark's `UTF8String.replace` and DuckDB's `replace` share the
    * non-overlapping left-to-right contract (so `a a a` under merge
    * `(a,a)` gives `aa, a` in both), and the initial per-char wrap is
    * one `regexp_replace('(.)', ' $1 ')` (code-point `.` in both Java
    * and RE2). The oracle re-derives every round's argmax itself — k
    * unrolled CTE blocks, nothing pinned.
    */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    bpeTrain(spark, dir, k)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** The one corpus pass shared by the t30 and t33 trainers:
    * normalized word counts, each word as a space-delimited
    * char-symbol string; checkpoint pins the vocab so every merge
    * round re-scans a vocab-sized table, never the corpus.
    */
  private def bpeVocab0(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(filter(tokens(normalizeText(col("text"))),
        t => length(t) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", " $1 ").as("s"), col("cnt"))
      .localCheckpoint()

  /** The t30 training loop, returning the learned merge list (t31
    * inlines it into the encode chain).
    */
  private[graft] def bpeTrain(spark: SparkSession, dir: String,
                              k: Int): Seq[(Long, String, String, Long)] = {
    val vocab0 = bpeVocab0(spark, dir)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var vocab = vocab0
    for (r <- 1 to k) {
      val top = vocab
        .select(col("cnt"),
          filter(split(trim(col("s")), "  "), x => length(x) > 0).as("toks"))
        .transform(bigramPairsWeighted)
        .groupBy(col("t1"), col("t2")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("t1"), col("t2"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, rr, pc) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rr, pc))
        // merge apply: literal-safe column replace (symbols may carry
        // apostrophes etc. — never splice them into SQL text)
        vocab = vocab.select(
          replace(col("s"), lit(s" $l  $rr "), lit(s" $l$rr ")).as("s"),
          col("cnt"))
      }
    }
    merges.result()
  }

  /** t31: tokenize with the TRAINED tokenizer — t30's learned merges
    * applied to every document, yielding the per-doc token count a
    * token-budget mix (q57/q58) would actually meter at training time
    * (t03's regex count approximates granularity; this IS the trained
    * vocab's segmentation). Train→apply closure: the merge list is
    * collected once (8 rows) and INLINED into a map-only per-doc
    * expression chain — whole-document symbol string (every non-space
    * char wrapped, so inter-word gaps are 3 spaces and can never
    * match a 2-space merge pattern — merges stay word-internal with
    * no word loop), then the 8 merges in rank order as chained
    * `replace` columns, then one whitespace split-count. Zero joins,
    * zero shuffles except the presentation sort: the trained
    * artifact rides the closure exactly like e06's centroid literals.
    */
  /** t33: BATCHED BPE training — t30 scaled past toy vocabulary. t30's
    * loop costs one driver round-trip (argmax collect) and one vocab
    * rewrite PER MERGE: the right shape at k=8, but a real 32k-merge
    * tokenizer would mean 32k Spark jobs. The standard fix (every
    * production BPE trainer batches): per ROUND, rank the weighted
    * pair counts once, collect the top-`cand` candidates (one bounded
    * driver result), greedily select up to `m` pairwise
    * SYMBOL-DISJOINT pairs in rank order (disjoint ⇒ one pair's
    * application cannot touch another's occurrences, so the batch
    * applies as one map-side pass), and rewrite the vocab once.
    * Driver round-trips: `rounds` = k/m, an m× cut; per-round cost
    * stays vocab-bound (one pair agg + one ≤`cand`-row collect + one
    * rewrite) — per-merge cost is bounded by vocab, never corpus, at
    * any k.
    *
    * Batched vs sequential semantics: within a round, all selections
    * use the ROUND-START counts (a batch member never sees a
    * batch-mate's effect on the ranking) — the documented, standard
    * batched-BPE approximation; across rounds, counts are exact. The
    * output contract matches t30: `(merge_rank, left_sym, right_sym,
    * pair_count)` with ranks global in selection order and
    * `pair_count` the round-start count.
    *
    * Engine-portable exactly like t30: ranking is `(count DESC, pair
    * ASC)`, the greedy disjoint selection is deterministic given that
    * total order (the oracle unrolls it as `m` per-round selection
    * CTEs with NOT-EXISTS symbol-overlap filters), and the batch
    * apply is the same chained non-overlapping left-to-right
    * `replace` contract, in rank order. Suffix-empty rounds are
    * harmless: once no disjoint candidate remains the round closes,
    * and the next round re-ranks fresh counts.
    */
  def bpeMergesBatched(spark: SparkSession, dir: String,
                       rounds: Int = 8, m: Int = 8,
                       cand: Int = 64): DataFrame = {
    import spark.implicits._
    // any (rounds, m, cand) is oracle-checkable: SparkEntry's
    // parameterized t33 builder unrolls the matching rank/select/apply
    // SQL per shape (t33 registers (8,8,64), t36 proves (4,16,128))
    bpeTrainBatched(spark, dir, rounds, m, cand)
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  private[graft] def bpeTrainBatched(spark: SparkSession, dir: String,
      rounds: Int, m: Int, cand: Int): Seq[(Long, String, String, Long)] =
    bpeTrainBatchedFrom(bpeVocab0(spark, dir), rounds, m, cand)

  /** The batched training loop over an explicit weighted vocab
    * (s = space-delimited symbol string, cnt) — lets the scale probe
    * feed a richer synthetic vocabulary than the fixture corpus, whose
    * ~90-merge ceiling saturates any trainer long before a real vocab
    * segment.
    */
  private[graft] def bpeTrainBatchedFrom(vocab0: DataFrame,
      rounds: Int, m: Int, cand: Int): Seq[(Long, String, String, Long)] = {
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var vocab = vocab0
    var rank = 0L
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      // ONE bounded collect per round: the top-`cand` pairs in the
      // global (count DESC, pair ASC) order — `cand` rows, vocab-agg'd
      val top = vocab
        .select(col("cnt"),
          filter(split(trim(col("s")), "  "), x => length(x) > 0).as("toks"))
        .transform(bigramPairsWeighted)
        .groupBy(col("t1"), col("t2")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("t1"), col("t2"))
        .limit(cand).collect()
      // greedy disjoint selection in rank order — pure driver logic
      // over ≤`cand` rows, mirrored verbatim by the oracle's unrolled
      // selection CTEs
      val used = scala.collection.mutable.Set.empty[String]
      val sel = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var i = 0
      while (i < top.length && sel.size < m) {
        val (l, r, pc) =
          (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        if (!used(l) && !used(r)) {
          sel += ((l, r, pc)); used += l; used += r
        }
        i += 1
      }
      // yield counter: how much of the batch budget the disjointness
      // filter actually grants this round — the saturation signal that
      // decides whether growing m buys merges or just bigger collects.
      // Opt-in (GRAFT_BPE_VERBOSE): this path is inside every timed
      // bench rep and every test, so it must stay quiet by default.
      if (sys.env.contains("GRAFT_BPE_VERBOSE"))
        println(s"[bpe_batched] round=$round selected=${sel.size}/$m " +
          s"candidates=${top.length}/$cand")
      if (sel.isEmpty) exhausted = true
      else {
        sel.foreach { case (l, r, pc) =>
          rank += 1; merges += ((rank, l, r, pc))
        }
        // the whole batch as ONE map-side rewrite (chained literal
        // replaces in rank order); checkpoint keeps per-round cost
        // flat — lineage never accumulates across rounds
        val merged = sel.foldLeft(col("s")) { case (c, (l, r, _)) =>
          replace(c, lit(s" $l  $r "), lit(s" $l$r "))
        }
        vocab = vocab.select(merged.as("s"), col("cnt")).localCheckpoint()
      }
    }
    merges.result()
  }

  /** t34: encode with the BATCHED-trained vocabulary — t33's 64
    * merges applied corpus-wide, the apply half of the scale path
    * (t31 demonstrates the closure at the 8-merge toy vocab; this is
    * the same map-only chained-replace closure at the vocab size the
    * batched trainer exists for). Same contract as t31: the merge
    * list is collected once (64 rows, driver-bounded) and inlined in
    * rank order; per-doc `n_bpe_tokens` under the real 64-symbol
    * segmentation. Zero joins, zero shuffles except the presentation
    * sort — a 64-deep replace chain is still ONE codegen'd projection
    * over the scan.
    */
  def bpeEncodeBatched(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeTrainBatched(spark, dir, 8, 8, 64)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(bpeTokensCol(merges, col("text")))
          .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** t35: the tokenizer as a PERSISTED artifact — the e13
    * build/persist/load contract applied to BPE, which is how a
    * trained tokenizer actually ships: t33's batched trainer runs
    * once, the merge table is written as parquet (the artifact a
    * 100 TB deployment distributes to every encode job — 64 rows,
    * trivially broadcastable), and encoding runs from the LOADED
    * table, never the trainer. Hash-checked against the same derived
    * oracle as t34: if the persist/load round-trip corrupts rank
    * order, drops a merge, or mangles a symbol, the corpus-wide
    * segmentation — and the gate hash — moves. `TextAnalysisSpec`
    * additionally pins loaded ≡ fresh merge-table equality.
    *
    * The artifact dir defaults to a session-scoped scratch path (the
    * e13 pattern) so concurrent sessions — e.g. Verify and `sbt test`
    * in parallel — can't race on overwrite-while-read of one shared
    * machine-global path.
    */
  def bpeEncodePersisted(spark: SparkSession, dir: String,
                         indexDirOverride: Option[String] = None): DataFrame = {
    import spark.implicits._
    val indexDir = indexDirOverride.getOrElse(
      graft.util.Scratch.dir(spark, "bpe_index", dir).toString)
    val trained = bpeTrainBatched(spark, dir, 8, 8, 64)
    trained.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .coalesce(1) // 64 rows — one file, deterministic artifact layout
      .write.mode("overwrite").parquet(s"$indexDir/merges.parquet")
    val loaded = spark.read.parquet(s"$indexDir/merges.parquet")
      .orderBy(col("merge_rank"))
      .as[(Long, String, String, Long)].collect().toSeq
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(bpeTokensCol(loaded, col("text")))
          .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The trained-merge encode closure shared by t31/t32 (and the
    * spec's inverse property): wrap every non-space char of the
    * normalized text as a symbol, apply the merges in rank order as
    * chained literal replaces, split to the token array. Exposed so
    * the decode(encode(x)) == x property can be checked on the SAME
    * column expressions the gates run, not a re-implementation.
    */
  private[graft] def bpeTokensCol(
      merges: Seq[(Long, String, String, Long)], text: Column): Column = {
    val wrapped = regexp_replace(normalizeText(text), "(\\S)", " $1 ")
    val merged = merges.foldLeft(wrapped) { case (c, (_, l, r, _)) =>
      replace(c, lit(s" $l  $r "), lit(s" $l$r "))
    }
    filter(split(trim(merged), "\\s+"), x => length(x) > 0)
  }

  def bpeEncode(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val merges = bpeTrain(spark, dir, k)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(bpeTokensCol(merges, col("text")))
          .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** t32: trained-vocab USAGE audit — the corpus token-frequency table
    * under the t30-trained tokenizer: top `topN` tokens by
    * `(count DESC, token ASC)` with per-token character length and the
    * chars-per-occurrence the token amortizes (`cnt * n_chars`, the
    * quantity a vocab-coverage/compression report ranks by). This is
    * the audit every tokenizer-training pipeline runs after t30/t31:
    * which learned symbols actually carry the corpus, and how much of
    * the byte mass the merged (multi-char) vocabulary absorbs vs the
    * single-char fallback tail.
    *
    * Shape: the same map-only trained-merge closure as t31 (merges
    * inlined as literal `replace`s — zero joins), then one explode +
    * map-side-combinable count agg whose shuffle carries `(token,
    * partial_count)` — vocab-sized, never corpus-sized — and a
    * TakeOrderedAndProject top-N (bounded driver result, the q08
    * pattern). At 100 TB the reduce side is |vocab| rows regardless of
    * corpus bytes. The oracle re-derives the merges themselves (the
    * t30 CTE chain) — nothing pinned.
    */
  def bpeTokenFreqs(spark: SparkSession, dir: String,
                    k: Int = 8, topN: Int = 25): DataFrame = {
    val merges = bpeTrain(spark, dir, k)
    Tables.documents(spark, dir)
      .select(explode(bpeTokensCol(merges, col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
      .select(col("tok"), col("cnt"),
        length(col("tok")).cast("long").as("n_chars"),
        (col("cnt") * length(col("tok"))).cast("long").as("chars_covered"))
  }

  /** t37: the t32 vocab-usage audit at the PRODUCTION vocabulary —
    * token frequencies, per-token char length, and amortized byte
    * coverage under the batched 64-merge vocab (the denomination
    * p03/p05/s23/t34/t35 share), instead of t32's 8-merge toy. This is
    * the report a tokenizer owner actually reads after training the
    * deployable vocab: which learned symbols carry the corpus, and how
    * much byte mass the merged vocabulary absorbs vs the single-char
    * tail. Same scale shape as t32: one map-only encode projection,
    * one map-side-combined count, TakeOrderedAndProject at topN.
    */
  def bpeTokenFreqsBatched(spark: SparkSession, dir: String,
                           topN: Int = 25): DataFrame = {
    val merges = bpeTrainBatched(spark, dir, 8, 8, 64)
    Tables.documents(spark, dir)
      .select(explode(bpeTokensCol(merges, col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
      .select(col("tok"), col("cnt"),
        length(col("tok")).cast("long").as("n_chars"),
        (col("cnt") * length(col("tok"))).cast("long").as("chars_covered"))
  }

  /** Lazy single-round plan for `DumpPlans`: the t30 gate's OUTPUT is
    * a driver-local 8-row merge table (the per-round argmax collect IS
    * the plan, the d10/d24 precedent), so the dumped evidence is the
    * kernel that repeats — the corpus→vocab reduction feeding one
    * round's weighted pair aggregate (map-side combinable; shuffle
    * rows = distinct pairs, never corpus tokens).
    */
  private[graft] def bpeRoundPlan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(filter(tokens(normalizeText(col("text"))),
        t => length(t) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), "(.)", " $1 ").as("s"), col("cnt"))
      .select(col("cnt"),
        filter(split(trim(col("s")), "  "), x => length(x) > 0).as("toks"))
      .transform(bigramPairsWeighted)
      .groupBy(col("t1"), col("t2")).agg(sum(col("cnt")).as("pc"))
      .orderBy(col("pc").desc, col("t1"), col("t2"))
      .limit(1)

  /** [[bigramPairs]] with a weight column carried through: emits
    * `(cnt, t1, t2)` for every adjacent pair of `toks`.
    */
  private def bigramPairsWeighted(df: DataFrame): DataFrame = df
    .select(col("cnt"), explode(expr(
      """zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),
        |         slice(toks, 2, greatest(size(toks) - 1, 0)),
        |         (a, b) -> struct(a AS t1, b AS t2))""".stripMargin)).as("bg"))
    .select(col("cnt"), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
}
