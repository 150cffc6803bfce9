package graft.jobs

import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data curation pipeline over a document corpus — the
  * LLM-data-pipeline composition of the engine's text + dedup operators
  * (SURVEY §2.11; the reference's NLP-prep ambition, `README.md:10`):
  *
  *  1. per-doc quality metrics (token count, mean token length,
  *     stopword ratio) — pure per-row expressions;
  *  2. quality gate on configurable thresholds;
  *  3. exact dedup by normalized-text fingerprint (group-by-hash);
  *  4. near-dup removal via MinHash+LSH pairs resolved to full
  *     transitive clusters (connected components,
  *     [[graft.operators.Dedup.dupClusters]]); each cluster keeps its
  *     min-id root;
  *  5. emits the curated corpus + a per-stage attrition report (every
  *     dropped doc is accounted for — the dead-letter discipline, S7).
  */
object CurationJob {

  case class Thresholds(minTokens: Int = 5, maxTokens: Int = 100000,
                        minMeanTokenLen: Double = 2.0,
                        maxStopwordRatio: Double = 0.9,
                        nearDupJaccard: Double = 0.6)

  case class Report(input: Long, afterQuality: Long, afterExact: Long,
                    afterNearDup: Long)

  private def stages(docs: DataFrame, idCol: String, textCol: String,
                     t: Thresholds, exactKernel: Boolean = false)
      : (DataFrame, DataFrame, DataFrame) = {
    // normalize ONCE and carry the result ("__norm") through the whole
    // pipeline — quality metrics, the dedup fingerprint and the LSH
    // signature pass all read it, so the 5-regex chain runs one time per
    // document instead of once per stage.
    val toks = TextFns.tokens(col("__norm"))
    val scored = docs
      .select(col(idCol), col(textCol),
        TextFns.normalizeText(col(textCol)).as("__norm"))
      .select(col(idCol), col(textCol), col("__norm"),
        size(toks).as("n_tokens"),
        TextFns.meanTokenLen(toks).as("mean_token_len"),
        TextFns.stopwordRatio(toks, graft.operators.TextAnalysis.enStopwords)
          .as("stopword_ratio"))

    val quality = scored.filter(
      col("n_tokens").between(t.minTokens, t.maxTokens) &&
      col("mean_token_len") >= t.minMeanTokenLen &&
      col("stopword_ratio") <= t.maxStopwordRatio)

    // exact dedup: keep min id per normalized-text fingerprint — one
    // window over one shuffle on the 8-byte fingerprint (a groupBy +
    // join-back would evaluate the quality scan twice and shuffle twice).
    // `exact` feeds two consumers (LSH pass, final anti-join) → persist.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("__norm"))).orderBy(col(idCol))
    val exact = quality
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist()

    // near-dup: resolve full transitive clusters (connected components
    // over the verified pairs), keep each cluster's min-id root.
    // __norm rides in, so the LSH pass skips its own normalize chain.
    // The LSH path (default) approximates EXACTLY the semantics the
    // exact kernel computes — same 5-char shingles over __norm, same
    // ≥-threshold Jaccard pair predicate — so the exact variant is the
    // oracle anchor for the whole pipeline, not a different pipeline.
    val pairs =
      if (exactKernel) {
        // all-pairs exact Jaccard — only sane over a bounded slice
        // (callers gate the input); localCheckpoint stops Catalyst
        // pushing the shingle projection past the join and
        // re-evaluating it once per PAIR
        val sh = exact.select(col(idCol),
            graft.functions.HashFns.sortedShingleSet(col("__norm"), 5).as("__sh"))
          .localCheckpoint(true)
        sh.select(col(idCol).as("doc_a"), col("__sh").as("sh_a"))
          .crossJoin(sh.select(col(idCol).as("doc_b"), col("__sh").as("sh_b")))
          .filter(col("doc_a") < col("doc_b"))
          .withColumn("jaccard",
            graft.functions.HashFns.jaccardSorted(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= t.nearDupJaccard)
          .select(col("doc_a"), col("doc_b"), col("jaccard"))
      } else Dedup.minHashLshPairsPortable(exact, idCol, "__norm",
        threshold = t.nearDupJaccard, preNormalized = true)
    val dupIds = Dedup.dupClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))   // non-roots drop
      .select(col("doc_id").as(idCol))
    val curated = exact.join(dupIds, Seq(idCol), "left_anti")
      .select(col(idCol), col(textCol)).orderBy(col(idCol))
    (quality, exact, curated)
  }

  def run(docs: DataFrame, idCol: String, textCol: String,
          t: Thresholds = Thresholds()): (DataFrame, Report) = {
    val (quality, exact, curatedLazy) = stages(docs, idCol, textCol, t)
    // materialize the (small) curated output, then release the cached
    // intermediate — callers get a lineage-free frame and no cache leak
    val curated = curatedLazy.localCheckpoint(true)
    val report = Report(docs.count(), quality.count(), exact.count(), curated.count())
    exact.unpersist()
    (curated, report)
  }

  /** Lazy final-stage plan for inspection (`DumpPlans`): the curated
    * frame WITHOUT the eager checkpoint — keeps the quality scan,
    * fingerprint window dedup and the final anti-join visible in the
    * dumped plan. Leaves the stage cache for the caller's session to
    * clear.
    */
  private[graft] def curatePlan(spark: SparkSession, dir: String): DataFrame =
    stages(graft.Tables.documents(spark, dir), "doc_id", "text", Thresholds())._3

  /** Lazy plan of the exact-kernel (d07) variant, for `DumpPlans`. */
  private[graft] def curateExactPlan(spark: SparkSession, dir: String): DataFrame =
    stages(graft.Tables.documents(spark, dir).filter(col("doc_id") < 250L),
      "doc_id", "text", Thresholds(), exactKernel = true)._3

  /** Report-free path: one terminal action computes the curated corpus
    * (the LSH collect inside cluster resolution is the only extra job).
    * Eagerly materialized so the stage caches can be released here.
    */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val (_, exact, curatedLazy) =
      stages(graft.Tables.documents(spark, dir), "doc_id", "text", Thresholds())
    val curated = curatedLazy.localCheckpoint(true)
    exact.unpersist()
    curated
  }

  /** The flagship pipeline with the near-dup stage on the EXACT
    * Jaccard kernel over a bounded id slice (the d08 anchor pattern):
    * every stage — quality gate, exact dedup, all-pairs ≥0.6 Jaccard,
    * transitive cluster resolution, min-id keep — is ANSI-SQL
    * expressible, so the whole composition gets a DuckDB hash-matched
    * CORRECTNESS row (d07). [[curate]] is the identical pipeline with
    * MinHash+LSH candidates instead of all-pairs — the 100 TB path,
    * registered rows-only as d11.
    */
  def curateExact(spark: SparkSession, dir: String, maxId: Long = 250L): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") < maxId)
    val (_, exact, curatedLazy) =
      stages(docs, "doc_id", "text", Thresholds(), exactKernel = true)
    val curated = curatedLazy.localCheckpoint(true)
    exact.unpersist()
    curated
  }
}
