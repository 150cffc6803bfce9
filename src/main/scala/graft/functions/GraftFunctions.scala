package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.GraftColumnBridge

/** SQL-surface registration of the engine's custom Catalyst expressions:
  * after `GraftFunctions.registerAll(spark)`, plain SQL text can call
  * `dot_f32`, `cosine_f32`, `simhash64`, `minhash_sig`, `minhash_word_sig`
  * and `sorted_jaccard` — the full extension surface is reachable from
  * `spark.sql(...)`, not only the Column API.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    GraftColumnBridge.registerFunction(spark, "dot_f32",
      es => VectorFns.DotProductF32(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "cosine_f32",
      es => VectorFns.CosineSimF32(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "simhash64",
      es => HashFns.SimHash64(es.head))
    GraftColumnBridge.registerFunction(spark, "sorted_jaccard",
      es => HashFns.SortedJaccard(es(0), es(1)))
    GraftColumnBridge.registerFunction(spark, "minhash_sig", {
      case Seq(c, n, k) =>
        HashFns.MinHashShingleSig(c, lit(n), lit(k))
      case es => throw new IllegalArgumentException(
        s"minhash_sig(text, shingleLen, numHashes), got ${es.size} args")
    })
    GraftColumnBridge.registerFunction(spark, "minhash_word_sig", {
      case Seq(c, n, k) =>
        HashFns.MinHashWordSig(c, lit(n), lit(k))
      case es => throw new IllegalArgumentException(
        s"minhash_word_sig(tokens, n, numHashes), got ${es.size} args")
    })
    // — round-2 fused kernels —
    GraftColumnBridge.registerFunction(spark, "normalize_text", {
      case Seq(c) => TextFns.NormalizeRest(
        org.apache.spark.sql.catalyst.expressions.Lower(c))
      case es => throw new IllegalArgumentException(
        s"normalize_text(text), got ${es.size} args")
    })
    GraftColumnBridge.registerFunction(spark, "sorted_shingles", {
      case Seq(c, n) => HashFns.SortedCharShingles(c, lit(n))
      case es => throw new IllegalArgumentException(
        s"sorted_shingles(text, n), got ${es.size} args")
    })
    GraftColumnBridge.registerFunction(spark, "winnow_fps", {
      case Seq(c, k, w) => HashFns.Winnow(c, lit(k), lit(w))
      case es => throw new IllegalArgumentException(
        s"winnow_fps(text, k, w), got ${es.size} args")
    })
    GraftColumnBridge.registerFunction(spark, "hashing_tf", {
      case Seq(c, d) => HashFns.HashingTfVec(c, lit(d))
      case es => throw new IllegalArgumentException(
        s"hashing_tf(tokens, dim), got ${es.size} args")
    })
  }

  private def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }
}
