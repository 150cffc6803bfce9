package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.GraftColumnBridge

/** SQL-surface registration of the engine's custom Catalyst expressions:
  * after `GraftFunctions.registerAll(spark)`, plain SQL text can call
  * `dot_f32`, `cosine_f32`, `dot_i64`, `dot_i8`, `simhash64`,
  * `minhash_sig`, `minhash_word_sig`, `sorted_jaccard` and the rest of
  * the builder table below — the full extension surface is reachable
  * from `spark.sql(...)`, not only the Column API.
  *
  * The same builder list backs [[graft.GraftExtensions]], the
  * `spark.sql.extensions`-loadable entry point — a user needs no code
  * at all to get the functions, only the config.
  */
object GraftFunctions {
  type Builder =
    Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression

  /** Every custom SQL function, name → expression builder. */
  val builders: Seq[(String, Builder)] = Seq(
    "dot_f32" -> (es => VectorFns.DotProductF32(es(0), es(1))),
    "cosine_f32" -> (es => VectorFns.CosineSimF32(es(0), es(1))),
    "dot_i64" -> (es => VectorFns.DotProductI64(es(0), es(1))),
    "dot_i8" -> (es => VectorFns.DotProductI8(es(0), es(1))),
    "simhash64" -> (es => HashFns.SimHash64(es.head)),
    "sorted_jaccard" -> (es => HashFns.SortedJaccard(es(0), es(1))),
    "minhash_sig" -> {
      case Seq(c, n, k) => HashFns.MinHashShingleSig(c, lit(n), lit(k))
      case es => throw new IllegalArgumentException(
        s"minhash_sig(text, shingleLen, numHashes), got ${es.size} args")
    },
    "minhash_word_sig" -> {
      case Seq(c, n, k) => HashFns.MinHashWordSig(c, lit(n), lit(k))
      case es => throw new IllegalArgumentException(
        s"minhash_word_sig(tokens, n, numHashes), got ${es.size} args")
    },
    // — round-2 fused kernels —
    "normalize_text" -> {
      case Seq(c) => TextFns.NormalizeRest(
        org.apache.spark.sql.catalyst.expressions.Lower(c))
      case es => throw new IllegalArgumentException(
        s"normalize_text(text), got ${es.size} args")
    },
    "sorted_shingles" -> {
      case Seq(c, n) => HashFns.SortedCharShingles(c, lit(n))
      case es => throw new IllegalArgumentException(
        s"sorted_shingles(text, n), got ${es.size} args")
    },
    "winnow_fps" -> {
      case Seq(c, k, w) => HashFns.Winnow(c, lit(k), lit(w))
      case es => throw new IllegalArgumentException(
        s"winnow_fps(text, k, w), got ${es.size} args")
    },
    "hashing_tf" -> {
      case Seq(c, d) => HashFns.HashingTfVec(c, lit(d))
      case es => throw new IllegalArgumentException(
        s"hashing_tf(tokens, dim), got ${es.size} args")
    },
    // the d03 fast-verify kernels (hashed shingle sets + packed sigs)
    "sorted_shingle_hashes" -> {
      case Seq(c, n) => HashFns.SortedShingleHashSet(c, lit(n))
      case es => throw new IllegalArgumentException(
        s"sorted_shingle_hashes(text, n), got ${es.size} args")
    },
    "sorted_jaccard_long" -> (es => HashFns.SortedJaccardLong(es(0), es(1))),
    "nfc_normalize" -> (es => TextFns.NfcNormalize(es.head)),
    "sig_bytes" -> (es => HashFns.PackSigBytes(es.head)),
    "sig_match_frac_bytes" -> (es => HashFns.SigMatchFracBytes(es(0), es(1))),
  )

  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }

  private def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }
}
