package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Bloom-filter runtime join filter — the 100 TB join optimization
  * Spark applies automatically under
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, exposed here as
  * an explicit, testable operator pair:
  *
  *  - BUILD ([[BloomAgg]]): a typed Aggregator over the (filtered)
  *    build-side keys. Each partition sets bits into its own bitset,
  *    the shuffle carries one `m/64`-long array per partition, merges
  *    OR them — the classic mergeable-summary shape. The finished
  *    filter is a few KB regardless of build cardinality.
  *  - PROBE ([[mightContain]]): a pure COLUMN EXPRESSION over built-in
  *    functions (two murmur3 hashes, double hashing g_i = h1 + i·h2),
  *    so the probe stays inside WholeStageCodegen on the fact side and
  *    drops non-matching rows MAP-SIDE, before the join shuffle.
  *
  * No false negatives (every inserted key probes true), so
  * prefilter + exact join ≡ plain join — false positives only cost
  * shuffle bytes, never correctness. That identity is what the q55
  * oracle checks; the FPR bound is asserted in `BloomSpec`.
  */
object Bloom {

  /** Bits per filter (power of two: cheap masking) and hash count.
    * m = 2^16 bits = 8 KiB; k = 5 → FPR ≈ 0.6% at ~6.5k keys,
    * ≈ 3% at 16k keys (n/m = 0.25).
    */
  val MBits: Int = 1 << 16
  val KHashes: Int = 5

  private val words = MBits / 64

  /** Second-hash salt (an Int literal — wraps negative, deliberately
    * identical on both sides).
    */
  private val Salt: Int = 0x9747b28c

  /** h1/h2 for double hashing, as Spark built-ins: murmur3 of the key
    * alone and murmur3 of (key, salt). Matches the Scala-side build
    * because both sides evaluate the same Murmur3Hash function —
    * asserted bit-for-bit in BloomSpec.
    */
  private def h1(key: Column): Column = hash(key).cast("long")
  private def h2(key: Column): Column = hash(key, lit(Salt)).cast("long")

  /** The i-th bit position: (h1 + i·h2) masked to [0, MBits). */
  private def pos(key: Column, i: Int): Column =
    (h1(key) + lit(i.toLong) * h2(key)).bitwiseAND(lit((MBits - 1).toLong))

  /** Probe expression over a DRIVER-BUILT bitset literal (the filter is
    * a few KB — it rides into the plan like a broadcast variable, and
    * `element_at` on an array literal is codegen'd).
    */
  def mightContain(key: Column, bits: Array[Long]): Column = {
    require(bits.length == words, s"expected $words words, got ${bits.length}")
    import org.apache.spark.sql.classic.GraftColumnBridge.{column, expression}
    // variable-distance shift: the public `shiftleft` only accepts a
    // literal Int distance, but the Catalyst expression takes any
    // expression — bridge it (same shim the custom kernels use)
    def shiftL(base: Column, dist: Column): Column = column(
      org.apache.spark.sql.catalyst.expressions.ShiftLeft(
        expression(base), expression(dist)))
    val arr = lit(bits)
    (0 until KHashes).map { i =>
      val p = pos(key, i)
      val word = element_at(arr, (shiftright(p, 6) + 1).cast("int"))
      val mask = shiftL(lit(1L), p.bitwiseAND(63L).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Scala-side bit positions for one key — MUST match [[pos]]. Spark's
    * `hash(c1, c2)` folds Murmur3 over the children (the untruncated
    * long accumulator seeds the next child; the expression output is
    * the final value truncated to int). We call Catalyst's own
    * `Murmur3HashFunction` with that exact fold — no re-implementation
    * to drift. Equality with the Column path is asserted in BloomSpec.
    */
  private[functions] def positions(key: Long): Seq[Int] = {
    import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val acc = Murmur3HashFunction.hash(key, LongType, 42L)
    val m1 = acc.toInt.toLong
    val m2 = Murmur3HashFunction.hash(Salt, IntegerType, acc).toInt.toLong
    (0 until KHashes).map(i => ((m1 + i * m2) & (MBits - 1)).toInt)
  }

  final case class BloomBuf(bits: Array[Long])

  /** Distributed build: one bitset per partition, OR-merged. */
  class BloomAgg extends Aggregator[Long, BloomBuf, Array[Long]] {
    override def zero: BloomBuf = BloomBuf(new Array[Long](words))

    override def reduce(b: BloomBuf, key: Long): BloomBuf = {
      positions(key).foreach { p => b.bits(p >> 6) |= (1L << (p & 63)) }
      b
    }

    override def merge(b1: BloomBuf, b2: BloomBuf): BloomBuf = {
      var i = 0
      while (i < words) { b1.bits(i) |= b2.bits(i); i += 1 }
      b1
    }

    override def finish(r: BloomBuf): Array[Long] = r.bits

    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def bloomAgg = new BloomAgg
}
