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
    * alone and murmur3 of (key, salt). The key is pinned to LongType
    * before hashing — the build side always hashes longs, and murmur3
    * of the same value at a different width (hashInt vs hashLong)
    * yields different bits, which would be silent false negatives.
    * Cross-side parity is asserted bit-for-bit in BloomSpec.
    */
  private def h1(key: Column): Column = hash(key.cast("long")).cast("long")
  private def h2(key: Column): Column = hash(key.cast("long"), lit(Salt)).cast("long")

  /** The i-th bit position: (h1 + i·h2) masked to [0, MBits). */
  private def pos(key: Column, i: Int): Column =
    (h1(key) + lit(i.toLong) * h2(key)).bitwiseAND(lit((MBits - 1).toLong))

  /** Hash-once fact-side prefilter — the form the hot path should use:
    * h1/h2 are projected ONCE per row and the 5 bit probes consume the
    * projected values (FilterExec codegen does not CSE across the
    * conjuncts of [[mightContain]], which re-derives both hashes per
    * probe — 10 murmur3s per row instead of 2).
    */
  def prefilter(df: org.apache.spark.sql.DataFrame, keyCol: String,
                bits: Array[Long]): org.apache.spark.sql.DataFrame = {
    require(bits.length == words, s"expected $words words, got ${bits.length}")
    val arr = lit(bits)
    df.withColumn("__bloom_h1", h1(col(keyCol)))
      .withColumn("__bloom_h2", h2(col(keyCol)))
      .filter((0 until KHashes).map { i =>
        val p = (col("__bloom_h1") + lit(i.toLong) * col("__bloom_h2"))
          .bitwiseAND(lit((MBits - 1).toLong))
        testBit(arr, p)
      }.reduce(_ && _))
      .drop("__bloom_h1", "__bloom_h2")
  }

  /** Probe expression over a DRIVER-BUILT bitset literal (the filter is
    * a few KB — it rides into the plan like a broadcast variable, and
    * `element_at` on an array literal is codegen'd). Unit/spec form:
    * prefer [[prefilter]] on hot paths (hashes once per row).
    */
  def mightContain(key: Column, bits: Array[Long]): Column = {
    require(bits.length == words, s"expected $words words, got ${bits.length}")
    val arr = lit(bits)
    (0 until KHashes).map(i => testBit(arr, pos(key, i))).reduce(_ && _)
  }

  /** Is bit `p` set in the literal bitset? `element_at` on the array
    * literal + a bridged variable-distance ShiftLeft (the public
    * `shiftleft` only accepts a literal Int distance; the Catalyst
    * expression takes any expression — same shim the custom kernels
    * use).
    */
  private def testBit(arr: Column, p: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column, expression}
    val word = element_at(arr, (shiftright(p, 6) + 1).cast("int"))
    val mask = column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      expression(lit(1L)), expression(p.bitwiseAND(63L).cast("int"))))
    word.bitwiseAND(mask) =!= 0L
  }

  /** Scala-side bit positions for one key — MUST match [[pos]]. Spark's
    * `hash(c1, c2)` folds Murmur3 over the children; the inter-child
    * accumulator is effectively the SIGN-EXTENDED INT result
    * (`Murmur3HashFunction.hash` truncates its seed argument to Int
    * internally), and the expression output is the final value as Int.
    * We call Catalyst's own `Murmur3HashFunction` with the same fold —
    * no re-implementation to drift; anyone swapping the hash family
    * must preserve the Int-accumulator semantics or the Column path
    * diverges (BloomSpec's parity test catches it).
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
