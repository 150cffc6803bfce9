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
    * one fused [[BloomContains]] expression per row (both murmur3s
    * computed once, bitset held once as a codegen reference object).
    * The composed [[mightContain]] formulation re-derives both hashes
    * per probe — 10 murmur3s per row instead of 2 — and repeats the
    * 8 KiB bitset literal per conjunct in the plan (FilterExec does
    * not CSE across split conjuncts, and CollapseProject inlines any
    * pre-projected hash columns right back into the filter).
    */
  def prefilter(df: org.apache.spark.sql.DataFrame, keyCol: String,
                bits: Array[Long]): org.apache.spark.sql.DataFrame =
    df.filter(containsCol(col(keyCol), bits))

  /** The fused probe as a Column. */
  def containsCol(key: Column, bits: Array[Long]): Column = {
    require(bits.length == words, s"expected $words words, got ${bits.length}")
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(BloomContains(
      GraftColumnBridge.expression(key.cast("long")), bits.toSeq))
  }

  /** Row-level probe kernel shared by interpreted eval and codegen —
    * both hashes computed exactly once.
    */
  def contains(key: Long, bits: Array[Long]): Boolean = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val m1 = Murmur3_x86_32.hashLong(key, 42)
    val m2 = Murmur3_x86_32.hashInt(Salt, m1)
    var i = 0
    while (i < KHashes) {
      val p = ((m1.toLong + i.toLong * m2.toLong) & (MBits - 1)).toInt
      if ((bits(p >> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe expression over a DRIVER-BUILT bitset literal (the filter is
    * a few KB — it rides into the plan like a broadcast variable, and
    * `element_at` on an array literal is codegen'd). Unit/spec form:
    * prefer [[prefilter]] on hot paths (hashes once per row).
    * NULL keys are rejected outright (`isNotNull` guard) so the
    * composed and fused forms agree: a NULL key can never match an
    * equi-join anyway, and Spark's `hash(NULL)` would otherwise map
    * every null to one arbitrary bucket.
    */
  def mightContain(key: Column, bits: Array[Long]): Column = {
    require(bits.length == words, s"expected $words words, got ${bits.length}")
    val arr = lit(bits)
    (Seq(key.isNotNull) ++
      (0 until KHashes).map(i => testBit(arr, pos(key, i)))).reduce(_ && _)
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
    * accumulator is the INT hash result (`Murmur3HashFunction.hash`
    * truncates its seed argument to Int internally), so the fold is
    * exactly `hashInt(Salt, hashLong(key, 42))` — the same direct
    * `Murmur3_x86_32` calls Catalyst compiles to. Anyone swapping the
    * hash family must preserve the Int-accumulator semantics or the
    * Column path diverges (BloomSpec's parity test catches it).
    */
  private[functions] def positions(key: Long): Seq[Int] = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val m1 = Murmur3_x86_32.hashLong(key, 42)
    val m2 = Murmur3_x86_32.hashInt(Salt, m1)
    (0 until KHashes).map(i => ((m1.toLong + i.toLong * m2.toLong) & (MBits - 1)).toInt)
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

  /** Fused probe expression: both murmur3s once per row, the bitset
    * evaluated through one codegen reference object instead of one
    * array-literal copy PER CONJUNCT like the composed form (tree
    * equality/canonicalization still compares the words — semantic
    * equality requires it — and the rendered plan text is truncated to
    * a digest via [[toString]]). `nullIntolerant` ⇒ NULL key → NULL →
    * filter drops the row, agreeing with [[mightContain]]'s isNotNull
    * guard. Same codegen pattern as the other custom kernels
    * (`VectorFns.CentroidCosines`).
    */
  case class BloomContains(child: org.apache.spark.sql.catalyst.expressions.Expression,
                           bits: Seq[Long])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == org.apache.spark.sql.types.LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_contains needs a BIGINT key (the build side hashes longs), got ${child.dataType}")
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bloom_contains"
    @transient private lazy val bitsArr: Array[Long] = bits.toArray
    override def nullSafeEval(input: Any): Any =
      contains(input.asInstanceOf[Long], bitsArr)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
      defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.contains($c, $ref)")
    }
    override def toString: String =
      s"bloom_contains($child, <$MBits-bit filter, ${bits.count(_ != 0L)} words set>)"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
