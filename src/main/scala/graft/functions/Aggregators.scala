package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregates (SURVEY §2.10 — the engine's
  * `Aggregator[IN,BUF,OUT]` extension surface).
  *
  * [[TopKAgg]] keeps the k largest (value, tag) pairs per group in a
  * bounded buffer — a per-group top-k that aggregates map-side (each
  * partition reduces to ≤k pairs before the shuffle), unlike the
  * window-function formulation which shuffles every row to its group.
  * At 100 TB this is the difference between shuffling k·|groups| rows
  * and shuffling |input| rows.
  */
object Aggregators {

  /** Buffer = sorted-descending vector of at most k (value, tag) pairs. */
  final case class TopKBuf(items: Seq[(Double, Long)])

  class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[Long]] {
    override def zero: TopKBuf = TopKBuf(Seq.empty)

    private def trim(items: Seq[(Double, Long)]): Seq[(Double, Long)] =
      items.sortBy { case (v, tag) => (-v, tag) }.take(k)

    override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
      TopKBuf(trim(b.items :+ a))

    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
      TopKBuf(trim(b1.items ++ b2.items))

    override def finish(r: TopKBuf): Seq[Long] = r.items.map(_._2)

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def topK(k: Int) = new TopKAgg(k)

  /** Misra-Gries frequent-items sketch over a stream of terms: at most
    * `k` counters per buffer. The distributed shape maps exactly onto
    * Spark's partial aggregation: each partition reduces its rows into
    * ≤k counters, the shuffle carries ≤k counters per partition (not
    * |input| rows), and merges preserve the MG invariant.
    *
    * Guarantees (classic MG bounds, n = total items observed):
    *  - estimate(t) ∈ [true(t) − n/(k+1), true(t)] — never overcounts;
    *  - every term with true frequency > n/(k+1) survives in the sketch.
    * Both are asserted in `AggregatorsSpec` against exact counts.
    *
    * The ES-capability analog is the `terms` agg's `shard_size`-bounded
    * approximate top-terms (per-shard truncation ≙ per-partition
    * counter bound).
    */
  final case class MGBuf(counts: Map[String, Long])

  class FrequentItemsAgg(k: Int)
      extends Aggregator[String, MGBuf, Seq[(String, Long)]] {
    override def zero: MGBuf = MGBuf(Map.empty)

    /** Decrement-all by `d`, dropping non-positive counters (the MG
      * "cancel one of each" step, batched).
      */
    private def decrement(counts: Map[String, Long], d: Long): Map[String, Long] =
      counts.collect { case (t, c) if c > d => t -> (c - d) }

    override def reduce(b: MGBuf, term: String): MGBuf = {
      val c = b.counts
      if (c.contains(term)) MGBuf(c.updated(term, c(term) + 1L))
      else if (c.size < k) MGBuf(c.updated(term, 1L))
      else MGBuf(decrement(c, 1L))
    }

    override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      val combined = b2.counts.foldLeft(b1.counts) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) MGBuf(combined)
      else {
        // subtract the (k+1)-th largest count so ≤k counters stay positive
        val d = combined.values.toSeq.sorted(Ordering.Long.reverse).apply(k)
        MGBuf(decrement(combined, d))
      }
    }

    override def finish(r: MGBuf): Seq[(String, Long)] =
      r.counts.toSeq.sortBy { case (t, c) => (-c, t) }

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def frequentItems(k: Int) = new FrequentItemsAgg(k)
}
