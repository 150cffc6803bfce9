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
}
