package graft.similarity

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs.
  *
  * The window-rank formulation of top-k-per-query shuffles every scored
  * candidate row (|Q|·|corpus| rows at the exchange). This Aggregator gets
  * Catalyst's partial aggregation instead: each map task reduces its
  * partition to ≤ k candidates per query before the shuffle — the exchange
  * carries |Q|·k·partitions rows, independent of corpus size. That is the
  * difference between "works at sf0.1" and "works at 100 TB".
  *
  * Ordering: score desc, then id asc (stable across runs/engines); ties at
  * the k boundary resolve to the smaller id.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Keep the buffer sorted best-first and clipped to k (k is small). */
  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val (front, back) = buf.span(better(_, x))
    (front ::: x :: back).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    // once the buffer is full, most candidates lose to the current k-th
    // best; rejecting them against the tail allocates nothing, which is
    // what keeps the per-row cost flat over |Q|·|corpus| scored pairs
    if (b.sizeIs >= k && !better(a, b.last)) b else insert(b, a)
  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(reduce)
  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
