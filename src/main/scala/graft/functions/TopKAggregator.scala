package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory per-group top-k as a typed Aggregator (the UDAF surface).
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(v))
  * <= k`) must sort every partition in full; this aggregator keeps exactly k
  * (value, id) pairs per group through the partial/merge phases, so per-group
  * state is O(k) no matter how many rows a hot key has, and the partial
  * aggregation happens map-side before the shuffle — at 100 TB the exchange
  * carries k rows per key per mapper instead of every row. Order is total
  * (value desc, id asc) so results are deterministic under any partitioning.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def keep(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    keep(b :+ a)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    keep(b1 ++ b2)
  override def finish(b: Seq[(Double, Long)]): Seq[Long] = b.map(_._2)
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  /** Register as SQL/`functions` UDAF `top_k_ids(value, id)` with fixed k. */
  def register(spark: org.apache.spark.sql.SparkSession, name: String, k: Int): Unit = {
    implicit val inEnc: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(new TopKAggregator(k)))
  }
}
