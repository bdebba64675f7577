package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Mergeable MinHash sketch aggregator: input is a shingle hash (Long),
 * the buffer is the k-wide elementwise-minimum signature. Because
 * elementwise min is associative and commutative, Spark executes this
 * as partial (map-side) + final aggregation — the sketch distributes
 * across 1000 executors with one shuffle of k-long buffers per group,
 * never the raw shingles. This is the grouped/streaming-safe
 * formulation of [[TextHash.minhashSignature]]; the per-row form (one
 * doc per row) needs no shuffle at all and is preferred when a
 * document is a single cell.
 *
 * Usable via `functions.udaf(new MinHashAggregator(k))` and registered
 * as `minhash_agg` by [[graft.operators.Dedup.registerUdfs]].
 */
final class MinHashAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val p = TextHash.permute(shingleHash, i)
      if (p < buf(i)) buf(i) = p
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
}

private object ExpressionEncoderHelper {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
