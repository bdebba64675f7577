package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Approximate heavy hitters — the ClickHouse `topK(k)(col)` equivalent
 * (reachable through the reference's SQL passthrough,
 * src/clickhouse_scan.rs:78), as a mergeable Misra–Gries summary.
 *
 * Misra–Gries keeps at most `capacity` counters (capacity = 8k here,
 * like CH's k * load_factor): a present key increments; a new key
 * inserts while there's room; otherwise EVERY counter decrements —
 * charging one occurrence of each tracked key against the new one.
 * That buys the classic guarantee: any value with true frequency
 * > N/capacity is in the summary, and each estimate undercounts by at
 * most N/capacity. Summaries merge by pointwise sum then re-pruning to
 * capacity (Agarwal et al., "Mergeable Summaries", PODS'12), which is
 * exactly the partial/final split Spark's ObjectHashAggregate gives a
 * [[TypedImperativeAggregate]] — each partition summarizes locally and
 * only capacity-sized maps cross the shuffle. At 100 TB that replaces
 * a full groupBy+count+sort of every distinct value with a bounded
 * sketch per partition.
 *
 * Returns the top `k` entries as `array<struct<value, count_est>>`,
 * count-descending (ties broken by value for a deterministic layout).
 * Registered as SQL `topk_agg(col, k)` by [[graft.GraftExtensions]].
 *
 * `weight` generalizes to CH `topKWeighted(k)(col, w)` (SQL
 * `topk_weighted_agg(col, w, k)`): a row counts as `w` occurrences.
 * The weighted Misra–Gries step charges `min(w, min counter)` against
 * every tracked key before inserting the remainder, which preserves
 * the ±totalWeight/capacity estimate bound; with w ≡ 1 it reduces to
 * the classic decrement.
 */
case class TopKAgg(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = weight

  private def capacity: Int = 8 * k

  override def prettyName: String = "topk_agg"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", child.dataType, nullable = true),
      StructField("count_est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0 || k > 65536)
      TypeCheckResult.TypeCheckFailure(s"topk_agg k=$k outside (0, 65536]")
    else if (weight.dataType != LongType && weight.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg weight must be int/bigint, got ${weight.dataType.simpleString}")
    else child.dataType match {
      case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_agg supports string/bigint/int values, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](capacity * 2)

  override def update(buffer: java.util.HashMap[Any, Long], input: InternalRow)
      : java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    val wRaw = weight.eval(input)
    val w = wRaw match {
      case null => 0L
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    if (v != null && w > 0) {
      // keys must own their bytes: eval may return a re-used UTF8String
      val key = v match {
        case s: UTF8String => s.clone()
        case other => other
      }
      val cur = buffer.get(key)
      if (cur != 0L || buffer.containsKey(key)) buffer.put(key, cur + w)
      else if (buffer.size < capacity) buffer.put(key, w)
      else {
        // weighted Misra–Gries: charge d = min(w, min counter) against
        // every tracked key; any remainder of w inserts as a new entry
        var minV = Long.MaxValue
        val vit = buffer.values().iterator()
        while (vit.hasNext) { val c = vit.next(); if (c < minV) minV = c }
        val d = math.min(w, minV)
        subtractAll(buffer, d)
        if (w > d) buffer.put(key, w - d)
      }
    }
    buffer
  }

  /** Subtract `d` from every counter, dropping the non-positive. */
  private def subtractAll(buffer: java.util.HashMap[Any, Long], d: Long): Unit = {
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def merge(a: java.util.HashMap[Any, Long], b: java.util.HashMap[Any, Long])
      : java.util.HashMap[Any, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.put(e.getKey, a.get(e.getKey) + e.getValue) // missing key unboxes to 0
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop the non-positive — the mergeable-summaries prune
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buffer: java.util.HashMap[Any, Long]): Any = {
    val entries = new Array[(Any, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val ord: Ordering[(Any, Long)] = new Ordering[(Any, Long)] {
      override def compare(x: (Any, Long), y: (Any, Long)): Int = {
        val byCount = java.lang.Long.compare(y._2, x._2)
        if (byCount != 0) byCount
        else (x._1, y._1) match { // deterministic tie-break
          case (a: UTF8String, b: UTF8String) => a.compareTo(b)
          case (a: java.lang.Number, b: java.lang.Number) =>
            java.lang.Long.compare(a.longValue(), b.longValue())
          case _ => 0
        }
      }
    }
    val top = entries.sorted(ord).take(k).map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c)): Any
    }
    new GenericArrayData(top)
  }

  override def serialize(buffer: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getKey match {
        case s: UTF8String =>
          val bytes = s.getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case l: java.lang.Long => out.writeLong(l)
        case n: java.lang.Integer => out.writeInt(n)
      }
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val map = new java.util.HashMap[Any, Long](capacity * 2)
    var i = 0
    while (i < n) {
      val key: Any = child.dataType match {
        case StringType =>
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        case LongType => java.lang.Long.valueOf(in.readLong())
        case IntegerType => java.lang.Integer.valueOf(in.readInt())
        case other => throw new IllegalStateException(s"topk_agg: unexpected type $other")
      }
      map.put(key, in.readLong())
      i += 1
    }
    map
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(child = newLeft, weight = newRight)
}
