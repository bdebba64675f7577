package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/**
 * Sequence-funnel analysis — the ClickHouse `windowFunnel(window)(ts,
 * cond1, …, condN)` behavioral aggregate (reachable through the
 * reference's SQL passthrough, src/clickhouse_scan.rs:78), with CH's
 * base-mode semantics: the result is the deepest step K such that
 * events matching steps 0..K-1 occur in timestamp order with every
 * step inside `window` of ITS CHAIN'S step-0 event. A later step-0
 * event restarts the chain clock (CH overwrites the level-0 timestamp
 * unconditionally), and step i only extends a chain whose previous
 * level exists — matching AggregateFunctionWindowFunnel's loop.
 *
 * Input shape is pre-flattened for Spark: `funnel_agg(ts, level,
 * window, steps)` where `level` is the 0-based step index this row
 * matches (filter rows to level >= 0 first; a row can only match one
 * level, the CH multi-condition case maps to the first matching cond).
 *
 * Distribution: the buffer is the group's matching events; partials
 * concatenate and the ORDER-SENSITIVE pass happens once at eval after
 * an explicit sort, so the result is independent of partitioning and
 * merge order — safe under partial aggregation pushdown. State is
 * O(matching events per group), the same bound CH accepts.
 */
case class FunnelAgg(
    ts: Expression,
    level: Expression,
    windowSpan: Long,
    steps: Int,
    strictIncrease: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with BinaryLike[Expression] {

  override def left: Expression = ts
  override def right: Expression = level
  override def prettyName: String = "funnel_agg"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (ts.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"funnel_agg timestamp must be bigint (epoch units), got ${ts.dataType.simpleString}")
    else if (level.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"funnel_agg level must be int, got ${level.dataType.simpleString}")
    else if (steps < 1 || steps > 32)
      TypeCheckResult.TypeCheckFailure(s"funnel_agg steps=$steps outside [1, 32]")
    else if (windowSpan <= 0)
      TypeCheckResult.TypeCheckFailure(s"funnel_agg window=$windowSpan must be > 0")
    else TypeCheckResult.TypeCheckSuccess

  // buffer: packed (ts, level) pairs — level folded into the low 6 bits
  // would risk ts overflow, so store pairs as two slots
  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty[Long]

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val t = ts.eval(input)
    val l = level.eval(input)
    if (t != null && l != null) {
      val lv = l.asInstanceOf[Int]
      if (lv >= 0 && lv < steps) {
        buffer += t.asInstanceOf[Long]
        buffer += lv.toLong
      }
    }
    buffer
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    a ++= b
    a
  }

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    if (n == 0) return 0
    // sort event indices by (ts, level) — deterministic under any
    // partitioning of the input
    val idx = Array.range(0, n)
    val sorted = idx.sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    if (strictIncrease) return evalStrictIncrease(buffer, sorted)
    val chainStart = Array.fill(steps)(Long.MinValue)
    var best = 0
    var k = 0
    while (k < n && best < steps) {
      val t = buffer(2 * sorted(k))
      val lv = buffer(2 * sorted(k) + 1).toInt
      if (lv == 0) {
        chainStart(0) = t // latest step-0 restarts the chain clock (CH)
        if (best < 1) best = 1
      } else if (chainStart(lv - 1) != Long.MinValue && t <= chainStart(lv - 1) + windowSpan) {
        chainStart(lv) = chainStart(lv - 1) // the chain's step-0 time propagates
        if (best < lv + 1) best = lv + 1
      }
      k += 1
    }
    best
  }

  /**
   * strict_increase mode: the result is the deepest L such that a
   * chain e_0 < e_1 < … < e_{L-1} exists with STRICTLY increasing
   * timestamps, lvl(e_i) = i, and every step within `windowSpan` of
   * its chain's e_0 — the declarative semantics of CH's
   * 'strict_increase' option. A single latest-start slot per level is
   * NOT enough here (the latest chain may share the current event's
   * timestamp and fail strictness while an earlier one qualifies), so
   * each level keeps its reached-chains as (lastTs ascending,
   * prefix-max start): the best predecessor for an event at time t is
   * the max start among chains with lastTs < t — binary search on the
   * ascending lastTs list. Exchange argument for optimality: chains
   * at a level are fully described by (lastTs, start), the current
   * event fixes lastTs = t for any extension, and a larger start only
   * loosens every future deadline — so extending the max-start
   * eligible chain dominates all alternatives.
   */
  private def evalStrictIncrease(buffer: ArrayBuffer[Long], sorted: Array[Int]): Int = {
    val lastTs = Array.fill(steps)(new ArrayBuffer[Long]())
    val maxStart = Array.fill(steps)(new ArrayBuffer[Long]())
    def append(lv: Int, t: Long, start: Long): Unit = {
      val prev = if (maxStart(lv).isEmpty) Long.MinValue else maxStart(lv).last
      lastTs(lv) += t
      maxStart(lv) += math.max(prev, start)
    }
    // rightmost entry with lastTs < t (lastTs is ascending by
    // construction: events are processed in ts order)
    def bestStartBefore(lv: Int, t: Long): Long = {
      val arr = lastTs(lv)
      var lo = 0
      var hi = arr.length // first index with lastTs >= t
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < t) lo = mid + 1 else hi = mid
      }
      if (lo == 0) Long.MinValue else maxStart(lv)(lo - 1)
    }
    var best = 0
    var k = 0
    val n = sorted.length
    while (k < n && best < steps) {
      val t = buffer(2 * sorted(k))
      val lv = buffer(2 * sorted(k) + 1).toInt
      if (lv == 0) {
        append(0, t, t)
        if (best < 1) best = 1
      } else if (lastTs(lv - 1).nonEmpty) {
        val start = bestStartBefore(lv - 1, t)
        if (start != Long.MinValue && t <= start + windowSpan) {
          append(lv, t, start)
          if (best < lv + 1) best = lv + 1
        }
      }
      k += 1
    }
    best
  }

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { out += bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FunnelAgg =
    copy(ts = newLeft, level = newRight)
}
