package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/**
 * Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
 * ClickHouse's `largestTriangleThreeBuckets(n)(x, y)` aggregate: keep
 * the first and last point, split the interior into n−2 equal-index
 * buckets, and from each bucket keep the point forming the largest
 * triangle with the previously kept point and the NEXT bucket's
 * centroid — the standard visually-faithful time-series reduction.
 *
 * Exact, engine-independent regime: x/y are integers (epoch seconds /
 * cents), bucket assignment is integer division, triangle areas are
 * compared via the centroid-denominator-cleared integer form
 *   |(x_a·m − Σx_next)(y_p − y_a) − (x_a − x_p)(Σy_next − y_a·m)|
 * with ties broken by point index — so a DuckDB recursive-CTE
 * reimplementation selects identical points. The third child is a
 * unique per-row tiebreak (event id) making the (x, y, tb) sort order
 * total. Long-overflow bound: the area terms stay < 2^63 while
 * m·|Δx|·|Δy| ≲ 9e18 — epoch-second x spans with cents y are safe to
 * ~10^7-point buckets; beyond that the comparison needs 128-bit.
 *
 * Distribution contract: partial buffers concatenate (merge is
 * append), so the aggregate distributes per series with one
 * O(series-length) buffer shuffle per group; the sort + LTTB pass
 * runs once in the final eval — the same per-group sequential-state
 * discipline as the funnel/sequence aggregates, with memory bounded
 * by the series length, not the table.
 */
case class LttbAgg(
    first: Expression,  // x
    second: Expression, // y
    third: Expression,  // tiebreak
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Array[Long]]]
  with TernaryLike[Expression] {

  override def prettyName: String = "lttb_agg"

  override def dataType: DataType = StructType(Seq(
    StructField("xs", ArrayType(LongType, containsNull = false)),
    StructField("ys", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType || second.dataType != LongType ||
      third.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        "lttb_agg requires (x: bigint, y: bigint, tiebreak: bigint)")
    else if (n < 3)
      TypeCheckResult.TypeCheckFailure(s"lttb_agg n=$n must be >= 3")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArrayBuffer[Array[Long]] =
    new ArrayBuffer[Array[Long]]

  override def update(
      buf: ArrayBuffer[Array[Long]], input: InternalRow): ArrayBuffer[Array[Long]] = {
    val xv = first.eval(input)
    val yv = second.eval(input)
    val tv = third.eval(input)
    if (xv != null && yv != null && tv != null)
      buf += Array(xv.asInstanceOf[Long], yv.asInstanceOf[Long], tv.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: ArrayBuffer[Array[Long]], b: ArrayBuffer[Array[Long]]): ArrayBuffer[Array[Long]] = {
    a ++= b; a
  }

  override def eval(buf: ArrayBuffer[Array[Long]]): Any = {
    val pts = buf.toArray
    java.util.Arrays.sort(pts, (p: Array[Long], q: Array[Long]) => {
      if (p(0) != q(0)) java.lang.Long.compare(p(0), q(0))
      else if (p(1) != q(1)) java.lang.Long.compare(p(1), q(1))
      else java.lang.Long.compare(p(2), q(2))
    })
    val cnt = pts.length
    val kept: Array[Array[Long]] =
      if (cnt <= n) pts
      else {
        val nb = n - 2
        // bucket of interior index i (1..cnt-2): 1 + ((i-1)*nb)/(cnt-2)
        def bucketOf(i: Int): Int =
          if (i == 0) 0
          else if (i == cnt - 1) nb + 1
          else 1 + (((i - 1).toLong * nb) / (cnt - 2)).toInt
        // bucket boundaries: first index of each bucket (buckets are
        // contiguous index ranges by construction)
        val starts = new Array[Int](nb + 3)
        starts(0) = 0
        var bCur = 0
        var i = 0
        while (i < cnt) {
          val b = bucketOf(i)
          while (bCur < b) { bCur += 1; starts(bCur) = i }
          i += 1
        }
        starts(nb + 2) = cnt
        val out = new Array[Array[Long]](n)
        out(0) = pts(0)
        var prev = pts(0)
        var b = 1
        while (b <= nb) {
          // centroid of bucket b+1 (bucket nb+1 = the last point)
          val ns = starts(b + 1); val ne = starts(b + 2)
          val m = (ne - ns).toLong
          var sx = 0L; var sy = 0L
          var j = ns
          while (j < ne) { sx += pts(j)(0); sy += pts(j)(1); j += 1 }
          var bestArea = -1L
          var best: Array[Long] = null
          j = starts(b)
          while (j < starts(b + 1)) {
            val p = pts(j)
            val area = math.abs(
              (prev(0) * m - sx) * (p(1) - prev(1)) -
                (prev(0) - p(0)) * (sy - prev(1) * m))
            if (area > bestArea) { bestArea = area; best = p }
            j += 1
          }
          out(b) = best
          prev = best
          b += 1
        }
        out(n - 1) = pts(cnt - 1)
        out
      }
    InternalRow(
      new GenericArrayData(kept.map(_(0))),
      new GenericArrayData(kept.map(_(1))))
  }

  override def serialize(buf: ArrayBuffer[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { p => bb.putLong(p(0)); bb.putLong(p(1)); bb.putLong(p(2)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getInt
    val buf = new ArrayBuffer[Array[Long]](cnt)
    var i = 0
    while (i < cnt) {
      buf += Array(bb.getLong, bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LttbAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LttbAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LttbAgg =
    copy(first = f, second = s, third = t)
}
