package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/**
 * Roaring-style compressed bitmap over 64-bit ids — the engine behind
 * the ClickHouse `groupBitmap` / `bitmapCardinality` / `bitmapAnd` /
 * `bitmapOr` / `bitmapAndnot` family (reference host dialect; the
 * same layout RoaringBitmap popularized, re-derived from the
 * published container design, not ported).
 *
 * Ids are partitioned by their high 48 bits into containers of 2^16
 * slots. A container is a sorted u16 array while it holds ≤ 4096
 * values (≤ 8 KiB) and flips to a fixed 1024-word bitset above that —
 * so memory is O(min(distinct, range/8)) per container and never
 * degenerates: a dense container costs 8 KiB regardless of
 * cardinality, a sparse one costs 2 bytes/value. Negative ids work:
 * `v >>> 16` keys are non-negative, so signed container order equals
 * unsigned order and the serialized walk stays aligned across
 * engines.
 *
 * Scale shape: the aggregate is partial+final mergeable (container
 * union is associative/commutative), so 1000 executors each build
 * local bitmaps and one shuffle moves O(distinct/8)-byte buffers per
 * group — the classic distinct-count/audience-overlap layout at
 * 100 TB, with set ALGEBRA (AND/OR/ANDNOT between groups) that plain
 * `count(distinct)` cannot express without a re-shuffle per
 * combination.
 */
object BitmapLite {

  /** Array-container capacity before flipping to a bitset. */
  val ArrMax = 4096

  final class Container {
    var n: Int = 0
    var arr: Array[Char] = new Array[Char](8) // sorted unique u16s
    var bits: Array[Long] = null              // 1024 words when dense

    def add(low: Int): Unit = {
      if (bits != null) {
        val w = low >>> 6
        val m = 1L << (low & 63)
        if ((bits(w) & m) == 0) { bits(w) |= m; n += 1 }
      } else {
        val c = low.toChar
        var lo = 0; var hi = n
        while (lo < hi) { // lower_bound
          val mid = (lo + hi) >>> 1
          if (arr(mid) < c) lo = mid + 1 else hi = mid
        }
        if (lo < n && arr(lo) == c) return
        if (n == ArrMax) { toBits(); add(low); return }
        if (n == arr.length) {
          val na = new Array[Char](math.min(arr.length * 2, ArrMax))
          System.arraycopy(arr, 0, na, 0, n)
          arr = na
        }
        System.arraycopy(arr, lo, arr, lo + 1, n - lo)
        arr(lo) = c
        n += 1
      }
    }

    private def toBits(): Unit = {
      bits = new Array[Long](1024)
      var i = 0
      while (i < n) { val v = arr(i); bits(v >>> 6) |= 1L << (v & 63); i += 1 }
      arr = null
    }

    def mergeFrom(o: Container): Unit = {
      if (o.bits != null && bits == null) toBits()
      if (bits != null) {
        if (o.bits != null) {
          var i = 0; var cnt = 0
          while (i < 1024) {
            bits(i) |= o.bits(i)
            cnt += java.lang.Long.bitCount(bits(i))
            i += 1
          }
          n = cnt
        } else {
          var i = 0
          while (i < o.n) { add(o.arr(i)); i += 1 }
        }
      } else {
        var i = 0
        while (i < o.n) { add(o.arr(i)); i += 1 }
      }
    }

    def serializedSize: Int = 1 + 4 + (if (bits != null) 8192 else 2 * n)

    def writeTo(bb: ByteBuffer): Unit = {
      bb.put(if (bits != null) 1.toByte else 0.toByte)
      bb.putInt(n)
      if (bits != null) { var i = 0; while (i < 1024) { bb.putLong(bits(i)); i += 1 } }
      else { var i = 0; while (i < n) { bb.putChar(arr(i)); i += 1 } }
    }
  }

  final class Builder {
    val containers = new java.util.TreeMap[Long, Container]()

    def add(v: Long): Unit = {
      val key = v >>> 16
      var c = containers.get(key)
      if (c == null) { c = new Container; containers.put(key, c) }
      c.add((v & 0xFFFFL).toInt)
    }

    def mergeFrom(o: Builder): Unit = {
      val it = o.containers.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val mine = containers.get(e.getKey)
        if (mine == null) containers.put(e.getKey, e.getValue)
        else mine.mergeFrom(e.getValue)
      }
    }

    def cardinality: Long = {
      var s = 0L
      val it = containers.values().iterator()
      while (it.hasNext) s += it.next().n
      s
    }

    def serialize(): Array[Byte] = {
      var size = 4
      val it0 = containers.values().iterator()
      while (it0.hasNext) size += 8 + it0.next().serializedSize
      val bb = ByteBuffer.allocate(size)
      bb.putInt(containers.size())
      val it = containers.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey)
        e.getValue.writeTo(bb)
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Builder = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Builder
    val nc = bb.getInt
    var i = 0
    while (i < nc) {
      val key = bb.getLong
      val c = new Container
      val kind = bb.get()
      val n = bb.getInt
      if (kind == 1) {
        c.bits = new Array[Long](1024)
        var w = 0
        while (w < 1024) { c.bits(w) = bb.getLong; w += 1 }
        c.arr = null
      } else {
        c.arr = new Array[Char](math.max(n, 1))
        var j = 0
        while (j < n) { c.arr(j) = bb.getChar; j += 1 }
      }
      c.n = n
      b.containers.put(key, c)
      i += 1
    }
    b
  }

  def cardinality(bytes: Array[Byte]): Long = {
    // header-only walk: container counts without decoding payloads
    val bb = ByteBuffer.wrap(bytes)
    val nc = bb.getInt
    var s = 0L; var i = 0
    while (i < nc) {
      bb.getLong // key
      val kind = bb.get()
      val n = bb.getInt
      s += n
      bb.position(bb.position() + (if (kind == 1) 8192 else 2 * n))
      i += 1
    }
    s
  }

  private def containerAnd(a: Container, b: Container): Long = {
    if (a.bits != null && b.bits != null) {
      var i = 0; var s = 0L
      while (i < 1024) { s += java.lang.Long.bitCount(a.bits(i) & b.bits(i)); i += 1 }
      s
    } else if (a.bits == null && b.bits == null) {
      var i = 0; var j = 0; var s = 0L
      while (i < a.n && j < b.n) {
        if (a.arr(i) < b.arr(j)) i += 1
        else if (a.arr(i) > b.arr(j)) j += 1
        else { s += 1; i += 1; j += 1 }
      }
      s
    } else {
      val (sparse, dense) = if (a.bits == null) (a, b) else (b, a)
      var i = 0; var s = 0L
      while (i < sparse.n) {
        val v = sparse.arr(i)
        if ((dense.bits(v >>> 6) & (1L << (v & 63))) != 0) s += 1
        i += 1
      }
      s
    }
  }

  def andCardinality(ab: Array[Byte], bb2: Array[Byte]): Long = {
    val a = deserialize(ab); val b = deserialize(bb2)
    var s = 0L
    val it = a.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = b.containers.get(e.getKey)
      if (other != null) s += containerAnd(e.getValue, other)
    }
    s
  }

  def orCardinality(a: Array[Byte], b: Array[Byte]): Long =
    cardinality(a) + cardinality(b) - andCardinality(a, b)

  def andNotCardinality(a: Array[Byte], b: Array[Byte]): Long =
    cardinality(a) - andCardinality(a, b)
}

/**
 * `bitmap_agg(id)` — builds a [[BitmapLite]] bitmap of all ids in the
 * group; mergeable partial+final so it distributes with one
 * O(distinct/8)-byte buffer shuffle per group. SQL-registered by
 * [[graft.GraftExtensions]].
 */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapLite.Builder] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg requires an integral id argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BitmapLite.Builder = new BitmapLite.Builder

  override def update(buffer: BitmapLite.Builder, input: InternalRow): BitmapLite.Builder = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.asInstanceOf[Number].longValue()
      })
    }
    buffer
  }

  override def merge(a: BitmapLite.Builder, b: BitmapLite.Builder): BitmapLite.Builder = {
    a.mergeFrom(b); a
  }

  override def eval(buffer: BitmapLite.Builder): Any = buffer.serialize()

  override def serialize(buffer: BitmapLite.Builder): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BitmapLite.Builder =
    BitmapLite.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}

/**
 * `bitmap_union_agg(bm)` — unions pre-built serialized bitmaps: the
 * -Merge half of ClickHouse's groupBitmapState/groupBitmapMerge pair.
 * A rollup table stores per-shard bitmap states; serving merges the
 * states without ever rescanning the fact table. Mergeable
 * partial+final like [[BitmapAgg]].
 */
case class BitmapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapLite.Builder] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_union_agg requires a bitmap (binary) argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BitmapLite.Builder = new BitmapLite.Builder

  override def update(buffer: BitmapLite.Builder, input: InternalRow): BitmapLite.Builder = {
    val v = child.eval(input)
    if (v != null) buffer.mergeFrom(BitmapLite.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(a: BitmapLite.Builder, b: BitmapLite.Builder): BitmapLite.Builder = {
    a.mergeFrom(b); a
  }

  override def eval(buffer: BitmapLite.Builder): Any = buffer.serialize()
  override def serialize(buffer: BitmapLite.Builder): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BitmapLite.Builder =
    BitmapLite.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAgg =
    copy(child = newChild)
}

/** `bitmap_cardinality(bm)` — distinct count from a serialized bitmap
  * (header-only walk, payloads skipped). */
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "bitmap_cardinality"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_cardinality requires a bitmap (binary) argument, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    BitmapLite.cardinality(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

sealed abstract class BitmapBinaryCard extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bitmap (binary) arguments")
}

/** `bitmap_and_cardinality(a, b)` — |A ∩ B|. */
case class BitmapAndCard(left: Expression, right: Expression) extends BitmapBinaryCard {
  override def prettyName: String = "bitmap_and_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapLite.andCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndCard =
    copy(left = l, right = r)
}

/** `bitmap_or_cardinality(a, b)` — |A ∪ B|. */
case class BitmapOrCard(left: Expression, right: Expression) extends BitmapBinaryCard {
  override def prettyName: String = "bitmap_or_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapLite.orCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOrCard =
    copy(left = l, right = r)
}

/** `bitmap_andnot_cardinality(a, b)` — |A \ B|. */
case class BitmapAndNotCard(left: Expression, right: Expression) extends BitmapBinaryCard {
  override def prettyName: String = "bitmap_andnot_cardinality"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapLite.andNotCardinality(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndNotCard =
    copy(left = l, right = r)
}
