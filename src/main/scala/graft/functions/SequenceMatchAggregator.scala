package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/**
 * ClickHouse `sequenceMatch('pattern')(ts, cond1, …)` (reachable through
 * the reference's SQL passthrough, src/clickhouse_scan.rs:78): does the
 * group's event sequence, ordered by time, CONTAIN a subsequence
 * matching the pattern?
 *
 * Supported pattern subset — the structural core of CH's language:
 *   `(?N)`     an event where condition N holds (N in 1..32)
 *   `.`        exactly one event of any kind
 *   `.*`       any number of events (including none)
 *   `(?t op n)` time constraint between the two events matched by the
 *              ADJACENT consuming tokens (op ∈ {<, <=, >, >=, ==, !=};
 *              n in the ts column's epoch units). Must sit directly
 *              between two consuming tokens — a constraint across `.*`
 *              is rejected at plan time rather than silently
 *              mis-matched (it has no bounded-state evaluation).
 *
 * Input is pre-flattened for Spark (same convention as funnel_agg):
 * `sequence_match_agg(ts, mask, 'pattern')` where `mask` is the bitmask
 * of conditions this event satisfies (bit N-1 for condition N; a CH
 * event can satisfy several conditions at once). Rows matching no
 * condition still participate as `.`/`.*` fodder — include them with
 * mask 0.
 *
 * Distribution: the buffer is the group's (ts, mask) events; partials
 * concatenate and the order-sensitive matching runs once at eval after
 * an explicit (ts, mask) sort — result independent of partitioning and
 * merge order. Matching itself is a position-set NFA sweep, O(tokens ×
 * events), no backtracking blowup.
 */
case class SequenceMatchAgg(
    ts: Expression,
    mask: Expression,
    pattern: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with BinaryLike[Expression] {

  import SequenceMatchAgg._

  override def left: Expression = ts
  override def right: Expression = mask
  override def prettyName: String = "sequence_match_agg"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  // parsed once per plan; IllegalArgumentException here surfaces at
  // planning with the offending pattern in the message
  @transient private lazy val tokens: Array[Token] = parse(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ts.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sequence_match_agg timestamp must be bigint (epoch units), got ${ts.dataType.simpleString}")
    else if (mask.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"sequence_match_agg mask must be int, got ${mask.dataType.simpleString}")
    else
      try { parse(pattern); TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage) }

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty[Long]

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val t = ts.eval(input)
    val m = mask.eval(input)
    if (t != null && m != null) {
      buffer += t.asInstanceOf[Long]
      buffer += m.asInstanceOf[Int].toLong
    }
    buffer
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    a ++= b
    a
  }

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    val idx = Array.range(0, n)
      .sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    val masks = idx.map(i => buffer(2 * i + 1).toInt)
    val tss = idx.map(i => buffer(2 * i))
    matches(masks, tokens, tss)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceMatchAgg =
    copy(ts = newLeft, mask = newRight)
}

/**
 * CH `sequenceCount('pattern')(ts, cond1, …)`: number of NON-OVERLAPPING
 * chains matching the pattern, greedy earliest-end in time order. Same
 * input convention, buffer, and merge-order independence as
 * [[SequenceMatchAgg]].
 */
case class SequenceCountAgg(
    ts: Expression,
    mask: Expression,
    pattern: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with BinaryLike[Expression] {

  import SequenceMatchAgg._

  override def left: Expression = ts
  override def right: Expression = mask
  override def prettyName: String = "sequence_count_agg"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  @transient private lazy val tokens: Array[Token] = parse(pattern)

  override def checkInputDataTypes(): TypeCheckResult =
    if (ts.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sequence_count_agg timestamp must be bigint (epoch units), got ${ts.dataType.simpleString}")
    else if (mask.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"sequence_count_agg mask must be int, got ${mask.dataType.simpleString}")
    else
      try { parse(pattern); TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage) }

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty[Long]

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val t = ts.eval(input)
    val m = mask.eval(input)
    if (t != null && m != null) {
      buffer += t.asInstanceOf[Long]
      buffer += m.asInstanceOf[Int].toLong
    }
    buffer
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    a ++= b; a
  }

  override def eval(buffer: ArrayBuffer[Long]): Any = {
    val n = buffer.length / 2
    val idx = Array.range(0, n).sortBy(i => (buffer(2 * i), buffer(2 * i + 1)))
    countMatches(idx.map(i => buffer(2 * i + 1).toInt), tokens,
      idx.map(i => buffer(2 * i)))
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

  override def withNewMutableAggBufferOffset(newOffset: Int): SequenceCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SequenceCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceCountAgg =
    copy(ts = newLeft, mask = newRight)
}

object SequenceMatchAgg {
  sealed trait Token
  case class Cond(bit: Int) extends Token // event with condition bit set
  case object AnyOne extends Token        // '.'  — exactly one event
  case object AnyGap extends Token        // '.*' — zero or more events
  /** CH `(?t op N)`: a time constraint between the two events matched
    * by the ADJACENT consuming tokens — `ts(next) − ts(prev)` must
    * satisfy `op N` (units = the ts column's epoch units). Parse
    * REQUIRES a consuming token ((?N) or `.`) directly on each side:
    * under this repo's adjacency semantics those are consecutive
    * events of the group, so the constraint is always a predicate on
    * one inter-event delta — which is what keeps the streaming state
    * bounded (one `lastTs` long; see EventStreams).
    *
    * Operator set: ClickHouse's sequenceMatch accepts `<, <=, >, >=,
    * ==`; this parser ADDITIONALLY accepts `!=` — a graft EXTENSION,
    * not CH-portable. A pattern using `(?t!=n)` will not run on the
    * reference CH surface; everything else in the accepted grammar
    * is the CH subset. */
  case class TimeEdge(cmp: String, v: Long) extends Token

  /** Parse the CH pattern subset; fail with the position on anything else. */
  def parse(p: String): Array[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    while (i < p.length) {
      if (p.startsWith("(?", i)) {
        val close = p.indexOf(')', i)
        if (close < 0) throw new IllegalArgumentException(
          s"sequence_match_agg: unclosed '(?' at position $i in '$p'")
        val body = p.substring(i + 2, close)
        if (body.startsWith("t")) {
          val rest = body.substring(1)
          val (cmp, numStr) =
            if (rest.startsWith("<=")) ("<=", rest.substring(2))
            else if (rest.startsWith(">=")) (">=", rest.substring(2))
            else if (rest.startsWith("==")) ("==", rest.substring(2))
            else if (rest.startsWith("!=")) ("!=", rest.substring(2))
            else if (rest.startsWith("<")) ("<", rest.substring(1))
            else if (rest.startsWith(">")) (">", rest.substring(1))
            else throw new IllegalArgumentException(
              s"sequence_match_agg: expected (?t<op><n> with op in {<, <=, >, >=, ==, !=}, got '(?$body)' in '$p'")
          val v = numStr.toLongOption.getOrElse(throw new IllegalArgumentException(
            s"sequence_match_agg: expected integer time value, got '(?$body)' in '$p'"))
          if (v < 0) throw new IllegalArgumentException(
            s"sequence_match_agg: negative time value in '(?$body)' ('$p')")
          out += TimeEdge(cmp, v)
        } else {
          val n = body.toIntOption.getOrElse(throw new IllegalArgumentException(
            s"sequence_match_agg: expected (?N) with integer N, got '(?$body)' in '$p'"))
          if (n < 1 || n > 32) throw new IllegalArgumentException(
            s"sequence_match_agg: condition number $n outside [1, 32] in '$p'")
          out += Cond(n - 1)
        }
        i = close + 1
      } else if (p.startsWith(".*", i)) { out += AnyGap; i += 2 }
      else if (p.charAt(i) == '.') { out += AnyOne; i += 1 }
      else throw new IllegalArgumentException(
        s"sequence_match_agg: unexpected character '${p.charAt(i)}' at position $i in '$p'")
    }
    if (!out.exists(_.isInstanceOf[Cond])) throw new IllegalArgumentException(
      s"sequence_match_agg: pattern '$p' has no (?N) condition")
    val toks = out.toArray
    def consuming(t: Token): Boolean = t match {
      case Cond(_) | AnyOne => true
      case _ => false
    }
    toks.indices.foreach { i =>
      if (toks(i).isInstanceOf[TimeEdge]) {
        val ok = i > 0 && i < toks.length - 1 &&
          consuming(toks(i - 1)) && consuming(toks(i + 1))
        if (!ok) throw new IllegalArgumentException(
          s"sequence_match_agg: '(?t…)' must sit directly between two " +
            s"consuming tokens ((?N) or '.') in '$p' — a constraint across " +
            "'.*' has no bounded-state evaluation")
      }
    }
    toks
  }

  /** Tokens with each [[TimeEdge]] folded onto the FOLLOWING consuming
    * token as its incoming-edge constraint — the positional alphabet
    * every matcher below runs on (edges occupy no NFA position). */
  def compile(tokens: Array[Token]): Array[(Token, Option[TimeEdge])] = {
    val out = ArrayBuffer.empty[(Token, Option[TimeEdge])]
    var pending: Option[TimeEdge] = None
    tokens.foreach {
      case e: TimeEdge => pending = Some(e)
      case t => out += ((t, pending)); pending = None
    }
    out.toArray
  }

  /** Does inter-event delta `d` satisfy the edge constraint? */
  def edgeOk(e: TimeEdge, d: Long): Boolean = e.cmp match {
    case "<" => d < e.v
    case "<=" => d <= e.v
    case ">" => d > e.v
    case ">=" => d >= e.v
    case "==" => d == e.v
    case _ => d != e.v
  }

  /**
   * Non-overlapping match count (CH `sequenceCount`): scan the events
   * once with a token-position NFA (state t = "first t tokens
   * consumed"; `.*` contributes an epsilon edge and an any-event self
   * loop); every time the accept state is reached the counter bumps
   * and the NFA restarts on the NEXT event — greedy earliest-end,
   * which never overlaps chains.
   */
  def countMatches(masks: Array[Int], tokens: Array[Token]): Int =
    countMatches(masks, tokens, null)

  /** `tss` may be null for edge-free patterns. Time-edge soundness:
    * non-gap NFA bits never persist across events (each event rebuilds
    * `next` from scratch; only `AnyGap` self-loops and the start bit
    * carry over), and parse forbids edges adjacent to `.*` — so a bit
    * feeding an edge-guarded transition at event i was necessarily set
    * while processing event i−1, making `tss(i) − tss(i−1)` exactly
    * the delta the constraint ranges over. */
  def countMatches(masks: Array[Int], tokens: Array[Token],
      tss: Array[Long]): Int = {
    val steps = compile(tokens)
    require(steps.forall(_._2.isEmpty) || tss != null,
      "time-constrained pattern needs the timestamp array")
    val m = steps.length
    def closure(states: java.util.BitSet): java.util.BitSet = {
      var t = 0
      while (t < m) {
        if (states.get(t) && steps(t)._1 == AnyGap) states.set(t + 1)
        t += 1
      }
      states
    }
    def fresh(): java.util.BitSet = {
      val s = new java.util.BitSet(m + 1)
      s.set(0)
      closure(s)
    }
    var states = fresh()
    var count = 0
    var i = 0
    while (i < masks.length) {
      val ev = masks(i)
      def edgeHolds(edge: Option[TimeEdge]): Boolean =
        edge.forall(e => i >= 1 && edgeOk(e, tss(i) - tss(i - 1)))
      val next = new java.util.BitSet(m + 1)
      var t = 0
      while (t < m) {
        if (states.get(t)) steps(t) match {
          case (Cond(bit), edge) =>
            if (((ev >> bit) & 1) == 1 && edgeHolds(edge)) next.set(t + 1)
          case (AnyOne, edge) => if (edgeHolds(edge)) next.set(t + 1)
          case _ => next.set(t) // gap swallows this event (never edge-guarded)
        }
        t += 1
      }
      // implicit leading .*: a new tentative match may start at ANY
      // event, so the start state persists across steps
      next.set(0)
      closure(next)
      if (next.get(m)) { count += 1; states = fresh() }
      else states = next
      i += 1
    }
    count
  }

  /**
   * Containment match (CH searches the pattern WITHIN the sequence, so
   * leading/trailing gaps are implicit): position-set NFA — `reach(p)`
   * = "after consuming the tokens so far, the match cursor can stand
   * just before event p".
   */
  def matches(masks: Array[Int], tokens: Array[Token]): Boolean =
    matches(masks, tokens, null)

  /** `tss` may be null for edge-free patterns. Time-edge soundness:
    * `reach(p)` set by a CONSUMING token means that token consumed
    * event p−1 exactly, and parse forbids edges adjacent to `.*` — so
    * an edge-guarded token applied from `reach(p)` constrains
    * `tss(p) − tss(p−1)`, the delta of the two consecutive events its
    * adjacent tokens match. */
  def matches(masks: Array[Int], tokens: Array[Token],
      tss: Array[Long]): Boolean = {
    val steps = compile(tokens)
    require(steps.forall(_._2.isEmpty) || tss != null,
      "time-constrained pattern needs the timestamp array")
    val n = masks.length
    var reach = Array.fill(n + 1)(true) // implicit leading .*
    steps.foreach { case (tok, edge) =>
      val next = Array.fill(n + 1)(false)
      // p >= 1 always holds where an edge applies (the mandatory
      // preceding consuming token cleared reach(0)); guarded anyway
      def edgeHolds(p: Int): Boolean =
        edge.forall(e => p >= 1 && edgeOk(e, tss(p) - tss(p - 1)))
      tok match {
        case Cond(bit) =>
          var p = 0
          while (p < n) {
            if (reach(p) && ((masks(p) >> bit) & 1) == 1 && edgeHolds(p))
              next(p + 1) = true
            p += 1
          }
        case AnyOne =>
          var p = 0
          while (p < n) {
            if (reach(p) && edgeHolds(p)) next(p + 1) = true
            p += 1
          }
        case _ => // AnyGap (never edge-guarded)
          // upward closure: from p the cursor may stand anywhere >= p
          var seen = false
          var p = 0
          while (p <= n) {
            seen ||= reach(p)
            next(p) = seen
            p += 1
          }
      }
      reach = next
    }
    reach.exists(identity) // implicit trailing .*
  }
}
