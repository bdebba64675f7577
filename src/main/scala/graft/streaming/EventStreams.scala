package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface (SURVEY §2.10). The reference stack has
 * no streaming at all; this is the parity-plus layer the brief asks
 * for: unbounded `events` ingestion with watermarked time windows and
 * custom keyed state, expressed so the SAME aggregation logic runs in
 * both batch (q_window_time_tumbling) and streaming mode — Spark
 * plans the incremental execution.
 *
 * Scale notes: every operator here is keyed-state over shuffled
 * partitions (user_id / window start), so state distributes across
 * executors and is checkpointed via the normal state store; watermarks
 * bound state size — nothing accumulates unboundedly.
 */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /**
   * Tumbling 5-minute windows with a 10-minute watermark: late events
   * beyond the watermark are dropped; closed windows emit exactly once
   * in append mode.
   */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding windows (length 10m, slide 5m) — same watermark contract. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))

  /** Session windows: activity gaps over 15 minutes close a session. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "15 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))

  /**
   * Custom keyed state via mapGroupsWithState: a running per-user
   * event count + value total, updated incrementally per micro-batch.
   * The state object is tiny and per-key — the 100-TB-safe shape.
   */
  def runningUserTotals(events: Dataset[Event])(implicit s: SparkSession): Dataset[UserRunning] = {
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunning(userId, n, total)
          state.update(next)
          next
      }
  }

  /**
   * Stream-stream interval join: each click pairs with the same user's
   * views from the preceding 5 minutes. BOTH sides carry watermarks
   * and the join condition bounds event-time distance, so Spark can
   * evict join state as the watermark advances — the only shape whose
   * state stays finite on unbounded inputs. State is keyed by user_id,
   * so it shuffles and scales horizontally like any keyed aggregation.
   */
  def clicksWithRecentViews(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 5 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Output of [[streamingAsof]]: a purchase paired with the latest
    * at-or-before signup of the same user (µs epochs; signup −1 when
    * none). */
  final case class AsofMatch(user_id: Long, purchase_id: Long,
      purchase_us: Long, signup_us: Long)

  /** Per-user [[streamingAsof]] state: the latest FINALIZED signup
    * time, plus events still ahead of the watermark (ts µs, event_id,
    * isSignup). */
  final case class AsofState(lastSignupUs: Long,
      pending: List[(Long, Long, Boolean)])

  /**
   * STREAMING ASOF JOIN — the streaming half of `q_join_asof`: for
   * every purchase, the same user's latest signup at-or-before it,
   * over unbounded input. Spark has no stream-stream asof join, and
   * the interval-join spelling can't express "latest before" (it
   * would emit every view in range). flatMapGroupsWithState supplies
   * the missing operator:
   *
   *  - events buffer per user until the WATERMARK passes them — the
   *    event-time order a correct asof fold needs is only final below
   *    the watermark (a late signup may still arrive above it);
   *  - each invocation folds the newly-finalized events in (ts, kind)
   *    order (signups first at ties, the batch key's inclusive-tie
   *    contract), updating the running latest-signup and emitting one
   *    row per purchase — EXACTLY the batch window fold, incremental;
   *  - state per user = one long + the above-watermark tail, which
   *    the watermark bounds; keyed by user_id it shuffles and scales
   *    like any keyed aggregation. Matches the batch q_join_asof on
   *    the same data once the watermark passes everything
   *    (StreamingSpec pins the equivalence).
   */
  def streamingAsof(events: Dataset[Event])(implicit s: SparkSession): Dataset[AsofMatch] = {
    import s.implicits._
    events
      .filter(e => e.event_type == "purchase" || e.event_type == "signup")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Long.MinValue, Nil))
          // full µs precision: Timestamp.getTime is ms-truncated; the
          // sub-ms part lives in getNanos (batch q_join_asof uses
          // unix_micros, and the equivalence claim needs the same key)
          def us(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val incoming = batch.map(e =>
            (us(e.ts), e.event_id, e.event_type == "signup")).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // finalize STRICTLY below the watermark: Spark admits late
          // rows with eventTime == watermark, so an equal-timestamp
          // event may still arrive and must find its peers unfolded
          val (ready, pending) =
            (st.pending ++ incoming).partition(_._1 < wmUs)
          var last = st.lastSignupUs
          val out = ready.sortBy { case (t, id, isSignup) =>
            (t, if (isSignup) 0 else 1, id)
          }.flatMap { case (t, id, isSignup) =>
            if (isSignup) { last = t; Nil }
            else AsofMatch(userId, id, t,
              if (last == Long.MinValue) -1L else last) :: Nil
          }
          state.update(AsofState(last, pending))
          // wake this key when the watermark can finalize its tail
          pending.map(_._1).minOption.foreach(t =>
            state.setTimeoutTimestamp(t / 1000L + 1L))
          out.iterator
      }
  }

  /** One [[streamingFunnel]] emission: the user reached a NEW deepest
    * funnel step at event time `reached_us` (µs epoch). The per-user
    * max over the stream equals the batch `funnel_agg` result. */
  final case class FunnelProgress(user_id: Long, funnel_step: Int, reached_us: Long)

  /** Per-user [[streamingFunnel]] state: the latest chain-start time
    * per funnel level (µs; Long.MinValue = level unreached), the
    * deepest step emitted so far, and the (ts µs, level) events still
    * at-or-above the watermark. */
  final case class FunnelState(chainStart: Array[Long], best: Int,
      pending: List[(Long, Int)])

  /**
   * STREAMING windowFunnel — ClickHouse's signature behavioral
   * aggregate ([[graft.functions.FunnelAgg]], the batch `q_funnel`)
   * over unbounded input: per user, the deepest step K such that
   * events matching steps 0..K-1 occur in timestamp order with every
   * step inside `windowUs` of ITS CHAIN'S step-0 event; a later
   * step-0 restarts the chain clock. Spark has no incremental funnel;
   * flatMapGroupsWithState supplies it:
   *
   *  - events buffer per user until the watermark passes them — the
   *    (ts, level)-sorted order the fold needs is only final below
   *    the watermark (streamingAsof's finalize-strictly-below
   *    discipline; equal-timestamp events always finalize together);
   *  - the batch eval's single pass IS an incremental DP over that
   *    order — `chainStart(lv)` = the chain-start of the latest chain
   *    reaching level lv, `best` = the depth high-water mark — so the
   *    state carries the two arrays across micro-batches and each
   *    invocation folds only the newly-finalized events;
   *  - a row is emitted each time a user's depth high-water mark
   *    RISES (append mode — monotone output, never retracted), so the
   *    per-user running max equals the batch aggregate at every
   *    watermark and exactly once the watermark passes all input
   *    (StreamingSpec pins the equivalence against `funnel_agg`).
   *
   * State per user = `steps` longs + the above-watermark tail the
   * watermark bounds; keyed by user_id it shuffles and scales like
   * any keyed aggregation — no corpus-sized state anywhere.
   *
   * @param stepOf 0-based funnel level per event_type; types absent
   *               from the map are ignored (CH's unmatched-condition
   *               rows)
   * @param windowUs funnel window in µs of chain-start-to-step span
   */
  def streamingFunnel(events: Dataset[Event],
      stepOf: Map[String, Int] = Map("view" -> 0, "click" -> 1, "purchase" -> 2),
      windowUs: Long = 3600L * 1000000L)(implicit s: SparkSession): Dataset[FunnelProgress] = {
    import s.implicits._
    val steps = stepOf.values.max + 1
    require(stepOf.values.min == 0 && stepOf.values.toSet == (0 until steps).toSet,
      s"stepOf must cover 0..${steps - 1} exactly, got $stepOf")
    events
      .filter(e => stepOf.contains(e.event_type))
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(
            FunnelState(Array.fill(steps)(Long.MinValue), 0, Nil))
          // µs precision, same key as batch q_funnel's unix_micros
          def us(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val incoming = batch.map(e => (us(e.ts), stepOf(e.event_type))).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) =
            (st.pending ++ incoming).partition(_._1 < wmUs)
          val chainStart = st.chainStart.clone()
          var best = st.best
          val out = List.newBuilder[FunnelProgress]
          // FunnelAgg.eval's pass, verbatim, over the finalized tail
          ready.sortBy { case (t, lv) => (t, lv) }.foreach { case (t, lv) =>
            if (lv == 0) {
              chainStart(0) = t // latest step-0 restarts the chain clock (CH)
              if (best < 1) { best = 1; out += FunnelProgress(userId, 1, t) }
            } else if (chainStart(lv - 1) != Long.MinValue &&
                t <= chainStart(lv - 1) + windowUs) {
              chainStart(lv) = chainStart(lv - 1) // chain-start propagates
              if (best < lv + 1) { best = lv + 1; out += FunnelProgress(userId, lv + 1, t) }
            }
          }
          // once best == steps no further emission is possible (the
          // high-water mark is at its ceiling), so drop the pending
          // tail and stop scheduling wakeups for this key — the same
          // early-out sequenceMatch takes on match (round-9 advice);
          // without it a converted user pays buffer+sort+timeout
          // forever
          val done = best == steps
          state.update(FunnelState(chainStart, best, if (done) Nil else pending))
          if (!done) pending.map(_._1).minOption.foreach(t =>
            state.setTimeoutTimestamp(t / 1000L + 1L))
          out.result().iterator
      }
  }

  /** One [[streamingSequenceMatch]] emission: the user's event history
    * first matched the pattern at event time `matched_us` (µs epoch);
    * exactly one row per user ever (a containment match never
    * un-matches). */
  final case class SeqMatchProgress(user_id: Long, matched_us: Long)

  /** Per-user [[streamingSequenceMatch]] state: the NFA token-position
    * set as a bitmask (bit t = "first t tokens consumed"; bit
    * `tokens.length` = accepted), whether the match row was emitted,
    * and the (ts µs, mask) events still at-or-above the watermark. */
  final case class SeqMatchState(positions: Long, matched: Boolean,
      pending: List[(Long, Int)])

  /**
   * STREAMING sequenceMatch — CH's `sequenceMatch('pattern')(ts,
   * cond1, …)` ([[graft.functions.SequenceMatchAgg]], the batch
   * `q_agg_sequence_match`) over unbounded input: does the user's
   * event sequence, ordered by time, contain a subsequence matching
   * the pattern? Same pattern subset as the batch aggregate ((?N),
   * `.`, `.*`; time constraints rejected at construction).
   *
   * The batch eval's containment check is equivalent to an
   * EVENT-DRIVEN position-set NFA (the same automaton
   * `SequenceMatchAgg.countMatches` steps): state bit t means "the
   * first t pattern tokens are consumed"; each event advances `Cond`/
   * `AnyOne` bits, `AnyGap` bits self-loop, the start bit persists
   * (implicit leading `.*`) and ε-closure expands gaps. That state is
   * ONE LONG — so unlike the batch aggregate (which buffers the
   * group's events), the streaming form carries no event history at
   * all: per-user state = the bitmask + the above-watermark tail the
   * watermark bounds. Events finalize strictly below the watermark in
   * (ts, mask) order — the batch sort order — so the streamed verdict
   * per user equals the batch aggregate's once the watermark passes
   * the input (StreamingSpec pins the equivalence). Rows matching no
   * condition still participate (mask 0 — `.`/`.*` fodder), so pass
   * every event of the key, not just condition hits.
   *
   * @param maskOf condition bitmask per event_type (bit N-1 ⇔ CH's
   *               condN); absent types carry mask 0
   */
  def streamingSequenceMatch(events: Dataset[Event], pattern: String,
      maskOf: Map[String, Int] = Map("signup" -> 1, "purchase" -> 2))(
      implicit s: SparkSession): Dataset[SeqMatchProgress] = {
    import s.implicits._
    // one implementation: the single-pattern form is the multi form
    // with one NFA, so the two can never drift (the single-pattern
    // fuzz in StreamingSpec exercises the multi machinery end to end).
    // CHECKPOINT COMPATIBILITY (state schema v2, round 9): this
    // delegation changed the flatMapGroupsWithState state type from
    // the old single-pattern SeqMatchState to SeqMatchMultiState. A
    // streaming job restarting from a checkpoint written by the
    // pre-round-9 single-pattern form will fail (or silently misread
    // state) on the state-encoder schema mismatch — restart such jobs
    // with a FRESH checkpoint directory.
    streamingSequenceMatchMulti(events, Seq(pattern), maskOf)
      .map(p => SeqMatchProgress(p.user_id, p.matched_us))
  }

  /** One [[streamingSequenceMatchMulti]] emission: the user's history
    * first matched `patterns(pattern_idx)` at event time `matched_us`;
    * exactly one row per (user, pattern) ever. */
  final case class SeqMatchMultiProgress(user_id: Long, pattern_idx: Int,
      matched_us: Long)

  /** Per-user [[streamingSequenceMatchMulti]] state: one NFA
    * position-set bitmask and matched flag PER PATTERN, plus the ONE
    * shared above-watermark (ts µs, mask) tail — N patterns cost N
    * longs of extra state, not N buffered event streams. `lastTs` is
    * the timestamp of the last FINALIZED event (Long.MinValue before
    * the first): time-edge constraints always compare consecutive
    * finalized events (parse forbids edges across `.*`), so one long
    * serves every pattern's every constraint. */
  final case class SeqMatchMultiState(positions: Seq[Long],
      matched: Seq[Boolean], pending: List[(Long, Int)],
      lastTs: Long = Long.MinValue)

  /**
   * [[streamingSequenceMatch]] for SEVERAL patterns in ONE stream
   * pass — the production shape (a funnel-health job watches many
   * patterns over the same events; running one keyed state per
   * pattern would re-shuffle and re-buffer the stream N times). Every
   * watermark-finalized event steps all N automata; per-user state is
   * N longs + N booleans + the single shared pending tail, and the
   * tail is dropped (with its event-time timeouts) once EVERY pattern
   * has matched — the multi-pattern generalization of the single
   * form's early-out.
   *
   * Emissions are append-only: one (user, pattern_idx, matched_us)
   * row at each pattern's first match, independent across patterns.
   * Equivalence with running N independent single-pattern streams is
   * pinned in StreamingSpec (the automata share nothing but the
   * event feed).
   */
  def streamingSequenceMatchMulti(events: Dataset[Event],
      patterns: Seq[String],
      maskOf: Map[String, Int] = Map("signup" -> 1, "purchase" -> 2))(
      implicit s: SparkSession): Dataset[SeqMatchMultiProgress] = {
    import s.implicits._
    import graft.functions.SequenceMatchAgg.{AnyGap, AnyOne, Cond, TimeEdge, compile, edgeOk, parse}
    require(patterns.nonEmpty, "need at least one pattern")
    // compiled alphabet: TimeEdge constraints folded onto their
    // following consuming token (they occupy no NFA position); the
    // same soundness argument as the batch countMatches applies —
    // non-gap bits never persist across events and edges can't sit
    // next to `.*`, so an edge always compares against the
    // immediately-preceding finalized event (state.lastTs)
    val stepSets: Array[Array[(graft.functions.SequenceMatchAgg.Token, Option[TimeEdge])]] =
      patterns.map(p => compile(parse(p))).toArray
    stepSets.zipWithIndex.foreach { case (ts, i) =>
      require(ts.length < 63,
        s"pattern ${i} too long for the bitmask state: ${ts.length} tokens")
    }
    val nPat = stepSets.length
    def closure(pi: Int, set: Long): Long = {
      val steps = stepSets(pi)
      var st = set
      var t = 0
      while (t < steps.length) {
        if ((st >> t & 1L) == 1L && steps(t)._1 == AnyGap) st |= 1L << (t + 1)
        t += 1
      }
      st
    }
    def step(pi: Int, states: Long, ev: Int, delta: Long, hasPrev: Boolean): Long = {
      val steps = stepSets(pi)
      def eok(edge: Option[TimeEdge]): Boolean =
        edge.forall(e => hasPrev && edgeOk(e, delta))
      var next = 1L // the start state persists: a match may begin anywhere
      var t = 0
      while (t < steps.length) {
        if ((states >> t & 1L) == 1L) steps(t) match {
          case (Cond(bit), edge) =>
            if (((ev >> bit) & 1) == 1 && eok(edge)) next |= 1L << (t + 1)
          case (AnyOne, edge) => if (eok(edge)) next |= 1L << (t + 1)
          case _ => next |= 1L << t // gap swallows this event (never edge-guarded)
        }
        t += 1
      }
      closure(pi, next)
    }
    val inits = Seq.tabulate(nPat)(pi => closure(pi, 1L))
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqMatchMultiState, SeqMatchMultiProgress](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SeqMatchMultiState]) =>
          val st = state.getOption.getOrElse(
            SeqMatchMultiState(inits, Seq.fill(nPat)(false), Nil))
          def us(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          val incoming = batch.map(e => (us(e.ts), maskOf.getOrElse(e.event_type, 0))).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = (st.pending ++ incoming).partition(_._1 < wmUs)
          val positions = st.positions.toArray
          val matched = st.matched.toArray
          val matchedUs = Array.fill(nPat)(Long.MinValue)
          var prevTs = st.lastTs
          val readySorted = ready.sortBy { case (t, mk) => (t, mk) }
          if (!matched.forall(identity))
            readySorted.foreach { case (t, mk) =>
              var pi = 0
              while (pi < nPat) {
                if (!matched(pi)) {
                  positions(pi) = step(pi, positions(pi), mk,
                    t - prevTs, prevTs != Long.MinValue)
                  if ((positions(pi) >> stepSets(pi).length & 1L) == 1L) {
                    matched(pi) = true; matchedUs(pi) = t
                  }
                }
                pi += 1
              }
              prevTs = t
            }
          val lastTs = readySorted.lastOption.map(_._1).getOrElse(st.lastTs)
          val allMatched = matched.forall(identity)
          state.update(SeqMatchMultiState(positions.toSeq, matched.toSeq,
            if (allMatched) Nil else pending, lastTs))
          if (!allMatched) pending.map(_._1).minOption.foreach(t =>
            state.setTimeoutTimestamp(t / 1000L + 1L))
          (0 until nPat).iterator
            .filter(pi => matchedUs(pi) != Long.MinValue)
            .map(pi => SeqMatchMultiProgress(userId, pi, matchedUs(pi)))
      }
  }

  /** File-based streaming read of the harness events table (handles
    * both micros-timestamp and nanos-as-long parquet, like Q.events —
    * and like it, via an explicit schema rather than mutating the
    * session's legacy nanosAsLong conf, which would leak nanos-as-long
    * reads into every other parquet query on the session). */
  def readEventStream(s: SparkSession, dir: String): DataFrame = {
    val rawSchema =
      try s.read.parquet(s"$dir/events.parquet").schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PARQUET_TYPE_ILLEGAL" =>
          graft.operators.Q.eventsNanosSchema
      }
    // the file stream source requires a directory or glob (a bare file
    // path makes it derive a non-directory basePath and fail)
    val stream = s.readStream.schema(rawSchema).parquet(s"$dir/event*.parquet")
    rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream
    }
  }

  /**
   * Streaming ingest into the engine's OWN storage with EXACTLY-ONCE
   * delivery under epoch replays — the production tail of the
   * streaming surface. `foreachBatch` is documented at-least-once (a
   * restart re-emits the last uncommitted epoch); each micro-batch
   * appends to a clickhouse_native table with `insertDedup=true`, so
   * the replayed epoch rewrites byte-identical parts that the
   * part-level content identity (hash + length + byte compare,
   * ClickHouseNativeDataSource commit) drops — ClickHouse's
   * replicated-INSERT idempotence model re-expressed over Spark's
   * epoch replay semantics. Requirement, same as CH's: the batch's
   * content and partitioning must be a pure function of the epoch's
   * input (true for file/memory sources and deterministic transforms).
   *
   * Returns the writer ready for `.option("checkpointLocation", …)
   * .start()`.
   */
  def nativeSink(stream: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        appendEpoch(batch.toDF(), path, epochId)
      }

  /** The per-epoch append — exposed so the replay contract is testable
    * without a restart harness: appending the SAME batch twice under
    * the SAME epoch id must leave exactly one copy in the table, while
    * a LATER epoch whose content is legitimately byte-identical to an
    * earlier one (heartbeats, metrics with coarse columns) must still
    * land. The epoch id scopes the dedup identity (insertDedupToken —
    * CH's insert_deduplication_token), so only a genuine REPLAY of the
    * same epoch is a no-op. */
  def appendEpoch(batch: DataFrame, path: String, epochId: Long): Unit =
    batch.write.format("clickhouse_native")
      .option("insertDedup", "true")
      .option("insertDedupToken", s"epoch-$epochId")
      .mode("append").save(path)
}
