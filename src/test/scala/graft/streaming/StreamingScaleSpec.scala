package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.Event

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * STREAMING STATE-BOUNDEDNESS CERTIFICATION (round-10 verdict item 4).
 *
 * The q_stream_* registry keys prove correctness; these gates prove
 * the SCALE contract every streaming operator documents: state is a
 * function of KEY CARDINALITY (plus the above-watermark tail), never
 * of cumulative input volume. Each gate runs the same choreography at
 * input multiplicity 1× and M× over a FIXED key set and pins
 *
 *  1. state ROWS identical across multiplicities (rows = f(keys)),
 *  2. state rows PLATEAU across epochs while cumulative input grows
 *     (watermark cleanup actually evicts / the per-key record is
 *     constant-size),
 *  3. for the table-backed dedup index: index rows = distinct
 *     admitted contents, exactly, regardless of event count.
 *
 * These are the instruments a 100×-events run would read: if state
 * rows tracked events, an unbounded ingest would OOM the state store
 * at 100 TB; if the plateau failed, watermark cleanup is broken and
 * the job dies after enough epochs — both failure modes are invisible
 * to the correctness keys, which run a bounded fixture to completion.
 */
class StreamingScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(base: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $base:00")
  /** base + m minutes. */
  private def tsPlus(m: Int): Timestamp =
    new Timestamp(ts("00:00").getTime + m * 60000L)

  /** Last recorded state-operator row count / memory of a query. */
  private def stateRows(
      q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(withState.nonEmpty, "no stateful progress recorded")
    val last = withState.last.stateOperators
    (last.map(_.numRowsTotal).sum, last.map(_.memoryUsedBytes).sum)
  }

  /**
   * sequenceMatch at multiplicity m: K users, `epochs` epochs of
   * signup-only events (the pattern `(?1).*(?2)` can never complete,
   * so every user's state persists — the worst case for state growth),
   * event time advancing 30 min per epoch against a 10 min watermark
   * so each epoch finalizes the previous one. Returns the per-epoch
   * state-row trajectory and the final (rows, memory).
   */
  private def runSeqMatch(users: Int, m: Int, epochs: Int)
      : (Seq[Long], Long, Long) = {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val out = EventStreams
      .streamingSequenceMatchMulti(input.toDS(), Seq("(?1).*(?2)"))
    val qn = "sm_scale_" + m
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    val perEpoch = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      var id = 0L
      (0 until epochs).foreach { e =>
        val evs = for (u <- 0 until users; r <- 0 until m) yield {
          id += 1
          Event(id, tsPlus(e * 30 + (r % 5)), u.toLong, "signup", 0.0)
        }
        input.addData(evs: _*)
        q.processAllAvailable()
        perEpoch += stateRows(q)._1
      }
      // drain epochs: events far ahead advance the watermark past
      // everything, emptying every pending tail — the state left is
      // the per-user constant-size record. TWO drain batches because
      // the HDFS state store retains the last 2 version maps in
      // memory (maxBatchesToRetainInMemory) and memoryUsedBytes counts
      // both — one drain would leave the pre-drain version (with the
      // final epoch's pending tail) in the measurement
      (0 to 1).foreach { d =>
        val drain = (0 until users).map { u =>
          id += 1
          Event(id, tsPlus(epochs * 30 + 600 + d * 30), u.toLong, "signup", 0.0)
        }
        input.addData(drain: _*)
        q.processAllAvailable()
      }
      val (rows, mem) = stateRows(q)
      (perEpoch.toSeq, rows, mem)
    } finally q.stop()
  }

  test("sequenceMatch state rows scale with keys, not events (1x vs 50x), and plateau") {
    val users = 30
    val (traj1, rows1, mem1) = runSeqMatch(users, m = 1, epochs = 4)
    val (traj50, rows50, mem50) = runSeqMatch(users, m = 50, epochs = 4)
    info(s"seqmatch 1x:  per-epoch rows=$traj1 final rows=$rows1 mem=$mem1")
    info(s"seqmatch 50x: per-epoch rows=$traj50 final rows=$rows50 mem=$mem50")
    // rows = f(keys): 50x the events, identical state rows
    assert(rows1 === users.toLong)
    assert(rows50 === rows1,
      s"state rows grew with input volume: 1x=$rows1 50x=$rows50")
    // plateau: once every user has state (epoch 1), later epochs add
    // events but never rows
    assert(traj50.drop(1).forall(_ === users.toLong),
      s"state rows did not plateau across epochs: $traj50")
    // after the drain epoch the pending tails are empty, so the
    // per-key record is constant-size: 50x the input may not leave
    // more than 2x the state bytes (slack for store-internal
    // bookkeeping, maintenance-pass timing, version maps)
    assert(mem50 <= mem1 * 2,
      s"state memory tracked input volume: 1x=$mem1 B, 50x=$mem50 B")
  }

  /**
   * dropDuplicatesWithinWatermark at multiplicity m: K distinct
   * contents per epoch (the SAME K every epoch), repeated m times,
   * event time advancing 30 min per epoch against a 10 min watermark —
   * each epoch's fingerprint state is evictable by the time the next
   * epoch lands. Returns per-epoch state rows.
   */
  private def runExactDedup(contents: Int, m: Int, epochs: Int): Seq[Long] = {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = input.toDF().toDF("doc_id", "arrived", "text")
      .withColumn("fp", call_function("fnv1a64", col("text")))
      .withWatermark("arrived", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val qn = "dd_scale_" + m
    val q = deduped.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    val perEpoch = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      var id = 0L
      (0 until epochs).foreach { e =>
        val rows = for (c <- 0 until contents; r <- 0 until m) yield {
          id += 1
          (id, tsPlus(e * 30 + (r % 5)),
            s"document body number $c with shared words across copies")
        }
        input.addData(rows: _*)
        q.processAllAvailable()
        perEpoch += stateRows(q)._1
      }
      perEpoch.toSeq
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark state plateaus at distinct-contents, not events") {
    val contents = 20
    val traj1 = runExactDedup(contents, m = 1, epochs = 4)
    val traj50 = runExactDedup(contents, m = 50, epochs = 4)
    info(s"exact-dedup state rows 1x=$traj1 50x=$traj50")
    // state rows are the watermark-live fingerprints: at most the
    // current epoch's K plus the not-yet-evicted previous epoch —
    // NEVER the cumulative (or multiplicity-scaled) input
    assert(traj50 === traj1,
      s"fingerprint state depends on multiplicity: 1x=$traj1 50x=$traj50")
    assert(traj50.forall(_ <= 2L * contents),
      s"fingerprint state exceeded the watermark-live bound: $traj50")
    // plateau, not growth: the last epoch holds no more state than the
    // second (cumulative input has doubled meanwhile)
    assert(traj50.last <= traj50(1),
      s"state grew across epochs despite eviction: $traj50")
  }

  test("streaming dedup index rows equal distinct admitted contents at any multiplicity") {
    import spark.implicits._
    val contents = 12
    def runIndexed(m: Int): (Long, Long, Long) = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-sdedup-scale-$m").toString
      val (idxPath, outPath) = (s"$base/index", s"$base/out")
      var id = 0L
      (0 until 3).foreach { epoch =>
        val batch = (for (c <- 0 until contents; r <- 0 until m) yield {
          id += 1
          (id, s"epoch independent content $c stays byte identical across epochs and copies")
        }).toDF("doc_id", "text")
        StreamingDedup.dedupEpoch(batch, "doc_id", "text", idxPath, outPath,
          epochId = epoch, threshold = 1.0, exactConfirm = true,
          indexNearKill = false)
      }
      val idx = spark.read.format("clickhouse_native").load(idxPath)
      val out = spark.read.format("clickhouse_native").load(outPath)
      (idx.count(), out.count(), id)
    }
    val (idx1, out1, n1) = runIndexed(1)
    val (idx20, out20, n20) = runIndexed(20)
    info(s"dedup index: m=1 events=$n1 idx=$idx1 out=$out1; m=20 events=$n20 idx=$idx20 out=$out20")
    // the admitted-corpus index is the ONLY cross-epoch state, and it
    // holds exactly one row per distinct content — 20x the events and
    // 3x the epochs add ZERO rows beyond the first epoch's K
    assert(idx1 === contents.toLong && out1 === contents.toLong)
    assert(idx20 === idx1 && out20 === out1,
      s"index grew with event volume: m=1 ($idx1,$out1) m=20 ($idx20,$out20)")
  }
}
