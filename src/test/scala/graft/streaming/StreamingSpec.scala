package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStreams.{Event, UserRunning}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(m: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("tumbling windows aggregate incrementally across micro-batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_t").outputMode("update").start()
    try {
      input.addData(
        Event(1, ts("00:01"), 10, "click", 1.0),
        Event(2, ts("00:02"), 10, "click", 2.0),
        Event(3, ts("00:06"), 11, "view", 3.0))
      q.processAllAvailable()
      input.addData(Event(4, ts("00:03"), 12, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_t")
        .groupBy("wstart", "event_type")
        .agg(max("cnt").as("cnt")) // update mode re-emits; take latest
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        (ts("00:00"), "click", 3L),
        (ts("00:05"), "view", 1L)))
    } finally q.stop()
  }

  test("watermark drops events later than 10 minutes in append mode") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("wm_t").outputMode("append").start()
    try {
      input.addData(Event(1, ts("00:01"), 10, "click", 1.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark
      input.addData(Event(2, ts("01:00"), 10, "click", 1.0))
      q.processAllAvailable()
      // this event is > 10 min behind the watermark → must be dropped
      input.addData(Event(3, ts("00:02"), 10, "click", 99.0))
      q.processAllAvailable()
      // close remaining windows
      input.addData(Event(4, ts("02:00"), 10, "click", 1.0))
      q.processAllAvailable()
      val first = spark.table("wm_t")
        .filter(col("wstart") === ts("00:00")).collect()
      assert(first.length === 1)
      assert(first(0).getAs[Long]("cnt") === 1L) // late event NOT counted
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    implicit val ctx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("state_t").outputMode("update").start()
    try {
      input.addData(Event(1, ts("00:01"), 7, "click", 1.5))
      q.processAllAvailable()
      input.addData(Event(2, ts("00:02"), 7, "click", 2.5),
        Event(3, ts("00:03"), 8, "view", 10.0))
      q.processAllAvailable()
      val latest = spark.table("state_t").as[UserRunning].collect()
        .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
      assert(latest(7L).n_events === 2 && math.abs(latest(7L).total_value - 4.0) < 1e-9)
      assert(latest(8L).n_events === 1)
    } finally q.stop()
  }

  test("session windows merge activity within the gap") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_t").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts("00:01"), 5, "click", 1.0),
        Event(2, ts("00:10"), 5, "click", 1.0),  // within 15m gap → same session
        Event(3, ts("01:00"), 5, "click", 1.0))  // new session
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      input.addData(Event(4, ts("03:00"), 6, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_t").filter(col("user_id") === 5)
        .select("session_start", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(sessions.exists { case (st, n) => st == ts("00:01") && n == 2 })
      assert(sessions.exists { case (st, n) => st == ts("01:00") && n == 1 })
    } finally q.stop()
  }

  test("streaming minhash: sketches over a document stream equal batch signatures") {
    // THE reason the mergeable aggregate exists: a document arriving in
    // pieces across micro-batches accumulates the same sketch as a
    // single-pass batch computation (elementwise-min is order-free).
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "completely different words about distributed query engines and shuffles")
    val input = MemoryStream[(Long, String)]
    val sigs = input.toDF().toDF("doc_id", "chunk")
      .select(col("doc_id"), call_function("shingle_hashes", col("chunk"), lit(3)).as("sh"))
      .groupBy("doc_id").agg(expr("minhash_agg(sh, 128)").as("sig"))
    val q = sigs.writeStream.format("memory").queryName("mh_t").outputMode("update").start()
    try {
      // doc 1 arrives split across two micro-batches (each chunk is a
      // full shingle window; batch reference uses chunk-wise union)
      val (h1, h2) = texts(1L).split(" ").splitAt(6) match {
        case (a, b) => (a.mkString(" "), b.mkString(" "))
      }
      input.addData((1L, h1), (2L, texts(2L)))
      q.processAllAvailable()
      input.addData((1L, h2))
      q.processAllAvailable()
      // update mode re-emits a group per batch; sketch updates only
      // lower slots, so the elementwise min across emissions IS the
      // final signature (no reliance on sink row order)
      val streamed = spark.table("mh_t").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
        .groupBy(_._1).view.mapValues(_.map(_._2)
          .reduce((a, b) => a.zip(b).map(p => math.min(p._1, p._2)))).toMap
      val expect1 = graft.functions.TextHash.minhashSignature(
        graft.functions.TextHash.shingleHashes(h1, 3) ++
          graft.functions.TextHash.shingleHashes(h2, 3), 128).toSeq
      val expect2 = graft.functions.TextHash.minhashSignature(
        graft.functions.TextHash.shingleHashes(texts(2L), 3), 128).toSeq
      assert(streamed(1L) === expect1)
      assert(streamed(2L) === expect2)
    } finally q.stop()
  }

  test("streaming bitmap distinct: per-group cardinality over a user stream equals batch") {
    // the streaming half of q_agg_bitmap: bitmap states accumulate
    // across micro-batches (union is order-free and monotone), so the
    // latest emission per group carries the exact running distinct —
    // unbounded-stream distinct counting with O(distinct/8) state
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val counts = input.toDF().toDF("etype", "user_id")
      .groupBy("etype")
      .agg(expr("bitmap_cardinality(bitmap_agg(user_id))").as("uniq"))
    val q = counts.writeStream.format("memory").queryName("bm_t")
      .outputMode("update").start()
    try {
      input.addData(("click", 1L), ("click", 2L), ("view", 1L))
      q.processAllAvailable()
      input.addData(("click", 2L), ("click", 3L), ("view", 9L), ("view", 1L))
      q.processAllAvailable()
      // cardinality is monotone nondecreasing: max emission = final state
      val streamed = spark.table("bm_t").collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(streamed === Map("click" -> 3L, "view" -> 2L))
    } finally q.stop()
  }

  test("streaming token chunking: per-row shard packing over a document stream equals batch") {
    // tokenChunks is stateless per-row column math, so it composes with
    // readStream unchanged — the shard-packing stage of a LIVE ingest
    // pipeline (docs arrive, chunks stream out append-mode, no state
    // store at all)
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextPipeline.tokenChunks(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 4, overlap = 1)
      .writeStream.format("memory").queryName("chunk_t").outputMode("append").start()
    try {
      input.addData((1L, "a b c d e f g h"), (2L, "x y"))
      q.processAllAvailable()
      input.addData((3L, "one two three four five"))
      q.processAllAvailable()
      val streamed = spark.table("chunk_t")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
      val batch = graft.operators.TextPipeline.tokenChunks(
          Seq((1L, "a b c d e f g h"), (2L, "x y"), (3L, "one two three four five"))
            .toDF("doc_id", "text"), "doc_id", "text", chunkSize = 4, overlap = 1)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
      assert(streamed === batch)
      assert(streamed.contains((1L, 0, 4, "a b c d")))
      assert(streamed.contains((1L, 1, 4, "d e f g"))) // 1-token overlap
    } finally q.stop()
  }

  test("streaming sequence match: pattern state accumulates across micro-batches") {
    // The sequence aggregates buffer (ts, mask) pairs and defer the
    // order-sensitive NFA pass to eval — so events arriving out of
    // order ACROSS micro-batches still converge to the batch answer
    // once all partials merge.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Int)]
    val out = input.toDF().toDF("user_id", "tus", "mask")
      .groupBy("user_id")
      .agg(call_function("sequence_match_agg",
        col("tus"), col("mask"), lit("(?1).*(?2)")).as("m"))
    val q = out.writeStream.format("memory").queryName("seq_t").outputMode("update").start()
    try {
      // the PURCHASE (cond 2) arrives in batch 1, the earlier SIGNUP
      // (cond 1) only in batch 2 — time order opposite arrival order
      input.addData((1L, 20L, 2), (2L, 20L, 2))
      q.processAllAvailable()
      input.addData((1L, 10L, 1)) // user 1 completes the pattern
      q.processAllAvailable()
      val last = spark.table("seq_t").collect()
        .map(r => (r.getLong(0), r.getBoolean(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).exists(identity)).toMap
      assert(last(1L) === true)   // signup(10) before purchase(20)
      assert(last(2L) === false)  // purchase only
    } finally q.stop()
  }

  test("file-based event stream matches the batch tumbling aggregation") {
    val dir = SparkTestBase.sfDir
    val stream = EventStreams.readEventStream(spark, dir)
    val q = stream
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("cnt"))
      // driver-generated parquet may carry ts as TIMESTAMP_NTZ, whose
      // window bounds surface as LocalDateTime — normalize both sides
      .select(col("w.start").cast("timestamp").as("wstart"), col("cnt"))
      .writeStream.format("memory").queryName("file_t").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_t").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val batch = graft.operators.Q.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour").as("w")).agg(count(lit(1)).as("cnt"))
        .select(col("w.start").cast("timestamp").as("wstart"), col("cnt"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join and bounds state") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val joined = EventStreams.clicksWithRecentViews(input.toDF())
    val q = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode("append").start()
    val events = Seq(
      Event(1, ts("00:01"), 10, "view", 0.0),
      Event(2, ts("00:03"), 10, "click", 0.0),  // joins view 1 (2m before)
      Event(3, ts("00:02"), 11, "view", 0.0),
      Event(4, ts("00:09"), 11, "click", 0.0),  // 7m after view 3 → outside 5m
      Event(5, ts("00:04"), 10, "view", 0.0),
      Event(6, ts("00:06"), 10, "click", 0.0),  // joins views 1 AND 5
      Event(7, ts("00:05"), 12, "click", 0.0))  // no view for user 12
    try {
      // two micro-batches, split mid-stream: results must not depend on
      // batch boundaries
      input.addData(events.take(4): _*)
      q.processAllAvailable()
      input.addData(events.drop(4): _*)
      q.processAllAvailable()
      // close join state by advancing watermark far ahead
      input.addData(Event(99, ts("02:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ssj_t")
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch reference: same join logic on a static frame
      val batch = EventStreams.clicksWithRecentViews(events.toDF())
        .select("click_id", "view_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((2L, 1L), (6L, 1L), (6L, 5L)))
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming exact dedup: content-hash dropDuplicates keeps first across batches") {
    // the streaming half of q_dedup_exact: an arriving corpus deduped
    // on a codegen'd content fingerprint AS IT STREAMS —
    // dropDuplicatesWithinWatermark bounds the hash state by event
    // time, so the operator runs forever on unbounded ingest (plain
    // dropDuplicates would grow state without bound at 100 TB).
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = input.toDF().toDF("doc_id", "arrived", "text")
      .withColumn("fp", call_function("fnv1a64", col("text")))
      .withWatermark("arrived", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("sdedup_t")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("00:00"), "alpha beta gamma"),
        (2L, ts("00:01"), "totally different text"))
      q.processAllAvailable()
      // batch 2: doc 3 repeats doc 1's content inside the watermark —
      // dropped; doc 4 is fresh — kept
      input.addData(
        (3L, ts("00:02"), "alpha beta gamma"),
        (4L, ts("00:03"), "yet another document"))
      q.processAllAvailable()
      // advance watermark far ahead to flush append-mode results
      input.addData((99L, ts("02:00"), "closer"))
      q.processAllAvailable()
      val kept = spark.table("sdedup_t").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(kept.contains(1L) && kept.contains(2L) && kept.contains(4L))
      assert(!kept.contains(3L), "duplicate content inside the watermark must be dropped")
    } finally q.stop()
  }

  test("streaming native sink: micro-batches land in native storage, replayed epoch is a no-op") {
    // the production tail of the streaming surface: foreachBatch
    // appends each epoch to a clickhouse_native table with
    // insertDedup=true, so foreachBatch's documented at-least-once
    // replay (a restart re-emitting the last uncommitted epoch)
    // becomes exactly-once via part-level content identity.
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("native_sink_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("native_sink_ckpt_").toString
    val input = MemoryStream[Event]
    val q = EventStreams.nativeSink(input.toDF(), s"$dir/events_native")
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(
        Event(1, ts("00:01"), 10, "click", 1.0),
        Event(2, ts("00:02"), 11, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("00:06"), 12, "purchase", 3.0))
      q.processAllAvailable()
      val table = spark.read.format("clickhouse_native").load(s"$dir/events_native")
      assert(table.count() === 3)
      assert(table.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))

      // replay contract, without a restart harness: re-append epoch 1's
      // exact batch UNDER ITS OWN epoch id — byte-identical parts with
      // the same dedup token, dropped by insertDedup
      val epoch1 = Seq(Event(3, ts("00:06"), 12, "purchase", 3.0)).toDF()
      EventStreams.appendEpoch(epoch1, s"$dir/events_native", epochId = 1L)
      val after = spark.read.format("clickhouse_native").load(s"$dir/events_native")
      assert(after.count() === 3, "a replayed epoch must not duplicate rows")

      // a LATER epoch with legitimately identical content is NOT a
      // replay — different token, must land (the data-loss hazard of
      // unscoped content dedup: heartbeat-like streams re-emit equal
      // row sets)
      EventStreams.appendEpoch(epoch1, s"$dir/events_native", epochId = 2L)
      val after2 = spark.read.format("clickhouse_native").load(s"$dir/events_native")
      assert(after2.count() === 4,
        "identical content under a NEW epoch id is new data, not a replay")
    } finally q.stop()
  }

  test("streaming asof: latest at-or-before signup per purchase, late data handled") {
    implicit val ctx = spark.sqlContext
    implicit val sp = spark
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = EventStreams.streamingAsof(input.toDS())
      .writeStream.format("memory").queryName("asof_t").outputMode("append").start()
    def us(m: String): Long = ts(m).getTime * 1000L
    try {
      input.addData(
        Event(1, ts("00:05"), 1, "signup", 0.0),
        Event(2, ts("00:10"), 1, "purchase", 5.0),
        Event(3, ts("00:02"), 2, "purchase", 1.0))
      q.processAllAvailable()
      // user 2's signup arrives LATE (a later micro-batch) but before
      // the watermark passed its purchase — the buffer must reorder
      input.addData(
        Event(4, ts("00:01"), 2, "signup", 0.0),
        Event(5, ts("00:12"), 1, "purchase", 2.0))
      q.processAllAvailable()
      // sentinel batches advance the watermark so earlier events finalize
      Seq("02:00", "03:00", "03:10").zipWithIndex.foreach { case (m, i) =>
        input.addData(Event(90L + i, ts(m), 9, "purchase", 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table("asof_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val expected = Set(
        (1L, 2L, us("00:10"), us("00:05")),
        (1L, 5L, us("00:12"), us("00:05")),
        (2L, 3L, us("00:02"), us("00:01")), // late signup still matched
        (9L, 90L, us("02:00"), -1L))        // no signup → sentinel -1
      assert(expected.subsetOf(rows), s"missing rows: ${expected -- rows}")
      // nothing wrong was ever emitted, and above-watermark events held back
      assert(rows.forall(r => expected.contains(r) || r._1 == 9L),
        s"unexpected rows: ${rows -- expected}")
      assert(!rows.exists(_._2 == 92L), "event above the watermark must stay pending")
    } finally q.stop()
  }

  // deterministic ~50-word documents for the dedup stream: near-dups
  // share all but one word (shingle Jaccard ≈ 0.94, far above the 0.5
  // threshold); distinct seeds share no vocabulary at all
  private def doc(seed: Int): String =
    (0 until 50).map(i => s"w${seed}x$i").mkString(" ")
  private def nearDoc(seed: Int): String =
    (0 until 50).map(i => if (i == 25) "CHANGED" else s"w${seed}x$i").mkString(" ")

  test("streaming dedup: intra-batch clusters then index kills across epochs") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val (idx, out, ckpt) = (s"$dir/idx", s"$dir/out", s"$dir/ckpt")
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.dedupStream(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", idx, out)
      .option("checkpointLocation", ckpt).start()
    try {
      // epoch 0: 1 and 2 are near-dups (min id 1 represents), 3 unique
      input.addData((1L, doc(1)), (2L, nearDoc(1)), (3L, doc(3)))
      q.processAllAvailable()
      // epoch 1: 10 is an EXACT re-crawl of doc 1 (different id — the
      // fp path must kill it), 11 unique, 12 near-dup of 11 intra-batch
      input.addData((10L, doc(1)), (11L, doc(11)), (12L, nearDoc(11)))
      q.processAllAvailable()
      val outIds = spark.read.format("clickhouse_native").load(out)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(outIds.sorted === Seq(1L, 3L, 11L))
      val idxRows = spark.read.format("clickhouse_native").load(idx)
        .select("id", "epoch").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(idxRows === Map(1L -> 0L, 3L -> 0L, 11L -> 1L))
    } finally q.stop()
  }

  test("streaming dedup: epoch replay is a no-op, content recurrence is not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-r").toString
    val (idx, out) = (s"$dir/idx", s"$dir/out")
    def run(batch: Seq[(Long, String)], epoch: Long): Unit =
      StreamingDedup.dedupEpoch(batch.toDF("doc_id", "text"),
        "doc_id", "text", idx, out, epoch)
    run(Seq((1L, doc(1)), (3L, doc(3))), epoch = 0L)
    run(Seq((11L, doc(11))), epoch = 1L)
    def outCounts = spark.read.format("clickhouse_native").load(out)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outCounts === Map(1L -> 1L, 3L -> 1L, 11L -> 1L))
    // at-least-once REPLAY of epoch 1 (same batch, same epoch id): the
    // index read pins to epoch < 1, so the replay recomputes the same
    // survivors and the epoch-scoped part identity drops the re-append
    run(Seq((11L, doc(11))), epoch = 1L)
    assert(outCounts === Map(1L -> 1L, 3L -> 1L, 11L -> 1L),
      "replayed epoch must not double any row")
    // the same CONTENT under a NEW epoch and id is a genuine duplicate:
    // the dedup logic itself must drop it (opposite of the appendEpoch
    // heartbeat contract, where later identical content must land)
    run(Seq((20L, doc(11)), (21L, doc(21))), epoch = 2L)
    assert(outCounts === Map(1L -> 1L, 3L -> 1L, 11L -> 1L, 21L -> 1L),
      "re-crawled content must be deduped, fresh content admitted")
  }

  test("streaming funnel: running depth equals batch funnel_agg, window + restart honored") {
    implicit val ctx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    // user 1: clean 3-step conversion inside the hour
    // user 2: click with no view — depth stays 0, nothing emitted
    // user 3: click 2h after the only view — outside the window, depth 1
    // user 4: a SECOND view restarts the chain clock (CH semantics), so
    //         the late purchase fits the restarted chain — depth 3
    // user 5: its view arrives a micro-batch AFTER its click but below
    //         the watermark — the pending buffer must reorder, depth 2
    // batches keep max-seen event time low enough that every
    // out-of-order arrival stays above the 10-minute watermark (the
    // admission contract; genuinely-late data is dropped by design)
    val batch1 = Seq(
      Event(101, ts("00:01"), 1, "view", 0.0),
      Event(102, ts("00:10"), 1, "click", 0.0),
      Event(201, ts("00:05"), 2, "click", 0.0),
      Event(301, ts("00:01"), 3, "view", 0.0),
      Event(401, ts("00:01"), 4, "view", 0.0),
      Event(502, ts("00:08"), 5, "click", 0.0))
    val batch2 = Seq(
      Event(501, ts("00:03"), 5, "view", 0.0), // out-of-order vs 502
      Event(103, ts("00:30"), 1, "purchase", 0.0),
      Event(402, ts("00:45"), 4, "view", 0.0),
      Event(403, ts("00:50"), 4, "click", 0.0))
    val batch3 = Seq(
      Event(404, ts("01:30"), 4, "purchase", 0.0),
      Event(302, ts("02:00"), 3, "click", 0.0))
    val input = MemoryStream[Event]
    val q = EventStreams.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_t").outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      // sentinel batches advance the watermark so every event finalizes
      // (the EventTimeTimeout wakeups flush keys with no new data)
      Seq("04:00", "05:00", "05:10").zipWithIndex.foreach { case (m, i) =>
        input.addData(Event(900L + i, ts(m), 9, "view", 0.0))
        q.processAllAvailable()
      }
      val emitted = spark.table("funnel_t").as[EventStreams.FunnelProgress]
        .collect().filter(_.user_id != 9L)
      // monotone append-only output: per user, depths emit strictly
      // rising in event-time order, never retracted
      emitted.groupBy(_.user_id).foreach { case (u, rows) =>
        val inOrder = rows.sortBy(_.reached_us).map(_.funnel_step).toList
        assert(inOrder == inOrder.sorted && inOrder.distinct == inOrder,
          s"user $u depths must rise strictly: $inOrder")
      }
      val streamed = emitted.groupBy(_.user_id)
        .map { case (u, rows) => u -> rows.map(_.funnel_step).max }
      // the batch oracle: the SAME events through the batch aggregate
      val all = batch1 ++ batch2 ++ batch3
      val batch = all.toDF()
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1)
            .when(col("event_type") === "purchase", 2).otherwise(-1).as("lvl"))
        .where(col("lvl") >= 0)
        .groupBy("user_id")
        .agg(call_function("funnel_agg",
          col("tus"), col("lvl"), lit(3600L * 1000000L), lit(3)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      all.map(_.user_id).distinct.foreach { u =>
        assert(streamed.getOrElse(u, 0) === batch(u),
          s"user $u: streamed max ${streamed.get(u)} != batch ${batch(u)}")
      }
    } finally q.stop()
  }

  test("streaming funnel fuzz: random events in arrival-time batches match batch funnel_agg") {
    implicit val ctx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    // Randomized equivalence: 120 events over 6 users with random
    // types/timestamps, streamed in event-time-ordered slices with
    // BOUNDED shuffling inside each slice (out-of-order arrival within
    // the 10-minute watermark — the admission contract; arbitrary
    // global shuffling would make events genuinely late, which the
    // watermark DROPS by design and the batch aggregate would count).
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "other")
    val events = (0 until 120).map { i =>
      val tsec = rnd.nextInt(7200) // 2h span, frequent window misses
      Event(i.toLong, new Timestamp(ts("00:00").getTime + tsec * 1000L),
        1L + rnd.nextInt(6), types(rnd.nextInt(types.length)), 0.0)
    }
    // sort by event time, then swap within a 4-minute jitter window
    val ordered = events.sortBy(_.ts.getTime).toArray
    for (k <- ordered.indices.reverse) {
      val j = math.max(0, k - rnd.nextInt(4))
      if (math.abs(ordered(k).ts.getTime - ordered(j).ts.getTime) < 240000L) {
        val t = ordered(k); ordered(k) = ordered(j); ordered(j) = t
      }
    }
    val slices = ordered.grouped(17).toSeq
    val input = MemoryStream[Event]
    val q = EventStreams.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_fuzz_t").outputMode("append").start()
    try {
      slices.foreach { sl => input.addData(sl.toSeq: _*); q.processAllAvailable() }
      Seq("05:00", "06:00", "06:10").zipWithIndex.foreach { case (m, i) =>
        input.addData(Event(900L + i, ts(m), 99, "view", 0.0))
        q.processAllAvailable()
      }
      val streamed = spark.table("funnel_fuzz_t").as[EventStreams.FunnelProgress]
        .collect().filter(_.user_id != 99L)
        .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.funnel_step).max }
      val batch = events.toDF()
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1)
            .when(col("event_type") === "purchase", 2).otherwise(-1).as("lvl"))
        .where(col("lvl") >= 0)
        .groupBy("user_id")
        .agg(call_function("funnel_agg",
          col("tus"), col("lvl"), lit(3600L * 1000000L), lit(3)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      (1L to 6L).foreach { u =>
        assert(streamed.getOrElse(u, 0) === batch.getOrElse(u, 0),
          s"user $u: streamed ${streamed.get(u)} != batch ${batch.get(u)}")
      }
    } finally q.stop()
  }

  test("registry key q_stream_funnel: streamed choreography equals the batch q_funnel result") {
    // the round-9 oracle-board wiring (operators/StreamingQueries):
    // file-stream fixture + sentinel watermark advancement, run to
    // completion inside the registry fn — must reproduce the batch
    // key's distribution exactly (the same equivalence the driver's
    // DuckDB oracle gates at sf0.01)
    val reg = graft.operators.QueryRegistry.queries
    def rows(k: String) = reg(k)(spark, SparkTestBase.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows("q_stream_funnel") === rows("q_funnel"))
  }

  test("registry key q_stream_dedup: two-epoch streamed survivors equal the batch apply result") {
    val reg = graft.operators.QueryRegistry.queries
    def ids(k: String) = reg(k)(spark, SparkTestBase.sfDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("q_stream_dedup") === ids("q_dedup_apply"))
    assert(ids("q_stream_dedup").nonEmpty)
  }

  test("multi-pattern sequenceMatch: one stream pass equals N independent batch verdicts") {
    implicit val ctx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    // all four fuzz patterns through ONE keyed state (N longs + one
    // shared pending tail) — per-pattern matched sets must equal the
    // batch aggregate's verdicts, emissions at most one per
    // (user, pattern), independent across patterns
    val types = Vector("signup", "purchase", "other")
    val maskOf = Map("signup" -> 1, "purchase" -> 2)
    // includes a TIME-CONSTRAINED pattern: the streaming NFA evaluates
    // (?t…) from ONE extra long of state (lastTs — edges always
    // compare consecutive finalized events), and must still equal the
    // buffering batch aggregate
    val patterns = Seq("(?1).*(?2)", "(?1).(?2)", "(?1)(?2)", "(?2).*(?1).*(?1)",
      "(?1)(?t<=600000000)(?2)")
    val rnd = new scala.util.Random(7)
    val events = (0 until 90).map { i =>
      Event(i.toLong, new Timestamp(ts("00:00").getTime + rnd.nextInt(3600) * 1000L),
        1L + rnd.nextInt(5), types(rnd.nextInt(types.length)), 0.0)
    }
    val slices = events.sortBy(e => (e.ts.getTime, e.event_id)).grouped(23).toSeq
    val input = MemoryStream[Event]
    val q = EventStreams.streamingSequenceMatchMulti(input.toDS(), patterns, maskOf)
      .writeStream.format("memory").queryName("seqm_multi").outputMode("append").start()
    try {
      slices.foreach { sl => input.addData(sl: _*); q.processAllAvailable() }
      Seq("03:00", "04:00", "04:10").zipWithIndex.foreach { case (m, i) =>
        input.addData(Event(900L + i, ts(m), 99, "other", 0.0))
        q.processAllAvailable()
      }
      val streamedRows = spark.table("seqm_multi")
        .as[EventStreams.SeqMatchMultiProgress]
        .collect().filter(_.user_id != 99L)
      assert(streamedRows.groupBy(r => (r.user_id, r.pattern_idx))
        .forall(_._2.length == 1), "at most one emission per (user, pattern)")
      patterns.zipWithIndex.foreach { case (pat, pi) =>
        val streamed = streamedRows.filter(_.pattern_idx == pi).map(_.user_id).toSet
        val batch = events.toDF()
          .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
            coalesce(typedLit(maskOf).apply(col("event_type")), lit(0)).as("mask"))
          .groupBy("user_id")
          .agg(call_function("sequence_match_agg",
            col("tus"), col("mask"), lit(pat)).as("hit"))
          .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
        assert(streamed === batch, s"pattern $pat (idx $pi): $streamed != $batch")
      }
    } finally q.stop()
  }

  test("streaming sequenceMatch: NFA state equals batch verdict across patterns (fuzz)") {
    implicit val ctx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    // the streaming NFA carries ONE LONG of state per user (no event
    // history); equivalence with the buffering batch aggregate is the
    // whole contract — fuzz it across pattern shapes including `.`
    // (exactly-one) and mask-0 fodder rows
    val types = Vector("signup", "purchase", "other")
    val maskOf = Map("signup" -> 1, "purchase" -> 2)
    val patterns = Seq("(?1).*(?2)", "(?1).(?2)", "(?1)(?2)", "(?2).*(?1).*(?1)")
    val rnd = new scala.util.Random(7)
    val events = (0 until 90).map { i =>
      Event(i.toLong, new Timestamp(ts("00:00").getTime + rnd.nextInt(3600) * 1000L),
        1L + rnd.nextInt(5), types(rnd.nextInt(types.length)), 0.0)
    }
    val slices = events.sortBy(e => (e.ts.getTime, e.event_id)).grouped(23).toSeq
    patterns.foreach { pat =>
      val qn = s"seqm_t_${patterns.indexOf(pat)}"
      val input = MemoryStream[Event]
      val q = EventStreams.streamingSequenceMatch(input.toDS(), pat, maskOf)
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        slices.foreach { sl => input.addData(sl: _*); q.processAllAvailable() }
        Seq("03:00", "04:00", "04:10").zipWithIndex.foreach { case (m, i) =>
          input.addData(Event(900L + i, ts(m), 99, "other", 0.0))
          q.processAllAvailable()
        }
        val streamedRows = spark.table(qn).as[EventStreams.SeqMatchProgress]
          .collect().filter(_.user_id != 99L)
        assert(streamedRows.groupBy(_.user_id).forall(_._2.length == 1),
          "at most one emission per user, ever")
        val streamed = streamedRows.map(_.user_id).toSet
        val batch = events.toDF()
          .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
            coalesce(typedLit(maskOf).apply(col("event_type")), lit(0)).as("mask"))
          .groupBy("user_id")
          .agg(call_function("sequence_match_agg",
            col("tus"), col("mask"), lit(pat)).as("hit"))
          .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
        assert(streamed === batch,
          s"pattern $pat: streamed $streamed != batch $batch")
      } finally q.stop()
    }
  }
}
