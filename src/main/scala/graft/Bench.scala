package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-round benchmark main. Prints ONE JSON line:
 *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
 *
 * Forcing: each query's physical plan is executed via
 * `queryExecution.toRdd` + drain — NOT `.count()`, which would let
 * Catalyst prune projections/expressions out of the measured plan and
 * flatter every non-aggregate query.
 *
 * `native_count_1m` is the direct comparable to BASELINE.md's anchor
 * (reference: count(*) over a 1M-row Native file, 0.095 s cold
 * including process start; ours is warm query time — see BASELINE.md's
 * comparability note).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.native.NativeCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        s"${sys.props("java.io.tmpdir")}/graft_bench/warehouse")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // The sweep accumulates broadcast/shuffle garbage that
      // ContextCleaner only frees after a FULL GC clears the weak refs
      // (driver-side broadcast objects sit in old gen, which young
      // collections never touch) — left to the 30min default, later
      // queries pay eviction stalls (q_tpch_q3 5.9s mid-sweep vs 1.0s
      // fresh, r5 notes). Rounds 5-8 set this to 60s — and round 9
      // measured that each System.gc() POISONS the next several
      // seconds of execution (recorded A/B, BENCH_NOTES round-9
      // section: gc-before-every-rep walls 9.4/3.0/7.7/5.4s on a
      // plan whose steady state is 2.33s, while gc-IN-window reads
      // only 0.08-0.18s — the cost is post-GC recompilation/cleanup
      // drain, not collection time), landing at a random point every
      // 60s of sweep — i.e. preferentially inside the LONGEST keys'
      // timed windows. That is the recorded mechanism behind the r8
      // driver-sweep-only anomalies the round-9 verdict flagged
      // (scale_containment_10x 34.9 vs 7.7 isolated, q_tpch_q21 1.86
      // vs 1.08: the longer the key, the more storms its min-of-N
      // absorbs, while short isolated runs dodge them).
      // Round 9: periodic GC pushed past sweep length; cleanup instead
      // runs DETERMINISTICALLY at key boundaries (see maybeCleanup),
      // outside every timed window, with an untimed heal pass.
      .config("spark.cleaner.periodicGC.interval", "30min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // GC-in-window instrumentation (round-9 verdict item 1): the r8
    // sweep showed two keys (scale_containment_10x, q_tpch_q21) 1.7-4.5x
    // their isolated times ON THE DRIVER HOST ONLY, and the standing
    // hypothesis was collection landing inside the timed window. Every
    // measured rep now records the JVM-wide GC time that elapsed DURING
    // it; the per-key value reported is the GC seconds of the rep that
    // won the min — so a driver-sweep number that disagrees with an
    // isolated number can be attributed (or not) to GC from the JSON
    // alone, without a rerun.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var s = 0L
      gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime))
      s
    }
    // Whole-VM stall meter (round-10 end-of-round sweeps): two
    // same-binary sweeps showed 20–35 s rep excursions on keys whose
    // same-sweep minima are 1–8 s with near-zero in-window GC — i.e.
    // the VM itself pausing (hypervisor steal / host contention), a
    // mechanism the gc row CANNOT see. A daemon heartbeat sleeps 50 ms
    // in a loop; any gap between consecutive wakeups beyond 250 ms is
    // counted as stall time (GC pauses also land here — subtract the
    // separately-measured gc row to estimate pure steal). Per-rep
    // stall rides next to gc, so a driver-sweep anomaly is attributed
    // to the HOST from the JSON alone, without a rerun.
    val stallNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    locally {
      val t = new Thread(() => {
        var last = System.nanoTime()
        while (true) {
          Thread.sleep(50)
          val now = System.nanoTime()
          val gap = now - last
          if (gap > 250000000L) stallNanos.addAndGet(gap - 50000000L)
          last = now
        }
      })
      t.setDaemon(true); t.setName("graft-stall-meter"); t.start()
    }
    def stallMillis(): Long = stallNanos.get / 1000000L
    // Hypervisor-steal meter (round 12): the round-12 isolated studies
    // caught 30-39 s walls on 1.5 s plans with gc ≈ 0 AND recorded
    // stall ≈ 0 — the heartbeat only sees FREEZES (its sleeping thread
    // still wakes on time while the 32 compute threads crawl), so
    // steal-shaped degradation was invisible to every instrument. The
    // guest kernel exposes the exact quantity: /proc/stat field 8 is
    // CPU-jiffies the hypervisor withheld, summed over vCPUs (verified
    // ticking on this VM). Per-rep steal CPU-seconds ride next to
    // gc/stall; wall ≫ plan with steal ≈ wall·cpus is machine-readably
    // HOST, not plan.
    def stealJiffies(): Long = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => 0L }
    // Jiffies→seconds divisor: USER_HZ. getconf CLK_TCK is the
    // authoritative read (a kernel with a non-100 USER_HZ mapping
    // would silently mis-scale the contamination threshold); fall
    // back to the mainstream-Linux 100 if getconf is unavailable.
    val userHz: Double = try {
      // stderr merged into stdout and a bounded waitFor (ADVICE r13):
      // a getconf that blocks (stub waiting on stdin, full stderr
      // pipe) must not hang the whole bench before any timing starts —
      // the NonFatal catch cannot fire on a hang.
      val p = new ProcessBuilder("getconf", "CLK_TCK")
        .redirectErrorStream(true).start()
      p.getOutputStream.close()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      if (!p.waitFor(2, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly()
        throw new RuntimeException("getconf CLK_TCK timed out")
      }
      val v = out.toDouble
      if (v > 0) v else 100.0
    } catch { case scala.util.control.NonFatal(_) => 100.0 }
    def stealSecs(): Double = stealJiffies() / userHz
    val stealAtStart = stealSecs()
    val benchDebug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // Per-rep wall curves for every key whose winning rep exceeds ~1 s
    // (round-10, generalizing the q21 attribution discipline): the rep
    // SHAPE distinguishes first-touch JIT (rep1 big, repN small — the
    // q_dedup_minhash r9 suspect) from host contention (all reps big)
    // from a plan regression (all reps big AND sentinels clean) without
    // a rerun. Full map in bench_full.json; watch keys in the compact
    // line.
    val repsByKey = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val stallByKey = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stealByKey = scala.collection.mutable.LinkedHashMap[String, Double]()
    /** (wall, gc, stall, steal) per rep — steal in CPU-seconds summed
      * over the VM's vCPUs (divide by cpus for a wall-comparable
      * average). */
    def timeRepsFull(reps: Int, label: String = "")(f: => Unit): Seq[(Double, Double, Double, Double)] = {
      (1 to reps).map { i =>
        val g0 = gcMillis()
        val s0 = stallMillis()
        val v0 = stealSecs()
        val w = time(f)
        val g = (gcMillis() - g0) / 1e3
        val st = (stallMillis() - s0) / 1e3
        val sv = stealSecs() - v0
        if (benchDebug)
          System.err.println(f"BENCHDBG $label rep$i wall=$w%.3f gc=$g%.3f stall=$st%.3f steal=$sv%.2f")
        (w, g, st, sv)
      }
    }
    // steal is summed over the MACHINE's vCPUs regardless of how many
    // threads Spark was given, so normalize by the vCPU count from
    // /proc/stat ITSELF (count of cpuN lines) — the same source as the
    // numerator. Runtime.availableProcessors under a cgroup CPU quota
    // or -XX:ActiveProcessorCount can read lower than the vCPUs summed
    // in field 8, overestimating per-CPU steal and tripping the
    // contamination retry on noise (same hazard as SPARK_GRAFT_CPUS=8).
    val nCpus: Int = {
      val fromStat = try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().count(_.matches("cpu\\d+\\s.*")) finally src.close()
      } catch { case scala.util.control.NonFatal(_) => 0 }
      if (fromStat > 0) fromStat else Runtime.getRuntime.availableProcessors
    }
    def timeReps(reps: Int, label: String = "")(f: => Unit): (Double, Double) = {
      var samples = timeRepsFull(reps, label)(f)
      // Host-contaminated minimum: when the WINNING rep itself
      // overlapped a measured whole-VM stall — or (round 12) enough
      // hypervisor steal to be the number (avg per-CPU steal > 0.5 s
      // and > 25% of its wall) — the estimate is provably
      // host-poisoned; up to 2 extra reps buy a clean window. Bounded:
      // extras only run under detected contamination, never on a quiet
      // host, so the sweep budget is unchanged in the common case.
      def contaminated(m: (Double, Double, Double, Double)): Boolean =
        m._1 > 1.0 && (m._3 > math.max(0.5, 0.25 * m._1) ||
          m._4 / nCpus > math.max(0.5, 0.25 * m._1))
      var extras = 0
      while (extras < 2 && contaminated(samples.minBy(_._1))) {
        samples = samples ++ timeRepsFull(1, label)(f)
        extras += 1
      }
      if (label.nonEmpty && samples.map(_._1).min > 1.0)
        repsByKey(label) = samples.map(_._1)
      val win = samples.minBy(_._1)
      if (label.nonEmpty && win._3 > 0.05) stallByKey(label) = win._3
      if (label.nonEmpty && win._4 > 0.5) stealByKey(label) = win._4
      (win._1, win._2)
    }

    // JVM/codegen warmup so the first measured query isn't charged for
    // it: prime aggregation, string-expression projection, JSON, the
    // custom codegen'd expressions, and the dedup UDF/aggregate
    // families (each costs seconds the first time janino/JIT runs —
    // measured up to 4 s charged to whichever query ran first)
    (1 to 2).foreach { _ =>
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      spark.read.parquet(s"$sfDir/nation.parquet")
        .select(upper(col("n_name")), length(col("n_name")), col("n_nationkey") * 2)
        .collect()
      graft.operators.Q.events(spark, sfDir).limit(10)
        .select(get_json_object(col("props"), "$.k"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType)))))
        .collect()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      docs.selectExpr("fnv1a64(text)", "simhash64(text)").collect()
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3).collect()
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3,
        useAggregator = true).collect()
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      emb.selectExpr("vec_dot(embedding, embedding)").collect()
    }

    // Native-anchor fixtures. native_count_1m (warm count(*) over a
    // 1M-row Native file) is THE number graded against BASELINE.md
    // (reference: 0.095 s), so its measurement must be robust to
    // session-position effects observed on this host:
    //  - measured only at the END, one bad run put ALL FIVE reps at
    //    ~0.5 s (heap carries 130+ queries of GC debt);
    //  - measured only at the START, the decode loop never reaches
    //    C2-compiled steady state (~0.12 s vs 0.07 s fully warm, even
    //    after ten priming reps).
    // So each anchor is measured min-of-5 TWICE — once here (quiet
    // JVM) and once after the query sweep (fully JIT-warm) — and the
    // overall minimum reported: the repeatable cost of the plan, which
    // is what a warm-benchmark minimum estimates.
    val fx = s"${sys.props("java.io.tmpdir")}/graft_bench/native_1m"
    if (!new java.io.File(fx).exists()) {
      spark.range(1000000L).select(col("id").as("number"))
        .repartition(8)
        .write.format("clickhouse_native").mode("overwrite").save(fx)
    }
    // Zone-map pruning anchor: point lookup over a SORTED 1M-row native
    // table (range() keeps ids contiguous per partition, so every
    // block's [min,max] is disjoint). The sidecar prunes all but one
    // block at plan time — the measured cost is one block's decode, not
    // the table's.
    val fxs = s"${sys.props("java.io.tmpdir")}/graft_bench/native_1m_sorted"
    if (!new java.io.File(fxs).exists()) {
      spark.range(1000000L).select(col("id").as("number"))
        .write.format("clickhouse_native").mode("overwrite").save(fxs)
    }
    // Storage-partitioned-join anchor: two co-bucketed 1M-row catalog
    // tables join with ZERO Exchange; the identical data read path-based
    // (no layout claims) pays a full shuffle of both sides. The delta is
    // the per-query cost the bucketed layout paid once at ingest — the
    // number that grows with scale while the SPJ side stays flat.
    val wh = s"${sys.props("java.io.tmpdir")}/graft_bench/warehouse"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.bench")
    if (!new java.io.File(s"$wh/bench/spj_a").exists()) {
      spark.sql("""CREATE TABLE graft.bench.spj_a (k BIGINT, v DOUBLE)
                   USING clickhouse_native PARTITIONED BY (bucket(8, k))""")
      spark.sql("""CREATE TABLE graft.bench.spj_b (k BIGINT, w DOUBLE)
                   USING clickhouse_native PARTITIONED BY (bucket(8, k))""")
      spark.range(1000000L).select(col("id").as("k"), (col("id") * 2.0).as("v"))
        .writeTo("graft.bench.spj_a").append()
      spark.range(1000000L).select(col("id").as("k"), (col("id") * 3.0).as("w"))
        .writeTo("graft.bench.spj_b").append()
    }

    // Per-anchor thunks (round 12, verdict item 2): the anchors join
    // the quietFloor/remeasure instruments, so each must be
    // re-measurable INDIVIDUALLY at sweep end — the BASELINE.md gate
    // number can never again arrive 2.6× over gate with zero in-round
    // attribution (r11: driver native_count_1m 0.2503 vs the 0.0747
    // same-binary quiet value, no in-sweep evidence either way). The
    // join anchors pin their strategy themselves (broadcast off) so a
    // single-anchor remeasure reproduces the sweep's plan exactly.
    def pinnedJoin(f: => Unit): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try f finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    val anchorDefs: Seq[(String, () => Unit)] = Seq(
      "native_count_1m" -> (() =>
        spark.read.format("clickhouse_native").load(fx)
          .agg(count(lit(1)).as("cnt")).collect()),
      "native_point_lookup_1m" -> (() =>
        spark.read.format("clickhouse_native").load(fxs)
          .filter(col("number") === 777777L)
          .agg(count(lit(1)).as("cnt")).collect()),
      "native_spj_join_1m" -> (() => pinnedJoin {
        force(spark.table("graft.bench.spj_a").join(spark.table("graft.bench.spj_b"), "k")
          .select(col("k"), (col("v") + col("w")).as("x")))
      }),
      "native_shuffle_join_1m" -> (() => pinnedJoin {
        val pa = spark.read.format("clickhouse_native").load(s"$wh/bench/spj_a")
        val pb = spark.read.format("clickhouse_native").load(s"$wh/bench/spj_b")
        force(pa.join(pb, "k").select(col("k"), (col("v") + col("w")).as("x")))
      }))
    val anchorThunks = anchorDefs.toMap
    /** min-of-5 over one anchor. */
    def measureAnchor(name: String): Double =
      (1 to 5).map(_ => time(anchorThunks(name)())).min
    /** One min-of-5 pass over the four native anchors. */
    def measureAnchors(): Map[String, Double] =
      anchorDefs.map { case (n, _) => n -> measureAnchor(n) }.toMap
    val anchorsEarly = measureAnchors()

    // Each query is measured twice and the MINIMUM reported: single-shot
    // warm timings on this host swing up to ~5× from one-off JIT
    // compiles, GC pauses, and host scheduling noise (observed on
    // identical binaries run minutes apart); min-of-2 is the standard
    // warm-benchmark estimator for the repeatable cost of the plan.
    // TPC-H keys (and q_union_all, the fourth key in round 4's noisy
    // set) get min-of-3: round 3→4 showed ±30-40% swings on sub-second
    // shapes whose builders hadn't changed, so they need one more
    // sample to separate plan regressions from host noise.
    // SPARK_GRAFT_BENCH_ONLY="q_tpch_q3,q_tpch_q5" restricts the sweep
    // for local iteration; the driver always runs the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Deterministic heap hygiene (round 9; replaces the r8 per-key
    // forced GC, which was measured to POISON the following reps:
    // recorded A/B in BENCH_NOTES round-9 section — ngram with a
    // System.gc() immediately before every rep benched 9.4/3.0/7.7/
    // 5.4 s against a 2.33 s steady state without, while gc-in-window
    // read only 0.08-0.18 s, so the cost is post-GC execution
    // slowdown, invisible to GC accounting and therefore the WORST
    // kind of measurement pollution). Cleanup now runs at KEY
    // BOUNDARIES, at most once per ~90 s of sweep: a full GC (frees
    // the driver-held broadcast/shuffle weak refs so ContextCleaner
    // can RPC the removals — the r5 heap-debt problem stays solved)
    // followed by an untimed heal pass absorbing the bulk of the
    // poison; the FIRST key measured after a cleanup gets one extra
    // rep so min-of-N lands beyond the residual (recorded heal curve:
    // first rep after one GC 3.11 s vs 2.33 steady).
    var lastCleanupNs = System.nanoTime()
    def maybeCleanup(): Boolean = {
      if ((System.nanoTime() - lastCleanupNs) / 1e9 < 90.0) false
      else {
        System.gc()
        (1 to 2).foreach { _ =>
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1))).collect()
          spark.read.parquet(s"$sfDir/documents.parquet").limit(2000)
            .selectExpr("fnv1a64(text)", "shingle_array(text, 3)").collect()
        }
        lastCleanupNs = System.nanoTime()
        true
      }
    }
    // Per-key GC seconds inside the winning rep's timed window (full
    // map in the bench_full.json sidecar; disputed keys in the compact
    // line) — the round-9 verdict's attribution instrument: a sweep
    // number that disagrees with an isolated number now carries the
    // evidence of whether collection landed inside it.
    val gcByKey = scala.collection.mutable.LinkedHashMap[String, Double]()
    // Noise sentinels: a fixed trivial probe (count(*) over lineitem)
    // timed single-shot immediately BEFORE and AFTER each expensive key
    // — host contention inflates the sentinels alongside the key,
    // while a plan regression inflates only the key.
    // Round-10 (verdict item 2): generalized from the 2 hand-picked
    // disputed keys to EVERY key whose round-9 driver sweep exceeded
    // ~0.9 s (scale_join_10x's third flip-flop and q_dedup_minhash's
    // uninstrumented 10.2 s proved hand-picking loses the race) — so
    // no future driver anomaly on an expensive key arrives without
    // pre/post contention evidence. Keys not in this list that still
    // measure > 1 s this sweep get a dynamic POST probe (pre is
    // unknowable after the fact; post + gc + rep curve still
    // attributes). Probe overhead: ~0.1 s × ~100 probes ≈ 10 s,
    // outside every timed window.
    val sentinelAround = Set(
      // disputed/watch keys (rounds 8-9)
      "q_tpch_q21", "scale_containment_10x", "q_dedup_minhash",
      "scale_join_10x",
      // every remaining key > ~0.9 s in the round-9 driver sweep
      "q_dedup_minhash_grouped", "scale_spans_10x", "q_knn_graph_hier",
      "q_stream_asof", "q_stream_funnel", "scale_cc_10x",
      "q_stream_sequence_match", "q_knn_graph", "scale_knn_10x",
      "scale_ivfpq_10x", "q_stream_dedup", "q_dedup_apply",
      "q_dedup_ngram", "scale_knn_hier_10x", "q_agg_rank_corr",
      "scale_spans_1x", "q_dedup_clusters", "scale_dedup_10x",
      "scale_ivfpq_1x", "scale_cc_1x", "scale_semdedup_10x",
      "q_dedup_containment", "q_bm25_index_persist",
      "q_fn_array_transform", "q_boilerplate_strip", "scale_knn_hier_1x",
      "scale_knn_1x", "q_sim_cosine_ivfpq", "scale_containment_1x",
      "q_decontaminate", "scale_bm25_10x", "q_dedup_embedding_exact",
      "scale_semdedup_1x", "q_sim_index_persist", "q_dsir_resample",
      "q_dedup_incremental", "q_dsir_weights", "q_bpe_encode",
      "q_graph_triangles", "q_lm_perplexity", "q_engine_mutate",
      "q_dedup_semdedup_incremental", "q_agg_quantile_weighted",
      "q_dedup_spans", "scale_dedup_1x",
      // round-10 sweep crossers (both read ~3x their isolated 1.2/1.4 s
      // mid-sweep with inflated sentinels around them — positional, but
      // now fully pre/post-instrumented)
      "q_dedup_semdedup")
    val sentinels = scala.collection.mutable.LinkedHashMap[String, Double]()
    def sentinelProbe(tag: String): Unit =
      sentinels(tag) = time {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .agg(count(lit(1)).as("cnt")).collect()
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val cleaned = maybeCleanup()
      // Slow-JIT keys: the recorded rep curves (BENCH_NOTES round-9 —
      // isolated ngram 5.97/4.62/2.33/2.35; in-sweep debug ngram
      // 4.78/3.70, knn_graph_hier 7.55/6.63) show these plans need a
      // THIRD rep to reach the steady state min-of-N estimates, even
      // after the warmup block — their janino/codegen footprint is the
      // largest in the registry. Min-of-2 reported first-touch compile
      // cost (ngram 5.5 in-sweep vs 2.33 isolated steady), not the
      // repeatable cost of the plan.
      // q_dedup_minhash[_grouped] added round 10 (verdict item 1): the
      // r9 driver sweep read 10.23 s against a 1.6-2.1 s isolated rep
      // curve (rep1 2.08, rep2 1.64 — measured this round) with
      // scale_dedup_10x IMPROVING in the same sweep, so the plan is
      // linear and the in-sweep number was first-touch/positional; a
      // third rep plus the new sentinel+rep instruments make any
      // recurrence attributable from BENCH_r10.json alone.
      val slowWarm = Set("q_dedup_ngram", "q_dedup_containment",
        "q_knn_graph", "q_knn_graph_hier",
        "q_dedup_minhash", "q_dedup_minhash_grouped",
        // round-10: same positional signature as minhash (in-sweep
        // ~2.5x their isolated 1.2/1.4 s steady state on min-of-2)
        "q_dedup_semdedup", "q_dedup_semdedup_incremental")
      val baseReps =
        if (name.startsWith("q_tpch_") || name == "q_union_all" ||
          slowWarm(name)) 3
        else 2
      // q_stream_* keys run a full Structured Streaming choreography
      // (5+ micro-batches, sentinel-file watermark advancement, temp
      // checkpoint dirs) per invocation — wall time is micro-batch
      // scheduling, not operator throughput, and each invocation is
      // already an internal multi-run. One rep; they are correctness
      // keys first (round-9 verdict item 4), not perf-graded shapes.
      val reps =
        if (name.startsWith("q_stream_")) 1
        else baseReps + (if (cleaned) 1 else 0)
      if (sentinelAround(name)) sentinelProbe(s"${name}_pre")
      val r = name -> (try {
        val (w, g) = timeReps(reps, name)(force(fn(spark, sfDir)))
        gcByKey(name) = g
        w
      } catch { case _: Throwable => -1.0 })
      // dynamic coverage: a key that newly crossed 1 s still gets a
      // post probe (+ its rep curve via repsByKey) even if the static
      // list predates it
      if (sentinelAround(name) || r._2 > 1.0) sentinelProbe(s"${name}_post")
      r
    }

    // Scale points: the same plan at 1× and at a synthetic 10× (union of
    // ten id-shifted copies — key arithmetic keeps joins aligned and, for
    // documents, a per-copy character substitution keeps copies mutually
    // dissimilar; see docsAt).
    // The 10×/1× ratio is the evidence the shapes scale: a single-shuffle
    // aggregate or a broadcast-dim join should grow sub-linearly on this
    // host (fixed job overhead amortizes), and nothing should go
    // super-linear — that would flag a shuffle or candidate explosion
    // that 100 TB would amplify.
    val keyShift = 100000000L
    def lineitemAt(copies: Int) = {
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      (0 until copies).map(i =>
        l.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift)))
        .reduce(_ unionByName _)
    }
    def ordersAt(copies: Int) = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      (0 until copies).map(i =>
        o.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift)))
        .reduce(_ unionByName _)
    }
    // Each document copy gets a DISTINCT character substitution (a
    // rotation of a 10-letter alphabet — identity for copy 0), so copies
    // of the same source are mutually DISSIMILAR (shared shingles ~0):
    // a mere " copyN" suffix would leave the ten copies near-duplicates
    // of each other (Jaccard ≈ 1 ≥ threshold) and manufacture C(10,2)
    // verified pairs per source doc — super-linear growth by data
    // construction, masking exactly the plan-level explosion the ratio
    // gate below watches for. Within a copy the mapping is uniform, so
    // the 1× duplicate-pair structure is preserved verbatim: expected
    // pairs at 10× = 10 × pairs at 1× — linear.
    def docsAt(copies: Int) = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val alpha = "abcdefghij"
      (0 until copies).map { i =>
        val mapped = if (i == 0) col("text")
          else translate(col("text"), alpha, alpha.drop(i) + alpha.take(i))
        d.select((col("doc_id") + lit(i * keyShift)).as("doc_id"), mapped.as("text"))
      }.reduce(_ unionByName _)
    }
    def scaleAgg(copies: Int) = lineitemAt(copies)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("cnt"))
    // NOTE: measured with auto-broadcast OFF (see scalePoints below).
    // At 1× the orders side (~6 MB) broadcasts but at 10× (~60 MB) it
    // flips to sort-merge — the 10×/1× ratio would then compare two
    // STRATEGIES, not one strategy's scaling (observed as a spurious
    // ratio-20 gate trip, r5). Pinning both points to the shuffle join
    // makes the ratio measure what the gate watches: shuffle scaling.
    def scaleJoin(copies: Int) = lineitemAt(copies)
      .join(ordersAt(copies), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    def scaleDedup(copies: Int) = graft.operators.Dedup.minhashPairs(
      docsAt(copies), "doc_id", "text", threshold = 0.5)
    // SemDeDup scaling: cluster COUNT scales with the data (cluster =
    // (label, copy)) — the paper's own scale knob (nlist ∝ N keeps
    // per-cluster size, hence the by-design quadratic, constant), so
    // the ratio gate measures the plan's scaling, not the algorithm's
    // intentional within-cluster pair cost. Copies rotate the vector
    // by i dims: copies of one source are mutually background-similar
    // (never manufactured near-dups), each copy preserves the 1×
    // intra-copy structure verbatim.
    def embAt(copies: Int) = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until copies).map { i =>
        val emb = if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, 64 - i),
            slice(col("embedding"), 1, i))
        e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"),
          concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
          emb.as("embedding"))
      }.reduce(_ unionByName _)
    }
    def scaleSemdedup(copies: Int) = graft.operators.Dedup.semDeDup(
      embAt(copies), "vec_id", "embedding", "cluster", eps = 0.95)
    // kNN-graph scaling runs the APPROXIMATE regime (fixed nprobe,
    // nlist ∝ N — the production knob): per-cell size stays constant,
    // so candidate pairs grow ∝ N·nprobe·cellsize = linearly. The
    // exact-gate regime the ORACLE key runs (nprobe = nlist) is N² by
    // design and would trip any ratio gate — it exists to prove the
    // semantics, not the scaling; THIS point proves the scaling.
    def scaleKnn(copies: Int) = graft.operators.Similarity.knnGraph(
      embAt(copies).select(col("vec_id"), col("embedding")),
      k = 3, nlist = 16 * copies, nprobe = 4, trainFraction = 0.5)
    // BM25 scaling: the query-term set is FIXED while the corpus grows
    // (how retrieval actually scales) — the measured cost is the corpus
    // tokenize+explode pass with the term filter running before any
    // shuffle; rotated copies keep the posting rows for the query terms
    // ~1×, so the point isolates the corpus-pass cost the plan must
    // keep linear.
    def scaleBm25(copies: Int) = graft.operators.TextPipeline.bm25TopK(
      docsAt(copies), "doc_id", "text", Seq("dup", "merge", "window"), k = 10)
    // Containment scaling: same dissimilar-copy discipline as
    // scale_dedup — intra-copy containment structure is preserved
    // verbatim per copy (expected pairs 10× = 10 × 1×, linear), so a
    // super-linear ratio means the one-sided prefix join's candidate
    // set exploded, not the data.
    def scaleContainment(copies: Int) = graft.operators.Dedup
      .containmentPairsExact(docsAt(copies), "doc_id", "text", theta = 0.9)
    // IVF-PQ scaling runs the APPROXIMATE production regime (sampled
    // codebook, fixed nprobe, nlist ∝ N — same knob discipline as
    // scale_knn): per-cell size stays constant so candidate pairs per
    // query stay constant; the corpus-proportional costs are the
    // codebook train pass and the encode argmin — both single passes.
    // The query set is FIXED while the corpus grows (how serving
    // scales), like scale_bm25. The exact-gate regime the ORACLE key
    // runs (nprobe = nlist, lossless codebook) is brute force by
    // design; THIS point proves the scaling.
    // hierRouting (round 8): the flat encode argmin is O(N·nlist) —
    // quadratic under this point's own nlist ∝ N knob (the 100× cert
    // caught it on the kNN shape; same router, same fix). The probe
    // side is query-bounded here, so routing is the only change.
    def scaleIvfpq(copies: Int) = graft.operators.Similarity.ivfPqTopK(
      embAt(copies).select(col("vec_id"), col("embedding")),
      embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
      k = 10, nlist = 16 * copies, nprobe = 4, m = 4,
      codebook = null, lossless = false, trainFraction = 0.5,
      hierRouting = true)
    // kNN graph via the TWO-LEVEL router (Similarity.knnGraphHier) —
    // same knob discipline as scale_knn (nlist ∝ N, fixed nprobe), but
    // encode/probe are O(√nlist) per-row expressions instead of the
    // flat form's O(N·nlist) argmin + probe-ranking window. The 100×
    // certification measured the flat form at a 152× wall ratio on
    // 100× data (the quadratic router); this point watches the fix.
    def scaleKnnHier(copies: Int) = graft.operators.Similarity.knnGraphHier(
      embAt(copies).select(col("vec_id"), col("embedding")),
      k = 3, nlist = 16 * copies, nprobe = 4, superProbe = 2,
      trainCap = math.max(100000, 16 * copies))
    // Span dedup (ExactSubstr) scaling: the dissimilar-copy discipline
    // keeps each copy's segment texts disjoint (per-copy character
    // substitution), so first-occurrence structure is preserved
    // verbatim per copy — kept segments grow exactly linearly; the
    // point watches the two thin shuffles (segment min-occurrence,
    // doc reassembly) staying linear. 100× cert: ratio 40.9 at counts
    // exactly 100.0× (BENCH_NOTES round-9).
    def scaleSpans(copies: Int) = graft.operators.Dedup.spanDedup(
      docsAt(copies), "doc_id", "text", w = 8)
    // Connected-components scaling: edges = the MinHash pairs of the
    // C× corpus (disjoint copies ⇒ same component diameters ⇒ SAME
    // convergence-round count — pinned in LlmOpsSpec); per-round cost
    // is two shuffle joins over the edge set. Pair generation is part
    // of the measured plan here (unlike the cert, which isolates the
    // clustering); the gate still watches the composite staying
    // far from quadratic. 100× cert: clustering alone ratio 3.2.
    def scaleCc(copies: Int) = graft.operators.DedupClusters.assign(
      graft.operators.Dedup.minhashPairs(docsAt(copies), "doc_id", "text",
        threshold = 0.5).select(col("id_a"), col("id_b")))
    val scaleDefs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "scale_agg_1x" -> (() => scaleAgg(1)), "scale_agg_10x" -> (() => scaleAgg(10)),
      "scale_join_1x" -> (() => scaleJoin(1)), "scale_join_10x" -> (() => scaleJoin(10)),
      "scale_dedup_1x" -> (() => scaleDedup(1)), "scale_dedup_10x" -> (() => scaleDedup(10)),
      "scale_semdedup_1x" -> (() => scaleSemdedup(1)),
      "scale_semdedup_10x" -> (() => scaleSemdedup(10)),
      "scale_knn_1x" -> (() => scaleKnn(1)),
      "scale_knn_10x" -> (() => scaleKnn(10)),
      "scale_knn_hier_1x" -> (() => scaleKnnHier(1)),
      "scale_knn_hier_10x" -> (() => scaleKnnHier(10)),
      "scale_bm25_1x" -> (() => scaleBm25(1)),
      "scale_bm25_10x" -> (() => scaleBm25(10)),
      "scale_containment_1x" -> (() => scaleContainment(1)),
      "scale_containment_10x" -> (() => scaleContainment(10)),
      "scale_ivfpq_1x" -> (() => scaleIvfpq(1)),
      "scale_ivfpq_10x" -> (() => scaleIvfpq(10)),
      "scale_spans_1x" -> (() => scaleSpans(1)),
      "scale_spans_10x" -> (() => scaleSpans(10)),
      "scale_cc_1x" -> (() => scaleCc(1)),
      "scale_cc_10x" -> (() => scaleCc(10)))
    val scaleMakers = scaleDefs.toMap
    val scalePoints = scaleDefs
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, mk) =>
        val pinShuffleJoin = name.startsWith("scale_join")
        if (pinShuffleJoin)
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // Same deterministic boundary hygiene as the oracle sweep (see
        // maybeCleanup): the r8 per-point System.gc() here poisoned
        // the very ratio-gate numerators it was protecting.
        val cleaned = maybeCleanup()
        if (sentinelAround(name)) sentinelProbe(s"${name}_pre")
        val r = try {
          // min-of-3, same discipline as TPC-H: the 10×/1× ratio gate
          // divides two of these numbers, so a single noise excursion
          // on either point (observed up to 5×, r6 round notes) first
          // polluted a round verdict before min-of-3 was extended here.
          name -> (try {
            val (w, g) = timeReps(3 + (if (cleaned) 1 else 0), name)(force(mk()))
            gcByKey(name) = g
            w
          } catch { case _: Throwable => -1.0 })
        } finally if (pinShuffleJoin)
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        if (sentinelAround(name) || r._2 > 1.0) sentinelProbe(s"${name}_post")
        r
      }

    // ---- Workload-count instruments (round 11, verdict item 3) ----
    // The wall-clock ratio gate needs a retry to distinguish plan
    // explosions from host storms; workload COUNTS need neither — they
    // are deterministic run to run (deterministic data, deterministic
    // hashing) and exactly linear by data construction (docsAt's
    // per-copy substitution keeps copies mutually dissimilar), so a
    // candidate/pair/segment count growing super-linearly flags a plan
    // or data-construction explosion REGARDLESS of wall time, and a
    // linear count clears a slow wall number as noise. Counted outside
    // every timed window; the gate below fails on count ratio > 12
    // (expected exactly ~10) with no retry — a count cannot storm.
    //   dedup       → LSH banding candidate pairs (pre-verification:
    //                 the quantity that explodes if banding degenerates)
    //   containment → prefix-join candidate pairs (pre-verification)
    //   cc          → connected-components assignment rows (the full
    //                 edge+iterate pipeline's output cardinality)
    //   spans       → total w-token segments (sum of n_seg)
    // Round 12 (verdict item 3) extends coverage to the remaining
    // countable families — ivfpq was the ONLY family whose cert rested
    // on wall alone:
    //   bm25        → post-term-filter posting rows; the query set is
    //                 FIXED while the corpus grows, so expected ratio
    //                 ≈ 1 (per-query serving cost, corpus-independent)
    //   semdedup    → within-cluster rank-join candidate pairs (the
    //                 algorithm's by-design Σ cᵢ² work; drops would
    //                 read 0 on the natural corpus — BENCH_NOTES r9);
    //                 cluster structure preserved per copy ⇒ ~10×
    //   knn         → probed-cell candidate pairs (flat KMeans cells;
    //                 nlist ∝ N keeps per-cell size ~constant ⇒ ~10×,
    //                 with cell-balance wiggle — the gate's wlMaxRatio
    //                 map sets per-family ceilings)
    //   knn_hier    → same via the two-level router (deterministic
    //                 hash-ranked train sample)
    //   ivfpq       → probe×cell candidate rows over the FIXED
    //                 20-query set ⇒ expected ratio ≈ 1
    val wlCounts = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    // An instrument that THROWS records (-1, -1) instead of silently
    // vanishing from the map: an AnalysisException here (renamed
    // column, broken builder) is exactly the collapse class the gate
    // below hunts, so it must trip the round, not erase its own
    // coverage (round-12 self-review).
    def wlPair(fam: String)(mk: Int => Long): Unit =
      if (only.isEmpty) // full sweeps only — iteration runs skip the cost
        try wlCounts(fam) = (mk(1), mk(10))
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"WL INSTRUMENT THREW for $fam: $e")
          wlCounts(fam) = (-1L, -1L)
        }
    wlPair("dedup") { c =>
      graft.operators.Dedup.minhashCandidates(docsAt(c), "doc_id", "text").count()
    }
    wlPair("containment") { c =>
      graft.operators.Dedup.containmentCandidates(
        docsAt(c), "doc_id", "text", theta = 0.9).count()
    }
    wlPair("cc") { c => scaleCc(c).count() }
    wlPair("spans") { c =>
      scaleSpans(c).agg(sum(col("n_seg"))).collect()(0).getLong(0)
    }
    wlPair("bm25") { c =>
      graft.operators.TextPipeline.bm25Candidates(
        docsAt(c), "doc_id", "text", Seq("dup", "merge", "window")).count()
    }
    wlPair("semdedup") { c =>
      graft.operators.Dedup.semDeDupCandidates(
        embAt(c), "vec_id", "embedding", "cluster").count()
    }
    wlPair("knn") { c =>
      graft.operators.Similarity.knnGraphCandidates(
        embAt(c).select(col("vec_id"), col("embedding")),
        nlist = 16 * c, nprobe = 4, trainFraction = 0.5).count()
    }
    wlPair("knn_hier") { c =>
      graft.operators.Similarity.knnGraphHierCandidates(
        embAt(c).select(col("vec_id"), col("embedding")),
        nlist = 16 * c, nprobe = 4, superProbe = 2,
        trainCap = math.max(100000, 16 * c)).count()
    }
    wlPair("ivfpq") { c =>
      graft.operators.Similarity.ivfPqCandidates(
        embAt(c).select(col("vec_id"), col("embedding")),
        embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
        nlist = 16 * c, nprobe = 4, trainFraction = 0.5,
        hierRouting = true).count()
    }
    // Round 13 (verdict item 4) — the last countable families:
    //   join → join OUTPUT rows (the probe-side cardinality the
    //          shuffle join materializes; per-copy disjoint keys ⇒
    //          exactly 10×; a key-construction bug that cross-matched
    //          copies would read ~100×)
    //   agg  → output GROUP count (constant 6 on this schema ⇒ ratio
    //          ~1; growth means the grouping keys themselves exploded)
    //   bpe  → pass-1 distinct adjacent-pair cardinality (the per-pass
    //          aggregate state + top-M collect input; VOCAB-bounded,
    //          not corpus-sized — the rotation boundaries mint new
    //          pairs, but the set is the union of ≤10 rotations of a
    //          fixed charset, so the ratio SATURATES below ~6 (measured
    //          3.84× on this fixture) rather than growing with the
    //          corpus — see the wlMaxRatio rationale below)
    // NOT instrumented: pq_train/encode — its historical failure mode
    // (the flat O(N·nlist) argmin under nlist ∝ N, caught by the 100×
    // cert) is a COMPUTE-shape quadratic with row counts that stay
    // exactly N; a cardinality instrument would read 10.0 through the
    // regression and certify nothing. That family stays wall+cert
    // covered (scale_ivfpq + the 100× table) by design.
    wlPair("join") { c =>
      lineitemAt(c).join(ordersAt(c),
        col("l_orderkey") === col("o_orderkey")).count()
    }
    wlPair("agg") { c => scaleAgg(c).count() }
    wlPair("bpe") { c =>
      graft.operators.TextPipeline.bpePairCount(docsAt(c), "text")
    }

    // ---- Suspect re-measure (round 11, verdict items 1-2) ----------
    // A storm can inflate EVERY rep of a min-of-3 key (r10:
    // scale_dedup_10x [14.1, 19.6, 16.6] in the driver sweep vs a
    // 2.9 s isolated steady floor on a quiet host, and scale_cc_1x
    // 11.4 vs 1.9 — tools/dedup_cc_repeat.scala, 9 reps each, zero
    // stall, zero heap ratchet). The sweep value always stands; any
    // instrumented key that measured > 3× its recorded quiet-host
    // floor is re-measured min-of-2 at the END of the sweep and
    // reported under "remeasure" — in-round attribution: sweep ≫
    // remeasure ⇒ storm window; both slow ⇒ plan. Floors are the best
    // quiet-host values on record (isolated studies + clean sweeps);
    // they are suspicion triggers only, never gates, so a plan change
    // that legitimately slows a key just costs one extra measurement.
    val quietFloor = Map(
      // the four BASELINE-adjacent anchors (round 12, verdict item 2):
      // the one number BASELINE.md is gated on must never again arrive
      // 2.6× over gate with no in-round attribution (r11). Floors are
      // best quiet-host values on record (BENCH_NOTES rounds 5-11:
      // count 0.048-0.075, point 0.071-0.098, spj 0.239, shuffle 0.39).
      "native_count_1m" -> 0.065, "native_point_lookup_1m" -> 0.07,
      "native_spj_join_1m" -> 0.20, "native_shuffle_join_1m" -> 0.35,
      "q_count_star" -> 0.10,
      "scale_agg_1x" -> 0.15, "scale_agg_10x" -> 0.35,
      "scale_join_1x" -> 0.35, "scale_join_10x" -> 1.2,
      "scale_dedup_1x" -> 0.9, "scale_dedup_10x" -> 2.9,
      "scale_semdedup_1x" -> 0.8, "scale_semdedup_10x" -> 2.5,
      "scale_knn_1x" -> 1.8, "scale_knn_10x" -> 5.0,
      "scale_knn_hier_1x" -> 1.7, "scale_knn_hier_10x" -> 2.4,
      "scale_bm25_1x" -> 0.4, "scale_bm25_10x" -> 0.95,
      "scale_containment_1x" -> 2.6, "scale_containment_10x" -> 6.0,
      "scale_ivfpq_1x" -> 2.2, "scale_ivfpq_10x" -> 4.0,
      "scale_spans_1x" -> 0.7, "scale_spans_10x" -> 2.7,
      "scale_cc_1x" -> 1.9, "scale_cc_10x" -> 3.6,
      "q_dedup_minhash" -> 1.1, "q_dedup_minhash_grouped" -> 0.9,
      "q_dedup_containment" -> 1.6, "q_dedup_ngram" -> 2.3,
      "q_dedup_semdedup" -> 1.1, "q_dedup_semdedup_incremental" -> 1.4,
      "q_knn_graph" -> 4.0, "q_knn_graph_hier" -> 6.0,
      "q_tpch_q21" -> 0.9)
    // Second anchor pass, now fully JIT-warm; report the overall min
    // (see the fixture-block comment for why both passes exist). Runs
    // BEFORE the suspect re-measure so the anchors' combined minima
    // can trigger (and be re-measured by) the instrument below.
    val anchorsLate = measureAnchors()
    val anchors = anchorsEarly.map { case (k, v) => k -> math.min(v, anchorsLate(k)) }

    val sweepByName = (results ++ scalePoints).toMap ++ anchors
    // Round 12 (verdict item 2): each re-measure window is SELF-
    // ATTRIBUTING — its own pre/post trivial-probe sentinel plus the
    // whole-VM stall seconds that elapsed inside the window ride next
    // to the value, so "both sweep and remeasure slow" can no longer
    // falsely pattern-match "plan" when the host is degraded at END of
    // sweep (exactly what r11's q_dedup_semdedup 23.3 and
    // scale_bm25_10x 10.4 readings did). Decision rule now:
    //   remeasure fast                              ⇒ sweep was a storm
    //   remeasure slow + sentinels/stall/steal dirty ⇒ host still degraded
    //   remeasure slow + sentinels ~0.1, stall 0, steal ~0 ⇒ plan — investigate
    val remeasured =
      scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Double, Double)]()
    if (only.isEmpty) {
      val suspects = quietFloor.toSeq.flatMap { case (k, floor) =>
        sweepByName.get(k).filter(v => v > 3 * floor).map(v => (k, v / floor))
      }.sortBy(-_._2).take(6)
      if (suspects.nonEmpty) {
        // Untimed heal pass first: the round-12 positional study
        // measured suspects running ~2x their floors immediately after
        // the heavy wl-count pass even at steal 0 (BENCH_NOTES) — the
        // same post-heavy-neighbor drain maybeCleanup exists for. One
        // GC + two trivial queries keep that inflation out of the
        // attribution readings.
        System.gc()
        (1 to 2).foreach { _ =>
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1))).collect()
        }
      }
      suspects.foreach { case (k, infl) =>
        val pin = k.startsWith("scale_join")
        if (pin) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val pre = time {
            spark.read.parquet(s"$sfDir/lineitem.parquet")
              .agg(count(lit(1)).as("cnt")).collect()
          }
          val s0 = stallMillis()
          val v0 = stealSecs()
          val re =
            if (anchorThunks.contains(k)) (1 to 2).map(_ => measureAnchor(k)).min
            else {
              val mk: () => org.apache.spark.sql.DataFrame =
                scaleMakers.get(k).getOrElse(() =>
                  SparkEntry.queries(k)(spark, sfDir))
              timeRepsFull(2)(force(mk())).map(_._1).min
            }
          val st = (stallMillis() - s0) / 1e3
          val sv = stealSecs() - v0
          val post = time {
            spark.read.parquet(s"$sfDir/lineitem.parquet")
              .agg(count(lit(1)).as("cnt")).collect()
          }
          remeasured(k) = (re, pre, post, st, sv)
          System.err.println(
            f"SUSPECT REMEASURE $k: sweep=${sweepByName(k)}%.2f (${infl}%.1fx floor) " +
              f"remeasure=$re%.2f pre=$pre%.3f post=$post%.3f stall=$st%.2f steal=$sv%.2f")
        } catch { case scala.util.control.NonFatal(_) => () }
        finally if (pin) spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val all = results ++ scalePoints ++ anchors.toSeq.sortBy(_._1)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    // The FULL per-key map exceeds the harness's stdout-tail capture
    // (2000 chars), and rounds 1-5 showed the driver parses a
    // TRUNCATED stdout line → BENCH_r*.json parsed=null. So stdout now
    // carries EXACTLY ONE compact, always-<2000-char JSON line (first
    // line == last line == parseable wherever the driver reads), and
    // the full map goes to stderr plus the target/bench_full.json
    // sidecar for round-over-round key diffing.
    def j(v: Double): String = if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // gc: per-key GC seconds inside the winning rep's window;
    // sentinel: trivial-probe wall times bracketing the disputed keys.
    val gcMap = gcByKey.map { case (k, v) => "\"" + k + "\":" + j(v) }
      .mkString("{", ",", "}")
    val sentMap = sentinels.map { case (k, v) => "\"" + k + "\":" + j(v) }
      .mkString("{", ",", "}")
    val repsMap = repsByKey.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(j).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val stallMap = stallByKey.map { case (k, v) => "\"" + k + "\":" + j(v) }
      .mkString("{", ",", "}")
    val stealMap = stealByKey.map { case (k, v) => "\"" + k + "\":" + j(v) }
      .mkString("{", ",", "}")
    // workload counts + suspect re-measures (round 11): small maps,
    // included verbatim in BOTH lines — wl is the count gate's
    // evidence, remeasure is the in-round storm/plan attribution.
    // Round 12: remeasure entries are [value, pre_sentinel,
    // post_sentinel, stall_sec, steal_cpu_sec] — the window's own
    // host-state stamp (verdict item 2; steal added after the isolated
    // studies caught 30-39 s walls with stall ≈ 0 — steal-shaped
    // degradation the heartbeat cannot see); the compact line falls
    // back to value-only under the 2000-char budget (full arrays
    // always in the stderr line + bench_full.json).
    val wlJson = wlCounts.map { case (k, (c1, c10)) =>
      "\"" + k + "\":[" + c1 + "," + c10 + "]" }.mkString("{", ",", "}")
    val remJson = remeasured.map { case (k, (v, pre, post, st, sv)) =>
      "\"" + k + "\":[" + j(v) + "," + j(pre) + "," + j(post) + "," + j(st) +
        "," + j(sv) + "]" }
      .mkString("{", ",", "}")
    val remJsonVals = remeasured.map { case (k, (v, _, _, _, _)) =>
      "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","hz":$userHz,"vcpus":$nCpus,"queries":$qs,"gc":$gcMap,"stall":$stallMap,"steal":$stealMap,"sentinel":$sentMap,"reps":$repsMap,"wl":$wlJson,"remeasure":$remJson,"sf":"$sfDir"}"""
    System.err.println(fullLine)
    // sidecars are written only for FULL sweeps: a filtered
    // SPARK_GRAFT_BENCH_ONLY iteration run must not clobber the last
    // full sweep's evidence files (it did once, round 10)
    try if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () } // sidecar is best-effort
    val headliners = Seq("q_tpch_q1", "q_tpch_q21", "q_dedup_minhash",
      "q_sim_cosine_ivf", "q_count_star")
    val byNameAll = all.toMap
    val compactKeys = (anchors.keys.toSeq.sorted ++
      scalePoints.map(_._1) ++ headliners.filter(byNameAll.contains))
    val cqs = compactKeys.map(k => "\"" + k + "\":" + j(byNameAll(k)))
      .mkString("{", ",", "}")
    // TPC-H visibility in the 2000-char tail: min/p50/max over the 22
    // TPC-H keys so round-over-round TPC-H regressions are judgeable
    // without the sidecar.
    val tpch = results.collect { case (k, v) if k.startsWith("q_tpch_") && v >= 0 => v }
      .sorted
    val tpchStats = if (tpch.isEmpty) ""
      else s""","tpch":{"n":${tpch.size},"min":${j(tpch.head)},"p50":${j(tpch(tpch.size / 2))},"max":${j(tpch.last)}}"""
    // Attribution evidence IN the compact line (2000-char budget, so
    // it can't carry the ~100-entry full sentinel map — that's in the
    // stderr line + bench_full.json): the historically disputed keys'
    // gc / pre/post sentinels / rep curves explicitly, a summary of
    // the whole sentinel population (n, median, max + which probe was
    // the max), and explicit entries for any probe that ran > 3× the
    // sweep median — i.e. the anomalies surface themselves; a clean
    // sweep costs ~6 summary fields.
    val watch = Seq("q_tpch_q21", "scale_containment_10x",
      "q_dedup_minhash", "scale_join_10x").filter(gcByKey.contains)
    val watchGc = if (watch.isEmpty) ""
      else s""","gc":${watch.map(k => "\"" + k + "\":" + j(gcByKey(k)))
        .mkString("{", ",", "}")}"""
    val sentVals = sentinels.values.toSeq.sorted
    val sentStats = if (sentVals.isEmpty) "" else {
      val med = sentVals(sentVals.size / 2)
      val (maxTag, maxV) = sentinels.maxBy(_._2)
      s""","sent_n":${sentinels.size},"sent_med":${j(med)},"sent_max":${j(maxV)},"sent_max_tag":"$maxTag""""
    }
    val sentMedian = if (sentVals.isEmpty) 0.0 else sentVals(sentVals.size / 2)
    val watchTags = watch.flatMap(k => Seq(s"${k}_pre", s"${k}_post")).toSet
    // watch keys' probes are guaranteed slots; anomalous probes
    // (> 3× sweep median — e.g. post-heavy-key drain or real
    // contention) fill the remainder of a 12-entry budget so the
    // compact line stays under the driver's 2000-char tail capture
    val watchSentEntries = sentinels.filter { case (k, _) => watchTags(k) }
    val anomSentEntries = sentinels.filter { case (k, v) =>
      !watchTags(k) && sentMedian > 0 && v > 3 * sentMedian
    }.take(math.max(0, 12 - watchSentEntries.size))
    val compactSentEntries = watchSentEntries ++ anomSentEntries
    val watchSent = if (compactSentEntries.isEmpty) ""
      else s""","sentinel":${compactSentEntries
        .map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")}"""
    val watchReps = {
      val m = watch.filter(repsByKey.contains)
      if (m.isEmpty) ""
      else s""","reps":${m.map(k => "\"" + k + "\":[" + repsByKey(k).map(j).mkString(",") + "]")
        .mkString("{", ",", "}")}"""
    }
    // stall evidence in the compact line: the sweep-wide total (one
    // number that says "quiet host" or "noisy host" at a glance) plus
    // per-key entries for any winning rep that carried stall — on a
    // quiet host this is one ~0 field.
    val stallTotal = stallMillis() / 1e3
    // sweep-wide hypervisor steal in CPU-seconds (divide by 32 for a
    // wall-comparable average): the one number that says whether the
    // host was taking cycles this sweep, visible even when no discrete
    // freeze tripped the heartbeat
    val stealTotal = stealSecs() - stealAtStart
    val watchStall = if (stallByKey.isEmpty) ""
      else s""","stall":${stallByKey.toSeq.sortBy(-_._2).take(8)
        .map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")}"""
    // 2000-char budget guard: a stormy sweep can fill every optional
    // block (12 sentinel entries + 8 stall entries + 6 remeasures) and
    // the closest observed line is 1831 bytes — if the assembled line
    // would exceed the driver's scrape window, drop the anomaly
    // sentinel entries first, then the per-key stall entries, then the
    // remeasure attribution stamps (value-only fallback; all remain
    // verbatim in the stderr full line + bench_full.json).
    // hz rides the compact line only when it differs from the
    // mainstream-Linux 100 (the one case where the steal scaling
    // assumption needs to be visible); it is always in the stderr full
    // line + bench_full.json. vcpus always rides — the contamination
    // divisor should be auditable next to steal_total.
    val hzField = if (userHz == 100.0) "" else s""","hz":${j(userHz)}"""
    def assembleCompact(sent: String, stall: String, rem: String,
        reps: String = watchReps): String =
      s"""{"metric":"total","value":${j(total)},"unit":"sec","n_queries":${all.length},"queries":$cqs$tpchStats$watchGc$sent$reps$sentStats,"stall_total":${j(stallTotal)},"steal_total":${j(stealTotal)}$hzField,"vcpus":$nCpus$stall,"wl":$wlJson,"remeasure":$rem,"sf":"$sfDir"}"""
    val watchOnlySent = if (watchSentEntries.isEmpty) ""
      else s""","sentinel":${watchSentEntries
        .map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")}"""
    val compactLine = Seq(
      assembleCompact(watchSent, watchStall, remJson),
      assembleCompact(watchOnlySent, watchStall, remJson),
      assembleCompact(watchOnlySent, "", remJson),
      assembleCompact(watchOnlySent, "", remJsonVals),
      // round 13: vcpus + 3 new wl families cost ~60 bytes, so the
      // ladder gains two real rungs — drop the sentinel block, then
      // the per-key rep curves — before the everything-dropped
      // fallback (all of it remains verbatim in bench_full.json)
      assembleCompact("", "", remJsonVals),
      assembleCompact("", "", remJsonVals, reps = ""))
      // 1880, not 1990 (round 13): the driver scrapes a 2000-char
      // stdout TAIL, and sbt's own trailing "[success] Total time: …"
      // noise (~70 bytes) sits inside that window AFTER our line — a
      // 1,931-byte line (r12) got its HEAD clipped and parsed as null.
      // Budgeting ~120 bytes for the trailing noise makes the stdout
      // line itself parseable again instead of relying on the
      // bench_compact.json sidecar the driver doesn't read yet.
      .find(_.length <= 1880)
      .getOrElse(assembleCompact("", "", remJsonVals, reps = ""))
    // Fixed sidecar for the compact line too (round-9 verdict item 6:
    // BENCH_r08.json had parsed=null — the driver scrapes a stdout
    // tail where sbt noise can clip the line; the sidecar survives).
    try if (only.isEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("target/bench_compact.json"),
        (compactLine + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    // The compact line is printed AFTER the scale gate below (r15): the
    // driver scrapes a 2000-char merged-output TAIL, and the gate's
    // retry messages (plus sbt's trailing "[success]") were landing
    // AFTER our line — BENCH_r13/r14 both show the JSON head clipped by
    // exactly that, parsing as null. Printing it last-before-exit keeps
    // only sbt's ~70-byte noise behind it (already budgeted by the 1880
    // ladder above); a tripped gate still prints the line first, so the
    // measurements stay on record in every exit path. The sidecar
    // (target/bench_compact.json, written above) is the durable copy.

    // Scale-regression gate: 10× data must cost FAR less than the gate
    // ratio. Every scale shape is a single-shuffle aggregate, a
    // key-aligned join, or a thin-row LSH pipeline — all sub-linear on
    // this host (fixed job overhead amortizes; observed ratios
    // 2.5–7.6, but host noise on min-of-2 sub-second points has pushed
    // the join ratio to ~8.7 once). The failures this gate hunts —
    // candidate explosion, shuffle blowup, a plan that stopped
    // broadcasting — are ORDER-OF-MAGNITUDE events (a quadratic
    // candidate set at 10× data costs ~100×), so the threshold sits at
    // 15: above every observed noise excursion, far below any real
    // explosion. The compact JSON prints after the gate (but before any
    // gate-failure exit), so a tripped gate still leaves the
    // measurements on record.
    // Gate regime (round-9 verdict item 8): with the periodic-GC
    // poisoning removed (see maybeCleanup), in-sweep numbers are
    // expected to track isolated numbers (r8 isolated containment
    // ratio 3.8 vs the poisoned in-sweep 10.4) — the gate therefore
    // stays on in-sweep numbers at 15, and the per-key gc/sentinel
    // columns in the output are the evidence trail if they diverge.
    val byName = all.toMap
    // Re-measure a tripped pair ONCE before failing the round: the
    // failures this gate hunts (candidate/shuffle explosions) are
    // properties of the PLAN and reproduce on every run, while a host
    // storm (round-10: whole-VM stalls inflating one 10× point to a
    // 21× ratio — rep curve [28.8, 78.8, 30.4] with the 1× point and
    // every sibling pipeline clean in the same sweep) does not. Both
    // points re-run min-of-2 and each keeps its best across rounds, so
    // a genuine explosion still fails loudly — a quadratic 10× point
    // cannot measure fast twice.
    def remeasureRatio(k: String): Double = {
      val pin = k == "join" // same strategy pin as the first pass
      if (pin) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def best(name: String): Double = scaleMakers.get(name).map { mk =>
          val re = timeRepsFull(2)(force(mk())).map(_._1).min
          math.min(re, byName(name))
        }.getOrElse(-1.0)
        val t1 = best(s"scale_${k}_1x")
        val t10 = best(s"scale_${k}_10x")
        System.err.println(f"SCALE GATE RETRY scale_$k: best 1x=$t1%.3f 10x=$t10%.3f")
        if (t1 <= 0 || t10 < 0) Double.MaxValue else t10 / t1
      } catch { case scala.util.control.NonFatal(_) => Double.MaxValue }
      finally if (pin) spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // Count gate FIRST (round 11, verdict item 3): counts are
    // deterministic, so there is no retry and no threshold drift — a
    // candidate/pair/segment count at 10× exceeding 12× its 1× value
    // is a plan or data-construction explosion, full stop, however
    // fast or slow the host happened to run it. Expected ratio is
    // exactly ~10 by data construction; 12 absorbs only the handful
    // of accidental cross-copy hash collisions a 64-bit space allows.
    // Per-family count-ratio ceilings: the linear-by-construction
    // families expect exactly ~10 (12 absorbs hash-collision noise);
    // the FIXED-QUERY serving families (bm25, ivfpq) expect ~1 —
    // certified 1.00 / 1.02 at 10× and 1.00 / 1.06 at 100× — so for
    // them a ratio of, say, 8 is an 8× per-query serving-cost blowup
    // that the uniform 12 would wave through (round-12 self-review);
    // 3.0 leaves margin for cell-balance drift while still catching
    // any real routing regression.
    // agg (constant group count) expects ~1 like the fixed-query
    // serving families — the uniform 12 would wave an 8× state blowup
    // through for it too. bpe measures 82 → 315 (3.84×) on this
    // fixture: the 10-letter rotation mints new pairs at rotated/
    // unrotated character boundaries, but the pair set is the UNION of
    // at most 10 rotations of a fixed charset, so it saturates — 6.0
    // holds the measured value with margin while still catching a
    // corpus-proportional (ratio ≈ 10+) tokenizer degeneration.
    val wlMaxRatio = Map("bm25" -> 3.0, "ivfpq" -> 3.0,
      "agg" -> 3.0, "bpe" -> 6.0).withDefaultValue(12.0)
    val countTripped = wlCounts.toSeq.flatMap { case (fam, (c1, c10)) =>
      if (c1 < 0)
        Some(s"wl_$fam: instrument THREW — count coverage lost (see stderr)")
      else if (c1 == 0 || c10 == 0)
        // Dead-zone fix (round-12 ADVICE item 3 + self-review): every
        // instrumented family has a known-nonzero workload at BOTH
        // scales on this fixture (1x: dedup 257, containment 98895,
        // cc 477, spans 36049, bm25 7977, semdedup 199666, knn 997301,
        // knn_hier 1003385, ivfpq 9825 — BENCH_NOTES round 12; round
        // 13 additions: join 600000, agg 6, bpe 82), so a
        // zero on either side IS the failure: the instrument (or the
        // multi-copy data construction) collapsed, whatever the other
        // side read.
        Some(s"wl_$fam: counts ($c1, $c10) — instrument collapsed (known-nonzero workload both sides)")
      else if (c10 > wlMaxRatio(fam) * c1)
        Some(s"wl_$fam: 10x count $c10 > ${wlMaxRatio(fam)} x 1x count $c1 — super-linear workload")
      else None
    }
    val tripped = countTripped ++ Seq("agg", "join", "dedup", "semdedup", "knn", "knn_hier",
      "bm25", "containment", "ivfpq", "spans", "cc").flatMap { k =>
      // BOTH points must be present (filtered local-iteration runs can
      // select one point of a pair; r14 caught the bare byName(10x)
      // lookup throwing NoSuchElementException on exactly that)
      if (!byName.contains(s"scale_${k}_1x") ||
        !byName.contains(s"scale_${k}_10x")) None // filtered out (local iteration)
      else {
      val (t1x, t10x) = (byName(s"scale_${k}_1x"), byName(s"scale_${k}_10x"))
      if (t1x <= 0 || t10x < 0)
        Some(s"scale_$k: missing/failed measurement (1x=$t1x 10x=$t10x)")
      else if (t10x / t1x >= 15.0) {
        // A family with a LINEAR count instrument cannot have had a
        // CANDIDATE explosion — the candidate/pair/segment count is
        // what a quadratic plan inflates, and it is deterministic
        // where wall time storms (this host has measured 4.6×
        // same-hour swings on byte-identical fixed shapes —
        // BENCH_NOTES round 11). But a wall regression that does NOT
        // inflate counts (skew, partitioning, per-pair verify cost) is
        // still a plan bug (round-12 ADVICE item 2), so linear counts
        // downgrade the trip to the SAME retry discipline as the
        // un-instrumented families instead of a blanket pass: re-run
        // both points; fail only if the ≥15 ratio reproduces.
        val countLinear = wlCounts.get(k).exists { case (c1, c10) =>
          c1 > 0 && c10 > 0 && c10 <= wlMaxRatio(k) * c1 }
        val re = remeasureRatio(k)
        if (re >= 15.0)
          Some(f"scale_$k: 10x/1x ratio ${t10x / t1x}%.1f >= 15 (retry ${re}%.1f" +
            (if (countLinear) s", counts LINEAR wl=${wlCounts(k)} — wall-only regression: skew/partitioning, not candidates"
             else "") + ") — super-linear growth")
        else {
          System.err.println(f"SCALE GATE: scale_$k first-pass ratio " +
            f"${t10x / t1x}%.1f did NOT reproduce (retry ${re}%.1f)" +
            (if (countLinear) s"; counts linear wl=${wlCounts(k)}" else "") +
            " — host noise, not plan")
          None
        }
      }
      else None
      }
    }
    spark.stop()
    // Last stdout of this program: the sidecar note, then the compact
    // JSON (see the deferral comment above the gate).
    println("bench compact sidecar: target/bench_compact.json")
    println(compactLine)
    if (tripped.nonEmpty) {
      tripped.foreach(m => System.err.println(s"SCALE GATE FAILED: $m"))
      sys.exit(1)
    }
  }
}
