package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * MergeTree table-engine FINAL semantics ([[MergeTree]]), dictionary
 * enrichment, and the round-6 dialect widening (statistical moments,
 * geo distance) exercised end-to-end over the harness tables.
 *
 * Scale notes per key are on the operators; the common thread is that
 * every FINAL fold is a single hash aggregate (map-side partials — the
 * shuffle carries at most one row per key per input partition, not the
 * raw log), and the dictionary join broadcasts the dictionary side the
 * way ClickHouse keeps dictionaries RAM-resident on every node.
 */
object EngineQueries {

  val all: Seq[(String, Q)] = Seq(

    "q_engine_replacing" -> Q(
      // ReplacingMergeTree FINAL: latest version per (user_id,
      // event_type) — the deduplicated "current state" view of an
      // append-only event export. Version = ts (unique per user in the
      // harness data, so the fold is deterministic). One hash
      // aggregate; the oracle spells the same fold as a window.
      (s, dir) => MergeTree.replacingFinal(
        Q.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"), col("value")),
        Seq("user_id", "event_type"), "ts"),
      Some(s"""SELECT user_id, event_type, ts, event_id, value
               FROM ${Q.eventsOracle} events
               QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC) = 1""")),

    "q_engine_optimize" -> Q(
      // OPTIMIZE TABLE ... FINAL end-to-end over this library's OWN
      // storage: the versioned event export lands as an 8-part native
      // table (accumulate-only, one part per INSERT batch — exactly
      // how the reference's export grows), MergeTree.optimizeReplacing
      // forces the merge into 2 key-clustered compacted parts, and the
      // result is read back from the compacted files — fold + native
      // write + read round-trip proven in one key. Oracle = the same
      // replacing fold the server's FINAL view computes, which also
      // proves no rows were lost or duplicated by compaction.
      (s, dir) => {
        val src = ScanQueries.fixtureDir(dir, "optimize_src")
        val dst = ScanQueries.fixtureDir(dir, "optimize_dst")
        Q.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"), col("value"))
          .repartition(8)
          .write.format("clickhouse_native").mode("overwrite").save(src)
        MergeTree.optimizeReplacing(s, src, dst,
          Seq("user_id", "event_type"), "ts", parts = 2)
      },
      Some(s"""SELECT user_id, event_type, ts, event_id, value
               FROM ${Q.eventsOracle} events
               QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts DESC) = 1""")),

    "q_engine_evolve" -> Q(
      // schema evolution end-to-end over this library's OWN storage:
      // a pre-ALTER part (two columns) and a post-ALTER part (three —
      // the ADD COLUMN layout NativeCatalog.alterTable produces) land
      // in one table directory; the mergeSchema read unions the
      // headers and null-fills the old part's missing column. Oracle =
      // the same rows rebuilt from orders with a CASE standing in for
      // "rows written before the ALTER have no value" — which also
      // proves no column was dropped or misaligned across the
      // heterogeneous parts.
      (s, dir) => {
        val fx = ScanQueries.fixtureDir(dir, "evolve_tbl")
        val o = t(s, dir, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_custkey"))
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.format("clickhouse_native").mode("append").save(fx)
        s.read.format("clickhouse_native").option("mergeSchema", "true").load(fx)
      },
      Some("""SELECT o_orderkey, o_custkey,
                     CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END AS o_totalprice
              FROM orders""")),

    "q_engine_insert_dedup" -> Q(
      // ClickHouse's insert_deduplicate contract (replicated-MergeTree
      // INSERT idempotence) over this library's own storage: the SAME
      // batch written twice with insertDedup=true commits exactly one
      // part — the retry is a no-op, decided by comparing the new
      // part's sidecar content hash (FNV-1a-64 of its file bytes)
      // against pre-existing parts, driver-side metadata only. The
      // gate reads the table back and hash-compares against a SINGLE
      // copy of the batch — a dedup failure would double every row.
      // Byte-identical re-encode is guaranteed by the deterministic
      // writer (single partition, sorted rows, no timestamps in the
      // format).
      (s, dir) => {
        val fx = ScanQueries.fixtureDir(dir, "insert_dedup_tbl")
        val batch = t(s, dir, "orders").filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .coalesce(1).sortWithinPartitions("o_orderkey")
        batch.write.format("clickhouse_native").mode("overwrite").save(fx)
        batch.write.format("clickhouse_native")
          .option("insertDedup", "true").mode("append").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders WHERE o_orderkey % 5 = 0""")),

    "q_engine_replacing_deleted" -> Q(
      // ReplacingMergeTree(ver, is_deleted) FINAL — CH's soft-delete
      // variant (23.2+): deletes travel as ordinary inserts with
      // is_deleted=1 and the key vanishes when its LATEST version is a
      // tombstone. Version = (ts, event_id) struct so the fold is
      // total even on tied timestamps; 'error' events play the
      // tombstone role over the harness stream.
      (s, dir) => {
        val ev = Q.events(s, dir).select(col("user_id"),
          MergeTree.versionWithTiebreak(col("ts"), col("event_id")).as("v"),
          when(col("event_type") === "error", 1).otherwise(0).as("is_deleted"),
          floor(col("value") * 100).cast("long").as("cents"))
        MergeTree.replacingFinalDeleted(ev, Seq("user_id"), "v", "is_deleted")
          .select(col("user_id"), col("v.ts").as("ts"),
            col("v.event_id").as("event_id"), col("is_deleted"), col("cents"))
      },
      Some(s"""SELECT user_id, ts, event_id, is_deleted, cents FROM (
                 SELECT user_id, ts, event_id,
                        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_deleted,
                        CAST(floor(value * 100) AS BIGINT) AS cents,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
                 FROM ${Q.eventsOracle} events)
               WHERE rn = 1 AND is_deleted = 0""")),

    "q_engine_optimize_dedup" -> Q(
      // OPTIMIZE TABLE ... FINAL DEDUPLICATE over this library's own
      // storage: a table seeded with planted whole-row duplicates
      // (every 3rd order re-inserted) force-merges into 2 compacted
      // parts with exact-duplicate rows dropped — read back for the
      // gate, so fold + native write + read round-trip in one key.
      // Oracle = DISTINCT over the un-duplicated source.
      (s, dir) => {
        val src = ScanQueries.fixtureDir(dir, "optdedup_src")
        val dst = ScanQueries.fixtureDir(dir, "optdedup_dst")
        val base = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        base.unionByName(base.filter(col("o_orderkey") % 3 === 0))
          .write.format("clickhouse_native").mode("overwrite").save(src)
        MergeTree.optimizeDeduplicate(s, src, dst, parts = 2)
      },
      Some("""SELECT DISTINCT o_orderkey, o_custkey, o_orderpriority FROM orders""")),

    "q_engine_collapsing" -> Q(
      // CollapsingMergeTree FINAL over a versioned sign stream: signup
      // opens (+1), error cancels (-1); per user the LATEST row decides
      // whether the key survives in its +1 state. Deterministic
      // versioned reading (= VersionedCollapsingMergeTree) — see
      // MergeTree.collapsingFinal's doc for the malformed-stream note.
      (s, dir) => MergeTree.collapsingFinal(
        Q.events(s, dir)
          .filter(col("event_type").isin("signup", "error"))
          .select(col("user_id"), col("ts"),
            when(col("event_type") === "signup", 1).otherwise(-1).as("sign"),
            col("value")),
        Seq("user_id"), "sign", "ts"),
      Some(s"""SELECT user_id, ts, sign, value FROM (
                 SELECT user_id, ts,
                        CASE WHEN event_type = 'signup' THEN 1 ELSE -1 END AS sign,
                        value
                 FROM ${Q.eventsOracle} events
                 WHERE event_type IN ('signup', 'error'))
               QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1
                 AND sign = 1""")),

    "q_engine_summing" -> Q(
      // SummingMergeTree FINAL: numeric columns pre-summed per key —
      // the rollup a CH export of such a table has already half-applied
      // (partially-merged parts sum per-part; the read must finish the
      // fold). value sums are rounded for the cross-engine gate; hits
      // is an exact integer sum.
      (s, dir) => MergeTree.summingFinal(
        Q.events(s, dir)
          .select(col("user_id"), col("event_type"), col("value"),
            lit(1L).as("hits")),
        Seq("user_id", "event_type"), Seq("value", "hits"))
        .select(col("user_id"), col("event_type"),
          round(col("value"), 2).as("value_sum"), col("hits")),
      Some(s"""SELECT user_id, event_type,
                      round(sum(value), 2) AS value_sum,
                      count(*) AS hits
               FROM ${Q.eventsOracle} events
               GROUP BY user_id, event_type""")),

    "q_join_dict" -> Q(
      // dictGetOrDefault semantics: a PARTIAL dictionary (nations with
      // key < 10) enriches every customer row, misses filled with the
      // default — ClickHouse dictionaries are RAM-resident lookup
      // tables on every server; the Spark-native equivalent is a
      // broadcast left join + coalesce, which keeps the fact side
      // shuffle-free at any scale.
      (s, dir) => {
        val dict = t(s, dir, "nation").filter(col("n_nationkey") < 10)
          .select(col("n_nationkey").as("dict_k"), col("n_name").as("dict_v"))
        t(s, dir, "customer")
          .join(broadcast(dict), col("c_nationkey") === col("dict_k"), "left")
          .select(col("c_custkey"),
            coalesce(col("dict_v"), lit("UNKNOWN")).as("nation_name"))
      },
      Some("""SELECT c_custkey,
                     COALESCE(n_name, 'UNKNOWN') AS nation_name
              FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 10) n
                ON c_nationkey = n_nationkey""")),

    "q_agg_entropy" -> Q(
      // CH entropy(x): Shannon entropy (log2) of the value distribution
      // per group. Spelled as two hash aggregates on the algebraic form
      // H = log2(S) − Σ c·log2(c) / S (S = Σ c) — both engines sum the
      // same five per-type counts per user, so the only float work is
      // the final expression; no per-row log2 ever runs (the inner
      // aggregate collapses to |group|·|distinct values| rows).
      (s, dir) => Q.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(round(
          log2(sum(col("c"))) -
            sum(col("c") * log2(col("c"))) / sum(col("c")), 4).as("entropy")),
      Some(s"""WITH c AS (SELECT user_id, event_type, count(*) AS c
                          FROM ${Q.eventsOracle} events
                          GROUP BY user_id, event_type)
               SELECT user_id,
                      round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
               FROM c GROUP BY user_id""")),

    "q_agg_moments" -> Q(
      // CH skewPop/skewSamp/kurtPop/kurtSamp through the dialect
      // registration (ChDialect round-6), single-pass streaming central
      // moments on the Spark side; the oracle recomputes them two-pass
      // (exact mean, then centered power sums) — an independent
      // numeric path, so agreement at 4 dp is a real differential test
      // of the moment algebra, not a shared rounding artifact.
      // `+ 0.0` after every round: a skew that is statistically zero
      // rounds to ±0.0 with a SIGN chosen by each engine's summation
      // order (observed at sf0.001: Spark +0.0 vs DuckDB -0.0 — a
      // run-order-dependent flake, since Spark's float sum order
      // varies with partitioning). IEEE -0.0 + 0.0 = +0.0 normalizes
      // the sign on both engines and is the identity for every other
      // value.
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_moments")
        s.sql("""SELECT l_returnflag,
                        round(skewPop(l_quantity), 4) + 0.0  AS skew_pop,
                        round(skewSamp(l_quantity), 4) + 0.0 AS skew_samp,
                        round(kurtPop(l_quantity), 4) + 0.0  AS kurt_pop,
                        round(kurtSamp(l_quantity), 4) + 0.0 AS kurt_samp
                 FROM li_moments GROUP BY l_returnflag""")
      },
      Some("""WITH mu AS (SELECT l_returnflag, avg(l_quantity) AS mu
                          FROM lineitem GROUP BY l_returnflag),
                   d AS (SELECT l.l_returnflag, l.l_quantity - mu.mu AS d
                         FROM lineitem l JOIN mu USING (l_returnflag)),
                   m AS (SELECT l_returnflag, count(*) AS n,
                                sum(d*d)/count(*) AS m2,
                                sum(d*d*d)/count(*) AS m3,
                                sum(d*d*d*d)/count(*) AS m4
                         FROM d GROUP BY l_returnflag)
              SELECT l_returnflag,
                     round(m3/pow(m2, 1.5), 4) + 0.0                 AS skew_pop,
                     round(m3/pow(m2, 1.5)*sqrt((n-1.0)/n), 4) + 0.0 AS skew_samp,
                     round(m4/(m2*m2), 4) + 0.0                      AS kurt_pop,
                     round(m4/(m2*m2)*(n-1.0)/n, 4) + 0.0            AS kurt_samp
              FROM m""")),

    "q_agg_ttest" -> Q(
      // CH welchTTest(v, group): two-sample Welch t statistic + df —
      // the A/B-test primitive. Exact-regime: values quantize to
      // integer cents; ONE conditional-aggregation pass produces the
      // six exact integer sums (n, Σ, Σ² per arm), and both engines
      // evaluate the identical closed form from them — no accumulation
      // order in the float path. Single hash aggregate; at any scale
      // the output is one row.
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val a = col("event_type") === "click"
        val agg = e.agg(
          count(when(a, 1)).as("n1"), sum(when(a, col("c"))).as("s1"),
          sum(when(a, col("c") * col("c"))).as("sq1"),
          count(when(!a, 1)).as("n2"), sum(when(!a, col("c"))).as("s2"),
          sum(when(!a, col("c") * col("c"))).as("sq2"))
        val (n1, s1, sq1) = (col("n1").cast("double"), col("s1").cast("double"), col("sq1").cast("double"))
        val (n2, s2, sq2) = (col("n2").cast("double"), col("s2").cast("double"), col("sq2").cast("double"))
        val m1 = s1 / n1; val m2 = s2 / n2
        val v1 = (sq1 / n1 - m1 * m1) * (n1 / (n1 - 1.0))
        val v2 = (sq2 / n2 - m2 * m2) * (n2 / (n2 - 1.0))
        val se1 = v1 / n1; val se2 = v2 / n2
        agg.select(
          round((m1 - m2) / sqrt(se1 + se2), 4).as("t_stat"),
          round((se1 + se2) * (se1 + se2) /
            (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)), 2).as("welch_df"))
      },
      Some(s"""WITH c AS (SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS c
                     FROM ${Q.eventsOracle} e
                     WHERE event_type IN ('click', 'purchase')),
              sums AS (SELECT
                       count(*) FILTER (event_type = 'click') AS n1,
                       sum(c)   FILTER (event_type = 'click') AS s1,
                       sum(c*c) FILTER (event_type = 'click') AS sq1,
                       count(*) FILTER (event_type = 'purchase') AS n2,
                       sum(c)   FILTER (event_type = 'purchase') AS s2,
                       sum(c*c) FILTER (event_type = 'purchase') AS sq2
                     FROM c),
              f AS (SELECT CAST(n1 AS DOUBLE) AS n1, CAST(s1 AS DOUBLE) AS s1,
                           CAST(sq1 AS DOUBLE) AS sq1, CAST(n2 AS DOUBLE) AS n2,
                           CAST(s2 AS DOUBLE) AS s2, CAST(sq2 AS DOUBLE) AS sq2
                     FROM sums),
              m AS (SELECT n1, n2,
                           (sq1/n1 - (s1/n1)*(s1/n1)) * (n1/(n1-1.0)) / n1 AS se1,
                           (sq2/n2 - (s2/n2)*(s2/n2)) * (n2/(n2-1.0)) / n2 AS se2,
                           s1/n1 - s2/n2 AS dm
                     FROM f)
              SELECT round(dm / sqrt(se1 + se2), 4) AS t_stat,
                     round((se1 + se2) * (se1 + se2) /
                           (se1*se1/(n1-1.0) + se2*se2/(n2-1.0)), 2) AS welch_df
              FROM m""")),

    "q_agg_mannwhitney" -> Q(
      // CH mannWhitneyUTest: rank-sum statistic between two arms,
      // INTEGER-EXACT — tie-averaged ranks are carried doubled
      // (rank_min + rank_max stays integral), so the gate compares
      // integers. The rank machinery runs on the DISTINCT-value table
      // (bounded domain after cents quantization), not the event
      // stream: per-value counts hash-aggregate first, the cumulative
      // rank window runs over that small table, and the final fold is
      // one more aggregate — the standard scalable rank-statistic
      // layout.
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val byVal = e.groupBy("c").agg(
          count(lit(1)).as("cnt"),
          count(when(col("event_type") === "click", 1)).as("cnt_a"))
        val wBelow = Window.orderBy("c")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = byVal.withColumn("below",
          coalesce(sum(col("cnt")).over(wBelow), lit(0L)))
        // doubled tie-averaged rank of value v = 2*below + cnt + 1
        ranked.agg(
          sum(col("cnt_a") * (col("below") * 2 + col("cnt") + 1)).as("two_r_a"),
          sum(col("cnt_a")).as("n_a"),
          sum(col("cnt") - col("cnt_a")).as("n_b"))
          .select(col("two_r_a"), col("n_a"), col("n_b"),
            (col("two_r_a") - col("n_a") * (col("n_a") + 1)).as("two_u_a"))
      },
      Some(s"""WITH c AS (SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS c
                     FROM ${Q.eventsOracle} e
                     WHERE event_type IN ('click', 'purchase')),
              bv AS (SELECT c,
                       count(*) AS cnt,
                       count(*) FILTER (WHERE event_type = 'click') AS cnt_a
                     FROM c GROUP BY c),
              r AS (SELECT cnt, cnt_a,
                       coalesce(sum(cnt) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
                     FROM bv)
              SELECT CAST(sum(cnt_a * (below * 2 + cnt + 1)) AS BIGINT) AS two_r_a,
                     CAST(sum(cnt_a) AS BIGINT) AS n_a,
                     CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,
                     CAST(sum(cnt_a * (below * 2 + cnt + 1)) -
                       sum(cnt_a) * (sum(cnt_a) + 1) AS BIGINT) AS two_u_a
              FROM r""")),

    "q_agg_cramers_v" -> Q(
      // CH cramersV(a, b): association strength between two categorical
      // columns via the chi² contingency fold. Counts are exact
      // integers (event_type × value-centile bucket); chi² sums
      // (obs−exp)²/exp over the R×C cell table — a tiny aggregate after
      // the one contingency hash-agg, rounded to 4 dp to absorb
      // cell-order summation ulps.
      (s, dir) => {
        val e = Q.events(s, dir).select(col("event_type"),
          floor(floor(col("value") * 100) / 10000.0).cast("long").as("bucket"))
        val cells = e.groupBy("event_type", "bucket").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("event_type").agg(sum("o").as("rt"))
        val colT = cells.groupBy("bucket").agg(sum("o").as("ct"))
        val n = cells.agg(sum("o").as("n"))
        // dimension-scalar probes (R×C of the contingency table) —
        // bounded by category cardinality, legitimate at any scale
        val r = cells.select(countDistinct("event_type")).head().getLong(0)
        val c = cells.select(countDistinct("bucket")).head().getLong(0)
        val exp = col("rt") * col("ct") / col("n")
        cells.join(rowT, "event_type").join(colT, "bucket").crossJoin(broadcast(n))
          .select(((col("o") - exp) * (col("o") - exp) / exp).as("term"), col("n"))
          .agg(sum(col("term")).as("chi2"), first(col("n")).as("n"))
          .select(round(
            sqrt(col("chi2") / (col("n") * math.min(r - 1, c - 1).toDouble)), 4)
            .as("cramers_v"))
      },
      Some(s"""WITH e AS (SELECT event_type,
                       CAST(floor(CAST(floor(value * 100) AS BIGINT) / 10000.0) AS BIGINT) AS bucket
                     FROM ${Q.eventsOracle} ev),
              cells AS (SELECT event_type, bucket, count(*) AS o
                     FROM e GROUP BY 1, 2),
              rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
              ct AS (SELECT bucket, sum(o) AS ct FROM cells GROUP BY 1),
              n AS (SELECT sum(o) AS n FROM cells),
              dims AS (SELECT count(DISTINCT event_type) AS r,
                              count(DISTINCT bucket) AS c FROM cells),
              chi AS (SELECT sum((o - rt.rt * ct.ct / n.n) *
                                 (o - rt.rt * ct.ct / n.n) /
                                 (rt.rt * ct.ct / n.n)) AS chi2,
                             first(n.n) AS n
                     FROM cells JOIN rt USING (event_type)
                                JOIN ct USING (bucket), n)
              SELECT round(sqrt(chi2 / (n * least(dims.r - 1, dims.c - 1))), 4)
                       AS cramers_v
              FROM chi, dims""")),

    "q_agg_interval_sum" -> Q(
      // CH intervalLengthSum(start, end): total length of the UNION of
      // (possibly overlapping) intervals per group — the coverage
      // primitive behind span-dedup accounting and SLA uptime. Classic
      // sweep: a segment opens where start exceeds the running max end
      // of everything earlier; (group, segment) aggregates give union
      // segments; integer day arithmetic end to end. Two window passes
      // + two hash aggregates, all keyed by the group — one shuffle.
      (s, dir) => {
        // duplicate intervals collapse FIRST: coverage is a set
        // property, and distinct (s0, e0) rows give the sweep windows a
        // TOTAL order — without it, tied rows can land in different
        // orders across the two window passes (observed in DuckDB:
        // new_seg computed under one tie order, summed under another,
        // misattributing segment boundaries)
        val iv = t(s, dir, "orders").select(
          col("o_orderpriority").as("grp"),
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("s0"))
          .withColumn("e0", col("s0") + (col("s0") % 5) + 1) // end exclusive
          .distinct()
        val wPrev = Window.partitionBy("grp").orderBy(col("s0"), col("e0"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.partitionBy("grp").orderBy(col("s0"), col("e0"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = iv
          .withColumn("prev_max", max(col("e0")).over(wPrev))
          .withColumn("new_seg",
            when(col("prev_max").isNull || col("s0") > col("prev_max"), 1L)
              .otherwise(0L))
          .withColumn("seg_id", sum(col("new_seg")).over(wRun))
        seg.groupBy("grp", "seg_id")
          .agg(min("s0").as("seg_s"), max("e0").as("seg_e"))
          .groupBy("grp")
          .agg(sum(col("seg_e") - col("seg_s")).as("covered_days"),
            count(lit(1)).as("n_segments"))
      },
      Some("""WITH iv AS (SELECT DISTINCT o_orderpriority AS grp,
                       datediff('day', DATE '1992-01-01', o_orderdate) AS s0,
                       datediff('day', DATE '1992-01-01', o_orderdate) +
                         (datediff('day', DATE '1992-01-01', o_orderdate) % 5) + 1 AS e0
                     FROM orders),
              seg AS (SELECT grp, s0, e0,
                       CASE WHEN max(e0) OVER (PARTITION BY grp ORDER BY s0, e0
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                              OR s0 > max(e0) OVER (PARTITION BY grp ORDER BY s0, e0
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            THEN 1 ELSE 0 END AS new_seg
                     FROM iv),
              segid AS (SELECT grp, s0, e0,
                       sum(new_seg) OVER (PARTITION BY grp ORDER BY s0, e0
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
                     FROM seg),
              segs AS (SELECT grp, seg_id, min(s0) AS seg_s, max(e0) AS seg_e
                     FROM segid GROUP BY 1, 2)
              SELECT grp, CAST(sum(seg_e - seg_s) AS BIGINT) AS covered_days,
                     count(*) AS n_segments
              FROM segs GROUP BY grp""")),

    "q_agg_regression" -> Q(
      // CH simpleLinearRegression(x, y) → (slope, intercept), plus the
      // fit quality CH exposes as corr²: Spark's regr_* aggregates are
      // the same single-pass Welford-style machinery (partial+final
      // mergeable, one hash aggregate — distributes like any sum).
      // Rounded to 6 dp: both engines fold the identical co-moment
      // algebra; only summation order separates them.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2")),
      Some("""SELECT l_returnflag,
                     round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                     round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
                     round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_avg_weighted" -> Q(
      // CH avgWeighted(v, w) = Σv·w / Σw — spelled on the algebraic
      // form (two plain sums) rather than a custom aggregate, so the
      // partial/final split is Spark's own codegen'd sum. Weight =
      // quantity, value = extendedprice: the per-unit average price.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(
          sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")),
          4).as("avg_weighted")),
      Some("""SELECT l_returnflag,
                     round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                       AS avg_weighted
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_uniq_upto" -> Q(
      // CH uniqUpTo(N)(x): exact distinct count while ≤ N, pinned to
      // N+1 beyond — the "is this column low-cardinality?" probe used
      // before choosing a dictionary encoding. The relational spelling
      // (least over countDistinct) keeps the semantics while letting
      // Spark's distinct-aggregate machinery (partial sets, one
      // shuffle) do the work; a 100-TB deployment would swap the inner
      // exact distinct for the HLL sketch once over the N+1 clamp.
      // N=50: suppliers-per-returnflag exceeds it (clamp branch fires),
      // linenumbers-per-returnflag stay ≤ 7 (exact branch) — both
      // branches of the clamp are exercised.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          least(countDistinct(col("l_suppkey")), lit(51L)).as("uniq_supp_upto50"),
          least(countDistinct(col("l_linenumber")), lit(51L)).as("uniq_ln_upto50")),
      Some("""SELECT l_returnflag,
                     least(count(DISTINCT l_suppkey), 51) AS uniq_supp_upto50,
                     least(count(DISTINCT l_linenumber), 51) AS uniq_ln_upto50
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_bit" -> Q(
      // CH groupBitAnd/groupBitOr/groupBitXor — bitwise fold aggregates
      // (flag-mask accumulation). All three are associative+commutative,
      // so the map-side partial folds whole partitions to one word
      // before the shuffle — the cheapest possible aggregate at scale.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("bit_and(l_linenumber)").as("mask_and"),
          expr("bit_or(l_linenumber)").as("mask_or"),
          expr("bit_xor(l_orderkey)").as("mask_xor")),
      Some("""SELECT l_returnflag,
                     bit_and(l_linenumber) AS mask_and,
                     bit_or(l_linenumber) AS mask_or,
                     bit_xor(l_orderkey) AS mask_xor
              FROM lineitem GROUP BY l_returnflag""")),

    "q_fn_encoding" -> Q(
      // CH hex / MD5 / SHA256 / base64Encode / base64Decode family:
      // byte-level codecs as codegen'd column expressions, with the
      // decode(encode(x)) round-trip pinned back to the original so a
      // broken decoder can't hide behind a broken encoder.
      (s, dir) => t(s, dir, "nation").select(
        col("n_nationkey"),
        hex(col("n_name").cast("binary")).as("hex_name"),
        md5(col("n_name").cast("binary")).as("md5_name"),
        sha2(col("n_name").cast("binary"), 256).as("sha256_name"),
        base64(col("n_name").cast("binary")).as("b64_name"),
        unbase64(base64(col("n_name").cast("binary"))).cast("string").as("rt_name")),
      Some("""SELECT n_nationkey,
                     hex(n_name) AS hex_name,
                     md5(n_name) AS md5_name,
                     sha256(n_name) AS sha256_name,
                     to_base64(CAST(n_name AS BLOB)) AS b64_name,
                     CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR)
                       AS rt_name
              FROM nation""")),

    "q_fn_datetime_extra" -> Q(
      // CH toISOWeek / toDayOfYear / toQuarter / toLastDayOfMonth /
      // addMonths family beyond q_fn_date's basics. End-of-month
      // clamping (Jan 31 + 1 month → Feb 29) is exercised by real
      // orderdates; months_from_1996 pins interval arithmetic to the
      // month-boundary-crossing count both engines agree on.
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("qtr"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        months_between(date_trunc("month", col("o_orderdate")),
          lit("1996-01-01").cast("date")).cast("int").as("months_from_1996")),
      Some("""SELECT o_orderkey,
                     CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
                     CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
                     CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
                     last_day(o_orderdate) AS month_end,
                     CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
                     CAST(datediff('month', DATE '1996-01-01',
                                   date_trunc('month', o_orderdate)) AS INTEGER)
                       AS months_from_1996
              FROM orders""")),

    "q_fn_array_sort" -> Q(
      // CH arraySort / arrayReverseSort / arrayDistinct / arrayFlatten /
      // arraySlice over the embeddings vectors. Pure per-row expressions
      // (no shuffle, fully codegen-able); sort/distinct/flatten operate
      // on the raw floats — identical bit patterns both engines — and
      // only the FINAL projection serializes each element as an exact
      // scaled integer, floor(x·10⁶) (widen-to-double, multiply, floor:
      // three correctly-rounded IEEE ops on identical inputs — engine-
      // exact, unlike decimal float rendering, whose sci-notation
      // thresholds differ between engines). Driver-gate rule: array
      // cells can't be hashed, so the final schema is scalar-only.
      (s, dir) => {
        val f6 = (c: org.apache.spark.sql.Column) =>
          Q.strArr(transform(c, x => floor(x.cast("double") * lit(1000000.0))))
        t(s, dir, "embeddings").select(
          col("vec_id"),
          f6(sort_array(slice(col("embedding"), 1, 6))).as("sorted6"),
          f6(sort_array(slice(col("embedding"), 1, 6), asc = false)).as("rsorted6"),
          f6(sort_array(array_distinct(slice(col("embedding"), 1, 6)))).as("distinct6"),
          f6(flatten(array(slice(col("embedding"), 1, 3),
            slice(col("embedding"), 4, 3)))).as("flat6"))
      },
      Some {
        def f6(inner: String) = Q.strArrSql(
          s"list_transform($inner, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        s"""SELECT vec_id,
                     ${f6("list_sort(embedding[1:6])")} AS sorted6,
                     ${f6("list_reverse_sort(embedding[1:6])")} AS rsorted6,
                     ${f6("list_sort(list_distinct(embedding[1:6]))")} AS distinct6,
                     ${f6("flatten([embedding[1:3], embedding[4:6]])")} AS flat6
              FROM embeddings"""
      }),

    "q_fn_geo" -> Q(
      // greatCircleDistance through the dialect: synthetic coordinates
      // derived from the customer key (pure integer-mod arithmetic —
      // identical on both engines), distance to a fixed point. Rounded
      // to whole meters: both sides evaluate the same closed-form
      // haversine; only libm ulp differences separate them, far inside
      // the 1 m grid.
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("cust_geo")
        s.sql("""SELECT c_custkey,
                        round(greatCircleDistance(lon, lat, 2.349014, 48.864716), 0)
                          AS dist_m
                 FROM (SELECT c_custkey,
                              (c_custkey % 360) - 180 + 0.5 AS lon,
                              (c_custkey % 170) - 85 + 0.5  AS lat
                       FROM cust_geo)""")
      },
      Some("""WITH pts AS (SELECT c_custkey,
                                  (c_custkey % 360) - 180 + 0.5 AS lon,
                                  (c_custkey % 170) - 85 + 0.5  AS lat
                           FROM customer)
              SELECT c_custkey,
                     round(2.0 * 6371000.0 * asin(sqrt(least(
                       pow(sin(radians(48.864716 - lat) * 0.5), 2) +
                       cos(radians(lat)) * cos(radians(48.864716)) *
                       pow(sin(radians(2.349014 - lon) * 0.5), 2), 1.0))), 0)
                       AS dist_m
              FROM pts"""))
  )
}
