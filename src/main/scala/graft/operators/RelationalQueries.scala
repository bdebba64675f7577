package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The relational capability surface (SURVEY §2.2–§2.8, §2.10): every
 * operator a user of the reference stack reaches through its host
 * engines (DuckDB around `clickhouse_native(...)` scans, ClickHouse
 * through `clickhouse_scan` SQL passthrough — reference
 * README.md:63-75, src/clickhouse_scan.rs:78), re-expressed as
 * declarative Spark DataFrame plans so Catalyst supplies pushdown,
 * join selection, partial aggregation and whole-stage codegen.
 *
 * Determinism contract (FIXTURES.md §3): every LIMIT is paired with a
 * total ORDER BY; float aggregates are rounded in the final
 * projection; every computed column is aliased identically in the
 * Spark plan and the DuckDB oracle.
 *
 * Type parity notes (Spark ↔ DuckDB 1.0): integer SUMs are cast to
 * BIGINT in the oracle (DuckDB widens to HUGEINT); year/length/
 * datediff/floor/ceil/row_number are cast to Spark's result type.
 */
object RelationalQueries {

  val all: Seq[(String, Q)] = Seq(

    // ----- §2.2 projections / filters / scalar expressions ---------------

    "q_projection_all" -> Q(
      (s, dir) => t(s, dir, "region"),
      Some("SELECT * FROM region")),

    "q_projection_cols" -> Q(
      (s, dir) => t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

    "q_filter_neq" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_returnflag") =!= "N")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
              FROM lineitem WHERE l_returnflag != 'N'""")),

    "q_filter_compound" -> Q(
      (s, dir) => t(s, dir, "orders")
        .filter((col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
          || (col("o_orderpriority") === "1-URGENT" && !(col("o_totalprice") <= 50000.0)))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
              FROM orders
              WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
                 OR (o_orderpriority = '1-URGENT' AND NOT (o_totalprice <= 50000.0))""")),

    "q_expr_scalar" -> Q(
      (s, dir) => t(s, dir, "nation").select(
        col("n_nationkey"),
        (col("n_nationkey") * 2 + 1).as("k2"),
        lit("x").as("tag"),
        upper(col("n_name")).as("uname"),
        length(col("n_name")).as("name_len")),
      Some("""SELECT n_nationkey, n_nationkey * 2 + 1 AS k2, 'x' AS tag,
                     upper(n_name) AS uname, CAST(length(n_name) AS INTEGER) AS name_len
              FROM nation""")),

    // ----- §2.3 joins ------------------------------------------------------

    "q_join_inner" -> Q(
      (s, dir) => t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"), "inner")
        .select("n_nationkey", "n_name", "r_name"),
      Some("""SELECT n_nationkey, n_name, r_name
              FROM nation JOIN region ON n_regionkey = r_regionkey""")),

    "q_join_left" -> Q(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey"),
      Some("""SELECT c_custkey, c_name, o_orderkey
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey""")),

    "q_join_full" -> Q(
      (s, dir) => {
        val a = t(s, dir, "nation").filter(col("n_regionkey").isin(0, 1))
          .select(col("n_nationkey").as("ak"), col("n_name").as("a_name"))
        val b = t(s, dir, "nation").filter(col("n_regionkey").isin(1, 2))
          .select(col("n_nationkey").as("bk"), col("n_name").as("b_name"))
        a.join(b, col("ak") === col("bk"), "full")
          .select(coalesce(col("ak"), col("bk")).as("k"), col("a_name"), col("b_name"))
      },
      Some("""SELECT coalesce(ak, bk) AS k, a_name, b_name FROM
                (SELECT n_nationkey AS ak, n_name AS a_name FROM nation WHERE n_regionkey IN (0, 1)) a
                FULL JOIN
                (SELECT n_nationkey AS bk, n_name AS b_name FROM nation WHERE n_regionkey IN (1, 2)) b
                ON ak = bk""")),

    "q_join_semi" -> Q(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    "q_join_anti" -> Q(
      // customers with no high-value order (the restriction keeps the
      // result non-trivial: every customer has SOME order in this data)
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_totalprice > 400000.0)""")),

    "q_join_cross" -> Q(
      (s, dir) => t(s, dir, "region").select(col("r_name"))
        .crossJoin(t(s, dir, "nation").select(col("n_name"))),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    "q_join_theta" -> Q(
      // Non-equi predicate → BroadcastNestedLoopJoin; both sides tiny.
      (s, dir) => {
        val a = t(s, dir, "region").select(col("r_regionkey").as("ra"), col("r_name").as("name_a"))
        val b = t(s, dir, "region").select(col("r_regionkey").as("rb"), col("r_name").as("name_b"))
        a.join(b, col("ra") < col("rb")).select("name_a", "name_b")
      },
      Some("""SELECT a.r_name AS name_a, b.r_name AS name_b
              FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey""")),

    "q_join_broadcast" -> Q(
      // Explicit broadcast hint: dim side ships to every executor, no
      // shuffle of the fact side — the 100-TB-correct join shape.
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name"),
      Some("""SELECT c_custkey, n_name
              FROM customer JOIN nation ON c_nationkey = n_nationkey""")),

    "q_join_bloom" -> Q(
      // bloom-filter pre-filtered semi join (BloomJoin.bloomSemiJoin):
      // the dim keys aggregate into Spark's own mergeable bloom sketch,
      // probed as a codegen'd predicate at the fact scan BEFORE any
      // shuffle. False positives are removed by the exact semi join, so
      // the result — and the oracle — is the plain semi join.
      (s, dir) => BloomJoin.bloomSemiJoin(
          t(s, dir, "lineitem"),
          t(s, dir, "part").filter(col("p_size") === 1),
          "l_partkey", "p_partkey",
          expectedItems = 10000L, numBits = 131072L)
        .select("l_orderkey", "l_partkey", "l_quantity"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)""")),

    "q_join_any" -> Q(
      // CH ANY LEFT JOIN: each left row pairs with AT MOST ONE right
      // row — ClickHouse keeps one arbitrary row per key in the hash
      // table. The deterministic (and scale-correct) spelling reduces
      // the right side to one representative per key BEFORE the join:
      // min_by picks the first lineitem by linenumber, the aggregate is
      // mergeable (partial+final), and the join then carries one row
      // per key instead of the full fact fan-out — exactly the
      // hash-table collapse CH's ANY modifier buys, made explicit.
      // The pick-order must be TOTAL for the cross-engine gate: harness
      // linenumbers repeat within an order, so min_by on linenumber
      // alone would tie-break engine-arbitrarily; (linenumber, quantity)
      // packed into one integer key makes ties value-identical.
      (s, dir) => {
        val pick = col("l_linenumber").cast("long") * 1000000L +
          (col("l_quantity") * 100).cast("long")
        val anyLine = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(
            min(col("l_linenumber")).as("any_linenumber"),
            min_by(col("l_quantity"), pick).as("any_quantity"))
        t(s, dir, "orders")
          .join(anyLine, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("any_linenumber"), col("any_quantity"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, any_linenumber, any_quantity
              FROM orders LEFT JOIN (
                SELECT l_orderkey,
                       CAST(min(l_linenumber) AS INTEGER) AS any_linenumber,
                       min_by(l_quantity, CAST(l_linenumber AS BIGINT) * 1000000 +
                                          CAST(l_quantity * 100 AS BIGINT)) AS any_quantity
                FROM lineitem GROUP BY l_orderkey) a
                ON o_orderkey = l_orderkey""")),

    "q_join_asof" -> Q(
      // ASOF: for each purchase event, the latest signup by the same
      // user at-or-before it. Spark has no native asof join; the
      // scale-correct formulation is union + running `last(_, ignoreNulls)`
      // over one window — ONE shuffle on user_id and zero pair
      // explosion (a join+max re-pairs every purchase with every
      // earlier signup of the user before aggregating). Signups sort
      // before purchases at equal timestamps so ties stay inclusive
      // (p_ts >= s_ts). DuckDB oracle uses its native ASOF JOIN.
      (s, dir) => {
        val e = Q.events(s, dir).filter(col("event_type").isin("purchase", "signup"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), when(col("event_type") === "signup", 0).otherwise(1))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("last_signup_ts",
            last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" && col("last_signup_ts").isNotNull)
          .select(col("event_id"), col("last_signup_ts"))
      },
      Some(s"""SELECT p.event_id, s.ts AS last_signup_ts
              FROM (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'purchase') p
              ASOF JOIN (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'signup') s
              ON p.user_id = s.user_id AND p.ts >= s.ts""")),

    "q_join_asof_tolerance" -> Q(
      // ASOF with a MAX-STALENESS bound (pandas merge_asof tolerance /
      // QuestDB ASOF ... TOLERANCE): the latest signup at-or-before
      // each purchase counts only within 7 days — older matches null
      // out instead of silently pairing stale state. Same single
      // window shuffle as q_join_asof (the bound is a post-window
      // filter, not a join-shape change); LEFT semantics keep every
      // purchase row. The oracle composes DuckDB's native ASOF LEFT
      // JOIN with the same staleness CASE.
      (s, dir) => {
        val tolSec = 7L * 24 * 3600
        val e = Q.events(s, dir).filter(col("event_type").isin("purchase", "signup"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), when(col("event_type") === "signup", 0).otherwise(1))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("last_signup_ts",
            last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            when(col("last_signup_ts").isNotNull &&
              col("ts").cast("timestamp").cast("long") -
                col("last_signup_ts").cast("timestamp").cast("long") <= tolSec,
              col("last_signup_ts")).as("recent_signup_ts"))
      },
      Some(s"""SELECT p.event_id,
                     CASE WHEN s.ts IS NOT NULL
                            AND epoch(p.ts) - epoch(s.ts) <= 7 * 24 * 3600
                          THEN s.ts END AS recent_signup_ts
              FROM (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'purchase') p
              ASOF LEFT JOIN (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'signup') s
              ON p.user_id = s.user_id AND p.ts >= s.ts""")),

    "q_join_asof_exec" -> Q(
      // The same ASOF semantics through the CUSTOM OPERATOR
      // (graft.plans.AsofJoin: logical node -> strategy -> sorted merge
      // exec — the top tier of the extension ladder). Each side shuffles
      // once on user_id, sorts (user_id, ts) within partitions, then a
      // single forward pass joins with O(1) state. Same DuckDB ASOF
      // oracle as the composed q_join_asof — two independent
      // implementations, one hash to match.
      (s, dir) => {
        val e = Q.events(s, dir).filter(col("event_type").isin("purchase", "signup"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts").as("s_ts"))
        graft.plans.Asof.join(purchases, signups, Seq("user_id"), "ts", "s_ts")
          .select(col("event_id"), col("s_ts").as("last_signup_ts"))
      },
      Some(s"""SELECT p.event_id, s.ts AS last_signup_ts
              FROM (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'purchase') p
              ASOF JOIN (SELECT * FROM ${Q.eventsOracle} WHERE event_type = 'signup') s
              ON p.user_id = s.user_id AND p.ts >= s.ts""")),

    "q_join_range" -> Q(
      // Distributed range join (RangeJoin.pointInInterval): lineitem
      // ship-days against 31-day order windows via bucketed equi-join
      // + residual BETWEEN — one shuffle per side on the bucket id, NO
      // BroadcastNestedLoop/cartesian anywhere (plan-guarded in
      // RangeJoinSpec), each match exactly once by construction. The
      // oracle states the BETWEEN join directly. Day numbers and
      // integral quantity sums keep the whole key integer-exact.
      (s, dir) => {
        val epoch = lit("1992-01-01").cast("date")
        val pts = t(s, dir, "lineitem").select(
          datediff(col("l_shipdate").cast("date"), epoch).as("p_day"),
          col("l_quantity").cast("long").as("qty"))
        val iv = t(s, dir, "orders").filter(col("o_orderkey") % 199 === 0)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"), epoch).as("s_day"))
          .withColumn("e_day", col("s_day") + 30)
        RangeJoin.pointInInterval(pts, "p_day", iv, "s_day", "e_day", bucketWidth = 31)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_pts"), sum("qty").as("qty_sum"))
      },
      Some("""SELECT o.o_orderkey, count(*) AS n_pts,
                     CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
              FROM lineitem l,
                   (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
                    FROM orders WHERE o_orderkey % 199 = 0) o
              WHERE CAST(l.l_shipdate AS DATE) BETWEEN o.d AND o.d + 30
              GROUP BY o.o_orderkey""")),

    "q_join_interval_overlap" -> Q(
      // Interval×interval overlap join (RangeJoin.intervalOverlap):
      // 31-day order windows from two disjoint deterministic order
      // samples, joined on overlap via the same binned equi-join —
      // each pair emitted exactly once by the first-common-bucket
      // residual (no dedup pass; fuzz-pinned in RangeJoinSpec). The
      // oracle states the overlap predicate directly.
      (s, dir) => {
        val epoch = lit("1992-01-01").cast("date")
        def windows(mod: Long, rem: Long, keyName: String) =
          t(s, dir, "orders").filter(col("o_orderkey") % mod === rem)
            .select(col("o_orderkey").as(keyName),
              datediff(col("o_orderdate").cast("date"), epoch).as(s"${keyName}_s"))
            .withColumn(s"${keyName}_e", col(s"${keyName}_s") + 30)
        val a = windows(199L, 0L, "key_a")
        val b = windows(199L, 1L, "key_b")
        RangeJoin.intervalOverlap(a, "key_a_s", "key_a_e",
            b, "key_b_s", "key_b_e", bucketWidth = 31)
          .select(col("key_a"), col("key_b"),
            (greatest(col("key_a_s"), col("key_b_s")) -
              least(col("key_a_e"), col("key_b_e"))).cast("long").as("neg_overlap_days"))
      },
      Some("""WITH w AS (SELECT o_orderkey,
                     CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS s
                   FROM orders),
              a AS (SELECT o_orderkey AS key_a, s AS a_s, s + 30 AS a_e
                    FROM w WHERE o_orderkey % 199 = 0),
              b AS (SELECT o_orderkey AS key_b, s AS b_s, s + 30 AS b_e
                    FROM w WHERE o_orderkey % 199 = 1)
              SELECT key_a, key_b,
                     CAST(greatest(a_s, b_s) - least(a_e, b_e) AS BIGINT)
                       AS neg_overlap_days
              FROM a JOIN b ON a_s <= b_e AND b_s <= a_e""")),

    // ----- §2.4 aggregations ----------------------------------------------

    "q_count_star" -> Q(
      // The reference's flagship query (README.md:63, its one CI test).
      (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
      Some("SELECT count(*) AS cnt FROM lineitem")),

    "q_agg_max" -> Q(
      (s, dir) => t(s, dir, "lineitem").agg(
        max(col("l_quantity")).as("max_qty"),
        max(col("l_extendedprice")).as("max_price"),
        max(col("l_shipdate")).as("max_ship")),
      Some("""SELECT max(l_quantity) AS max_qty, max(l_extendedprice) AS max_price,
                     max(l_shipdate) AS max_ship FROM lineitem""")),

    "q_agg_basic" -> Q(
      // TPC-H Q1 shape: partial (map-side) agg + final agg, one shuffle
      // on the grouping key.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(l_extendedprice), 2) AS sum_price,
                     round(avg(l_quantity), 4) AS avg_qty,
                     min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                     count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    "q_agg_distinct" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("d_parts"),
          countDistinct(col("l_suppkey")).as("d_supps"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS d_parts,
                     count(DISTINCT l_suppkey) AS d_supps, count(*) AS cnt
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_groupingsets" -> Q(
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
                     round(sum(l_quantity), 2) AS sum_qty
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    "q_agg_stats" -> Q(
      // statistical aggregates (CH quantile()/stddevSamp() equivalents)
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(expr("median(l_quantity)"), 2).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 2).as("p90_qty")),
      Some("""SELECT l_returnflag,
                     round(stddev_samp(l_quantity), 6) AS sd_qty,
                     round(var_samp(l_quantity), 6) AS var_qty,
                     round(quantile_cont(l_quantity, 0.5), 2) AS med_qty,
                     round(quantile_cont(l_quantity, 0.9), 2) AS p90_qty
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_histogram" -> Q(
      // CH histogram(bins)(x) re-expressed in its EXACT regime: CH's
      // adaptive streaming bins are approximation machinery, so the
      // gate runs the fixed equal-width spelling (bin edges derived
      // from the data's min/max — a 1-row broadcast) where the bin of
      // every value is closed-form. The bin arithmetic is spelled
      // IDENTICALLY on both sides — (x − mn) * bins / (mx − mn),
      // floored, top edge clamped into the last bin — so each step is
      // the same IEEE double on each engine. Output is integer-only.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val mm = li.agg(min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
        li.crossJoin(broadcast(mm))
          .select(least(floor((col("l_quantity") - col("mn")) * lit(10)
              / (col("mx") - col("mn"))), lit(9)).cast("int").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("cnt"))
      },
      Some("""WITH mm AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
                          FROM lineitem)
              SELECT CAST(least(floor((l_quantity - mn) * 10 / (mx - mn)), 9) AS INTEGER)
                       AS bin, count(*) AS cnt
              FROM lineitem, mm GROUP BY bin""")),

    "q_agg_summap" -> Q(
      // CH sumMap(keys, values): merge per-row (keys[], values[]) map
      // entries across a group, summing values per key, result as
      // key-sorted parallel arrays. Re-expressed relationally: explode
      // the entries to thin (group, key, value) rows, hash-aggregate
      // (map-side combining — a hot key collapses per partition), then
      // reassemble sorted arrays per group. Values are integral
      // quantities summed as longs — exact at any parallelism.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val rows = li.select(col("l_linenumber").as("grp"),
          array(concat(lit("f_"), col("l_returnflag")),
            concat(lit("s_"), col("l_linestatus"))).as("ks"),
          array(col("l_quantity").cast("long"), lit(1L)).as("vs"))
        rows.select(col("grp"), explode(arrays_zip(col("ks"), col("vs"))).as("e"))
          .select(col("grp"), col("e.ks").as("k"), col("e.vs").as("v"))
          .groupBy("grp", "k").agg(sum("v").as("sv"))
          .groupBy("grp").agg(array_sort(collect_list(struct(col("k"), col("sv")))).as("kv"))
          .select(col("grp"),
            // serialized final projection (Q.strArr) — the driver's
            // gate can't hash array cells; array form spec-covered
            Q.strArr(transform(col("kv"), x => x.getField("k"))).as("keys"),
            Q.strArr(transform(col("kv"), x => x.getField("sv"))).as("sums"))
      },
      Some(s"""WITH e AS (
                SELECT l_linenumber AS grp, 'f_' || l_returnflag AS k,
                       CAST(l_quantity AS BIGINT) AS v FROM lineitem
                UNION ALL
                SELECT l_linenumber, 's_' || l_linestatus, 1 FROM lineitem),
              g AS (SELECT grp, k, CAST(sum(v) AS BIGINT) AS sv
                    FROM e GROUP BY grp, k)
              SELECT grp, ${Q.strArrSql("list(k ORDER BY k)")} AS keys,
                     ${Q.strArrSql("list(sv ORDER BY k)")} AS sums
              FROM g GROUP BY grp""")),

    "q_agg_moving_sum" -> Q(
      // CH groupArrayMovingSum(3)(x): per group, the array of
      // 3-element moving sums in element order. Relationally: a
      // ROWS-frame window sum over thin (group, ord, value) rows —
      // Tungsten's streaming frame, no per-row array slicing — then
      // one collect per group. (l_orderkey, l_linenumber) is NOT
      // unique in this data, so the frame orders by (ord, v): rows
      // still tied agree on v too, and swapping equal values leaves
      // every moving sum unchanged — the ms multiset per ord is
      // deterministic, and both sides collect by (ord, ms). Integral
      // long sums are exact at any parallelism.
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey").as("g"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("ord"),
          col("l_quantity").cast("long").as("v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("ord"), col("v")).rowsBetween(-2, 0)
        li.withColumn("ms", sum("v").over(w))
          .groupBy("g")
          .agg(array_sort(collect_list(struct(col("ord"), col("ms")))).as("kv"))
          .select(col("g"),
            // serialized final projection (Q.strArr) — driver-gate rule
            Q.strArr(transform(col("kv"), x => x.getField("ms"))).as("moving_sums"))
      },
      Some(s"""WITH r AS (SELECT l_suppkey AS g,
                     l_orderkey * 10 + l_linenumber AS ord,
                     CAST(l_quantity AS BIGINT) AS v FROM lineitem),
              m AS (SELECT g, ord,
                     CAST(sum(v) OVER (PARTITION BY g ORDER BY ord, v
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS ms
                   FROM r)
              SELECT g, ${Q.strArrSql("list(ms ORDER BY ord, ms)")} AS moving_sums
              FROM m GROUP BY g""")),

    "q_agg_deltasum" -> Q(
      // CH deltaSum(x): the sum of positive differences between
      // consecutive values in order — counter-reset-tolerant rate
      // accounting. Per-user event series ordered by (ts, event_id)
      // (a total order — event_id is unique), values in floor-cents so
      // the windowed lag/diff and the final sum are exact integer
      // arithmetic at any partitioning.
      (s, dir) => {
        val ev = Q.events(s, dir).select(col("user_id"), col("ts"),
          col("event_id"), floor(col("value") * 100).cast("long").as("cents"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        ev.withColumn("prev", lag("cents", 1).over(w))
          .groupBy("user_id").agg(
            sum(when(col("prev").isNotNull && col("cents") > col("prev"),
              col("cents") - col("prev")).otherwise(lit(0L))).as("delta_sum_cents"),
            count(lit(1)).as("n_events"))
      },
      Some(s"""WITH d AS (SELECT user_id,
                     CAST(floor(value * 100) AS BIGINT) AS cents,
                     lag(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
                   FROM ${Q.eventsOracle})
               SELECT user_id,
                      CAST(sum(CASE WHEN prev IS NOT NULL AND cents > prev
                                    THEN cents - prev ELSE 0 END) AS BIGINT)
                        AS delta_sum_cents,
                      count(*) AS n_events
               FROM d GROUP BY user_id""")),

    "q_agg_approx_distinct" -> Q(
      // HyperLogLog++-class sketch — the CH uniq() equivalent; mergeable
      // partial+final, the exact-distinct replacement at 100 TB. Raw
      // sketch estimates differ per engine, so the oracle-VISIBLE
      // columns are the exact count plus a boolean asserting the HLL
      // estimate landed within ±5% of it (HLL++ is deterministic for
      // fixed input+rsd, so the boolean is stable); the oracle emits
      // literal TRUE — an estimate drifting past the bound flips the
      // column and fails the hash gate. The raw-estimate behavior and
      // rsd sweep stay property-tested in RelationalOpsSpec.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          approx_count_distinct(col("l_partkey")).as("approx_raw"))
        .select(col("l_returnflag"), col("distinct_parts"),
          (abs(col("approx_raw") - col("distinct_parts"))
            <= col("distinct_parts") * 0.05).as("hll_within_5pct")),
      Some("""SELECT l_returnflag,
                     count(DISTINCT l_partkey) AS distinct_parts,
                     TRUE AS hll_within_5pct
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_corr" -> Q(
      // bivariate statistics (CH corr()/covarPop() equivalents)
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covp_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covs_qp")),
      Some("""SELECT l_returnflag,
                     round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
                     round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
                     round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_topk" -> Q(
      // CH topK(k) heavy hitters — mergeable Misra–Gries sketch
      // (functions/TopKAggregator.scala); partials summarize per
      // partition, only capacity-bounded maps cross the shuffle.
      // Oracle-gate configuration: k=2000 ⇒ TopKAggregator's internal
      // capacity 8×k = 16000, which exceeds the column cardinality
      // (1000 distinct suppliers at sf0.1 — scales as 10k×SF), so no
      // decrement ever fires, counts are true frequencies, and the
      // (count desc, value asc) tie-break is deterministic — a plain
      // GROUP BY + ORDER BY oracle applies. NOTE: this exactness is
      // SF-dependent — at SF > ~1.6 supplier cardinality passes 16000
      // and the gate silently leaves the exact regime; bump k with SF.
      // The genuinely-approximate small-capacity regime (estimates
      // within totalWeight/capacity) is property-tested in TopKAggSpec.
      (s, dir) => t(s, dir, "lineitem")
        .agg(call_function("topk_agg", col("l_suppkey"), lit(2000)).as("top"))
        .select(posexplode(col("top")))
        .filter(col("pos") < 10)
        .select(col("pos"), col("col.value").as("suppkey"),
          col("col.count_est").as("count_est")),
      Some("""SELECT CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey) - 1 AS INTEGER) AS pos,
                     l_suppkey AS suppkey, cnt AS count_est
              FROM (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey)
              QUALIFY pos < 10""")),

    "q_agg_topk_weighted" -> Q(
      // CH topKWeighted(k)(col, w): heavy hitters by accumulated WEIGHT
      // (here: suppliers by total quantity shipped, not line count) —
      // same mergeable sketch with the weighted Misra–Gries step. Same
      // exact-regime argument as q_agg_topk (capacity >= cardinality ⇒
      // weighted sums are exact); l_quantity is integral in this corpus
      // so the long cast is lossless on both engines.
      (s, dir) => t(s, dir, "lineitem")
        .agg(call_function("topk_weighted_agg", col("l_suppkey"),
          col("l_quantity").cast("long"), lit(2000)).as("top"))
        .select(posexplode(col("top")))
        .filter(col("pos") < 10)
        .select(col("pos"), col("col.value").as("suppkey"),
          col("col.count_est").as("qty_est")),
      Some("""SELECT CAST(row_number() OVER (ORDER BY w DESC, l_suppkey) - 1 AS INTEGER) AS pos,
                     l_suppkey AS suppkey, w AS qty_est
              FROM (SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
                    FROM lineitem GROUP BY l_suppkey)
              QUALIFY pos < 10""")),

    "q_funnel" -> Q(
      // CH windowFunnel: per-user view→click→purchase conversion depth
      // within a 1-hour window, aggregated into a step distribution.
      // Oracle: FunnelAgg's greedy pass (FunnelAggregator.scala) is
      // provably equivalent to an EXISTS formulation — the chain-start
      // it keeps per level is the LATEST one, which is maximally
      // permissive for the t <= start + window deadline, so
      // step >= L  ⟺  ∃ e_0..e_{L-1} with lvl(e_i)=i, ts(e_0) <= … <=
      // ts(e_{L-1}), and ts(e_i) <= ts(e_0) + window. That is a chain
      // of correlated EXISTS over the events table, which IS ANSI-SQL.
      // Merge/partitioning invariance stays covered by FunnelAggSpec.
      (s, dir) => {
        val lvl = when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(-1)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), lvl.as("lvl"))
          .where(col("lvl") >= 0)
          .groupBy("user_id")
          .agg(call_function("funnel_agg",
            col("tus"), col("lvl"), lit(3600L * 1000000L), lit(3)).as("funnel_step"))
          .groupBy("funnel_step")
          .agg(count(lit(1)).as("users"))
          .orderBy("funnel_step")
      },
      Some(s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                          FROM ${Q.eventsOracle}
                          WHERE event_type IN ('view', 'click', 'purchase'))
               SELECT funnel_step, count(*) AS users FROM (
                 SELECT u.user_id,
                   CASE WHEN EXISTS (SELECT 1 FROM e v, e c, e p
                               WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                                 AND p.user_id = u.user_id
                                 AND v.event_type = 'view' AND c.event_type = 'click'
                                 AND p.event_type = 'purchase'
                                 AND v.ts <= c.ts AND c.ts <= p.ts
                                 AND c.ts <= v.ts + INTERVAL 1 HOUR
                                 AND p.ts <= v.ts + INTERVAL 1 HOUR) THEN 3
                        WHEN EXISTS (SELECT 1 FROM e v, e c
                               WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                                 AND v.event_type = 'view' AND c.event_type = 'click'
                                 AND v.ts <= c.ts
                                 AND c.ts <= v.ts + INTERVAL 1 HOUR) THEN 2
                        WHEN EXISTS (SELECT 1 FROM e v
                               WHERE v.user_id = u.user_id
                                 AND v.event_type = 'view') THEN 1
                        ELSE 0 END AS funnel_step
                 FROM (SELECT DISTINCT user_id FROM e) u)
               GROUP BY funnel_step ORDER BY funnel_step""")),

    "q_agg_sequence_match" -> Q(
      // CH sequenceMatch('(?1).*(?2)'): per user, does a signup occur
      // strictly before a purchase? Pattern matching itself isn't
      // ANSI-SQL, but THIS pattern reduces to EXISTS over a self-join —
      // which is the oracle. Events in the same microsecond tie-break
      // by mask (signup bit < purchase bit), matching the oracle's
      // strict '<' on (ts, type) pairs only when timestamps differ; the
      // synthetic data has no same-user same-microsecond collisions.
      (s, dir) => {
        val m = when(col("event_type") === "signup", 1)
          .when(col("event_type") === "purchase", 2).otherwise(0)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), m.as("mask"))
          .groupBy("user_id")
          .agg(
            call_function("sequence_match_agg",
              col("tus"), col("mask"), lit("(?1).*(?2)")).as("m_gap"),
            call_function("sequence_match_agg",
              col("tus"), col("mask"), lit("(?1)(?2)")).as("m_adj"))
          .groupBy("m_gap", "m_adj").agg(count(lit(1)).as("users"))
          .orderBy("m_gap", "m_adj")
      },
      Some(s"""SELECT m_gap, m_adj, count(*) AS users FROM (
                 SELECT a.user_id,
                        coalesce(g.m_gap, false) AS m_gap,
                        a.m_adj AS m_adj
                 FROM (SELECT user_id,
                              bool_or(cur = 'signup' AND nxt = 'purchase') AS m_adj
                       FROM (SELECT user_id, event_type AS cur,
                                    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
                             FROM ${Q.eventsOracle}) ordered
                       GROUP BY user_id) a
                 LEFT JOIN (SELECT DISTINCT s.user_id, true AS m_gap
                            FROM ${Q.eventsOracle} s JOIN ${Q.eventsOracle} p
                              ON s.user_id = p.user_id
                            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
                              AND s.ts < p.ts) g
                   ON a.user_id = g.user_id)
               GROUP BY m_gap, m_adj ORDER BY m_gap, m_adj""")),

    "q_agg_sequence_count" -> Q(
      // CH sequenceCount('(?1)(?2)'): per user, how many times does a
      // view IMMEDIATELY precede a click (no event between)? A 2-token
      // adjacency chain can never overlap another when the two types
      // differ, so the count equals the lead()-pair count — which is
      // the SQL oracle. Output: distribution of per-user pair counts.
      (s, dir) => {
        val m = when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(0)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), m.as("mask"))
          .groupBy("user_id")
          .agg(call_function("sequence_count_agg",
            col("tus"), col("mask"), lit("(?1)(?2)")).cast("long").as("pairs"))
          .groupBy("pairs").agg(count(lit(1)).as("users"))
          .orderBy("pairs")
      },
      Some(s"""SELECT pairs, count(*) AS users FROM (
                 SELECT user_id,
                        count(*) FILTER (WHERE cur = 'view' AND nxt = 'click') AS pairs
                 FROM (SELECT user_id, event_type AS cur,
                              lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
                       FROM ${Q.eventsOracle}) ordered
                 GROUP BY user_id)
               GROUP BY pairs ORDER BY pairs""")),

    "q_agg_sequence_count_time" -> Q(
      // CH sequenceCount with a TIME CONSTRAINT — '(?1)(?t<=n)(?2)':
      // how many view→click adjacent pairs land within n µs? A 2-token
      // adjacency chain over differing types can never overlap another
      // (q_agg_sequence_count's argument), and the (?t) edge filters
      // by the same consecutive-event delta the oracle's lead() pair
      // computes — so the count equals the lead()-pair count under the
      // delta predicate.
      (s, dir) => {
        val m = when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2).otherwise(0)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), m.as("mask"))
          .groupBy("user_id")
          .agg(call_function("sequence_count_agg", col("tus"), col("mask"),
            lit("(?1)(?t<=600000000)(?2)")).cast("long").as("quick_pairs"))
          .groupBy("quick_pairs").agg(count(lit(1)).as("users"))
          .orderBy("quick_pairs")
      },
      Some(s"""SELECT quick_pairs, count(*) AS users FROM (
                 SELECT user_id,
                        count(*) FILTER (WHERE cur = 'view' AND nxt = 'click'
                                         AND dus <= 600000000) AS quick_pairs
                 FROM (SELECT user_id, event_type AS cur,
                              lead(event_type) OVER w AS nxt,
                              epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dus
                       FROM ${Q.eventsOracle}
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts)) o
                 GROUP BY user_id)
               GROUP BY quick_pairs ORDER BY quick_pairs""")),

    "q_agg_sequence_match_time" -> Q(
      // CH sequenceMatch with a TIME CONSTRAINT — '(?1)(?t<=n)(?2)':
      // a signup immediately followed by a purchase within n µs (and
      // the '>' direction as the second aggregate). The (?t) edge is
      // exact under this repo's adjacency semantics (it constrains
      // the delta of two CONSECUTIVE events), so it reduces to a
      // lead()-pair predicate — which is the oracle. Same no-same-µs
      // tie justification as q_agg_sequence_match.
      (s, dir) => {
        val m = when(col("event_type") === "signup", 1)
          .when(col("event_type") === "purchase", 2).otherwise(0)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tus"), m.as("mask"))
          .groupBy("user_id")
          .agg(
            call_function("sequence_match_agg", col("tus"), col("mask"),
              lit("(?1)(?t<=600000000)(?2)")).as("m_within"),
            call_function("sequence_match_agg", col("tus"), col("mask"),
              lit("(?1)(?t>600000000)(?2)")).as("m_beyond"))
          .groupBy("m_within", "m_beyond").agg(count(lit(1)).as("users"))
          .orderBy("m_within", "m_beyond")
      },
      Some(s"""SELECT m_within, m_beyond, count(*) AS users FROM (
                 SELECT user_id,
                        coalesce(bool_or(cur = 'signup' AND nxt = 'purchase'
                                         AND dus <= 600000000), false) AS m_within,
                        coalesce(bool_or(cur = 'signup' AND nxt = 'purchase'
                                         AND dus > 600000000), false) AS m_beyond
                 FROM (SELECT user_id, event_type AS cur,
                              lead(event_type) OVER w AS nxt,
                              epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dus
                       FROM ${Q.eventsOracle}
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts)) o
                 GROUP BY user_id)
               GROUP BY m_within, m_beyond ORDER BY m_within, m_beyond""")),

    "q_agg_conditional" -> Q(
      // CH countIf/sumIf/avgIf — conditional aggregation without a
      // pre-filter (each aggregate sees a different predicate). Spark
      // spells it count/sum/avg over when() (nulls are skipped by all
      // aggregates); the oracle uses SQL FILTER clauses.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("big_cnt"),
          sum(when(col("l_linestatus") === "F", col("l_quantity")))
            .cast("double").as("f_qty"),
          round(avg(when(col("l_discount") > 0.05, col("l_extendedprice"))), 4)
            .as("hi_disc_avg")),
      Some("""SELECT l_returnflag,
                     count(*) FILTER (WHERE l_quantity > 25) AS big_cnt,
                     CAST(sum(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS f_qty,
                     round(avg(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4) AS hi_disc_avg
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_argminmax" -> Q(
      // CH argMax(x, y)/argMin(x, y) — the value of x at the extreme of
      // y. Deterministic because o_orderkey (the ordering value) is
      // unique; max_by on a tied value would be engine-dependent.
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          max_by(col("o_custkey"), col("o_orderkey")).as("last_cust"),
          min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
          max(col("o_orderkey")).as("max_key")),
      Some("""SELECT o_orderpriority,
                     arg_max(o_custkey, o_orderkey) AS last_cust,
                     arg_min(o_custkey, o_orderkey) AS first_cust,
                     max(o_orderkey) AS max_key
              FROM orders GROUP BY o_orderpriority""")),

    "q_agg_approx_quantile" -> Q(
      // Greenwald–Khanna approximate percentile (CH quantile() default
      // is approximate too) — mergeable sketch, the 100-TB replacement
      // for exact sort-based quantiles. Oracle-gate configuration:
      // accuracy 2^30 makes the permitted rank error εn < 1 at any
      // correctness SF, i.e. the sketch returns the exact discrete
      // order statistic — and Spark's rank definition (smallest element
      // with rank >= ceil(p·n)) matches DuckDB's quantile_disc
      // (verified empirically incl. fractional-rank edges), so the SQL
      // gate applies. The genuinely-approximate small-accuracy regime
      // keeps its ±2% bound in RelationalOpsSpec.
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1073741824))
            .as("approx_p50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1073741824))
            .as("approx_p95")),
      Some("""SELECT l_returnflag,
                     quantile_disc(l_extendedprice, 0.5) AS approx_p50,
                     quantile_disc(l_extendedprice, 0.95) AS approx_p95
              FROM lineitem GROUP BY l_returnflag""")),

    "q_agg_having" -> Q(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n_orders"))
        .filter(col("total") > 500000.0),
      Some("""SELECT o_custkey, round(sum(o_totalprice), 2) AS total,
                     count(*) AS n_orders
              FROM orders GROUP BY o_custkey
              HAVING round(sum(o_totalprice), 2) > 500000.0""")),

    "q_agg_collect" -> Q(
      // list aggregation (CH groupArray equivalent); sorted for
      // determinism, then serialized to a delimited string because the
      // driver's comparator cannot hash array-typed cells. The array
      // form itself is covered by RelationalOpsSpec ("q_agg_collect
      // array form").
      (s, dir) => t(s, dir, "nation")
        .groupBy("n_regionkey")
        .agg(array_join(sort_array(collect_list(col("n_name"))), "|").as("names"),
          count(lit(1)).as("n")),
      Some("""SELECT n_regionkey,
                     array_to_string(list_sort(list(n_name)), '|') AS names,
                     count(*) AS n
              FROM nation GROUP BY n_regionkey""")),

    "q_pivot" -> Q(
      // pivot: one column per l_returnflag value; oracle spells it as
      // conditional aggregation (the relational core of PIVOT)
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")), 2))
        .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r")),
      Some("""SELECT l_linestatus,
                     round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
                     round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
                     round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
              FROM lineitem GROUP BY l_linestatus""")),

    "q_unpivot" -> Q(
      // UNPIVOT (wide → long), the inverse reshaping of q_pivot:
      // Spark's stack() generator melts two measure columns into
      // (metric, val) rows; the oracle is the relational core of
      // UNPIVOT — one UNION ALL branch per measure. Money travels as
      // floor-cents (floor of the SAME double is engine-identical;
      // a bare CAST would truncate in Spark but round in DuckDB).
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        expr("""stack(2,
          'qty', CAST(l_quantity AS LONG),
          'price_cents', floor(l_extendedprice * 100)) AS (metric, val)""")),
      Some("""SELECT l_orderkey, l_linenumber, 'qty' AS metric,
                     CAST(l_quantity AS BIGINT) AS val FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'price_cents',
                     CAST(floor(l_extendedprice * 100) AS BIGINT) FROM lineitem""")),

    "q_with_fill" -> Q(
      // ClickHouse `ORDER BY day WITH FILL` (gap-filled time series)
      // re-expressed declaratively: per-type daily counts, then every
      // missing day in each type's own [min_day, max_day] span
      // materialized with cnt=0. The calendar is generated
      // DISTRIBUTED — sequence() + explode inside the plan, sized by
      // the per-type span aggregate — not by a driver loop; observed
      // counts land via left join. Dates and counts are integers, so
      // the gate is engine-exact. At 100 TB the span table is
      // group-cardinality-sized (broadcasts) and the fill output is
      // bounded by groups × days, both tiny next to the event stream.
      (s, dir) => {
        // value > 250 keeps the daily series SPARSE at every SF (7 of
        // 14 calendar rows filled at sf0.001, 82 of 136 at sf0.01) —
        // an unfiltered series is gap-free and the fill never fires
        val daily = Q.events(s, dir).filter(col("value") > 250)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val cal = daily.groupBy("event_type")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("event_type"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        cal.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
      },
      Some(s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS cnt
                     FROM ${Q.eventsOracle} e WHERE value > 250 GROUP BY 1, 2),
              spans AS (SELECT event_type, min(day) AS d0, max(day) AS d1
                     FROM daily GROUP BY 1),
              cal AS (SELECT event_type,
                       CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                         CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                     FROM spans)
              SELECT c.event_type, c.day, coalesce(d.cnt, 0) AS cnt
              FROM cal c LEFT JOIN daily d
                ON c.event_type = d.event_type AND c.day = d.day""")),

    "q_with_fill_interpolate" -> Q(
      // ClickHouse `WITH FILL ... INTERPOLATE (x AS x)` — gap rows
      // carry the PREVIOUS observed value forward instead of a
      // constant: same distributed spine as q_with_fill, then a
      // last-ignoring-nulls frame window per group (sorted once within
      // the group partition — no extra shuffle over the fill join).
      // Value = daily event count in exact integers; days before the
      // first observation of a group can't occur (spine starts at the
      // group's min day), so the carry is total.
      (s, dir) => {
        val daily = Q.events(s, dir).filter(col("value") > 250)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val cal = daily.groupBy("event_type")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("event_type"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cal.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            col("cnt").isNotNull.as("observed"),
            last(col("cnt"), ignoreNulls = true).over(w).as("cnt_ff"))
      },
      Some(s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS cnt
                     FROM ${Q.eventsOracle} e WHERE value > 250 GROUP BY 1, 2),
              spans AS (SELECT event_type, min(day) AS d0, max(day) AS d1
                     FROM daily GROUP BY 1),
              cal AS (SELECT event_type,
                       CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                         CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                     FROM spans)
              SELECT c.event_type, c.day,
                     d.cnt IS NOT NULL AS observed,
                     last_value(d.cnt IGNORE NULLS) OVER (
                       PARTITION BY c.event_type ORDER BY c.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt_ff
              FROM cal c LEFT JOIN daily d
                ON c.event_type = d.event_type AND c.day = d.day""")),

    "q_join_fuzzy" -> Q(
      // Fuzzy join (FuzzyJoin.editDistance1): part names against
      // deterministically-misspelled probes (middle character
      // deleted), matched at levenshtein <= 1 via symmetric-delete
      // blocking — recall provably 1.0, exact-distance verify, no
      // cross join (plan-guarded in FuzzyJoinSpec). The oracle brute-
      // forces levenshtein over the small distinct-name domain.
      (s, dir) => {
        val names = t(s, dir, "part").select(col("p_name")).distinct()
        val probes = names.select(expr(
          """concat(substr(p_name, 1, CAST(length(p_name) / 2 AS INT) - 1),
                    substr(p_name, CAST(length(p_name) / 2 AS INT) + 1))""")
          .as("probe"))
        FuzzyJoin.editDistance1(probes, "probe", names, "p_name")
      },
      Some("""WITH names AS (SELECT DISTINCT p_name FROM part),
              probes AS (SELECT DISTINCT
                     substr(p_name, 1, length(p_name) // 2 - 1) ||
                     substr(p_name, length(p_name) // 2 + 1) AS probe
                   FROM names)
              SELECT p.probe AS l_val, n.p_name AS r_val,
                     CAST(levenshtein(p.probe, n.p_name) AS INTEGER) AS dist
              FROM probes p, names n
              WHERE levenshtein(p.probe, n.p_name) <= 1""")),

    "q_agg_maxintersections" -> Q(
      // CH maxIntersections(start, end): the peak number of
      // simultaneously-open intervals — re-expressed as the classic
      // sweep-line: ±1 events at start and end+1, running ROWS-frame
      // sum ordered by (pos, delta) (ends before starts at the same
      // position — correct for closed intervals), max per group. Tied
      // events are interchangeable (+1 runs ascend through any
      // permutation), so the group max is deterministic; all integer.
      (s, dir) => {
        val epoch = lit("1992-01-01").cast("date")
        val iv = t(s, dir, "orders").select(col("o_orderpriority").as("grp"),
          datediff(col("o_orderdate").cast("date"), epoch).as("s"))
        val ev = iv.select(col("grp"), col("s").as("pos"), lit(1L).as("d"))
          .unionByName(iv.select(col("grp"), (col("s") + 31).as("pos"),
            lit(-1L).as("d")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("pos"), col("d"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        ev.withColumn("open", sum("d").over(w))
          .groupBy("grp").agg(max("open").as("max_open"))
      },
      Some("""WITH iv AS (SELECT o_orderpriority AS grp,
                     CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS s
                   FROM orders),
              ev AS (SELECT grp, s AS pos, 1 AS d FROM iv
                     UNION ALL
                     SELECT grp, s + 31, -1 FROM iv),
              r AS (SELECT grp, CAST(sum(d) OVER (PARTITION BY grp
                     ORDER BY pos, d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open
                   FROM ev)
              SELECT grp, max(open) AS max_open FROM r GROUP BY grp""")),

    "q_sample_stratified" -> Q(
      // stratified sampling (per-class fractions) — the training-data
      // rebalancing primitive, in its DETERMINISTIC form: membership is
      // a multiplicative hash of the row key against a per-stratum
      // threshold (Knuth's 2654435761 mod 2^32, bucketed mod 1000).
      // Hash sampling beats seeded RNG at 100 TB — membership is
      // reproducible across reruns/engines/partitionings, which makes
      // it SQL-expressible and oracle-able; per-stratum proportions are
      // bounded in RelationalOpsSpec, and the seeded-Bernoulli
      // `sampleBy` formulation is exercised there too.
      (s, dir) => {
        val bucket =
          pmod(col("o_orderkey") * lit(2654435761L), lit(4294967296L)) % 1000
        val thresh = when(col("o_orderpriority") === "1-URGENT", 500)
          .when(col("o_orderpriority") === "2-HIGH", 250)
          .otherwise(100)
        t(s, dir, "orders")
          .filter(bucket < thresh)
          .select("o_orderkey", "o_orderpriority")
      },
      Some("""SELECT o_orderkey, o_orderpriority FROM orders
              WHERE ((o_orderkey * 2654435761) % 4294967296) % 1000 <
                    CASE o_orderpriority WHEN '1-URGENT' THEN 500
                                         WHEN '2-HIGH' THEN 250
                                         ELSE 100 END""")),

    "q_sample_clause" -> Q(
      // CH's `SAMPLE k OFFSET m` SELECT clause — deterministic
      // key-hash sampling over a fixed slice of hash space: the
      // sampling key maps uniformly onto [0, 2^32) (same Knuth
      // multiplicative hash the other sampling keys use) and
      // SAMPLE 1/10 OFFSET 3/10 keeps the [0.3·2^32, 0.4·2^32) slice —
      // repeatable across reruns/engines/partitionings, and disjoint
      // OFFSET slices compose to the full table (CH's parallel-
      // processing idiom). Pure per-row arithmetic, zero shuffles.
      (s, dir) => {
        val b = pmod(col("o_orderkey") * lit(2654435761L), lit(4294967296L))
        t(s, dir, "orders")
          .filter(b >= lit(1288490188L) && b < lit(1717986918L)) // ⌊0.3·2^32⌋..⌊0.4·2^32⌋
          .select("o_orderkey", "o_custkey", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE ((o_orderkey * 2654435761) % 4294967296) >= 1288490188
                AND ((o_orderkey * 2654435761) % 4294967296) < 1717986918""")),

    "q_sample_weighted" -> Q(
      // Efraimidis–Spirakis weighted sampling without replacement
      // (TextPipeline.weightedSample): top-k by qlog2(u)/w with the
      // deterministic hash uniform — inclusion probability ∝ weight,
      // reproducible across engines. qlog2 is Mitchell's piecewise-
      // linear log2 (bitlen + power-of-two-divided mantissa): every
      // step exact in IEEE doubles except the one final correctly-
      // rounded division, so skey is bit-identical on both engines
      // with NO rounding step (the earlier libm-ln + 6dp spelling
      // hash-failed on a half-boundary straddle, r5 verdict).
      (s, dir) => TextPipeline.weightedSample(
        t(s, dir, "orders"), "o_orderkey", "o_totalprice", k = 100),
      Some("""WITH s AS (SELECT o_orderkey AS id,
                     CAST(o_totalprice AS DOUBLE) AS w,
                     ((o_orderkey % 1000003) * 2654435761) % 4294967296 AS h
                   FROM orders WHERE o_totalprice > 0),
              m AS (SELECT id, w, h * 2 + 1 AS m FROM s),
              b AS (SELECT id, w, m, length(bin(m)) AS bl FROM m)
              SELECT id, w,
                     (CAST(bl AS DOUBLE) - 35.0
                      + CAST(m AS DOUBLE) / CAST(1::BIGINT << (bl - 1) AS DOUBLE)) / w
                       AS skey
              FROM b ORDER BY skey DESC, id LIMIT 100""")),

    // ----- §2.5 window functions ------------------------------------------

    "q_window_rank" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
      },
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
                     CAST(row_number() OVER w AS INTEGER) AS rn,
                     CAST(rank() OVER w AS INTEGER) AS rk,
                     CAST(dense_rank() OVER w AS INTEGER) AS drk
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""")),

    "q_window_analytic" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Q.events(s, dir).filter(col("user_id") < 50).select(
          col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("value")).over(w).as("first_value"))
      },
      Some(s"""SELECT event_id, user_id, value,
                     lag(value, 1) OVER w AS prev_value,
                     lead(value, 1) OVER w AS next_value,
                     first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value
              FROM ${Q.eventsOracle} WHERE user_id < 50
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    "q_window_ntile" -> Q(
      // distribution ranking: ntile buckets + relative ranks. The
      // percent_rank/cume_dist RATIOS are re-projected onto their
      // exact integer preimages (rank−1 and rows≤current) for the
      // gate: round(ratio, 6) straddles a decimal half-boundary at
      // some partition sizes (observed at sf0.1: k/n ≈ 0.0640625 →
      // Spark 0.064063, DuckDB 0.064062), while ratio × n rounds back
      // to the exact integer at ANY SF — the float window machinery
      // still runs and a wrong ratio still flips the integer.
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
        val n = count(lit(1)).over(Window.partitionBy("c_nationkey"))
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w) * (n - 1)).cast("long").as("rank0"),
          round(cume_dist().over(w) * n).cast("long").as("cume_rows"))
      },
      Some("""SELECT c_custkey, c_nationkey,
                     CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                     CAST(round(percent_rank() OVER w * (count(*) OVER p - 1)) AS BIGINT) AS rank0,
                     CAST(round(cume_dist() OVER w * count(*) OVER p) AS BIGINT) AS cume_rows
              FROM customer
              WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
                     p AS (PARTITION BY c_nationkey)""")),

    "q_window_frame" -> Q(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      },
      Some("""SELECT o_orderkey, o_custkey,
                     round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
              FROM orders""")),

    // ----- §2.10 time windows (batch form) --------------------------------

    "q_window_time_tumbling" -> Q(
      (s, dir) => Q.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("sum_value")),
      Some(s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart, event_type,
                     count(*) AS cnt, round(sum(value), 2) AS sum_value
              FROM ${Q.eventsOracle} GROUP BY 1, 2""")),

    "q_window_time_sliding" -> Q(
      // sliding windows (10 min length, 5 min slide): every event lands
      // in exactly two windows; oracle expands via a 2-element unnest
      (s, dir) => Q.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt")),
      Some(s"""SELECT time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS wstart,
                     event_type, count(*) AS cnt
              FROM ${Q.eventsOracle} e
              CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
              GROUP BY 1, 2""")),

    "q_window_time_session" -> Q(
      // session windows, batch form (15-minute inactivity gap); oracle
      // is the classic gaps-and-islands rewrite. Probed empirically:
      // Spark session_window MERGES events exactly `gap` apart, so a
      // new island starts only at diff strictly > gap.
      (s, dir) => Q.events(s, dir)
        .groupBy(session_window(col("ts"), "15 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
          col("user_id"), col("n_events")),
      Some(s"""WITH o AS (
                 SELECT user_id, ts,
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                 FROM ${Q.eventsOracle}),
               g AS (
                 SELECT user_id, ts,
                        sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL '15 minutes'
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess
                 FROM o)
              SELECT min(ts) AS session_start,
                     max(ts) + INTERVAL '15 minutes' AS session_end,
                     user_id, count(*) AS n_events
              FROM g GROUP BY user_id, sess""")),

    // ----- §2.6 sorts / limits / top-k ------------------------------------

    "q_limit" -> Q(
      (s, dir) => t(s, dir, "orders").orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice").limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_orderkey LIMIT 10""")),

    "q_sort" -> Q(
      (s, dir) => t(s, dir, "customer")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
              ORDER BY c_acctbal DESC, c_custkey""")),

    "q_topk" -> Q(
      // orderBy + limit → TakeOrderedAndProject: per-partition top-k,
      // only k rows per partition reach the driver-side merge.
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(15),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")),

    // ----- §2.7 set operations --------------------------------------------

    "q_union_all" -> Q(
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("c").as("src"))
        .unionAll(t(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("s").as("src"))),
      Some("""SELECT c_custkey AS id, c_name AS name, 'c' AS src FROM customer
              UNION ALL
              SELECT s_suppkey AS id, s_name AS name, 's' AS src FROM supplier""")),

    "q_intersect" -> Q(
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT
              SELECT s_nationkey AS nk FROM supplier""")),

    "q_except" -> Q(
      // customers minus urgent-order customers (unrestricted orders
      // cover every customer → empty result proves nothing)
      (s, dir) => t(s, dir, "customer").select(col("c_custkey").as("k"))
        .except(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k"))),
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT
              SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'""")),

    "q_intersect_all" -> Q(
      // duplicate-preserving set ops (multiset semantics)
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(t(s, dir, "supplier").select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT ALL
              SELECT s_nationkey AS nk FROM supplier""")),

    "q_except_all" -> Q(
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").as("nk"))),
      Some("""SELECT c_nationkey AS nk FROM customer
              EXCEPT ALL
              SELECT s_nationkey AS nk FROM supplier""")),

    // ----- §2.8 scalar function families ----------------------------------

    "q_fn_string" -> Q(
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_name"), 1, 8).as("prefix"),
        regexp_replace(col("p_name"), " ", "-").as("dashed"),
        trim(col("p_name")).as("trimmed"),
        col("p_name").like("%al%").as("has_al"),
        col("p_name").rlike("^[a-m]").as("starts_low")),
      Some("""SELECT p_partkey,
                     p_brand || '_' || p_type AS brand_type,
                     upper(p_name) AS uname, lower(p_brand) AS lbrand,
                     substring(p_name, 1, 8) AS prefix,
                     regexp_replace(p_name, ' ', '-', 'g') AS dashed,
                     trim(p_name) AS trimmed,
                     p_name LIKE '%al%' AS has_al,
                     regexp_matches(p_name, '^[a-m]') AS starts_low
              FROM part""")),

    "q_fn_string_search" -> Q(
      // CH position / countSubstrings / multiSearchAny / startsWith /
      // endsWith: substring search as codegen'd column expressions.
      // countSubstrings spelled on the length-difference identity
      // (non-overlapping occurrences, same as CH); multiSearchAny as a
      // single alternation regex — one scan per row either way.
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        locate("al", col("p_name")).as("pos_al"),
        ((length(col("p_name")) - length(regexp_replace(col("p_name"), "an", ""))) / 2)
          .cast("int").as("cnt_an"),
        col("p_name").rlike("red|blue|green").as("any_color"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_name").endsWith("e").as("ends_e")),
      Some("""SELECT p_partkey,
                     CAST(position('al' IN p_name) AS INTEGER) AS pos_al,
                     CAST((length(p_name) - length(replace(p_name, 'an', ''))) / 2
                       AS INTEGER) AS cnt_an,
                     regexp_matches(p_name, 'red|blue|green') AS any_color,
                     starts_with(p_name, 'a') AS starts_a,
                     ends_with(p_name, 'e') AS ends_e
              FROM part""")),

    "q_fn_date" -> Q(
      (s, dir) => t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        to_date(col("o_orderdate")).as("order_day"),
        datediff(lit("1996-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_1996")),
      Some("""SELECT o_orderkey,
                     CAST(year(o_orderdate) AS INTEGER) AS y,
                     CAST(month(o_orderdate) AS INTEGER) AS m,
                     CAST(day(o_orderdate) AS INTEGER) AS d,
                     CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                     CAST(o_orderdate AS DATE) AS order_day,
                     CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INTEGER) AS days_to_1996
              FROM orders""")),

    "q_fn_math" -> Q(
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        // per-row double arithmetic is bit-identical across engines —
        // no rounding (round() half-behaviour differs at exact .xx5)
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod")),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_extendedprice * (1 - l_discount) AS net,
                     CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
                     CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
                     abs(l_discount - 0.05) AS disc_dev,
                     CAST(mod(l_orderkey, 7) AS BIGINT) AS key_mod
              FROM lineitem""")),

    "q_fn_array" -> Q(
      // + 0.0 after each round: a tiny negative element rounds to -0.0
      // in DuckDB but +0.0 in Spark (observed on one sf0.1 embedding);
      // IEEE -0.0 + 0.0 = +0.0 normalizes the sign on both engines and
      // is the identity everywhere else (same fix as q_agg_moments).
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        (round(element_at(col("embedding"), 1).cast("double"), 4) + 0.0).as("first_elem"),
        (round(aggregate(transform(col("embedding"), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4) + 0.0).as("elem_sum"),
        array_contains(array(lit(1), lit(2), lit(3)), col("label")).as("label_in_123")),
      Some("""SELECT vec_id,
                     CAST(len(embedding) AS INTEGER) AS dim,
                     round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_elem,
                     round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) + 0.0 AS elem_sum,
                     list_contains([1, 2, 3], label) AS label_in_123
              FROM embeddings""")),

    "q_fn_explode" -> Q(
      // generator/table-function surface (§2.11): one row per word —
      // Spark's explode ⇄ DuckDB's unnest. The multiset compare is
      // order-insensitive, so no ORDER BY needed.
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        explode(split(col("p_name"), " ")).as("word")),
      Some("""SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
              FROM part""")),

    "q_fn_map" -> Q(
      // Map construct + access exercised Spark-side; the oracle computes
      // the expected values directly (DuckDB's map dialect differs).
      (s, dir) => t(s, dir, "nation").select(
        col("n_nationkey"),
        element_at(
          str_to_map(concat(lit("k:"), col("n_name"), lit(",v:"), col("n_nationkey")), lit(","), lit(":")),
          "k").as("k_val"),
        element_at(map(lit("a"), lit(1), lit("b"), lit(2)), "b").as("b_val"),
        size(map(lit("a"), lit(1), lit("b"), lit(2))).as("n_keys")),
      Some("""SELECT n_nationkey, n_name AS k_val, 2 AS b_val, 2 AS n_keys FROM nation""")),

    "q_fn_json" -> Q(
      // one from_json parse per row feeding all three projections —
      // three get_json_object calls would re-parse the document thrice
      (s, dir) => {
        val parsed = from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("missing", org.apache.spark.sql.types.StringType))))
        Q.events(s, dir).withColumn("j", parsed).select(
          col("event_id"),
          col("j.k").as("k_str"),
          col("j.k").cast("int").as("k_int"),
          col("j.missing").as("absent"))
      },
      Some("""SELECT event_id,
                     json_extract_string(props, '$.k') AS k_str,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                     json_extract_string(props, '$.missing') AS absent
              FROM events""")),

    "q_fn_conditional" -> Q(
      (s, dir) => t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        when(col("c_acctbal") > 0, col("c_acctbal")).as("pos_bal")),
      Some("""SELECT c_custkey,
                     CASE WHEN c_acctbal < 0 THEN 'neg'
                          WHEN c_acctbal < 5000 THEN 'mid'
                          ELSE 'high' END AS tier,
                     coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
                     CASE WHEN c_acctbal > 0 THEN c_acctbal END AS pos_bal
              FROM customer""")),

    "q_fn_struct" -> Q(
      // CH Tuple construction + element access (tuple(x,y).1 / named
      // tuples). Final projection flattens to scalars so both engines
      // hash comparable columns.
      (s, dir) => {
        val tup = struct(col("n_name").as("nm"), col("n_regionkey").as("rk"))
        t(s, dir, "nation").select(
          col("n_nationkey"),
          tup.getField("nm").as("nm"),
          (tup.getField("rk") + 1).as("rk1"))
      },
      Some("""SELECT n_nationkey,
                     (struct_pack(nm := n_name, rk := n_regionkey)).nm AS nm,
                     (struct_pack(nm := n_name, rk := n_regionkey)).rk + 1 AS rk1
              FROM nation""")),

    "q_fn_bitwise" -> Q(
      // CH bitAnd/bitOr/bitXor/bitNot/bitShiftLeft family. DuckDB's `^`
      // is exponentiation, so the oracle spells XOR as xor(); Spark's
      // shiftleft preserves the input width, so both sides stay BIGINT.
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_orderkey").bitwiseAND(255)).as("and255"),
        (col("l_orderkey").bitwiseOR(col("l_linenumber"))).as("or_ln"),
        (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("xor_pk"),
        shiftleft(col("l_linenumber"), 4).as("shl4"),
        shiftright(col("l_orderkey"), 3).as("shr3")),
      Some("""SELECT l_orderkey, l_linenumber,
                     l_orderkey & 255 AS and255,
                     l_orderkey | l_linenumber AS or_ln,
                     xor(l_orderkey, l_partkey) AS xor_pk,
                     l_linenumber << 4 AS shl4,
                     l_orderkey >> 3 AS shr3
              FROM lineitem""")),

    "q_limit_by" -> Q(
      // ClickHouse `LIMIT 3 BY o_orderpriority` (top-N rows per group,
      // distinct from global LIMIT): re-expressed as a ranked window +
      // filter, which is exactly the partial-TopK plan Spark runs for
      // it (rank inside each hash partition, no global sort). Ties are
      // broken on o_orderkey so the selected rows are deterministic.
      // At 100 TB this is one shuffle on the BY key with per-group
      // state bounded by N — the same cost model as CH's LIMIT BY.
      (s, dir) => t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice
              FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                           row_number() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                    FROM orders)
              WHERE rn <= 3""")),

    "q_with_totals" -> Q(
      // ClickHouse `GROUP BY ... WITH TOTALS` (per-group rows plus one
      // grand-total row in the same result): re-expressed as
      // rollup(flag), which Catalyst plans as a single expanded
      // aggregate — one pass over the fact table, partial aggregation
      // on both grouping sets, no second scan for the totals row. The
      // null rollup key is renamed 'TOTAL' (l_returnflag is never null
      // in this schema, so the sentinel cannot collide). All-integer
      // outputs keep the gate engine-exact.
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag")
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("TOTAL")).as("flag"),
          col("qty"), col("n")),
      Some("""SELECT coalesce(l_returnflag, 'TOTAL') AS flag,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
                     count(*) AS n
              FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), ())""")),

    "q_agg_group_uniq_array" -> Q(
      // CH groupUniqArray(x): the distinct-set-per-group aggregate.
      // collect_set is a mergeable partial aggregate (distributes like
      // any hash agg); sorted + serialized for the driver's comparator
      // exactly as q_agg_collect does. Set size is bounded by the
      // column's domain (5 priorities), so per-group state is O(1)
      // regardless of fact-table size.
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), "|")
          .as("prios"),
          countDistinct(col("o_orderpriority")).as("n_uniq")),
      Some("""SELECT o_orderstatus,
                     array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS prios,
                     count(DISTINCT o_orderpriority) AS n_uniq
              FROM orders GROUP BY o_orderstatus""")),

    "q_agg_quantile_weighted" -> Q(
      // CH quantileExactWeighted(0.5)(x, w): exact weighted median.
      // Re-expressed as the definitional two-window plan — collapse to
      // per-(group, value) weight sums (one hash agg, map-side
      // combinable), cumulative weight ordered by value, then the
      // smallest value whose cumulative weight reaches half the total.
      // Both engines run the IDENTICAL integer cumsum over identically
      // ordered doubles, so the gate is exact — no quantile
      // interpolation regime involved. The window partition carries
      // one row per DISTINCT value per group (not per fact row), which
      // is what keeps the sort tractable at 100 TB.
      (s, dir) => {
        val perValue = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("v"),
            col("l_quantity").cast("long").as("wt"))
          .groupBy("flag", "v").agg(sum("wt").as("wt"))
        val win = Window.partitionBy("flag").orderBy("v")
        perValue
          .withColumn("cum", sum("wt").over(
            win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum("wt").over(Window.partitionBy("flag")))
          .filter(col("cum") >= col("tot") * 0.5)
          .groupBy("flag").agg(min("v").as("wmedian"))
      },
      Some("""WITH c AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
                     sum(CAST(l_quantity AS BIGINT)) AS wt
                   FROM lineitem GROUP BY 1, 2),
              r AS (SELECT flag, v,
                     sum(wt) OVER (PARTITION BY flag ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     sum(wt) OVER (PARTITION BY flag) AS tot
                   FROM c)
              SELECT flag, min(v) AS wmedian
              FROM r WHERE cum >= tot * 0.5 GROUP BY flag"""))
  )
}
