package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-8 dialect widening: the remaining ClickHouse statistical-test
 * aggregates (kolmogorovSmirnovTest, rankCorr, theilsU), the
 * minMap/maxMap combinator family, the arrayCumSum /
 * arrayDifference / arrayCompact higher-order trio, and `LIMIT n
 * WITH TIES` — every key oracle-gated in an exact regime.
 *
 * Shared scale discipline with the round-7 stats pack
 * (EngineQueries): rank/CDF machinery runs on the BOUNDED
 * distinct-value table after cents quantization (one hash aggregate
 * collapses the event stream first; the windowed cumulative pass
 * touches only distinct values), never on the raw stream; closed
 * forms evaluate from exact integer sums so both engines compute
 * identical IEEE doubles.
 */
object AnalyticsQueries {

  val all: Seq[(String, Q)] = Seq(

    "q_agg_kstest" -> Q(
      // CH kolmogorovSmirnovTest(value, group): two-sample KS D
      // statistic — the distribution-shift detector. INTEGER-EXACT:
      // D = max_x |F_a(x) − F_b(x)| is carried as the integer
      // numerator max |cum_a(x)·n_b − cum_b(x)·n_a| over the common
      // denominator n_a·n_b, so the gate compares integers; the
      // rounded quotient is derived from them identically in both
      // engines. The cumulative pass runs on the distinct-value
      // table (≤ ~50k cents values — bounded by the value domain,
      // not the event count), the standard scalable CDF layout.
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val a = col("event_type") === "click"
        val bv = e.groupBy("c").agg(
          count(when(a, 1)).as("ca"), count(when(!a, 1)).as("cb"))
        val w = Window.orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bv.select(
          sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
        val tot = bv.agg(sum("ca").as("na"), sum("cb").as("nb"))
        cum.crossJoin(broadcast(tot))
          .groupBy("na", "nb")
          .agg(max(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
            .as("d_num"))
          .select(col("na"), col("nb"), col("d_num"),
            round(col("d_num").cast("double") / (col("na") * col("nb")), 6)
              .as("ks_d"))
      },
      Some(s"""WITH c AS (SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS c
                     FROM ${Q.eventsOracle} e
                     WHERE event_type IN ('click', 'purchase')),
              bv AS (SELECT c,
                       count(*) FILTER (WHERE event_type = 'click') AS ca,
                       count(*) FILTER (WHERE event_type = 'purchase') AS cb
                     FROM c GROUP BY c),
              cum AS (SELECT
                       sum(ca) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
                       sum(cb) OVER (ORDER BY c
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
                     FROM bv),
              tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                             CAST(sum(cb) AS BIGINT) AS nb FROM bv)
              SELECT na, nb,
                     CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num,
                     round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
                           / (na * nb), 6) AS ks_d
              FROM cum, tot GROUP BY na, nb""")),

    "q_agg_rank_corr" -> Q(
      // CH rankCorr(x, y): Spearman rank correlation = Pearson over
      // tie-averaged ranks. Ranks are carried DOUBLED (2·below +
      // cnt + 1 stays integral under ties, the mannWhitney trick —
      // Pearson is scale-invariant so doubling cancels); the five
      // rank-product sums accumulate as decimal(38,0) (exact at any
      // row count — a long would wrap near n≈3e6), and both engines
      // evaluate the same closed form over the same exact integers.
      // Rank tables are per-distinct-value (one hash agg + a bounded
      // window), the fact stream joins them by value — two bounded
      // equi-joins, no O(n log n) global sort of the facts.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val rows = li.select(
          floor(col("l_quantity") * 100).cast("long").as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
        val j = rows.join(rankTable(rows, "x", "rx"), "x")
          .join(rankTable(rows, "y", "ry"), "y")
        val sums = j.agg(
          count(lit(1)).as("n"),
          sum(col("rx").cast("decimal(38,0)")).as("su"),
          sum(col("ry").cast("decimal(38,0)")).as("sv"),
          sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("suu"),
          sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("svv"),
          sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("suv"))
        val n = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val num = d("suv") / n - (d("su") / n) * (d("sv") / n)
        val den = sqrt(d("suu") / n - (d("su") / n) * (d("su") / n)) *
          sqrt(d("svv") / n - (d("sv") / n) * (d("sv") / n))
        sums.select(col("n"), round(num / den, 4).as("rank_corr"))
      },
      Some("""WITH rows_ AS (SELECT
                       CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                     FROM lineitem),
              bx AS (SELECT x AS v, count(*) AS cnt FROM rows_ GROUP BY x),
              rx AS (SELECT v AS x,
                       coalesce(sum(cnt) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         * 2 + cnt + 1 AS rx
                     FROM bx),
              by_ AS (SELECT y AS v, count(*) AS cnt FROM rows_ GROUP BY y),
              ry AS (SELECT v AS y,
                       coalesce(sum(cnt) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         * 2 + cnt + 1 AS ry
                     FROM by_),
              j AS (SELECT rx.rx, ry.ry FROM rows_
                     JOIN rx USING (x) JOIN ry USING (y)),
              sums AS (SELECT count(*) AS n,
                       sum(rx) AS su, sum(ry) AS sv,
                       sum(rx * rx) AS suu, sum(ry * ry) AS svv,
                       sum(rx * ry) AS suv FROM j),
              f AS (SELECT CAST(n AS BIGINT) AS n, CAST(n AS DOUBLE) AS nd,
                       CAST(su AS DOUBLE) AS su, CAST(sv AS DOUBLE) AS sv,
                       CAST(suu AS DOUBLE) AS suu, CAST(svv AS DOUBLE) AS svv,
                       CAST(suv AS DOUBLE) AS suv FROM sums)
              SELECT n,
                     round((suv / nd - (su / nd) * (sv / nd)) /
                           (sqrt(suu / nd - (su / nd) * (su / nd)) *
                            sqrt(svv / nd - (sv / nd) * (sv / nd))), 4)
                       AS rank_corr
              FROM f""")),

    "q_agg_theils_u" -> Q(
      // CH theilsU(x, y): ASYMMETRIC categorical association — the
      // fraction of X's entropy explained by knowing Y, U(X|Y) =
      // (H(X) − H(X|Y)) / H(X). Same contingency layout as
      // q_agg_cramers_v: one hash aggregate to exact integer cell
      // counts, entropy folds over the tiny R×C cell table (≤ ~30
      // cells), 4 dp rounding absorbs cell-order summation ulps (the
      // q_agg_entropy precedent for cross-engine ln determinism).
      (s, dir) => {
        val e = Q.events(s, dir).select(col("event_type"),
          floor(floor(col("value") * 100) / 10000.0).cast("long").as("bucket"))
        val cells = e.groupBy("event_type", "bucket").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("event_type").agg(sum("o").as("nx"))
        val colT = cells.groupBy("bucket").agg(sum("o").as("ny"))
        val n = cells.agg(sum("o").as("n"))
        val hx = rowT.crossJoin(broadcast(n))
          .select((-(col("nx") / col("n")) * log(col("nx") / col("n"))).as("h"))
          .agg(sum("h").as("hx"))
        val hxy = cells.join(colT, "bucket").crossJoin(broadcast(n))
          .select((-(col("o") / col("n")) * log(col("o") / col("ny"))).as("h"))
          .agg(sum("h").as("hxy"))
        hx.crossJoin(hxy)
          .select(round((col("hx") - col("hxy")) / col("hx"), 4).as("theils_u"))
      },
      Some(s"""WITH e AS (SELECT event_type,
                       CAST(floor(CAST(floor(value * 100) AS BIGINT) / 10000.0)
                         AS BIGINT) AS bucket
                     FROM ${Q.eventsOracle} ev),
              cells AS (SELECT event_type, bucket, count(*) AS o
                     FROM e GROUP BY 1, 2),
              rt AS (SELECT event_type, sum(o) AS nx FROM cells GROUP BY 1),
              ct AS (SELECT bucket, sum(o) AS ny FROM cells GROUP BY 1),
              n AS (SELECT sum(o) AS n FROM cells),
              hx AS (SELECT sum(-(nx / n.n) * ln(nx / n.n)) AS hx FROM rt, n),
              hxy AS (SELECT sum(-(o / n.n) * ln(o / ct.ny)) AS hxy
                     FROM cells JOIN ct USING (bucket), n)
              SELECT round((hx - hxy) / hx, 4) AS theils_u FROM hx, hxy""")),

    "q_agg_minmap" -> Q(
      // CH minMap/maxMap(keys, values): per-key min and max across a
      // group's map entries, result as key-sorted parallel arrays —
      // the companion of q_agg_summap (same explode → thin rows →
      // hash aggregate → reassemble layout; min/max partials collapse
      // map-side, so the shuffle carries one row per (group, key)).
      // Values are exact cents longs.
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val rows = li.select(col("l_linenumber").as("grp"),
          array(concat(lit("f_"), col("l_returnflag")),
            concat(lit("s_"), col("l_linestatus"))).as("ks"),
          array(floor(col("l_quantity") * 100).cast("long"),
            floor(col("l_extendedprice") * 100).cast("long")).as("vs"))
        rows.select(col("grp"), explode(arrays_zip(col("ks"), col("vs"))).as("e"))
          .select(col("grp"), col("e.ks").as("k"), col("e.vs").as("v"))
          .groupBy("grp", "k").agg(min("v").as("mn"), max("v").as("mx"))
          .groupBy("grp")
          .agg(array_sort(collect_list(struct(col("k"), col("mn"), col("mx"))))
            .as("kv"))
          .select(col("grp"),
            // serialized final projection (Q.strArr) — driver-gate rule
            Q.strArr(transform(col("kv"), x => x.getField("k"))).as("keys"),
            Q.strArr(transform(col("kv"), x => x.getField("mn"))).as("mins"),
            Q.strArr(transform(col("kv"), x => x.getField("mx"))).as("maxs"))
      },
      Some(s"""WITH e AS (
                SELECT l_linenumber AS grp, 'f_' || l_returnflag AS k,
                       CAST(floor(l_quantity * 100) AS BIGINT) AS v FROM lineitem
                UNION ALL
                SELECT l_linenumber, 's_' || l_linestatus,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) FROM lineitem),
              g AS (SELECT grp, k, min(v) AS mn, max(v) AS mx
                    FROM e GROUP BY grp, k)
              SELECT grp, ${Q.strArrSql("list(k ORDER BY k)")} AS keys,
                     ${Q.strArrSql("list(mn ORDER BY k)")} AS mins,
                     ${Q.strArrSql("list(mx ORDER BY k)")} AS maxs
              FROM g GROUP BY grp""")),

    "q_fn_array_transform" -> Q(
      // CH arrayCumSum / arrayDifference / arrayCompact as Spark
      // higher-order functions — per-row, codegen-friendly, no
      // explode, no shuffle beyond the scan. arrayCumSum is a single
      // aggregate() pass with an array accumulator (not the O(len²)
      // slice-and-sum spelling); arrayDifference keeps CH's leading-0
      // convention; arrayCompact collapses CONSECUTIVE duplicates
      // only (1-based element_at(arr, i) under a 0-based lambda index
      // i reads the previous element). The oracle recomputes all
      // three index-wise over the same derived 5-element arrays.
      (s, dir) => {
        val src = t(s, dir, "orders").select(col("o_orderkey").as("k"),
          array(col("o_orderkey") % 7 - 3, col("o_orderkey") % 5 - 2,
            col("o_orderkey") % 5 - 2, col("o_orderkey") % 3,
            lit(0L)).as("arr"))
        src.select(col("k"),
          // serialized final projections (Q.strArr) — driver-gate rule
          Q.strArr(col("arr")).as("arr"),
          Q.strArr(
            expr("""aggregate(arr, cast(array() as array<bigint>),
                    (acc, x) -> concat(acc,
                      array(coalesce(try_element_at(acc, -1), 0L) + x)))"""))
            .as("cum"),
          Q.strArr(
            expr("transform(arr, (x, i) -> IF(i = 0, 0L, x - element_at(arr, i)))"))
            .as("diff"),
          Q.strArr(
            expr("filter(arr, (x, i) -> i = 0 OR x != element_at(arr, i))"))
            .as("compacted"))
      },
      Some(s"""WITH a AS (SELECT o_orderkey AS k,
                       [o_orderkey % 7 - 3, o_orderkey % 5 - 2,
                        o_orderkey % 5 - 2, o_orderkey % 3,
                        CAST(0 AS BIGINT)] AS arr
                     FROM orders)
              SELECT k, ${Q.strArrSql("arr")} AS arr,
                     ${Q.strArrSql(
                       """list_transform(range(1, 6),
                       i -> CAST(list_sum(arr[1:i]) AS BIGINT))""")} AS cum,
                     ${Q.strArrSql(
                       """list_transform(range(1, 6),
                       i -> CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
                                 ELSE arr[i] - arr[i - 1] END)""")} AS diff,
                     ${Q.strArrSql(
                       """list_transform(
                       list_filter(range(1, 6),
                         i -> i = 1 OR arr[i] <> arr[i - 1]),
                       i -> arr[i])""")} AS compacted
              FROM a""")),

    "q_agg_time_decay" -> Q(
      // CH's time-decayed window aggregates (exponentialTimeDecayedSum
      // family): per event, the decay-weighted sum of the user's
      // values over the trailing hour. EXACT REGIME: linear decay
      // weight (3600 + t_j − t_i)/3600 over integer seconds and cents
      // — the weighted sum DECOMPOSES into two plain range-frame
      // window sums (Σ c_j·(3600+tr_j) − tr_i·Σ c_j), so the whole
      // operator is two codegen'd window aggregates over one
      // user-partitioned shuffle, integer-exact at any parallelism;
      // no per-row collect, state bounded by the range frame. The
      // oracle recomputes via a bounded self-join — an independent
      // algebraic path over the same integers. (The float-exp variant
      // rides the same frame machinery and is spec-tested against a
      // driver recompute — exp ulps differ per engine, so it can't
      // hash-gate; see AnalyticsQueriesSpec.)
      (s, dir) => {
        val e = Q.events(s, dir).select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts").cast("timestamp")).as("t"),
          floor(col("value") * 100).cast("long").as("c"))
        val byUser = Window.partitionBy("user_id")
        val er = e.withColumn("tr", col("t") - min("t").over(byUser))
        val frame = Window.partitionBy("user_id").orderBy("tr")
          .rangeBetween(-3600, 0)
        er
          .withColumn("s1", sum(col("c") * (col("tr") + 3600)).over(frame))
          .withColumn("s0", sum(col("c")).over(frame))
          .select(col("user_id"), col("event_id"),
            (col("s1") - col("tr") * col("s0")).as("units"))
          // scaled display value stays INTEGRAL (units div 36 == the
          // decayed sum in 1e-4 currency units, truncated): a rounded
          // double here straddles half-up-vs-binary rounding between
          // engines on exact .5 boundaries
          .withColumn("decayed_e4", expr("units div 36"))
      },
      Some(s"""WITH e AS (SELECT user_id, event_id,
                       CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
                       CAST(floor(value * 100) AS BIGINT) AS c
                     FROM ${Q.eventsOracle} ev),
              m AS (SELECT user_id, min(t) AS t0 FROM e GROUP BY user_id),
              r AS (SELECT e.user_id, e.event_id, e.t - m.t0 AS tr, e.c
                     FROM e JOIN m USING (user_id)),
              j AS (SELECT a.user_id, a.event_id,
                       CAST(sum(b.c * (3600 + b.tr - a.tr)) AS BIGINT) AS units
                     FROM r a JOIN r b ON a.user_id = b.user_id
                       AND b.tr BETWEEN a.tr - 3600 AND a.tr
                     GROUP BY a.user_id, a.event_id)
              SELECT user_id, event_id, units,
                     units // 36 AS decayed_e4
              FROM j""")),

    "q_agg_bounding_ratio" -> Q(
      // CH boundingRatio(x, y): the slope between the leftmost and
      // rightmost points of the group — (argMax(y,x) − argMin(y,x)) /
      // (max(x) − min(x)). CH keeps an arbitrary row under x-ties —
      // not reproducible across engines (and this synthetic lineitem
      // DOES tie on orderkey·10+linenumber) — so the exact regime
      // first collapses to one y per (group, x) with max(y): after
      // that the arg-extrema are functions of the data, not the scan
      // order. Two hash aggregates, max_by/min_by partials.
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_returnflag"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
          .groupBy("l_returnflag", "x").agg(max("y").as("y"))
        li.groupBy("l_returnflag").agg(
          max_by(col("y"), col("x")).as("y_last"),
          min_by(col("y"), col("x")).as("y_first"),
          max("x").as("x_max"), min("x").as("x_min"))
          .select(col("l_returnflag"),
            round((col("y_last") - col("y_first")).cast("double") /
              (col("x_max") - col("x_min")), 6).as("bounding_ratio"))
      },
      Some("""WITH p0 AS (SELECT l_returnflag,
                       l_orderkey * 10 + l_linenumber AS x,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                     FROM lineitem),
              p AS (SELECT l_returnflag, x, max(y) AS y
                     FROM p0 GROUP BY l_returnflag, x)
              SELECT l_returnflag,
                     round(CAST(arg_max(y, x) - arg_min(y, x) AS DOUBLE)
                           / (max(x) - min(x)), 6) AS bounding_ratio
              FROM p GROUP BY l_returnflag""")),

    "q_agg_foreach" -> Q(
      // CH's -ForEach aggregate combinator (sumForEach/maxForEach):
      // elementwise aggregation of array columns across a group's
      // rows. Scalable spelling: posexplode to thin (grp, pos, v)
      // rows, ONE hash aggregate (map-side partials collapse each
      // (grp, pos) cell per partition), reassemble pos-sorted arrays —
      // the same explode→agg→reassemble layout as q_agg_summap, so
      // the shuffle carries one row per (group, position), never the
      // raw arrays.
      (s, dir) => {
        val src = t(s, dir, "orders").select(
          (col("o_custkey") % 10).as("grp"),
          array(col("o_orderkey") % 7, col("o_orderkey") % 5,
            floor(col("o_totalprice")).cast("long")).as("arr"))
        src.select(col("grp"), posexplode(col("arr")).as(Seq("pos", "v")))
          .groupBy("grp", "pos")
          .agg(sum("v").as("sv"), max("v").as("mv"))
          .groupBy("grp")
          .agg(array_sort(collect_list(struct(col("pos"), col("sv"), col("mv"))))
            .as("kv"))
          .select(col("grp"),
            // serialized final projection (Q.strArr) — driver-gate rule
            Q.strArr(transform(col("kv"), x => x.getField("sv"))).as("sum_foreach"),
            Q.strArr(transform(col("kv"), x => x.getField("mv"))).as("max_foreach"))
      },
      Some(s"""WITH e AS (
                SELECT o_custkey % 10 AS grp, 0 AS pos, o_orderkey % 7 AS v
                FROM orders
                UNION ALL
                SELECT o_custkey % 10, 1, o_orderkey % 5 FROM orders
                UNION ALL
                SELECT o_custkey % 10, 2,
                       CAST(floor(o_totalprice) AS BIGINT) FROM orders),
              g AS (SELECT grp, pos, CAST(sum(v) AS BIGINT) AS sv,
                           CAST(max(v) AS BIGINT) AS mv
                    FROM e GROUP BY grp, pos)
              SELECT grp, ${Q.strArrSql("list(sv ORDER BY pos)")} AS sum_foreach,
                     ${Q.strArrSql("list(mv ORDER BY pos)")} AS max_foreach
              FROM g GROUP BY grp""")),

    "q_fn_string_distance" -> Q(
      // CH editDistance / levenshtein + byte-hamming over the
      // priority labels: codegen'd Spark builtins, no UDF. Distances
      // are integers — exact gate. (The DuckDB oracle's levenshtein
      // is an independent implementation, so agreement is a
      // differential test of the metric, not an echo.)
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"), col("o_orderstatus"))
        o.select(col("o_orderkey"),
          levenshtein(col("o_orderpriority"), lit("3-MEDIUM")).cast("long").as("lev"),
          levenshtein(col("o_orderpriority"), col("o_orderstatus")).cast("long").as("lev_col"),
          (length(col("o_orderpriority")) - length(lit("3-MEDIUM"))).cast("long").as("len_delta"))
      },
      Some("""SELECT o_orderkey,
                     levenshtein(o_orderpriority, '3-MEDIUM') AS lev,
                     levenshtein(o_orderpriority, o_orderstatus) AS lev_col,
                     length(o_orderpriority) - length('3-MEDIUM') AS len_delta
              FROM orders""")),

    "q_engine_mutate" -> Q(
      // ClickHouse mutations over this library's OWN storage:
      // `ALTER TABLE orders DELETE WHERE status='F' AND price<100k`
      // then `ALTER TABLE ... UPDATE custkey=-1, priority='X-'||priority
      // WHERE priority='1-URGENT'`, chained copy-on-write
      // (NativeTableOps.mutate* — parts the predicate provably cannot
      // touch are copied through byte-identical via zone-map sidecar
      // checks; only affected parts are read and rewritten, CH's own
      // mutation execution model). The gate reads the final mutated
      // table and compares against the oracle's relational spelling
      // of both mutations over the parquet original.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val base = ScanQueries.fixtureDir(dir, "orders_mutate_base")
        val afterDel = ScanQueries.fixtureDir(dir, "orders_mutate_del")
        val afterUpd = ScanQueries.fixtureDir(dir, "orders_mutate_upd")
        val conf = s.sessionState.newHadoopConf()
        Seq(afterDel, afterUpd).foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).delete(p, true)
        }
        t(s, dir, "orders").write.format("clickhouse_native")
          .mode("overwrite").save(base)
        NativeTableOps.mutateDelete(s, base, afterDel,
          col("o_orderstatus") === "F" && col("o_totalprice") < 100000)
        NativeTableOps.mutateUpdate(s, afterDel, afterUpd,
          col("o_orderpriority") === "1-URGENT",
          Map("o_custkey" -> lit(-1L),
            "o_orderpriority" -> concat(lit("X-"), col("o_orderpriority"))))
      },
      Some("""SELECT o_orderkey,
                     CASE WHEN o_orderpriority = '1-URGENT' THEN -1
                          ELSE o_custkey END AS o_custkey,
                     o_orderstatus, o_totalprice, o_orderdate,
                     CASE WHEN o_orderpriority = '1-URGENT'
                          THEN 'X-' || o_orderpriority
                          ELSE o_orderpriority END AS o_orderpriority
              FROM orders
              WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)""")),

    "q_engine_ttl" -> Q(
      // MergeTree `TTL ts ... DELETE` over this library's own storage
      // (NativeTableOps.applyTtl): events land time-ordered in 4
      // range-partitioned parts; expiring everything before Jan 15
      // DROPS the provably-all-expired parts by sidecar metadata alone
      // (never read — CH's part-level TTL drop, the reason time-series
      // retention is O(parts) not O(data)), copies provably-live parts
      // byte-identical, and rewrites only the boundary part. The ts
      // column is written non-Nullable (coalesce) because a NULL TTL
      // value must survive deletion, so only non-nullable columns can
      // prove a part empty. Gate: the surviving table hash-equals the
      // oracle's WHERE spelling.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val base = ScanQueries.fixtureDir(dir, "events_ttl_base")
        val out = ScanQueries.fixtureDir(dir, "events_ttl_out")
        val outP = new org.apache.hadoop.fs.Path(out)
        outP.getFileSystem(s.sessionState.newHadoopConf()).delete(outP, true)
        val ev = Q.events(s, dir).select(
          col("event_id"),
          coalesce(col("ts"), timestamp_micros(lit(0L)).cast("timestamp_ntz"))
            .as("ts"),
          col("user_id"), col("event_type"), col("value"))
        ev.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
          .write.format("clickhouse_native").mode("overwrite").save(base)
        NativeTableOps.applyTtl(s, base, out, "ts",
          to_timestamp(lit("2024-01-15 00:00:00")).cast("timestamp_ntz"))
        s.read.format("clickhouse_native").load(out)
      },
      Some(s"""SELECT event_id, ts, user_id, event_type, value
              FROM ${Q.eventsOracle}
              WHERE NOT (ts < TIMESTAMP '2024-01-15 00:00:00')""")),

    "q_engine_projection" -> Q(
      // CH PROJECTIONS: the base events table lands time-clustered
      // (zone maps prune ts); ADD PROJECTION by_user re-clusters a
      // copy by user_id under projections/ (invisible to base scans,
      // like CH's in-part projection storage). The read routes
      // through NativeTableOps.readWithProjections, which counts
      // admitted blocks per layout from sidecar METADATA and scans
      // the layout that prunes the user_id predicate hardest — CH's
      // optimize_use_projections move. Gate: the routed read
      // hash-equals the plain SQL filter (routing can change IO,
      // never results); the routing choice itself is pinned in
      // NativeTableOpsSpec.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val base = ScanQueries.fixtureDir(dir, "events_projection")
        val ev = Q.events(s, dir).select(
          col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        ev.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
          .write.format("clickhouse_native").mode("overwrite").save(base)
        NativeTableOps.addProjection(s, base, "by_user",
          Seq("user_id", "ts"))
        val (routed, _) = NativeTableOps.readWithProjections(s, base,
          col("user_id").between(3, 9))
        routed.groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100).cast("long")).as("val_cents"))
      },
      Some(s"""SELECT user_id, count(*) AS n,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS val_cents
              FROM ${Q.eventsOracle}
              WHERE user_id BETWEEN 3 AND 9
              GROUP BY user_id""")),

    "q_engine_ttl_recompress" -> Q(
      // `TTL ts ... RECOMPRESS CODEC(ZSTD)` — the storage-tiering
      // companion of q_engine_ttl: provably-cold parts (zone maps
      // prove every row before the cutoff) rewrite compressed, hot
      // parts copy byte-identical, NO row is dropped. Gate: the
      // recompressed table hash-equals the full source — content
      // preservation is the whole contract; the codec/copy-through
      // split is pinned in NativeTableOpsSpec.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val base = ScanQueries.fixtureDir(dir, "events_ttlrc_base")
        val out = ScanQueries.fixtureDir(dir, "events_ttlrc_out")
        val outP = new org.apache.hadoop.fs.Path(out)
        outP.getFileSystem(s.sessionState.newHadoopConf()).delete(outP, true)
        val ev = Q.events(s, dir).select(
          col("event_id"),
          coalesce(col("ts"), timestamp_micros(lit(0L)).cast("timestamp_ntz"))
            .as("ts"),
          col("user_id"), col("event_type"), col("value"))
        ev.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
          .write.format("clickhouse_native").mode("overwrite").save(base)
        NativeTableOps.applyTtlRecompress(s, base, out, "ts",
          to_timestamp(lit("2024-01-15 00:00:00")).cast("timestamp_ntz"))
        s.read.format("clickhouse_native").load(out)
      },
      Some(s"""SELECT event_id,
                     COALESCE(ts, TIMESTAMP '1970-01-01 00:00:00') AS ts,
                     user_id, event_type, value
              FROM ${Q.eventsOracle}""")),

    "scan_parts_meta" -> Q(
      // CH `system.parts` over a native directory: per-part rows /
      // bytes / block counts / compression / indexed flag, answered
      // from sidecar METADATA (indexed parts never open the data
      // file). The gate pins the metadata against ground truth: the
      // sum of per-part row counts must equal the table's true
      // cardinality, across exactly the 3 parts the write produced,
      // all sidecar-indexed.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val fx = ScanQueries.fixtureDir(dir, "supplier_parts_meta")
        t(s, dir, "supplier").repartition(3).write
          .format("clickhouse_native").mode("overwrite").save(fx)
        NativeTableOps.partsMeta(s, fx).agg(
          sum("rows").as("total_rows"),
          count(lit(1)).as("n_parts"),
          bool_and(col("indexed")).as("all_indexed"),
          bool_and(col("blocks") >= 1).as("has_blocks"))
      },
      Some("""SELECT count(*) AS total_rows, CAST(3 AS BIGINT) AS n_parts,
                     TRUE AS all_indexed, TRUE AS has_blocks
              FROM supplier""")),

    "scan_columns_meta" -> Q(
      // CH `system.columns` over a native directory: per-part column
      // inventory (position, declared native type, mapped Spark type)
      // answered from each part's FIRST BLOCK HEADER — no value
      // decode, metadata-scale driver work. Unlike a scan's merged
      // read schema, this surfaces per-part layout (schema drift from
      // a later ingest is visible part-by-part). Gate: the 3-part
      // supplier fixture must report exactly the written columns in
      // written order on every part.
      (s, dir) => {
        import graft.sources.native.NativeTableOps
        val fx = ScanQueries.fixtureDir(dir, "supplier_columns_meta")
        t(s, dir, "supplier").repartition(3).write
          .format("clickhouse_native").mode("overwrite").save(fx)
        NativeTableOps.columnsMeta(s, fx)
          .groupBy(col("position"), col("name").as("col_name"),
            col("chType").as("ch_type"), col("sparkType").as("spark_type"))
          .agg(count(lit(1)).as("n_parts"))
      },
      Some("""SELECT * FROM (VALUES
                (0, 's_suppkey',   'Nullable(Int64)',   'bigint', CAST(3 AS BIGINT)),
                (1, 's_name',      'Nullable(String)',  'string', CAST(3 AS BIGINT)),
                (2, 's_nationkey', 'Nullable(Int32)',   'int',    CAST(3 AS BIGINT)),
                (3, 's_acctbal',   'Nullable(Float64)', 'double', CAST(3 AS BIGINT)))
              t(position, col_name, ch_type, spark_type, n_parts)""")),

    "q_limit_ties" -> Q(
      // CH `ORDER BY ... LIMIT n WITH TIES`: the top n rows PLUS
      // every row tying the n-th sort key. Spelled scalably as
      // cutoff-then-filter: TakeOrdered produces the n-th highest
      // value (counting duplicates) as a 1-row broadcast, the fact
      // table filters against it — no global sort of the fact side,
      // no rank() window over a single partition. Equivalent to
      // rank() <= n (the oracle's spelling) because `p >= cutoff`
      // admits exactly the rows ranked ahead of or tying row n.
      (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("long").as("p"))
        val cutoff = o.select(col("p")).orderBy(col("p").desc).limit(100)
          .agg(min("p").as("cut"))
        o.crossJoin(broadcast(cutoff)).filter(col("p") >= col("cut"))
          .select(col("o_orderkey"), col("p"))
      },
      Some("""SELECT o_orderkey, p FROM (
                SELECT o_orderkey,
                       CAST(floor(o_totalprice * 100) AS BIGINT) AS p,
                       rank() OVER (ORDER BY CAST(floor(o_totalprice * 100)
                         AS BIGINT) DESC) AS rnk
                FROM orders)
              WHERE rnk <= 100""")),

    "q_seq_next_node" -> Q(
      // CH sequenceNextNode(forward, first_match)(ts, event_type,
      // event_type='view', event_type='click'): per user, find the
      // FIRST consecutive 'view'→'click' pair in event-time order and
      // return the event that immediately follows it (null when the
      // chain ends the stream). Relationally: two leads over the
      // per-user window, filter to chain starts, min-by chain
      // position — one shuffle on user_id, the window frame streams.
      // (ts, event_id) totally orders each user's events (event_id is
      // unique), so "first" is engine-independent.
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val e = Q.events(s, dir).select(
            col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("rn", row_number().over(w))
          .withColumn("e1", lead("event_type", 1).over(w))
          .withColumn("e2", lead("event_type", 2).over(w))
          .filter(col("event_type") === "view" && col("e1") === "click")
        // '(end)' sentinel: a chain that closes the stream has no next
        // event; DuckDB's arg_min skips NULL values while Spark's
        // min_by keeps them, so the argmin must never see a null. The
        // argmin key is the window row position (a scalar — DuckDB's
        // arg_min takes no struct keys), which encodes (ts, event_id).
        e.groupBy("user_id")
          .agg(min_by(coalesce(col("e2"), lit("(end)")), col("rn"))
            .as("next_node"))
      },
      Some(s"""WITH o AS (SELECT user_id, event_type,
                       row_number() OVER w AS rn,
                       lead(event_type, 1) OVER w AS e1,
                       lead(event_type, 2) OVER w AS e2
                     FROM ${Q.eventsOracle}
                     WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
              SELECT user_id,
                     arg_min(coalesce(e2, '(end)'), rn) AS next_node
              FROM o WHERE event_type = 'view' AND e1 = 'click'
              GROUP BY user_id""")),

    "q_agg_moving_avg" -> Q(
      // CH groupArrayMovingAvg(3)(x): the companion of
      // q_agg_moving_sum — same streaming ROWS-frame window over thin
      // (group, ord, value) rows, divided by the frame's actual row
      // count (CH divides by the window size; the first w−1 elements
      // use the partial frame — both spellings below divide the exact
      // integer sum by the exact frame count, so the IEEE quotient is
      // engine-identical).
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey").as("g"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("ord"),
          col("l_quantity").cast("long").as("v"))
        val w = Window.partitionBy("g").orderBy(col("ord"), col("v"))
          .rowsBetween(-2, 0)
        li.withColumn("ma",
            sum("v").over(w).cast("double") / count(lit(1)).over(w))
          .groupBy("g")
          .agg(array_sort(collect_list(struct(col("ord"), col("ma")))).as("kv"))
          .select(col("g"),
            // serialized final projection (Q.strArr4dp): the quotients
            // are engine-identical IEEE doubles (exact integer sum /
            // exact frame count) and strictly positive, so the fixed
            // "%.4f" rendering is engine-exact — driver-gate rule
            Q.strArr4dp(transform(col("kv"), x => x.getField("ma"))).as("moving_avgs"))
      },
      Some(s"""WITH r AS (SELECT l_suppkey AS g,
                     l_orderkey * 10 + l_linenumber AS ord,
                     CAST(l_quantity AS BIGINT) AS v FROM lineitem),
              m AS (SELECT g, ord,
                     CAST(sum(v) OVER fr AS DOUBLE)
                       / count(*) OVER fr AS ma
                   FROM r
                   WINDOW fr AS (PARTITION BY g ORDER BY ord, v
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
              SELECT g, ${Q.strArr4dpSql("list(ma ORDER BY ord, ma)")} AS moving_avgs
              FROM m GROUP BY g""")),

    "q_agg_linreg_multi" -> Q(
      // CH stochasticLinearRegression's closed-form cousin: OLS fit of
      // extendedprice ~ quantity + discount over lineitem, solved by
      // Cramer's rule from the Gram matrix. The nine moment sums are
      // EXACT integer aggregates over cents-quantized inputs (one
      // map-side-combined pass — the normal-equation layout that scales
      // to any row count, vs SGD's multi-epoch passes); the 3×3 solve
      // then runs on identical integers through an identical
      // double-precision expression tree in both engines, so the
      // rounded coefficients are engine-exact. Long-overflow bound:
      // Σ(x1c·yc) ≤ 5e10/row — safe below ~1e8 rows (sf≲100); beyond
      // that the sums need decimal widening.
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("x1"),          // integral qty
          (col("l_discount") * 100).cast("long").as("x2"),  // discount pct
          floor(col("l_extendedprice") * 100).cast("long").as("y")) // cents
        val sums = li.agg(
          count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x2") * col("x2")).as("s22"),
          sum("y").as("sy"),
          sum(col("x1") * col("y")).as("s1y"),
          sum(col("x2") * col("y")).as("s2y"))
        val d = (c: String) => col(c).cast("double")
        val (n, s1, s2) = (d("n"), d("s1"), d("s2"))
        val (s11, s12, s22) = (d("s11"), d("s12"), d("s22"))
        val (sy, s1y, s2y) = (d("sy"), d("s1y"), d("s2y"))
        val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
          s2 * (s1 * s12 - s11 * s2)
        val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
          s2 * (s1y * s12 - s11 * s2y)
        val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
          s2 * (s1 * s2y - s1y * s2)
        val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
          sy * (s1 * s12 - s11 * s2)
        sums.select(col("n"),
          round(det0 / det, 6).as("beta0_cents"),
          round(det1 / det, 6).as("beta1_cents"),
          round(det2 / det, 6).as("beta2_cents"))
      },
      Some("""WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
                     CAST(l_discount * 100 AS BIGINT) AS x2,
                     CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                   FROM lineitem),
              s AS (SELECT count(*) AS n,
                     CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
                     CAST(sum(x1 * x1) AS BIGINT) AS s11,
                     CAST(sum(x1 * x2) AS BIGINT) AS s12,
                     CAST(sum(x2 * x2) AS BIGINT) AS s22,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x1 * y) AS BIGINT) AS s1y,
                     CAST(sum(x2 * y) AS BIGINT) AS s2y
                   FROM r),
              dd AS (SELECT n,
                     CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
                     CAST(s2 AS DOUBLE) AS d2, CAST(s11 AS DOUBLE) AS d11,
                     CAST(s12 AS DOUBLE) AS d12, CAST(s22 AS DOUBLE) AS d22,
                     CAST(sy AS DOUBLE) AS dy, CAST(s1y AS DOUBLE) AS d1y,
                     CAST(s2y AS DOUBLE) AS d2y
                   FROM s)
              SELECT n,
                     round((dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
                            + d2 * (d1y * d12 - d11 * d2y))
                           / (nd * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
                              + d2 * (d1 * d12 - d11 * d2)), 6) AS beta0_cents,
                     round((nd * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
                            + d2 * (d1 * d2y - d1y * d2))
                           / (nd * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
                              + d2 * (d1 * d12 - d11 * d2)), 6) AS beta1_cents,
                     round((nd * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
                            + dy * (d1 * d12 - d11 * d2))
                           / (nd * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
                              + d2 * (d1 * d12 - d11 * d2)), 6) AS beta2_cents
              FROM dd""")),

    "q_agg_lttb" -> Q(
      // CH largestTriangleThreeBuckets(20)(x, y): downsample each
      // event-type series to 20 visually-faithful points
      // (functions/LttbAgg — first/last kept, 18 interior
      // equal-index buckets, max-triangle-vs-next-centroid selection).
      // x = epoch seconds, y = cents, event_id breaks sort ties; the
      // oracle re-runs the ALGORITHM as a DuckDB recursive CTE with a
      // LATERAL argmax per step — an independent engine walking the
      // same integer-exact spec. Distribution: one shuffle of series
      // buffers per event_type; selection runs once per group.
      (s, dir) => Q.events(s, dir)
        .select(col("event_type"),
          col("ts").cast("timestamp").cast("long").as("x"),
          floor(col("value") * 100).cast("long").as("y"),
          col("event_id").as("tb"))
        .groupBy("event_type")
        .agg(expr("lttb_agg(x, y, tb, 20)").as("d"))
        // serialized final projection (Q.strArr) — driver-gate rule
        .select(col("event_type"),
          Q.strArr(col("d.xs")).as("xs"), Q.strArr(col("d.ys")).as("ys")),
      Some(s"""WITH RECURSIVE
              src AS (SELECT event_type AS g,
                        CAST(floor(epoch(ts)) AS BIGINT) AS x,
                        CAST(floor(value * 100) AS BIGINT) AS y,
                        event_id AS id
                      FROM ${Q.eventsOracle}),
              pts AS (SELECT g,
                        row_number() OVER (PARTITION BY g ORDER BY x, y, id) - 1 AS idx,
                        x, y FROM src),
              nn AS (SELECT g, count(*) AS cnt FROM pts GROUP BY g),
              buck AS (SELECT p.g, p.idx, p.x, p.y,
                        CASE WHEN p.idx = 0 THEN 0
                             WHEN p.idx = nn.cnt - 1 THEN 19
                             ELSE 1 + CAST(((p.idx - 1) * 18) // (nn.cnt - 2) AS INT)
                        END AS b
                      FROM pts p JOIN nn ON p.g = nn.g),
              cent AS (SELECT g, b, count(*) AS m, sum(x) AS sx, sum(y) AS sy
                       FROM buck GROUP BY g, b
                       UNION ALL SELECT g, 20, 1, 0, 0 FROM nn),
              sel AS (
                SELECT g, 0 AS step, idx, x, y FROM buck WHERE b = 0
                UNION ALL
                SELECT s.g, s.step + 1, c.idx, c.x, c.y
                FROM sel s, LATERAL (
                   SELECT p.idx, p.x, p.y
                   FROM buck p JOIN cent ct ON ct.g = p.g AND ct.b = s.step + 2
                   WHERE p.g = s.g AND p.b = s.step + 1
                   ORDER BY abs((s.x * ct.m - ct.sx) * (p.y - s.y)
                                - (s.x - p.x) * (ct.sy - s.y * ct.m)) DESC, p.idx
                   LIMIT 1) c
                WHERE s.step < 19)
              SELECT g AS event_type,
                     ${Q.strArrSql("list(x ORDER BY step)")} AS xs,
                     ${Q.strArrSql("list(y ORDER BY step)")} AS ys
              FROM sel GROUP BY g""")),

    "q_fn_point_in_polygon" -> Q(
      // CH pointInPolygon((x,y), [(x1,y1),…]): even-odd ray casting.
      // Points are integer-derived from supplier keys; the polygon is a
      // fixed non-convex pentagon, so the per-edge crossing test
      //   (y1>y) != (y2>y)  AND  ((x2−x1)(y−y1) − (x−x1)(y2−y1))·sign(y2−y1) > 0
      // is pure integer arithmetic — no division, engine-exact. Both
      // sides unroll the same five edges as codegen'd comparisons
      // (composition of built-ins; no UDF) — a narrow scan + map,
      // trivially scalable.
      (s, dir) => {
        val poly = Seq((0L, 0L), (120L, 20L), (180L, 160L), (90L, 100L), (20L, 170L))
        val x = pmod(col("s_suppkey") * 73, lit(200L))
        val y = pmod(col("s_suppkey") * 37, lit(200L))
        val crossings = poly.indices.map { i =>
          val (x1, y1) = poly(i)
          val (x2, y2) = poly((i + 1) % poly.size)
          val sgn = if (y2 > y1) 1L else -1L
          val cross = (lit(y1) > y) =!= (lit(y2) > y) &&
            ((lit(x2 - x1) * (y - lit(y1)) - (x - lit(x1)) * lit(y2 - y1)) * lit(sgn) > 0)
          when(cross, 1).otherwise(0)
        }.reduce(_ + _)
        t(s, dir, "supplier").select(col("s_suppkey"),
          x.as("px"), y.as("py"),
          (crossings % 2 === 1).as("inside"))
      },
      Some {
        val poly = Seq((0L, 0L), (120L, 20L), (180L, 160L), (90L, 100L), (20L, 170L))
        val edges = poly.indices.map { i =>
          val (x1, y1) = poly(i)
          val (x2, y2) = poly((i + 1) % poly.size)
          val sgn = if (y2 > y1) 1L else -1L
          s"""(CASE WHEN (($y1 > py) <> ($y2 > py)) AND
                ((${x2 - x1} * (py - $y1) - (px - $x1) * ${y2 - y1}) * $sgn > 0)
              THEN 1 ELSE 0 END)"""
        }.mkString(" + ")
        s"""WITH p AS (SELECT s_suppkey,
                 (s_suppkey * 73) % 200 AS px,
                 (s_suppkey * 37) % 200 AS py
               FROM supplier)
           SELECT s_suppkey, px, py, (($edges) % 2 = 1) AS inside FROM p"""
      }),

    "q_agg_mean_ztest" -> Q(
      // CH meanZTest: two-sample z statistic for mean difference,
      // click vs purchase event values. All moments are exact integer
      // sums over cents; the z formula then runs on identical integers
      // through the same double expression in both engines (the same
      // regime as the Welch t key, with the z-test's pooled-se form).
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val m = e.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum("c").as("s"),
          sum(col("c") * col("c")).as("ss"))
        val a = m.filter(col("event_type") === "click")
          .select(col("n").as("na"), col("s").as("sa"), col("ss").as("ssa"))
        val b = m.filter(col("event_type") === "purchase")
          .select(col("n").as("nb"), col("s").as("sb"), col("ss").as("ssb"))
        val d = (c: Column) => c.cast("double")
        a.crossJoin(b).select(col("na"), col("nb"),
          round({
            val ma = d(col("sa")) / d(col("na"))
            val mb = d(col("sb")) / d(col("nb"))
            val va = (d(col("ssa")) - d(col("sa")) * d(col("sa")) / d(col("na"))) / (d(col("na")) - 1)
            val vb = (d(col("ssb")) - d(col("sb")) * d(col("sb")) / d(col("nb"))) / (d(col("nb")) - 1)
            (ma - mb) / sqrt(va / d(col("na")) + vb / d(col("nb")))
          }, 6).as("z"))
      },
      Some(s"""WITH e AS (SELECT event_type,
                     CAST(floor(value * 100) AS BIGINT) AS c
                   FROM ${Q.eventsOracle}
                   WHERE event_type IN ('click', 'purchase')),
              m AS (SELECT event_type, count(*) AS n,
                     CAST(sum(c) AS BIGINT) AS s,
                     CAST(sum(c * c) AS BIGINT) AS ss
                   FROM e GROUP BY event_type),
              a AS (SELECT n AS na, s AS sa, ss AS ssa FROM m WHERE event_type = 'click'),
              b AS (SELECT n AS nb, s AS sb, ss AS ssb FROM m WHERE event_type = 'purchase')
              SELECT na, nb,
                     round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                            - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                           / sqrt(((CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)) / CAST(na AS DOUBLE)
                                  + ((CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)) / CAST(nb AS DOUBLE)), 6) AS z
              FROM a, b"""))
  )

  /**
   * (v → doubled tie-averaged rank) table for q_agg_rank_corr's
   * Spearman: rank = 2·(#values strictly below) + cnt + 1 over the
   * per-distinct-value count table. Two physically different,
   * arithmetically IDENTICAL shapes behind a size switch:
   *
   *  - at or below `spark.graft.rankcorr.partition.minBytes` of input
   *    leaf bytes (default 256 MiB — sf0.1 lineitem is two orders
   *    below) the cumulative sum runs as ONE unpartitioned window over
   *    the distinct-value table: measured fastest at bench scale (r14
   *    A/B: 1.96 s vs 2.65 s partitioned — the extra exchange +
   *    checkpoint jobs beat the ~600k-row single-partition sort only
   *    on bigger inputs, OPTIMIZATION_r14.md);
   *  - above it, the at-scale shape ([[rankTablePartitioned]]): a
   *    range-partitioned prefix sum whose only global window is over
   *    the PARTITION-COUNT-sized offset table, so no task ever sorts
   *    the full distinct-value set (the 100-TB hazard the single
   *    window carries: one partition holding every distinct value of a
   *    near-unique column).
   *
   * Equivalence is pinned in AnalyticsOpsSpec on a tie-heavy fixture;
   * the switch can therefore never change the declared result, only
   * the plan.
   */
  private def rankTable(rows: org.apache.spark.sql.DataFrame, c: String,
      out: String): org.apache.spark.sql.DataFrame = {
    val bv = rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
    val minBytes = rows.sparkSession.conf
      .get("spark.graft.rankcorr.partition.minBytes",
        (256L * 1024 * 1024).toString).toLong
    val leafBytes = rows.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (leafBytes <= BigInt(minBytes)) rankTableWindowed(bv, c, out)
    else rankTablePartitioned(bv, c, out)
  }

  /** The small-input shape: one unpartitioned cumulative window over
    * the distinct-value table. Package-private for the equivalence
    * spec. */
  private[operators] def rankTableWindowed(bv: org.apache.spark.sql.DataFrame,
      c: String, out: String): org.apache.spark.sql.DataFrame = {
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    bv.withColumn("below", coalesce(sum("cnt").over(w), lit(0L)))
      .select(col("v").as(c), (col("below") * 2 + col("cnt") + 1).as(out))
  }

  /** The at-scale shape: range-partition the distinct-value table,
    * cumulative-sum locally per partition, and add per-partition
    * offsets from a prefix sum over the nPart-row totals table (the
    * only remaining global window — bounded by shuffle partitions, not
    * by data). repartitionByRange samples its boundaries, so `ranged`
    * is frozen with localCheckpoint: both consumers (local sums,
    * partition totals) must see the SAME materialized partition ids —
    * re-deriving the subtree could re-draw the sample. Range
    * partitions are contiguous ascending in v, so below(v) =
    * offset(part) + local_below(v) exactly; all sums are longs —
    * bit-identical to [[rankTableWindowed]]. */
  private[operators] def rankTablePartitioned(bv: org.apache.spark.sql.DataFrame,
      c: String, out: String): org.apache.spark.sql.DataFrame = {
    val nPart = bv.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = bv.repartitionByRange(nPart, col("v"))
      .withColumn("part", spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy("part").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("lb", coalesce(sum("cnt").over(wLoc), lit(0L)))
    val wOff = Window.orderBy("part").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("part").agg(sum("cnt").as("ptot"))
      .withColumn("off", coalesce(sum("ptot").over(wOff), lit(0L)))
      .select("part", "off")
    local.join(broadcast(offsets), "part")
      .select(col("v").as(c),
        ((col("lb") + col("off")) * 2 + col("cnt") + 1).as(out))
  }
}
