package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-10 dialect widening: ML evaluation + display formatting from
 * the ClickHouse function surface — arrayAUC (exact ROC-AUC via the
 * rank-sum identity), studentTTest (the pooled-variance companion to
 * the shipped welchTTest), sparkbar (the terminal bar-chart renderer),
 * and the formatReadableSize / formatReadableQuantity pair.
 *
 * Same exact-regime discipline as the round-7/8 stats packs: scores
 * quantize to integer cents, rank machinery runs on the BOUNDED
 * distinct-value table (one hash aggregate collapses the event stream
 * first), closed forms evaluate from exact integer sums with the same
 * operation order in both engines, and all string rendering is pure
 * integer arithmetic — no float formatting anywhere.
 */
object MetricsQueries {

  /** 8-level Unicode block ramp, U+2581..U+2588 (sparkbar's glyphs). */
  private val Blocks = "▁▂▃▄▅▆▇█"

  val all: Seq[(String, Q)] = Seq(

    "q_agg_auc" -> Q(
      // CH arrayAUC(scores, labels) — exact ROC-AUC via the rank-sum
      // identity AUC = (Σ_pos rank − n⁺(n⁺+1)/2) / (n⁺·n⁻) with
      // tie-averaged ranks. INTEGER-EXACT: ranks are carried DOUBLED
      // (2·below + cnt + 1 stays integral under ties — the
      // mannWhitney trick), giving the integer numerator
      // num = Σ_pos dr − n⁺(n⁺+1) over denominator 2·n⁺·n⁻; the gate
      // compares the integers and both engines derive the rounded
      // quotient identically. Scale shape: ONE hash aggregate
      // collapses the event stream to the bounded distinct-score
      // table (≤ ~100k cents values); the window walks only that.
      (s, dir) => {
        val e = Q.events(s, dir)
          .select((col("event_type") === "purchase").cast("long").as("y"),
            floor(col("value") * 100).cast("long").as("sc"))
        val bv = e.groupBy("sc")
          .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
        val w = Window.orderBy("sc").rowsBetween(Window.unboundedPreceding, -1)
        val ranked = bv
          .withColumn("below", coalesce(sum("cnt").over(w), lit(0L)))
          .select(col("cnt"), col("pos"),
            (col("below") * 2 + col("cnt") + 1).as("dr"))
        ranked.agg(
            sum(col("pos") * col("dr")).as("s2"),
            sum("pos").as("npos"),
            (sum("cnt") - sum("pos")).as("nneg"))
          .select(col("npos"), col("nneg"),
            (col("s2") - col("npos") * (col("npos") + 1)).as("auc_num"),
            round((col("s2") - col("npos") * (col("npos") + 1)).cast("double")
              / (col("npos") * col("nneg") * 2), 6).as("auc"))
      },
      Some(s"""WITH e AS (SELECT
                       CAST(event_type = 'purchase' AS BIGINT) AS y,
                       CAST(floor(value * 100) AS BIGINT) AS sc
                     FROM ${Q.eventsOracle}),
              bv AS (SELECT sc, count(*) AS cnt, sum(y) AS pos
                     FROM e GROUP BY sc),
              rk AS (SELECT cnt, pos,
                       2 * COALESCE(sum(cnt) OVER (ORDER BY sc
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + cnt + 1 AS dr
                     FROM bv),
              sums AS (SELECT CAST(sum(pos * dr) AS BIGINT) AS s2,
                              CAST(sum(pos) AS BIGINT) AS npos,
                              CAST(sum(cnt) - sum(pos) AS BIGINT) AS nneg
                       FROM rk)
              SELECT npos, nneg,
                     s2 - npos * (npos + 1) AS auc_num,
                     round(CAST(s2 - npos * (npos + 1) AS DOUBLE)
                           / (npos * nneg * 2), 6) AS auc
              FROM sums""")),

    "q_agg_student_ttest" -> Q(
      // CH studentTTest(v, group): pooled-variance two-sample t + df —
      // the equal-variance companion to the shipped welchTTest
      // (q_agg_ttest). Same exact regime: one conditional-aggregation
      // pass produces the six exact integer sums, both engines
      // evaluate the identical closed form (same operation order →
      // same IEEE doubles), df is an exact integer.
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("view", "click"))
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val a = col("event_type") === "view"
        val agg = e.agg(
          count(when(a, 1)).as("n1"), sum(when(a, col("c"))).as("s1"),
          sum(when(a, col("c") * col("c"))).as("sq1"),
          count(when(!a, 1)).as("n2"), sum(when(!a, col("c"))).as("s2"),
          sum(when(!a, col("c") * col("c"))).as("sq2"))
        val (n1, s1, sq1) = (col("n1").cast("double"),
          col("s1").cast("double"), col("sq1").cast("double"))
        val (n2, s2, sq2) = (col("n2").cast("double"),
          col("s2").cast("double"), col("sq2").cast("double"))
        val m1 = s1 / n1; val m2 = s2 / n2
        val v1 = (sq1 / n1 - m1 * m1) * (n1 / (n1 - 1.0))
        val v2 = (sq2 / n2 - m2 * m2) * (n2 / (n2 - 1.0))
        val sp2 = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / (n1 + n2 - 2.0)
        agg.select(
          round((m1 - m2) / sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2)), 4)
            .as("t_stat"),
          (col("n1") + col("n2") - 2).as("df"))
      },
      Some(s"""WITH c AS (SELECT event_type,
                       CAST(floor(value * 100) AS BIGINT) AS c
                     FROM ${Q.eventsOracle} e
                     WHERE event_type IN ('view', 'click')),
              sums AS (SELECT
                       count(*) FILTER (event_type = 'view') AS n1,
                       sum(c)   FILTER (event_type = 'view') AS s1,
                       sum(c*c) FILTER (event_type = 'view') AS sq1,
                       count(*) FILTER (event_type = 'click') AS n2,
                       sum(c)   FILTER (event_type = 'click') AS s2,
                       sum(c*c) FILTER (event_type = 'click') AS sq2
                     FROM c),
              f AS (SELECT CAST(n1 AS DOUBLE) AS n1, CAST(s1 AS DOUBLE) AS s1,
                           CAST(sq1 AS DOUBLE) AS sq1, CAST(n2 AS DOUBLE) AS n2,
                           CAST(s2 AS DOUBLE) AS s2, CAST(sq2 AS DOUBLE) AS sq2,
                           n1 + n2 - 2 AS df FROM sums),
              m AS (SELECT n1, n2, df, s1/n1 - s2/n2 AS dm,
                           (((n1 - 1.0) * ((sq1/n1 - (s1/n1)*(s1/n1)) * (n1/(n1-1.0))))
                            + ((n2 - 1.0) * ((sq2/n2 - (s2/n2)*(s2/n2)) * (n2/(n2-1.0)))))
                           / (n1 + n2 - 2.0) AS sp2
                     FROM f)
              SELECT round(dm / sqrt(sp2 * (1.0/n1 + 1.0/n2)), 4) AS t_stat,
                     CAST(df AS BIGINT) AS df
              FROM m""")),

    "q_agg_sparkbar" -> Q(
      // CH sparkbar(24)(hour, cnt): per event_type, the 24
      // hour-of-day buckets rendered as one string of 8-level block
      // glyphs — level = ceil(cnt·8 / max_cnt), empty bucket = ' '.
      // INTEGER-EXACT rendering: levels are integer ceilings and the
      // glyph is an index into a literal ramp — no float formatting.
      // Scale shape: one hash aggregate to (type, hour) counts (≤
      // 24·|types| rows), then a per-group map + a 24-element
      // higher-order transform; the dense 0..23 spine comes from
      // sequence(), so silent bucket gaps are impossible.
      (s, dir) => {
        val counts = Q.events(s, dir)
          .groupBy(col("event_type"), hour(col("ts")).as("h"))
          .agg(count(lit(1)).as("cnt"))
        val g = counts.groupBy("event_type").agg(
          max("cnt").as("mx"),
          map_from_entries(collect_list(struct(col("h"), col("cnt"))))
            .as("byh"))
        val bar = array_join(
          transform(sequence(lit(0), lit(23)), h => {
            val cnt = coalesce(element_at(col("byh"), h), lit(0L))
            val lvl = ((cnt * 8 + col("mx") - 1) / col("mx")).cast("long")
            when(cnt === 0, lit(" "))
              .otherwise(substring(lit(Blocks), lvl.cast("int"), lit(1)))
          }), "")
        g.select(col("event_type"), col("mx"), bar.as("bar"))
      },
      Some(s"""WITH c AS (SELECT event_type,
                       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
                       count(*) AS cnt
                     FROM ${Q.eventsOracle} GROUP BY 1, 2),
              g AS (SELECT event_type, CAST(max(cnt) AS BIGINT) AS mx
                    FROM c GROUP BY 1),
              spine AS (SELECT g.event_type, g.mx, r.range AS h,
                               COALESCE(c.cnt, 0) AS cnt
                        FROM g CROSS JOIN range(0, 24) r
                        LEFT JOIN c ON c.event_type = g.event_type
                                   AND c.h = r.range)
              SELECT event_type, mx,
                     string_agg(CASE WHEN cnt = 0 THEN ' '
                       ELSE substr('$Blocks',
                         CAST((cnt * 8 + mx - 1) // mx AS INT), 1) END,
                       '' ORDER BY h) AS bar
              FROM spine GROUP BY event_type, mx""")),

    "q_fn_format_readable" -> Q(
      // CH formatReadableSize / formatReadableQuantity: render a byte
      // count with binary units (KiB/MiB/...) and a count with
      // decimal units (thousand/million/...), two decimals. PURE
      // INTEGER rendering: scaled = v·100 div unit, then
      // whole '.' zero-padded-frac — no float formatting, so the
      // engines cannot diverge on rounding mode. Codegen'd CASE
      // chains; no UDF.
      (s, dir) => {
        def render(v: Column, unit: Long, suffix: String): Column = {
          val scaled = (v * 100 / unit).cast("long")
          concat((scaled / 100).cast("long").cast("string"), lit("."),
            lpad((scaled % 100).cast("string"), 2, "0"), lit(suffix))
        }
        def readableSize(v: Column): Column =
          when(v < 1024L, render(v, 1L, " B"))
            .when(v < 1024L * 1024, render(v, 1024L, " KiB"))
            .when(v < 1024L * 1024 * 1024, render(v, 1024L * 1024, " MiB"))
            .otherwise(render(v, 1024L * 1024 * 1024, " GiB"))
        def readableQuantity(v: Column): Column =
          when(v < 1000L, render(v, 1L, ""))
            .when(v < 1000000L, render(v, 1000L, " thousand"))
            .when(v < 1000000000L, render(v, 1000000L, " million"))
            .otherwise(render(v, 1000000000L, " billion"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"),
            floor(col("o_totalprice") * 100).cast("long").as("v"))
        o.select(col("o_orderkey"), col("v"),
          readableSize(col("v")).as("size_str"),
          readableQuantity(col("v")).as("qty_str"))
      },
      Some {
        def render(unit: Long, suffix: String) =
          s"CAST((v * 100) // $unit // 100 AS BIGINT) || '.' || " +
            s"lpad(CAST(CAST((v * 100) // $unit AS BIGINT) % 100 AS VARCHAR), 2, '0') || '$suffix'"
        s"""WITH o AS (SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS v
               FROM orders WHERE o_orderkey % 97 = 0)
            SELECT o_orderkey, v,
                   CASE WHEN v < 1024 THEN ${render(1L, " B")}
                        WHEN v < ${1024L * 1024} THEN ${render(1024L, " KiB")}
                        WHEN v < ${1024L * 1024 * 1024} THEN ${render(1024L * 1024, " MiB")}
                        ELSE ${render(1024L * 1024 * 1024, " GiB")} END AS size_str,
                   CASE WHEN v < 1000 THEN ${render(1L, "")}
                        WHEN v < 1000000 THEN ${render(1000L, " thousand")}
                        WHEN v < 1000000000 THEN ${render(1000000L, " million")}
                        ELSE ${render(1000000000L, " billion")} END AS qty_str
            FROM o"""
      }),

    "q_layout_zorder" -> Q(
      // Z-ORDER clustered layout (CH `ORDER BY mortonEncode(a, b)`,
      // Delta/Iceberg Z-ORDER): lineitem lands in native parts
      // range-clustered by the Morton interleave of (l_partkey,
      // l_suppkey), so the zone-map sidecars prune parts for
      // predicates on EITHER column — the multi-dimensional layout a
      // one-column sort cannot give. The cluster key is a pure
      // codegen'd shift/mask composition (functions/ZOrder, no UDF).
      // Gate: a 2-D box query over the z-ordered native table
      // hash-equals the same query on the parquet original (layout
      // changes the path, never the result); the both-dimensions
      // pruning contract is pinned in ZOrderSpec.
      (s, dir) => {
        import graft.functions.ZOrder
        val fx = ScanQueries.fixtureDir(dir, "lineitem_zorder")
        val zkey = ZOrder.interleave16(col("l_partkey"), col("l_suppkey"))
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"))
          .repartitionByRange(8, zkey)
          .sortWithinPartitions(zkey)
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
          .filter(col("l_partkey").between(50, 150) &&
            col("l_suppkey").between(2, 8))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n"), sum("qty").as("qty_sum"),
            min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"))
      },
      Some("""SELECT l_suppkey, count(*) AS n,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
                     min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
              FROM lineitem
              WHERE l_partkey BETWEEN 50 AND 150
                AND l_suppkey BETWEEN 2 AND 8
              GROUP BY l_suppkey""")),

    "q_agg_contingency" -> Q(
      // CH contingency(a, b): Pearson's contingency coefficient
      // C = sqrt(chi² / (chi² + n)) — the third member of the
      // association family (cramersV, theilsU shipped earlier). Same
      // scale layout: ONE hash aggregate to exact integer cell counts,
      // chi² folds over the tiny R×C cell table, 4 dp rounding absorbs
      // cell-order summation ulps (the q_agg_cramers_v precedent).
      (s, dir) => {
        val e = Q.events(s, dir).select(col("event_type"),
          floor(floor(col("value") * 100) / 10000.0).cast("long").as("bucket"))
        val cells = e.groupBy("event_type", "bucket").agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("event_type").agg(sum("o").as("rt"))
        val colT = cells.groupBy("bucket").agg(sum("o").as("ct"))
        val n = cells.agg(sum("o").as("n"))
        val exp = col("rt") * col("ct") / col("n")
        cells.join(rowT, "event_type").join(colT, "bucket")
          .crossJoin(broadcast(n))
          .select(((col("o") - exp) * (col("o") - exp) / exp).as("term"),
            col("n"))
          .agg(sum(col("term")).as("chi2"), first(col("n")).as("n"))
          .select(round(sqrt(col("chi2") / (col("chi2") + col("n"))), 4)
            .as("contingency_c"))
      },
      Some(s"""WITH e AS (SELECT event_type,
                       CAST(floor(CAST(floor(value * 100) AS BIGINT) / 10000.0) AS BIGINT) AS bucket
                     FROM ${Q.eventsOracle} ev),
              cells AS (SELECT event_type, bucket, count(*) AS o
                     FROM e GROUP BY 1, 2),
              rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
              ct AS (SELECT bucket, sum(o) AS ct FROM cells GROUP BY 1),
              n AS (SELECT sum(o) AS n FROM cells),
              chi AS (SELECT sum((o - rt.rt * ct.ct / n.n) *
                                 (o - rt.rt * ct.ct / n.n) /
                                 (rt.rt * ct.ct / n.n)) AS chi2,
                             first(n.n) AS n
                     FROM cells JOIN rt USING (event_type)
                                JOIN ct USING (bucket), n)
              SELECT round(sqrt(chi2 / (chi2 + n)), 4) AS contingency_c
              FROM chi""")),

    "q_agg_categorical_iv" -> Q(
      // CH categoricalInformationValue(cat, label): per-category
      // Information Value Σ (p⁺ᵢ − p⁻ᵢ)·ln(p⁺ᵢ/p⁻ᵢ) — the feature-
      // screening statistic. One hash aggregate to exact per-category
      // (pos, neg) integer counts; the IV fold runs over |categories|
      // rows (≤ 5 here) with the identical expression text in both
      // engines, 4 dp rounding absorbing term-order ulps. Frequencies
      // use +1 Laplace smoothing (the standard "adjusted WoE") so a
      // category with zero positives — which exists at sf0.001 — gets
      // a finite term instead of ln(0).
      (s, dir) => {
        val e = Q.events(s, dir).select(col("event_type"),
          (col("value") > 250).cast("long").as("y"))
        val cells = e.groupBy("event_type").agg(
          sum("y").as("pos"), (count(lit(1)) - sum("y")).as("neg"))
        val tot = cells.agg(sum("pos").as("tp"), sum("neg").as("tn"),
          count(lit(1)).as("k"))
        val p = (col("pos") + 1) / (col("tp") + col("k"))
        val q = (col("neg") + 1) / (col("tn") + col("k"))
        cells.crossJoin(broadcast(tot))
          .select(((p - q) * log(p / q)).as("term"))
          .agg(round(sum("term"), 4).as("iv"))
      },
      Some(s"""WITH e AS (SELECT event_type,
                       CAST(value > 250 AS BIGINT) AS y
                     FROM ${Q.eventsOracle} ev),
              cells AS (SELECT event_type, sum(y) AS pos,
                               count(*) - sum(y) AS neg
                     FROM e GROUP BY 1),
              tot AS (SELECT sum(pos) AS tp, sum(neg) AS tn,
                             count(*) AS k FROM cells)
              SELECT round(sum(((pos + 1) / CAST(tp + k AS DOUBLE)
                              - (neg + 1) / CAST(tn + k AS DOUBLE))
                     * ln(((pos + 1) / CAST(tp + k AS DOUBLE))
                        / ((neg + 1) / CAST(tn + k AS DOUBLE)))), 4) AS iv
              FROM cells, tot""")),

    "q_fn_array_enumerate" -> Q(
      // CH arrayEnumerate / arrayEnumerateUniq: positional indices
      // [1..n] and the occurrence ordinal of each element among its
      // equals so far. Codegen'd higher-order functions — the uniq
      // ordinal is transform((x, i) -> size(filter(slice(arr, 1, i+1),
      // y -> y = x))), no explode, no UDF; per-order flag arrays are
      // ≤ 7 elements so the quadratic lambda is constant work. The
      // oracle recomputes via unnest + row_number — an independent
      // relational spelling of the same semantics.
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 31 === 0)
        val a = li.groupBy(col("l_orderkey").as("k"))
          .agg(transform(
            array_sort(collect_list(struct(col("l_linenumber").as("ln"),
              col("l_returnflag").as("f")))),
            x => x.getField("f")).as("arr"))
        // serialized final projections (Q.strArr) — driver-gate rule;
        // enum columns first, then the source array is serialized in a
        // second select (same-select aliasing would shadow `arr`)
        a.select(col("k"), col("arr"),
          Q.strArr(sequence(lit(1), size(col("arr")))).as("enum_idx"),
          Q.strArr(transform(col("arr"), (x, i) =>
            size(filter(slice(col("arr"), lit(1), i + lit(1)), y => y === x))))
            .as("enum_uniq"))
          .select(col("k"), Q.strArr(col("arr")).as("arr"),
            col("enum_idx"), col("enum_uniq"))
      },
      Some(s"""WITH a AS (SELECT l_orderkey AS k,
                       -- tie-break on the flag: this synthetic lineitem
                       -- REUSES linenumbers within an order, and equal
                       -- (ln, flag) elements are interchangeable
                       list(l_returnflag ORDER BY l_linenumber, l_returnflag) AS arr
                     FROM lineitem WHERE l_orderkey % 31 = 0 GROUP BY 1),
              e AS (SELECT k, unnest(arr) AS f,
                       generate_subscripts(arr, 1) AS ord FROM a),
              r AS (SELECT k, f, ord,
                       row_number() OVER (PARTITION BY k, f ORDER BY ord) AS rn
                     FROM e),
              g AS (SELECT k,
                           ${Q.strArrSql("list(CAST(ord AS INT) ORDER BY ord)")} AS enum_idx,
                           ${Q.strArrSql("list(CAST(rn AS INT) ORDER BY ord)")} AS enum_uniq
                     FROM r GROUP BY k)
              SELECT g.k, ${Q.strArrSql("a.arr")} AS arr, g.enum_idx, g.enum_uniq
              FROM g JOIN a USING (k)""")),

    "q_join_asof_nearest" -> Q(
      // ASOF with NEAREST matching (pandas merge_asof
      // direction='nearest'): each purchase pairs with the signup
      // minimizing |Δt|, equidistant ties resolved BACKWARD (the
      // earlier signup) — deterministic in both engines. Scale shape:
      // the same single user_id shuffle as q_join_asof — the backward
      // candidate is a running last(ignoreNulls) and the forward one
      // a first(ignoreNulls) over the mirrored frame, so no per-user
      // pair explosion ever materializes. LEFT semantics keep
      // signup-less purchases (null match). The oracle is an
      // independent spelling: per-user pair join + arg_min over the
      // scalar key 2·|Δµs| + forward-bit (backward wins ties).
      (s, dir) => {
        val e = Q.events(s, dir)
          .filter(col("event_type").isin("purchase", "signup"))
          .withColumn("tus", unix_micros(col("ts").cast("timestamp")))
        val ord = when(col("event_type") === "signup", 0).otherwise(1)
        val sigTs = when(col("event_type") === "signup", col("ts"))
        val sigUs = when(col("event_type") === "signup", col("tus"))
        val wb = Window.partitionBy("user_id").orderBy(col("tus"), ord)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy("user_id").orderBy(col("tus"), ord)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        e.withColumn("b_ts", last(sigTs, ignoreNulls = true).over(wb))
          .withColumn("b_us", last(sigUs, ignoreNulls = true).over(wb))
          .withColumn("f_ts", first(sigTs, ignoreNulls = true).over(wf))
          .withColumn("f_us", first(sigUs, ignoreNulls = true).over(wf))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            // a NULL-ts purchase has no defined distance to anything:
            // null match (mirrors the oracle, whose arg_min key is
            // NULL for every candidate of such a row)
            when(col("tus").isNull, lit(null).cast("timestamp_ntz"))
              .when(col("f_us").isNull, col("b_ts"))
              .when(col("b_us").isNull, col("f_ts"))
              .when(col("tus") - col("b_us") <= col("f_us") - col("tus"),
                col("b_ts"))
              .otherwise(col("f_ts")).as("nearest_signup_ts"))
      },
      Some(s"""WITH p AS (SELECT event_id, user_id, ts
                     FROM ${Q.eventsOracle} WHERE event_type = 'purchase'),
              sg AS (SELECT user_id, ts FROM ${Q.eventsOracle}
                     WHERE event_type = 'signup'),
              m AS (SELECT p.event_id,
                       arg_min(sg.ts,
                         2 * abs(epoch_us(p.ts) - epoch_us(sg.ts))
                         + CASE WHEN sg.ts > p.ts THEN 1 ELSE 0 END)
                         AS nearest
                     FROM p JOIN sg ON p.user_id = sg.user_id
                     GROUP BY p.event_id)
              SELECT p.event_id, m.nearest AS nearest_signup_ts
              FROM p LEFT JOIN m USING (event_id)""")),

    "q_agg_group_concat" -> Q(
      // CH groupConcat(sep)(x) / SQL LISTAGG: per-region
      // comma-joined nation names, sorted for engine-independent
      // order. One hash aggregate; the concat folds over collected
      // arrays at the group level (array_join ∘ sort_array ∘
      // collect_list — collect order never leaks into the result).
      (s, dir) => {
        val n = t(s, dir, "nation").join(t(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        n.groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"),
            count(lit(1)).as("n_nations"))
      },
      Some("""SELECT r_name,
                     string_agg(n_name, ',' ORDER BY n_name) AS nations,
                     count(*) AS n_nations
              FROM nation JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name""")),

    "q_fn_array_set" -> Q(
      // CH arrayIntersect / arrayConcat+arrayDistinct (union) /
      // arrayFilter-based difference: set algebra between each
      // order's shipped-flag array and a literal reference set,
      // results SORTED+DEDUPED so both engines agree on order. All
      // codegen'd array builtins; per-order arrays are ≤ 7 elements.
      (s, dir) => {
        val ref = array(lit("A"), lit("N"))
        val a = t(s, dir, "lineitem").filter(col("l_orderkey") % 53 === 0)
          .groupBy(col("l_orderkey").as("k"))
          .agg(collect_list(col("l_returnflag")).as("flags"))
        // serialized final projections (Q.strArr) — driver-gate rule
        a.select(col("k"),
          Q.strArr(array_sort(array_distinct(array_intersect(col("flags"), ref))))
            .as("inter"),
          Q.strArr(array_sort(array_distinct(array_union(col("flags"), ref))))
            .as("uni"),
          Q.strArr(array_sort(array_distinct(array_except(col("flags"), ref))))
            .as("diff"))
      },
      Some(s"""WITH a AS (SELECT l_orderkey AS k,
                       list(l_returnflag) AS flags
                     FROM lineitem WHERE l_orderkey % 53 = 0 GROUP BY 1)
              SELECT k,
                     ${Q.strArrSql(
                       """list_sort(list_distinct(list_filter(flags,
                       x -> list_contains(['A','N'], x))))""")} AS inter,
                     ${Q.strArrSql(
                       """list_sort(list_distinct(list_concat(flags,
                       ['A','N'])))""")} AS uni,
                     ${Q.strArrSql(
                       """list_sort(list_distinct(list_filter(flags,
                       x -> NOT list_contains(['A','N'], x))))""")} AS diff
              FROM a""")),

    "q_agg_array_intersect" -> Q(
      // CH groupArrayIntersect(arr): the intersection of a group's
      // arrays — elements present in EVERY member array. Relationally:
      // explode to DISTINCT (grp, member, elem) thin rows, then an
      // element is in the intersection iff its distinct-member count
      // equals the group's member count — two hash aggregates + one
      // broadcast-joined group total, no array ever crosses the
      // shuffle whole. Groups = order priority, members = line
      // numbers, arrays = the flags seen at that (priority, line) —
      // member sets small enough that the intersection is non-empty
      // at every SF.
      (s, dir) => {
        val li = t(s, dir, "lineitem").join(t(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("grp"), col("l_linenumber").as("m"),
            col("l_returnflag").as("e"))
        val triples = li.distinct()
        val members = triples.select("grp", "m").distinct()
          .groupBy("grp").agg(count(lit(1)).as("n_members"))
        triples.groupBy("grp", "e").agg(countDistinct("m").as("n_with"))
          .join(broadcast(members), "grp")
          .filter(col("n_with") === col("n_members"))
          .groupBy("grp")
          // serialized final projection (Q.strArr) — driver-gate rule
          .agg(Q.strArr(sort_array(collect_list(col("e")))).as("common"))
      },
      Some(s"""WITH t AS (SELECT DISTINCT o_orderpriority AS grp,
                       l_linenumber AS m, l_returnflag AS e
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              members AS (SELECT grp, count(DISTINCT m) AS n_members
                     FROM t GROUP BY 1)
              SELECT grp, ${Q.strArrSql("list_sort(list(e))")} AS common
              FROM (SELECT grp, e, count(DISTINCT m) AS n_with
                    FROM t GROUP BY 1, 2) c
              JOIN members USING (grp)
              WHERE n_with = n_members
              GROUP BY grp""")),

    "q_funnel_strict" -> Q(
      // CH windowFunnel(window, 'strict_increase'): chain timestamps
      // must STRICTLY increase. Funnel times are minute-truncated so
      // same-minute collisions actually exist and the mode's verdict
      // differs from base on this data (FunnelAggSpec asserts the
      // difference). The aggregate keeps per level (lastTs ascending,
      // prefix-max chain start) so an equal-timestamp latest chain
      // can't shadow an earlier qualifying one — see
      // FunnelAggregator.evalStrictIncrease. Oracle: the strict-<
      // EXISTS chain, which the greedy pass provably equals.
      (s, dir) => {
        val lvl = when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .when(col("event_type") === "purchase", 2)
          .otherwise(-1)
        Q.events(s, dir)
          .select(col("user_id"),
            unix_micros(date_trunc("minute", col("ts").cast("timestamp")))
              .as("tus"), lvl.as("lvl"))
          .where(col("lvl") >= 0)
          .groupBy("user_id")
          .agg(call_function("funnel_agg", col("tus"), col("lvl"),
            lit(3600L * 1000000L), lit(3), lit("strict_increase"))
            .as("funnel_step"))
          .groupBy("funnel_step")
          .agg(count(lit(1)).as("users"))
          .orderBy("funnel_step")
      },
      Some(s"""WITH e AS (SELECT user_id,
                          date_trunc('minute', CAST(ts AS TIMESTAMP)) AS ts,
                          event_type
                          FROM ${Q.eventsOracle}
                          WHERE event_type IN ('view', 'click', 'purchase'))
               SELECT funnel_step, count(*) AS users FROM (
                 SELECT u.user_id,
                   CASE WHEN EXISTS (SELECT 1 FROM e v, e c, e p
                               WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                                 AND p.user_id = u.user_id
                                 AND v.event_type = 'view' AND c.event_type = 'click'
                                 AND p.event_type = 'purchase'
                                 AND v.ts < c.ts AND c.ts < p.ts
                                 AND c.ts <= v.ts + INTERVAL 1 HOUR
                                 AND p.ts <= v.ts + INTERVAL 1 HOUR) THEN 3
                        WHEN EXISTS (SELECT 1 FROM e v, e c
                               WHERE v.user_id = u.user_id AND c.user_id = u.user_id
                                 AND v.event_type = 'view' AND c.event_type = 'click'
                                 AND v.ts < c.ts
                                 AND c.ts <= v.ts + INTERVAL 1 HOUR) THEN 2
                        WHEN EXISTS (SELECT 1 FROM e v
                               WHERE v.user_id = u.user_id
                                 AND v.event_type = 'view') THEN 1
                        ELSE 0 END AS funnel_step
                 FROM (SELECT DISTINCT user_id FROM e) u)
               GROUP BY funnel_step ORDER BY funnel_step""")),

    "q_fn_vector_norms" -> Q(
      // CH L1Distance / L2Distance / LinfDistance between consecutive
      // embedding vectors. INTEGER-EXACT regime: elements quantize to
      // tenth-milli units first, so the element fold is integer
      // arithmetic — accumulation order (Spark's sequential
      // aggregate() vs DuckDB's unnest-row sum) cannot matter. The
      // only float op is the final L2 sqrt over an exact integer,
      // identical in both engines. Codegen'd zip_with/aggregate HOFs;
      // the pairing join is a thin self-join on consecutive ids.
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .filter(col("vec_id") % 7 === 0)
          .select(col("vec_id"),
            transform(col("embedding"),
              x => floor(x.cast("double") * 10000).cast("long")).as("q"))
        val a = e.select(col("vec_id").as("id"), col("q").as("qa"))
        val b = e.select((col("vec_id") - 7).as("id"), col("q").as("qb"))
        a.join(b, "id")
          .select(col("id"),
            aggregate(zip_with(col("qa"), col("qb"), (x, y) => abs(x - y)),
              lit(0L), (acc, x) => acc + x).as("l1"),
            aggregate(zip_with(col("qa"), col("qb"),
              (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
              .as("l2_sq"),
            array_max(zip_with(col("qa"), col("qb"), (x, y) => abs(x - y)))
              .as("linf"))
          .withColumn("l2", round(sqrt(col("l2_sq")), 4))
      },
      Some("""WITH e AS (SELECT vec_id,
                       list_transform(embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
                     FROM embeddings WHERE vec_id % 7 = 0),
              pairs AS (SELECT a.vec_id AS id, a.q AS qa, b.q AS qb
                     FROM e a JOIN e b ON b.vec_id = a.vec_id + 7),
              u AS (SELECT id, unnest(qa) AS xa, unnest(qb) AS xb FROM pairs)
              SELECT id,
                     CAST(sum(abs(xa - xb)) AS BIGINT) AS l1,
                     CAST(sum((xa - xb) * (xa - xb)) AS BIGINT) AS l2_sq,
                     CAST(max(abs(xa - xb)) AS BIGINT) AS linf,
                     round(sqrt(CAST(sum((xa - xb) * (xa - xb)) AS BIGINT)), 4) AS l2
              FROM u GROUP BY id""")),

    "q_agg_covar" -> Q(
      // CH covarSamp / covarPop: both covariance forms per group from
      // the same exact integer sums as q_agg_corr (cents quantization;
      // Σx, Σy, Σxy as decimal(38,0) so any row count stays exact) —
      // both engines evaluate the identical closed form, 4 dp.
      (s, dir) => {
        val rows = t(s, dir, "lineitem").select(col("l_returnflag"),
          floor(col("l_quantity") * 100).cast("long").as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
        val sums = rows.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
        val n = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val cpop = d("sxy") / n - (d("sx") / n) * (d("sy") / n)
        sums.select(col("l_returnflag"), col("n"),
          round(cpop, 4).as("covar_pop"),
          round(cpop * (n / (n - 1.0)), 4).as("covar_samp"))
      },
      Some("""WITH r AS (SELECT l_returnflag,
                       CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                     FROM lineitem),
              s AS (SELECT l_returnflag, count(*) AS n,
                       CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                       CAST(sum(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                       CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
                     FROM r GROUP BY 1)
              SELECT l_returnflag, n,
                     round(sxy / n - (sx / n) * (sy / n), 4) AS covar_pop,
                     round((sxy / n - (sx / n) * (sy / n)) * (n / (n - 1.0)), 4)
                       AS covar_samp
              FROM s""")),

    "q_window_dist" -> Q(
      // percent_rank / cume_dist — the two distribution window
      // functions completing the ranking family (rank/dense_rank/
      // ntile shipped earlier). Deterministic: the order key
      // (cents price, orderkey) is unique.
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("p"), col("o_orderkey"))
        t(s, dir, "orders")
          .filter(col("o_orderkey") % 41 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            floor(col("o_totalprice") * 100).cast("long").as("p"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
                     round(percent_rank() OVER w, 6) AS pr,
                     round(cume_dist() OVER w, 6) AS cd
              FROM (SELECT o_orderkey, o_orderpriority,
                           CAST(floor(o_totalprice * 100) AS BIGINT) AS p
                    FROM orders WHERE o_orderkey % 41 = 0)
              WINDOW w AS (PARTITION BY o_orderpriority
                           ORDER BY p, o_orderkey)"""))
  )
}
