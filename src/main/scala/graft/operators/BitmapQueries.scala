package graft.operators

import org.apache.spark.sql.functions._

/**
 * ClickHouse `groupBitmap` / `bitmapCardinality` / `bitmapAnd` /
 * `bitmapOr` / `bitmapAndnot` surface over the Roaring-style
 * mergeable bitmap aggregate ([[graft.functions.BitmapAgg]]).
 *
 * Why bitmaps and not `count(distinct)`: one pass builds a REUSABLE
 * set per group; every subsequent audience combination (A∩B, A∪B,
 * A\B, day-over-day retention) is algebra on the compact bitmaps —
 * no re-shuffle of the raw events per combination. At 100 TB the
 * events shuffle happens once; the bitmap rows that flow afterwards
 * are O(distinct/8) bytes.
 *
 * Every key is oracle-exact: bitmap cardinalities are exact (not
 * sketches), so DuckDB's `count(DISTINCT …)` spellings must match
 * bit-for-bit.
 */
object BitmapQueries {

  val all: Seq[(String, Q)] = Seq(

    "q_agg_bitmap" -> Q(
      // groupBitmap(user_id) per event_type — exact distinct users via
      // the mergeable bitmap (partial+final; one bitmap-buffer shuffle)
      (s, dir) => Q.events(s, dir)
        .groupBy("event_type")
        .agg(expr("bitmap_cardinality(bitmap_agg(user_id))").as("uniq_users"),
          count(lit(1)).as("n_events"))
        .select("event_type", "uniq_users", "n_events"),
      Some(s"""SELECT event_type, count(DISTINCT user_id) AS uniq_users,
                     count(*) AS n_events
              FROM ${Q.eventsOracle} GROUP BY event_type""")),

    "q_bitmap_ops" -> Q(
      // audience overlap: click-users vs purchase-users — AND/OR/ANDNOT
      // cardinalities on two 1-row bitmap sides (broadcast-tiny join of
      // two single-row aggregates; the raw events shuffle exactly once)
      (s, dir) => {
        val bm = Q.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(expr("bitmap_agg(user_id)").as("bm"))
        val a = bm.filter(col("event_type") === "click").select(col("bm").as("a"))
        val b = bm.filter(col("event_type") === "purchase").select(col("bm").as("b"))
        a.crossJoin(b).select(
          expr("bitmap_cardinality(a)").as("click_users"),
          expr("bitmap_cardinality(b)").as("purchase_users"),
          expr("bitmap_and_cardinality(a, b)").as("both_users"),
          expr("bitmap_or_cardinality(a, b)").as("either_users"),
          expr("bitmap_andnot_cardinality(a, b)").as("click_only"))
      },
      Some(s"""WITH c AS (SELECT DISTINCT user_id FROM ${Q.eventsOracle}
                         WHERE event_type = 'click'),
                   p AS (SELECT DISTINCT user_id FROM ${Q.eventsOracle}
                         WHERE event_type = 'purchase')
              SELECT (SELECT count(*) FROM c) AS click_users,
                     (SELECT count(*) FROM p) AS purchase_users,
                     (SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM p)) AS both_users,
                     (SELECT count(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM p)) AS either_users,
                     (SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS click_only""")),

    "q_bitmap_retention" -> Q(
      // day-over-day retention via bitmap algebra: one bitmap per day,
      // retained(d) = |bm(d) ∩ bm(d+1)|. The self-join moves only
      // per-day bitmap rows (O(days) of them), never the event stream.
      (s, dir) => {
        val bm = Q.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id"))
          .groupBy("d")
          .agg(expr("bitmap_agg(user_id)").as("bm"))
        val nxt = bm.select(date_sub(col("d"), 1).as("d"), col("bm").as("bm_next"))
        bm.join(nxt, Seq("d"), "left")
          .select(col("d"),
            expr("bitmap_cardinality(bm)").as("active"),
            coalesce(expr("bitmap_and_cardinality(bm, bm_next)"), lit(0L))
              .as("retained_next_day"))
      },
      Some(s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
                          FROM ${Q.eventsOracle}),
                   act AS (SELECT d, count(*) AS active FROM du GROUP BY d),
                   ret AS (SELECT a.d, count(*) AS retained
                           FROM du a JOIN du b
                             ON b.d = a.d + 1 AND a.user_id = b.user_id
                           GROUP BY a.d)
              SELECT act.d, active,
                     coalesce(retained, 0) AS retained_next_day
              FROM act LEFT JOIN ret ON act.d = ret.d"""))
  )
}
