package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed range (interval) join — the scale path for `point
 * BETWEEN start AND end` predicates.
 *
 * Spark's optimizer has no native interval-join strategy: a non-equi
 * join plans as BroadcastNestedLoopJoin (fine only when one side is
 * tiny — see `q_join_theta`) or, worse, a cartesian product. The
 * standard fix, used by every warehouse engine with a real range join
 * (and by Spark's own session-window machinery), is BINNING: quantize
 * the domain into fixed-width buckets, join point-bucket to
 * interval-bucket-span as a plain equi-join, and re-check the exact
 * predicate as a residual filter. Both sides shuffle ONCE on the
 * bucket id; no nested loop anywhere; AQE sees an ordinary shuffled
 * hash join.
 *
 * Uniqueness without dedup: the join key is the POINT's bucket, and
 * an interval emits each bucket in its span exactly once — so every
 * matching (point, interval) pair surfaces exactly once and no
 * distinct-pass is needed.
 *
 * Cost model: an interval of width W replicates into
 * `floor(W/bucketWidth) + 1` bucket rows. Pick `bucketWidth` near the
 * typical interval width: ~2 rows per interval, and each point joins
 * only its own bucket's intervals. Degenerate intervals (end < start,
 * or a NULL endpoint) match nothing by definition and are dropped
 * before the explode (`sequence` would throw on a descending range).
 *
 * Reference frame: ClickHouse expresses this as a raw non-equi JOIN
 * (no bucketed path) — this operator keeps the same semantics with a
 * shuffle plan that survives two large sides.
 */
object RangeJoin {

  /**
   * Inner-join `points` to `intervals` on
   * `points(pCol) BETWEEN intervals(startCol) AND intervals(endCol)`
   * (both ends inclusive), over any numeric domain (use day/epoch
   * numbers for dates). Output columns: all of `points`' then all of
   * `intervals`' (names must not collide).
   */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    val bw = lit(bucketWidth.toDouble)
    // floor(x / width) as the bucket id: the doubles are exact for any
    // plausible day/epoch magnitude (< 2^53)
    val p = points.filter(col(pCol).isNotNull)
      .withColumn("__bucket", floor(col(pCol) / bw).cast("long"))
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bw).cast("long"),
        floor(col(endCol) / bw).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pCol) >= col(startCol) && col(pCol) <= col(endCol))
      .drop("__bucket")
  }

  /**
   * Inner-join two interval tables on overlap:
   * `left.[ls, le]` ∩ `right.[rs, re]` ≠ ∅, i.e.
   * `ls <= re AND rs <= le` (closed intervals). Same binned equi-join
   * shape as [[pointInInterval]] — both sides explode their bucket
   * span, shuffle once on the bucket id.
   *
   * Exactly-once without a dedup pass: two overlapping intervals share
   * every bucket their overlap touches, so the residual keeps only the
   * FIRST common bucket — the one containing `greatest(ls, rs)`, the
   * overlap's start, which both sides cover by definition. Every other
   * shared bucket fails the predicate, so each matching pair survives
   * in exactly one bucket.
   *
   * Degenerate rows (NULL endpoints, end < start) overlap nothing and
   * are dropped on each side before the explode.
   */
  def intervalOverlap(left: DataFrame, lsCol: String, leCol: String,
      right: DataFrame, rsCol: String, reCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth=$bucketWidth must be >= 1")
    val bw = lit(bucketWidth.toDouble)
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
      .withColumn("__bucket", explode(sequence(
        floor(col(s) / bw).cast("long"), floor(col(e) / bw).cast("long"))))
    binned(left, lsCol, leCol).join(binned(right, rsCol, reCol), Seq("__bucket"))
      .filter(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol) &&
        col("__bucket") === floor(greatest(col(lsCol), col(rsCol)) / bw).cast("long"))
      .drop("__bucket")
  }
}
