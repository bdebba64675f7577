package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * ClickHouse MergeTree table-engine FINAL semantics, re-expressed as
 * declarative Spark aggregations.
 *
 * A user of the reference stack (reference README.md:63-75 — scans
 * consumed by host-engine SQL) typically exported the data FROM
 * ClickHouse tables whose engines fold rows at merge time:
 * ReplacingMergeTree keeps the newest version per key,
 * CollapsingMergeTree cancels +1/-1 row pairs, SummingMergeTree
 * pre-sums numeric columns per key. Reading such an export without
 * applying the fold (what `SELECT ... FINAL` does server-side) double
 * counts. These operators ARE the fold, so an exported raw row stream
 * queries like the server's FINAL view.
 *
 * All three compile to a single hash aggregate over the key columns —
 * one shuffle, with map-side partial aggregation (`max_by`/`sum`
 * partials collapse duplicates per input partition before anything
 * crosses the wire). None of them uses a window: a window spelling
 * (`row_number() OVER (PARTITION BY key ORDER BY version DESC)`) sorts
 * every partition and shuffles FULL rows; the `max_by(struct(...))`
 * aggregate ships at most one surviving row per key per input
 * partition — the difference between O(data) and O(keys) shuffle
 * traffic on a 100 TB append log where most keys repeat.
 *
 * (AggregatingMergeTree — the fourth folding engine — is covered by the
 * -State/-Merge rollup in `scan_matview_rollup`.)
 */
object MergeTree {

  private def payload(df: DataFrame, exclude: Seq[String]): Seq[String] =
    df.columns.filterNot(exclude.contains(_)).toSeq

  /**
   * ReplacingMergeTree FINAL: the row with the greatest `versionCol`
   * per `keyCols` group survives. Versions must be distinct within a
   * key (ClickHouse itself keeps an arbitrary one of several equal
   * versions — the last in insertion order, which a distributed read
   * cannot reproduce deterministically; callers with tie-able versions
   * should extend the version with a tiebreaker column via struct).
   *
   * Output columns: keyCols ++ versionCol ++ (remaining columns in
   * input order).
   */
  def replacingFinal(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val rest = payload(df, keyCols :+ versionCol)
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max(col(versionCol)).as(versionCol),
        rest.map(c => max_by(col(c), col(versionCol)).as(c)): _*)
      .select(((keyCols :+ versionCol) ++ rest).map(col): _*)
  }

  /**
   * CollapsingMergeTree FINAL over a versioned sign stream: per key,
   * the latest row (by `versionCol`) decides — if its sign is +1 the
   * key exists in that state; if -1 the key has been cancelled and
   * emits nothing. This is the well-formed-stream semantics (each -1
   * cancels the preceding +1); ClickHouse's own FINAL resolves the
   * same way when signs alternate, and its behavior on malformed
   * streams (two consecutive +1s) is explicitly undefined, so the
   * versioned reading is the deterministic one (it matches
   * VersionedCollapsingMergeTree exactly).
   */
  def collapsingFinal(df: DataFrame, keyCols: Seq[String], signCol: String,
      versionCol: String): DataFrame = {
    val rest = payload(df, keyCols ++ Seq(signCol, versionCol))
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max(col(versionCol)).as(versionCol),
        (max_by(col(signCol), col(versionCol)).as(signCol) +:
          rest.map(c => max_by(col(c), col(versionCol)).as(c))): _*)
      .filter(col(signCol) === 1)
      .select(((keyCols ++ Seq(versionCol, signCol)) ++ rest).map(col): _*)
  }

  /**
   * SummingMergeTree FINAL: per key, the given numeric columns are
   * summed; all other non-key columns are dropped (ClickHouse keeps an
   * arbitrary value for them — not reproducible, so not offered).
   */
  def summingFinal(df: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** Column helper: a version extended with a tiebreaker, for
    * [[replacingFinal]]/[[collapsingFinal]] callers whose version
    * column alone can tie (struct ordering is lexicographic). */
  def versionWithTiebreak(version: Column, tiebreak: Column): Column =
    struct(version, tiebreak)

  /**
   * `OPTIMIZE TABLE ... FINAL` for a native-format directory.
   * ClickHouse folds ReplacingMergeTree duplicates during background
   * part merges and OPTIMIZE forces the merge to completion; a
   * Spark-written native table accumulates part files per INSERT the
   * same way and nothing ever merges them. This operator IS the
   * forced merge: read every part, apply [[replacingFinal]], rewrite
   * as `parts` compacted part files into `dstDir`.
   *
   * Compaction writes BESIDE the live table (a new directory), never
   * in place: rewriting a directory that a lazy plan is concurrently
   * reading is a lost-update/torn-read hazard in any engine, and at
   * 100 TB the atomic swap (rename or catalog pointer flip) belongs
   * to the table catalog / orchestration layer, not inside a bulk
   * job. Cost shape: one hash aggregate (map-side partials collapse
   * per-part duplicates before the shuffle — the whole point of
   * merging an append log) + one clustered write; the write shuffles
   * on the key columns so each output part covers a key range and
   * later key-filtered reads prune parts via the zone-map sidecars.
   *
   * @return the compacted table, re-read from `dstDir`
   */
  def optimizeReplacing(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, dstDir: String, keyCols: Seq[String],
      versionCol: String, parts: Int = 1): DataFrame = {
    require(parts > 0, s"parts=$parts must be > 0")
    val folded = replacingFinal(
      spark.read.format("clickhouse_native").load(srcDir), keyCols, versionCol)
    folded.repartition(parts, keyCols.map(col): _*)
      .write.format("clickhouse_native").mode("overwrite").save(dstDir)
    spark.read.format("clickhouse_native").load(dstDir)
  }

  /**
   * `ReplacingMergeTree(ver, is_deleted)` FINAL — ClickHouse's
   * soft-delete variant (23.2+): per key the latest row (by
   * `versionCol`) decides, and when that latest row carries
   * `is_deleted = 1` the key emits NOTHING — a delete travels as an
   * ordinary insert, folded out at read/merge time. Same single hash
   * aggregate as [[replacingFinal]] (the deleted-filter is a post-agg
   * predicate on O(keys) rows), so an append-only export with
   * tombstone rows queries like the server's FINAL view.
   */
  def replacingFinalDeleted(df: DataFrame, keyCols: Seq[String],
      versionCol: String, isDeletedCol: String): DataFrame =
    replacingFinal(df, keyCols, versionCol)
      // only an explicit 1 deletes: a NULL is_deleted (e.g. rows
      // predating a metadata-only ADD COLUMN of the flag, which
      // null-fills) is NOT a tombstone — dropping those keys would
      // vanish live data (CH's is_deleted is non-nullable UInt8).
      // Spelled =!= 1 (not === 0 ∨ NULL) so a malformed flag value —
      // e.g. 2 from a corrupt export — keeps its key visible instead
      // of silently vanishing it; ClickHouse itself REJECTS is_deleted
      // outside {0,1}, so "not a valid tombstone" must never delete.
      .filter(col(isDeletedCol) =!= 1 || col(isDeletedCol).isNull)

  /**
   * `OPTIMIZE TABLE ... FINAL DEDUPLICATE [BY cols]` — the forced
   * merge that also drops fully-identical rows (no BY: whole-row
   * distinct) or rows identical on `byCols` (BY form). ClickHouse
   * leaves WHICH row survives a BY group unspecified; this operator
   * picks the MINIMUM of the remaining columns (a total order), so
   * the result is deterministic under any partitioning — the property
   * a hash gate and a re-runnable maintenance job both need. Cost
   * shape matches [[optimizeReplacing]]: one map-side-combining
   * aggregate + one key-clustered write.
   */
  def optimizeDeduplicate(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, dstDir: String, byCols: Seq[String] = Seq.empty,
      parts: Int = 1): DataFrame = {
    require(parts > 0, s"parts=$parts must be > 0")
    val src = spark.read.format("clickhouse_native").load(srcDir)
    val deduped =
      if (byCols.isEmpty) src.distinct()
      else {
        val rest = payload(src, byCols)
        if (rest.isEmpty) src.select(byCols.map(col): _*).distinct()
        else src.groupBy(byCols.map(col): _*)
          .agg(min(struct(rest.map(col): _*)).as("_p"))
          .select(byCols.map(col) ++ rest.map(c => col(s"_p.$c").as(c)): _*)
          // the maintenance contract is "the same table, compacted":
          // restore the SOURCE column order (the group-by spelling
          // above puts byCols first)
          .select(src.columns.map(col): _*)
      }
    val clusterCols = if (byCols.nonEmpty) byCols else src.columns.headOption.toSeq
    deduped.repartition(parts, clusterCols.map(col): _*)
      .write.format("clickhouse_native").mode("overwrite").save(dstDir)
    spark.read.format("clickhouse_native").load(dstDir)
  }
}
