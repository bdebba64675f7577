package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{Dedup, DedupClusters}

/**
 * STREAMING DEDUPLICATION — the continuous-ingestion form of the
 * dedup family: an unbounded document stream deduplicated against
 * everything ever admitted, with the admitted corpus represented only
 * by its [[graft.operators.Dedup.dedupIndex]] artifact persisted in
 * the engine's own native storage. This is the production shape for a
 * crawl pipeline at 100 TB: each micro-batch (a crawl snapshot slice)
 * is deduped intra-batch, then against the INDEX — tens of bytes per
 * corpus kilobyte; the admitted text itself is never re-read.
 *
 * Per epoch:
 *  1. intra-batch: MinHash/LSH candidate pairs → connected components
 *     → the min-id representative survives per cluster
 *     ([[graft.operators.DedupClusters.applyKeepList]] — a cluster
 *     collapses to its representative, and then lives or dies with it
 *     against the index);
 *  2. cross-epoch: [[graft.operators.Dedup.incrementalSurvivors]] of
 *     the representatives against the index restricted to STRICTLY
 *     EARLIER epochs (exact 64-bit fingerprint kill + banded LSH near
 *     kill, all bucketed equi-joins on thin rows);
 *  3. exactly-once writes: survivors to the output table and their
 *     (id, fp, sig, epoch) rows to the index table, both via
 *     [[EventStreams.appendEpoch]]'s epoch-scoped insert dedup.
 *
 * REPLAY CORRECTNESS (foreachBatch is at-least-once): a replayed
 * epoch N must recompute byte-identical output, or the part-identity
 * dedup in the native sink can't drop it. The index read is therefore
 * pinned to `epoch < N`: the first attempt's own appends (epoch = N)
 * are invisible to the replay, so the replay sees the exact index
 * state the first attempt saw — without that filter, the replay would
 * find every batch document fingerprint-identical to itself in the
 * index and emit nothing. The epoch column rides each index part, and
 * parts are written per epoch, so the `epoch < N` predicate prunes
 * the replayed epoch's parts at PLAN time via the `.chidx` zone maps —
 * replay determinism costs one pushed-down long comparison.
 * Same purity requirement as [[EventStreams.nativeSink]]: the batch
 * content must be a deterministic function of the epoch's input.
 *
 * Scale notes: state is the index TABLE, not executor memory — no
 * mapGroupsWithState, so admitted-corpus size is bounded by storage,
 * not by the state store; every join inside the epoch inherits the
 * batch operators' no-broadcast pins (corpusSide/fetchSide). A single
 * stream owns the index (the usual single-writer ingest topology);
 * concurrent writers would interleave epochs and need an external
 * coordinator.
 */
object StreamingDedup {

  /** The accumulated index (id, fp, sig, epoch), or an empty
    * same-schema relation before the first epoch commits. */
  private def readIndex(spark: SparkSession, indexPath: String,
      batch: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(indexPath)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) spark.read.format("clickhouse_native").load(indexPath)
    else Dedup.dedupIndex(batch, idCol, textCol, k, shingleN)
      .withColumn("epoch", lit(0L)).limit(0)
  }

  /**
   * One epoch's dedup, exposed (like [[EventStreams.appendEpoch]]) so
   * the replay contract is testable without a restart harness:
   * running the SAME batch under the SAME epoch id twice must leave
   * output and index unchanged, while the same content under a LATER
   * epoch is a genuine duplicate and must be dropped by the dedup
   * logic itself (the opposite of the heartbeat case in appendEpoch —
   * here content recurrence is exactly what the operator removes).
   */
  def dedupEpoch(batch: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, epochId: Long,
      threshold: Double = 0.5, k: Int = 128, bands: Int = 32,
      shingleN: Int = 3, exactConfirm: Boolean = false,
      indexNearKill: Boolean = true): Unit = {
    val spark = batch.sparkSession
    // 1. intra-batch: pairs → clusters → min-id representative.
    // exactConfirm is the ORACLE-GATE regime (the q_dedup_minhash /
    // q_dedup_apply convention): candidate pairs are confirmed
    // text-equal via an md5 re-join before clustering, so at
    // threshold 1.0 the pipeline's output is exactly the equal-text
    // cluster structure and a SQL window oracle can state it. The
    // probabilistic near-dup regime (exactConfirm=false) stays
    // spec-gated in StreamingSpec.
    val rawPairs = Dedup.minhashPairs(batch, idCol, textCol, k, bands,
      shingleN, threshold)
    val pairs =
      if (!exactConfirm) rawPairs
      else {
        val fp = batch.select(col(idCol).as("cid"), md5(col(textCol).cast("binary")).as("h"))
        rawPairs
          .join(fp.select(col("cid").as("id_a"), col("h").as("h_a")), "id_a")
          .join(fp.select(col("cid").as("id_b"), col("h").as("h_b")), "id_b")
          .filter(col("h_a") === col("h_b"))
          .drop("h_a", "h_b")
      }
    val reps = DedupClusters.applyKeepList(batch, idCol, pairs)
    // 2. cross-epoch, against strictly-earlier epochs only (see
    // scaladoc: replay determinism). indexNearKill=false keeps only
    // the unconditional exact-fingerprint kill (est_sim can never
    // reach the sentinel threshold 2.0), so in the oracle-gate regime
    // the cross-epoch decision rests on fp equality alone — the
    // signature-collision false-kill a SQL oracle cannot express is
    // ruled out by construction.
    val index = readIndex(spark, indexPath, batch, idCol, textCol, k, shingleN)
      .filter(col("epoch") < lit(epochId))
      .select("id", "fp", "sig")
    val survivors = Dedup.incrementalSurvivors(reps, index, idCol, textCol,
      k, bands, shingleN, if (indexNearKill) threshold else 2.0)
      .localCheckpoint() // computed once, appended twice (out + index)
    // 3. idempotent appends; either order is safe — a crash between
    // them replays the epoch and the already-landed side no-ops
    EventStreams.appendEpoch(survivors, outPath, epochId)
    EventStreams.appendEpoch(
      Dedup.dedupIndex(survivors, idCol, textCol, k, shingleN)
        .withColumn("epoch", lit(epochId)),
      indexPath, epochId)
  }

  /**
   * The streaming wrapper: every micro-batch flows through
   * [[dedupEpoch]] keyed by Spark's epoch id. Returns the writer
   * ready for `.option("checkpointLocation", …).start()`.
   */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, threshold: Double = 0.5,
      k: Int = 128, bands: Int = 32, shingleN: Int = 3,
      exactConfirm: Boolean = false, indexNearKill: Boolean = true)
      : DataStreamWriter[Row] =
    docs.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], epochId: Long) =>
        dedupEpoch(batch.toDF(), idCol, textCol, indexPath, outPath,
          epochId, threshold, k, bands, shingleN, exactConfirm, indexNearKill)
      }
}
