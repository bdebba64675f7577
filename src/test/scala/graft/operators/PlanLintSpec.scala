package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Repo-wide physical-plan lint over EVERY registered query key — the
 * 100-TB guard rail the per-operator specs can't give: a new key (or a
 * refactor of a shared helper) that introduces an all-pairs join or an
 * unpartitioned corpus-wide window anywhere in the registry fails here
 * by name, instead of surfacing as an OOM three rounds later on a
 * bigger corpus.
 *
 * Two invariants, each with an EXACT allowlist (set equality, so a
 * fixed key must also be REMOVED from the list — stale entries fail):
 *
 *  1. No `CartesianProduct` / `BroadcastNestedLoopJoin` node, except
 *     keys whose semantics are genuinely non-equi AND whose build side
 *     is provably bounded (a LIMITed or aggregated dimension, a query
 *     batch, a constant), or exact all-pairs verification anchors that
 *     exist precisely to gate an LSH/IVF path on a bounded corpus.
 *  2. No Window/WindowGroupLimit with an EMPTY partition spec, except
 *     keys whose window input is already reduced to a bounded row set
 *     (post-aggregate group rows, top-k survivors) — a global window
 *     over raw corpus rows single-threads the whole dataset through
 *     one partition.
 */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  /** Keys allowed to contain a cartesian / broadcast-nested-loop node,
    * with the reason the node is scale-safe (or deliberately not). */
  private val allowedAllPairs: Map[String, String] = Map(
    // --- 1-row scalar frames cross-joined back (the broadcast of a
    //     single aggregate row is the RIGHT plan at any scale) --------
    "q_agg_histogram" -> "global (min,max) bin-bounds 1-row frame",
    "q_agg_contingency" -> "grand-total 1-row frame",
    "q_agg_cramers_v" -> "grand-total 1-row frame",
    "q_agg_theils_u" -> "grand-total 1-row frame",
    "q_agg_categorical_iv" -> "global good/bad totals 1-row frame",
    "q_agg_kstest" -> "(n_a, n_b) totals 1-row frame",
    "q_agg_mean_ztest" -> "per-arm moment totals, bounded 1-row frames",
    "q_df_stats" -> "per-column summary vs 1-row corpus totals",
    "q_bitmap_ops" -> "two 1-row bitmap-aggregate sides (BitmapQueries.scala:38)",
    "q_limit_ties" -> "k-th-value cutoff 1-row frame (WITH TIES cut)",
    "q_tpch_q11" -> "global value-sum scalar subquery, 1 row",
    "q_tpch_q22" -> "global avg(acctbal) scalar subquery, 1 row",
    "q_quant_int8" -> "global max-abs scale 1-row frame",
    "q_mix_epochs" -> "per-source epoch factors, bounded by source domain",
    "q_dsir_weights" -> "bucket-total 1-row frame (DsirBuckets fixed)",
    "q_dsir_resample" -> "bucket-total 1-row frame (via q_dsir_weights)",
    "q_bm25_topk" -> "1-row (n_docs, avgdl) corpus-stats frame",
    "q_bm25_index_persist" -> "1-row corpus-stats frame (serve path)",
    "q_rank_fusion" -> "bm25 1-row stats + 1-query embedding side",
    "q_graph_triangles" -> "three 1-row count frames (Graph.scala:121)",
    // --- bounded build side by construction --------------------------
    "q_sim_cosine_topk" -> "query-batch side bounded (brute-force anchor)",
    "q_sim_cosine_lsh" -> "query-batch / plane-constant side bounded",
    "q_sim_cosine_ivf" -> "centroid table bounded by nlist",
    // NOTE q_sim_cosine_ivf_hier needs no allowlist entry since the
    // round-9 probe-side routing (Similarity.ivfCells hierRouting now
    // routes PROBES through the codegen'd IvfProbe expression too, not
    // just encodes): like q_knn_graph_hier, no corpus- OR query-scale
    // nested-loop join remains anywhere in the hier plan.
    "q_sim_cosine_ivfpq" -> "centroid + codebook tables bounded",
    "q_sim_index_persist" -> "centroid routing table bounded by nlist",
    "q_sim_hard_negatives" -> "query-batch side bounded",
    // NOTE q_knn_graph needs no allowlist entry since r14: the flat
    // probe ranking runs as a per-row array_sort expression over the
    // driver-resident centroid table, so the centroid crossJoin (the
    // old BroadcastNestedLoopJoin) no longer exists in the plan.
    "q_embed_classify" -> "label-centroid prototypes bounded by label domain",
    // --- semantically all-pairs / deliberate anchors ------------------
    "q_join_cross" -> "IS the cross-join operator",
    "q_join_theta" -> "non-equi theta join semantics",
    "q_dedup_embedding_exact" ->
      "deliberate all-pairs verification anchor for the LSH path (bounded gate corpus)")

  /** Keys allowed an unpartitioned window, with the boundedness
    * argument for the window's input. */
  private val allowedGlobalWindow: Map[String, String] = Map(
    "q_agg_auc" -> "window over distinct-cents-score aggregate (domain-bounded)",
    "q_agg_kstest" -> "CDF window over distinct-cents-value aggregate",
    "q_agg_mannwhitney" -> "rank window over distinct-cents-value aggregate",
    "q_agg_rank_corr" -> "rank windows over per-distinct-value aggregates",
    "q_vocab_build" -> "rank over limit(maxVocab) survivors",
    "q_bm25_topk" -> "rank over limit(k) survivors (TakeOrdered first)",
    "q_bm25_index_persist" -> "rank over limit(k) survivors (serve path)",
    "q_rank_fusion" -> "rank over union of two top-50 lists (<=100 rows)",
    "q_dsir_resample" -> "rank over limit(100) survivors (TakeOrdered first)",
    "q_lang_mix" -> "min-count window over per-language count table")

  /** Build each registered key ONCE (engine keys write fixtures at
    * construction — a second build would redo that work), with AQE off
    * while the physical plan is extracted: under AQE the exchanges are
    * inserted inside AdaptiveSparkPlanExec's preparation and a tree
    * walk of the un-executed plan would miss them. The walk
    * (SparkTestBase.walkPlan) recurses into expression-hosted subquery
    * plans too, so a global window inside a scalar subquery is seen. */
  private lazy val built
      : Map[String, (org.apache.spark.sql.types.StructType, Boolean, Boolean)] =
    SparkTestBase.withAqeDisabled {
      QueryRegistry.queries.map { case (key, mk) =>
        val df = mk(spark, dir)
        val plan = df.queryExecution.executedPlan
        val nodes = SparkTestBase.walkPlan(plan)
        val s = plan.toString
        val allPairs = s.contains("CartesianProduct") ||
          s.contains("BroadcastNestedLoopJoin")
        val globalWindow = nodes.exists {
          case w: WindowExec => w.partitionSpec.isEmpty
          case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
          case _ => false
        }
        key -> ((df.schema, allPairs, globalWindow))
      }
    }

  private lazy val lint: Map[String, (Boolean, Boolean)] =
    built.map { case (k, (_, ap, gw)) => k -> ((ap, gw)) }

  test("no unlisted cartesian or broadcast-nested-loop join in any registered plan") {
    val actual = lint.collect { case (k, (true, _)) => k }.toSet
    val expected = allowedAllPairs.keySet
    val unlisted = actual -- expected
    val stale = expected -- actual
    assert(unlisted.isEmpty,
      s"new all-pairs joins (justify + allowlist or fix): ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale allowlist entries (remove): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("every registered key projects only atomic columns (driver-gate hashability)") {
    // The driver's comparator sorts result cells with pandas, which
    // cannot hash array/map/struct cells — 13 keys sat unverified for a
    // round because their final projection ended in array<...>. The
    // COVERAGE.md discipline (serialize to '|'-joined strings on both
    // engines) is enforced here structurally so it can't regress.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = built.flatMap { case (key, (schema, _, _)) =>
      schema.fields.toSeq.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => s"$key.${f.name}: ${f.dataType.simpleString}"
      }
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"non-atomic final columns (serialize per COVERAGE.md): ${offenders.mkString(", ")}")
  }

  test("no unlisted unpartitioned window in any registered plan") {
    val actual = lint.collect { case (k, (_, true)) => k }.toSet
    val expected = allowedGlobalWindow.keySet
    val unlisted = actual -- expected
    val stale = expected -- actual
    assert(unlisted.isEmpty,
      s"new global windows (justify + allowlist or fix): ${unlisted.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale allowlist entries (remove): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
