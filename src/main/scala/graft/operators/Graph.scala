package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph computation beyond connected components
 * ([[DedupClusters]]): PageRank in FIXED-POINT integer arithmetic —
 * the host/domain quality-weighting pass a crawl-derived training
 * corpus runs before sampling (rank the source graph, weight
 * documents by their host's rank).
 *
 * Determinism: classic PageRank iterates doubles, whose sums depend
 * on partitioning/order. Here every rank is a long in units of
 * 1/SCALE: contributions divide integrally (`div` truncation is
 * order-free), the damping blend is integer multiply-then-divide, and
 * the per-target sum is an exact long aggregate — the whole iteration
 * is engine- and partitioning-exact, so a SQL oracle can replay it
 * with unrolled per-iteration CTEs (same recipe as the BPE keys).
 *
 * Scale shape per iteration: one hash aggregate of thin
 * (dst, contribution) rows + one equi-join of ranks to out-degrees —
 * both map-side combining; ranks never leave the cluster. Dangling
 * nodes (no out-edges) contribute nothing — the standard simplified
 * treatment; they still RECEIVE rank, and every node keeps the
 * damping floor.
 */
object Graph {

  val Scale = 1000000000L // 1e9 rank units per 1.0

  /**
   * Fixed-point PageRank over a directed edge list (distinct edges;
   * duplicate rows are collapsed). Damping 0.85 as the integer blend
   * `(15 * Scale) div 100 + (85 * inbound) div 100`.
   *
   * @return (node, rank_fp) for every node appearing as src or dst,
   *         rank_fp in 1/Scale units after `iterations` rounds from a
   *         uniform start of Scale per node
   */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"iterations=$iterations outside [1, 20]")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.withColumn("rank_fp", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = ranks.join(outDeg, ranks("node") === outDeg("src"))
        .select(col("node").as("c_src"),
          expr("rank_fp div outdeg").as("contrib"))
        .join(e, col("c_src") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum("contrib").as("inbound"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * Scale / 100) +
            expr("85 * coalesce(inbound, 0L) div 100")).as("rank_fp"))
    }
    ranks
  }
}
