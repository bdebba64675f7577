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

  /**
   * Exact distributed triangle count via degree-ordered edge
   * orientation (Suri & Vassilvitskii, WWW'11 — the MapReduce
   * classic): canonicalize to undirected loop-free edges, orient each
   * edge from its lower-(degree, id) endpoint to the higher, then
   * every triangle has exactly ONE vertex with both out-edges — so
   * joining the oriented wedges (a→b, a→c) against the closing
   * oriented edge counts each triangle exactly once, no dedup pass.
   *
   * The orientation is the scale story: out-degrees under the
   * (degree, id) order are O(sqrt(m)) even on power-law graphs, so
   * the wedge self-join never explodes on hub vertices — the "curse
   * of the last reducer" killer. Plan: two thin aggregates (degrees,
   * final count) + three equi-joins; no crossJoin, nothing on the
   * driver. The count itself is orientation-INDEPENDENT, which is
   * what makes the result oracle-able by a plain ordered 3-way
   * self-join.
   *
   * @return one row (n_vertices, n_edges, n_triangles) — all exact
   *         integers over the canonical undirected graph
   */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .distinct()
    val degrees = canon.select(col("lo").as("v"))
      .unionAll(canon.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient by (deg, id) — a total order, so exactly one direction
    // per edge; struct comparison is lexicographic
    val withDeg = canon
      .join(degrees.select(col("v").as("lo"), col("deg").as("deg_lo")), "lo")
      .join(degrees.select(col("v").as("hi"), col("deg").as("deg_hi")), "hi")
    val oriented = withDeg.select(
      when(struct(col("deg_lo"), col("lo")) < struct(col("deg_hi"), col("hi")),
        struct(col("lo").as("src"), col("hi").as("dst")))
        .otherwise(struct(col("hi").as("src"), col("lo").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // wedges from each center's out-edges (b != c, counted once via <)
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    // a wedge closes iff the oriented edge between its endpoints
    // exists — in EITHER direction ((b, c) is id-ordered, orientation
    // is degree-ordered; a left-semi equi-join on both keys)
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
      .unionAll(oriented.select(col("dst").as("b"), col("src").as("c")))
    val nTriangles = wedges.join(closing, Seq("b", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nV = degrees.agg(count(lit(1)).as("n_vertices"))
    val nE = canon.agg(count(lit(1)).as("n_edges"))
    nV.crossJoin(nE).crossJoin(nTriangles) // three 1-row frames
  }
}
