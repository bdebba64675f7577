package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Duplicate-cluster resolution: candidate pairs → connected
 * components → one kept representative per component. This is the
 * step that turns near-dup PAIRS into an actionable training-data
 * keep/drop list.
 *
 * Algorithm: iterative min-label propagation. Every id starts as its
 * own label; each round, a node adopts the minimum label among itself
 * and its neighbours. Chains halve in O(log(diameter)) rounds — dedup
 * components are tiny (clusters of near-identical docs), so a handful
 * of rounds converges; each round is one shuffle join + aggregate,
 * nothing ever touches the driver except the 1-row convergence check.
 */
object DedupClusters {

  /**
   * @param pairs  (id_a, id_b) candidate duplicate pairs
   * @return (id, cluster) — cluster = min id of the connected component
   */
  def assign(pairs: DataFrame, maxIterations: Int = 10): DataFrame = {
    // undirected edges, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))

    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // each node adopts min(own label, neighbours' labels)
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "dst_cluster"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_cluster")).as("n_cluster"))
      val next = labels.join(neighbourMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster"))).as("cluster"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }

  /**
   * Full dedup decision over a corpus: ids not in any candidate pair
   * keep themselves; within a cluster the minimum id survives.
   *
   * @return (id, cluster, keep)
   */
  def keepList(allIds: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clustered = assign(pairs)
    allIds.select(col(idCol).as("id"))
      .join(clustered, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("id")))
      .withColumn("keep", col("id") === col("cluster"))
  }
}
