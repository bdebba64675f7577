package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Duplicate-cluster resolution: candidate pairs → connected
 * components → one kept representative per component. This is the
 * step that turns near-dup PAIRS into an actionable training-data
 * keep/drop list.
 *
 * Algorithm: min-label propagation with pointer jumping. Each round,
 * (1) every node adopts the minimum label among itself and its
 * neighbours, then (2) re-labels itself with its LABEL's label —
 * the doubling step that makes long chains converge in
 * O(log(diameter)) rounds instead of O(diameter). Each round is two
 * shuffle joins; nothing touches the driver except the 1-row
 * convergence check. Every round ends in localCheckpoint(): caching
 * alone keeps the LOGICAL plan nesting round over round, and Catalyst
 * re-optimizing that ever-growing plan OOMs the driver long before
 * the data does — lineage truncation is load-bearing here.
 */
object DedupClusters {

  /**
   * @param pairs  (id_a, id_b) candidate duplicate pairs
   * @return (id, cluster) — cluster = min id of the connected component
   * @throws IllegalStateException if not converged in maxIterations
   *         (silently wrong clusters are worse than an error)
   */
  def assign(pairs: DataFrame, maxIterations: Int = 15): DataFrame = {
    // undirected edges, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // (1) each node adopts min(own label, neighbours' labels)
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "dst_cluster"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_cluster")).as("n_cluster"))
      val stepped = labels.join(neighbourMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster"))).as("cluster"))
      // (2) pointer jump: follow one indirection, label := label(label)
      val lookup = stepped.select(col("id").as("l_id"), col("cluster").as("l_cluster"))
      val next = stepped.join(lookup, col("cluster") === col("l_id"), "left")
        .select(col("id"), coalesce(col("l_cluster"), col("cluster")).as("cluster"))
        .localCheckpoint() // truncate lineage: plan must not grow per round
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), "id")
        .filter(col("cluster") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"DedupClusters.assign did not converge in $maxIterations iterations " +
          "- raise maxIterations (component diameter exceeds 2^iterations)")
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
