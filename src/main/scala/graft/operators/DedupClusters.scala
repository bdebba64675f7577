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
  def assign(pairs: DataFrame, maxIterations: Int = 15): DataFrame =
    assignWithRounds(pairs, maxIterations)._1

  /**
   * [[assign]] plus the number of label-propagation rounds it took to
   * converge (including the round that observes the fixpoint). The
   * round count is the scale certification's instrument: components
   * that are DISJOINT COPIES of a base corpus have the same diameters
   * as the base, so rounds at C× data must EQUAL rounds at 1× — per-
   * round cost is two shuffle joins over the edge set (linear in
   * edges), making total wall ∝ edges × rounds. A growing round count
   * at fixed diameter would flag a convergence-detection bug long
   * before wall time does (see tools/scale100.scala `cc`).
   */
  def assignWithRounds(pairs: DataFrame, maxIterations: Int = 15): (DataFrame, Int) = {
    // undirected edges, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()

    // Convergence signal: labels are node ids and every step is
    // non-increasing per node (min with neighbours includes self;
    // pointer jump maps cluster(id) → cluster(cluster(id)) ≤
    // cluster(id)), so sum(cluster) is strictly decreasing until the
    // fixpoint and stable exactly at it — one aggregate per round
    // instead of a separate join-with-old-labels job. The same action
    // materializes the (lazy) localCheckpoint, so each round runs ONE
    // job; lineage truncation stays load-bearing (see scaladoc).
    // decimal sum: id sums can exceed Long range on 64-bit id spaces,
    // and a wrapped sum could (astronomically rarely) alias two states
    def labelSumOf(df: DataFrame): BigDecimal = {
      val v = df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().get(0)
      if (v == null) BigDecimal(0) else BigDecimal(v.asInstanceOf[java.math.BigDecimal])
    }
    def jump(stepped: DataFrame): DataFrame = {
      // pointer jump: follow one indirection, label := label(label)
      val lookup = stepped.select(col("id").as("l_id"), col("cluster").as("l_cluster"))
      stepped.join(lookup, col("cluster") === col("l_id"), "left")
        .select(col("id"), coalesce(col("l_cluster"), col("cluster")).as("cluster"))
        .localCheckpoint(eager = false) // truncated on first action below
    }
    if (maxIterations < 1)
      throw new IllegalStateException(
        s"DedupClusters.assign did not converge in $maxIterations iterations " +
          "- raise maxIterations (component diameter exceeds 2^iterations)")
    // Round 1 FUSED (r14 optimization): with labels == id, the
    // neighbour-min join against the initial label table is an
    // identity — min(dst_cluster) == min(dst) — so round 1 is ONE
    // aggregate over the edge set. This removes the init label table
    // entirely (its distinct shuffle, its localCheckpoint job, and its
    // labelSum action) plus round 1's edges⋈labels shuffle join; the
    // label sequence is bit-identical (same min/least arithmetic), so
    // the per-round sums — and therefore the round COUNT the scale
    // certification pins — are unchanged. The initial sum(id) needed
    // for round 1's convergence check rides the same aggregate job as
    // round 1's label sum (sum over the identical node set: every node
    // of a symmetric edge table appears as src).
    val stepped1 = edges.groupBy(col("src")).agg(min(col("dst")).as("nc"))
      .select(col("src").as("id"), least(col("src"), col("nc")).as("cluster"))
    var labels = jump(stepped1)
    val firstSums = labels.agg(
      sum(col("cluster").cast("decimal(38,0)")),
      sum(col("id").cast("decimal(38,0)"))).head()
    def dec(v: Any): BigDecimal =
      if (v == null) BigDecimal(0) else BigDecimal(v.asInstanceOf[java.math.BigDecimal])
    var labelSum = dec(firstSums.get(0))
    var converged = labelSum == dec(firstSums.get(1))
    var i = 1
    while (!converged && i < maxIterations) {
      // (1) each node adopts min(own label, neighbours' labels)
      val neighbourMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "dst_cluster"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_cluster")).as("n_cluster"))
      val stepped = labels.join(neighbourMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_cluster"), col("cluster"))).as("cluster"))
      // (2) pointer jump + lazy checkpoint, materialized by the sum
      val next = jump(stepped)
      val nextSum = labelSumOf(next)
      labels = next
      converged = nextSum == labelSum
      labelSum = nextSum
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"DedupClusters.assign did not converge in $maxIterations iterations " +
          "- raise maxIterations (component diameter exceeds 2^iterations)")
    (labels, i)
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

  /**
   * Materialize the dedup decision: the corpus with every
   * non-representative cluster member removed — what a curation
   * pipeline actually writes out. The decision travels as a thin
   * (id) semi-join probe (only SURVIVOR ids, each a single long), so
   * the corpus rows stream through unshuffled on the probe side and
   * no text ever rides the decision machinery.
   *
   * @return the input rows whose `idCol` survives dedup, unchanged
   */
  def applyKeepList(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val kept = keepList(corpus.select(col(idCol)), idCol, pairs)
      .filter(col("keep")).select(col("id"))
    corpus.join(kept, corpus(idCol) === kept("id"), "left_semi")
  }
}
