package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-skew mitigation for shuffles (the brief's "salting for skew").
 *
 * AQE's skew-join split handles sort-merge joins at runtime; explicit
 * salting is the tool for the cases AQE can't rewrite — shuffled-hash
 * joins against a replicable right side, and grouped aggregations
 * whose per-key state is itself large. Both helpers keep results
 * bit-identical to the unsalted plan.
 */
object Skew {

  /**
   * Equi-join where `left` is heavily skewed on `key`: left rows get a
   * random salt in [0, salts), the (small) right side is replicated
   * once per salt value, and the join key becomes (key, salt) — a hot
   * key now spreads over `salts` partitions instead of one straggler.
   * Right side is replicated `salts`× — size it accordingly.
   */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // right/full outer would emit every unmatched right row once PER
    // REPLICA (salts× duplicates) — only shapes where the replicated
    // side never produces unmatched output rows are allowed
    require(Set("inner", "left", "leftouter", "cross")(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin supports inner/left joins only (got '$joinType'): " +
        "right/full outer would duplicate unmatched right rows per salt replica")
    val saltedLeft = left.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(salts))).cast("int"))
    val saltedRight = right.crossJoin(
      broadcast(spark_range_df(right, salts)))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) && col("__salt") === col("__salt_r"),
        joinType)
      .drop("__salt", "__salt_r")
      .drop(saltedRight(key))
  }

  private def spark_range_df(ref: DataFrame, salts: Int): DataFrame =
    ref.sparkSession.range(salts.toLong).select(col("id").cast("int").as("__salt_r"))

  /**
   * Two-phase aggregation for skewed group keys: partial aggregate on
   * (key, salt), then final aggregate on key. Spark's hash aggregate
   * already does map-side partials, so this only pays off when the
   * per-key partial state is big (collect-style or sketch buffers) —
   * e.g. a MinHash sketch per very-hot key.
   *
   * @param partials (aliased partial agg columns, matching final agg
   *                 over the partial results)
   */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(finals.head, finals.tail: _*)
  }
}
