package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bloom-filter pre-filtered joins — the explicit form of the runtime
 * row-level filtering Spark's `InjectRuntimeFilter` applies
 * opportunistically, offered as an operator so a pipeline can demand
 * it (the optimizer rule only fires under creation-cost heuristics
 * and config gates that a library caller doesn't control).
 *
 * Scale story (the reason this exists at 100 TB): in a fact⋈dim join
 * where the dim side is selective, the shuffle of the fact side is
 * the dominant cost — every fact row crosses the wire only to be
 * discarded by the join. A bloom built on the dim keys and evaluated
 * AT THE FACT SCAN drops non-joining rows before they are ever
 * shuffled (or even row-assembled: the predicate sits behind the
 * columnar scan), at the price of one tiny aggregate over the dim
 * side plus a ~1 MB sketch on the driver — the same driver hop every
 * broadcast/DPP filter takes. False positives cost nothing
 * semantically: the exact join still runs and removes them, so the
 * result is EXACTLY the plain join's (which is what makes the
 * operator SQL-oracle-able against the bloom-free formulation).
 *
 * Build is fully distributed: `bloom_filter_agg` is Spark's own
 * mergeable `TypedImperativeAggregate` (partial sketches merge
 * map-side), registered by [[graft.GraftExtensions]]; only the final
 * merged sketch is collected. The probe `bloom_might_contain` is the
 * engine's codegen'd predicate over a literal sketch — no UDF, stays
 * inside whole-stage codegen.
 */
object BloomJoin {

  /**
   * Rows of `fact` whose `factKey` appears in `dim`'s `dimKey` —
   * exactly `fact LEFT SEMI JOIN dim`, with a bloom pre-filter at the
   * fact scan. `numBits` sizes the sketch: ~10 bits/key gives ~1%
   * false positives (fp cost = wasted shuffle rows, never wrong
   * results).
   */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val sketch = dim.agg(call_function("bloom_filter_agg",
        xxhash64(col(dimKey)), lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val keys = dim.select(col(dimKey)).distinct()
    // null sketch = empty dim side → the semi join is empty anyway;
    // skip the bloom instead of probing a null literal
    val pre =
      if (sketch == null) fact
      else fact.filter(call_function("bloom_might_contain",
        lit(sketch), xxhash64(col(factKey))))
    // no broadcast hint: the operator can't see dim's size — AQE picks
    // broadcast for a small key set and a (pre-filtered, much smaller)
    // shuffle otherwise, which is exactly the desired behavior at both
    // the gate SF and 100 TB
    pre.join(keys, pre(factKey) === keys(dimKey), "left_semi")
  }
}
