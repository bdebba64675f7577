package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed fuzzy (edit-distance) join via symmetric-delete
 * blocking — the SymSpell construction re-expressed relationally.
 *
 * A naive `levenshtein(a, b) <= 1` join is a cross product (no equi
 * key), O(|L|·|R|) distance computations. The symmetric-delete
 * neighborhood fixes that with PROVABLE recall: if lev(a, b) <= 1
 * then del0/1(a) ∩ del0/1(b) ≠ ∅, where del0/1(s) = {s} ∪ {s with
 * one character deleted} — equality shares s itself; an
 * insertion/deletion pair shares the shorter string; a substitution
 * pair shares the string with the differing position deleted. So an
 * equi-join on exploded neighborhood variants generates every true
 * pair (candidates are a superset — e.g. transpositions collide too —
 * which the exact `levenshtein` verify then filters).
 *
 * Scale shape: each side explodes to length+1 thin (variant, value)
 * rows, one hash shuffle on the variant string, distinct-collapse of
 * multi-variant collisions, then the exact verify on candidate pairs
 * only. No cross join at any size (plan-guarded in FuzzyJoinSpec).
 */
object FuzzyJoin {

  /** {s} ∪ all single-character deletions of s, distinct. */
  private def variantsExpr(c: String): String =
    s"""array_distinct(concat(array($c),
        transform(sequence(1, length($c)),
                  i -> concat(substr($c, 1, i - 1), substr($c, i + 1)))))"""

  /**
   * All (l_val, r_val, dist) pairs with levenshtein distance <= 1
   * between the DISTINCT values of `left(lCol)` and `right(rCol)`.
   * Empty strings are excluded (their variant sequence would be
   * degenerate; an empty probe matches only 1-char strings — callers
   * wanting that edge can prepend it explicitly).
   */
  def editDistance1(left: DataFrame, lCol: String,
      right: DataFrame, rCol: String): DataFrame = {
    def side(df: DataFrame, c: String, out: String) = df
      .select(col(c).cast("string").as(out)).filter(length(col(out)) > 0)
      .distinct()
      .select(col(out), explode(expr(variantsExpr(out))).as("variant"))
    side(left, lCol, "l_val").join(side(right, rCol, "r_val"), "variant")
      .select("l_val", "r_val").distinct()
      .withColumn("dist", levenshtein(col("l_val"), col("r_val")))
      .filter(col("dist") <= 1)
  }
}
