package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("symmetric-delete join == brute-force levenshtein<=1 (seeded fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def word() = (1 to (3 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val ls = (1 to 120).map(_ => word()).distinct
    val rs = (1 to 120).map(_ => word()).distinct
    val got = FuzzyJoin.editDistance1(ls.toDF("w"), "w", rs.toDF("w"), "w")
      .select("l_val", "r_val").as[(String, String)].collect().toSet
    val want = (for (a <- ls; b <- rs if lev(a, b) <= 1) yield (a, b)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fuzz corpus produced no near pairs — weaken the alphabet")
  }

  test("distances are exact and bounded; equality pairs report 0") {
    import spark.implicits._
    val out = FuzzyJoin.editDistance1(
      Seq("abc", "abd", "xyz").toDF("w"), "w",
      Seq("abc", "abcd", "zzzz").toDF("w"), "w")
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(("abc", "abc", 0), ("abc", "abcd", 1),
      ("abd", "abc", 1), ("abd", "abcd", 1)))
  }

  test("plan has no cross join or nested loop (scale guard)") {
    import spark.implicits._
    val plan = FuzzyJoin.editDistance1(
      (1 to 50).map(i => s"w$i").toDF("w"), "w",
      (1 to 50).map(i => s"v$i").toDF("w"), "w")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
