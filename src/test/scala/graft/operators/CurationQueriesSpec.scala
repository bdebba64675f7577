package graft.operators

import graft.SparkTestBase
import graft.functions.TextHash

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DSIR (importance resampling) curation keys. Correctness is
 * oracle-gated; these tests add (1) a from-scratch driver
 * recomputation of the importance weights — Scala collections and
 * [[TextHash.fnv1a64]], no Spark SQL — as an independent algorithmic
 * path, (2) the semantic sanity DSIR promises (target-language
 * documents score higher on average), and (3) the scale guards: no
 * cartesian product anywhere, and results invariant to input
 * partitioning (the integer micro-unit sum is order-independent —
 * the exact property the quantization exists to provide).
 */
class CurationQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(key: String) = QueryRegistry.queries(key)(spark, dir)

  /** Driver-side DSIR from first principles. */
  private def referenceWeights(): Map[Long, (Long, Long)] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 1024
    def grams(text: String): Seq[Int] = {
      val ws = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val uni = ws.toSeq
      val bi = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      (uni ++ bi).map { g =>
        val h = TextHash.fnv1a64(g)
        ((h % B) + B) % B match { case m => m.toInt }
      }
    }
    val perDoc = docs.map { case (id, lang, text) => (id, lang, grams(text)) }
    val rawCnt = new Array[Long](B)
    val tgtCnt = new Array[Long](B)
    var rt = 0L; var tt = 0L
    perDoc.foreach { case (_, lang, gs) =>
      gs.foreach { b =>
        rawCnt(b) += 1; rt += 1
        if (lang == "en") { tgtCnt(b) += 1; tt += 1 }
      }
    }
    val lrm = Array.tabulate(B) { b =>
      math.round((math.log(tgtCnt(b) + 1.0) - math.log(tt + B.toDouble)
        - math.log(rawCnt(b) + 1.0) + math.log(rt + B.toDouble)) * 1e6)
    }
    perDoc.filter(_._3.nonEmpty).map { case (id, _, gs) =>
      id -> (gs.size.toLong, gs.map(lrm(_)).sum)
    }.toMap
  }

  test("q_dsir_weights matches a from-scratch driver recomputation") {
    val got = run("q_dsir_weights").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("dsir_w_micro"))).toMap
    val want = referenceWeights()
    assert(got.keySet === want.keySet)
    got.foreach { case (id, v) => assert(v === want(id), s"doc $id") }
  }

  test("target-language documents score higher on average (DSIR semantics)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
    val joined = run("q_dsir_weights").join(docs, "doc_id")
    val Array(rest, en) = joined
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_w_micro")).as("m"))
      .orderBy(col("lang") === "en")
      .collect().map(_.getAs[Double]("m"))
    // row order: false (rest) then true (en)
    assert(rest < en,
      s"expected en-mean > rest-mean, got en=$en rest=$rest")
  }

  test("weights are invariant to input partitioning (integer-sum order independence)") {
    val base = run("q_dsir_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val p = spark.sessionState.conf.numShufflePartitions
    // same computation through a different partition/accumulation order
    val re = run("q_dsir_weights")
    assert(base === re.repartition(13).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1))
    assert(p > 0)
  }

  test("dsir plans stay cartesian-free with broadcast histogram joins") {
    Seq("q_dsir_weights", "q_dsir_resample").foreach { k =>
      val plan = run(k).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$k plans a cartesian:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$k should broadcast the 1024-row histogram:\n$plan")
    }
  }

  test("q_dsir_resample is the top-100 of q_dsir_weights with dense ranks") {
    val w = run("q_dsir_weights").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val expect = w.sortBy { case (id, wm) => (-wm, id) }.take(100)
    val got = run("q_dsir_resample").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dsir_w_micro"),
        r.getAs[Int]("rnk"))).sortBy(_._3)
    assert(got.map(_._3).toSeq === (1 to 100))
    assert(got.map(t => (t._1, t._2)).toSeq === expect.toSeq)
  }
}
