package graft.functions

import graft.SparkTestBase
import graft.functions.SequenceMatchAgg._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** CH sequenceMatch subset: parser, NFA matcher vs a brute-force
  * reference, SQL surface, and merge-order invariance. */
class SequenceMatchAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Exponential reference matcher: try every split point recursively. */
  private def ref(masks: Array[Int], tokens: List[Token], from: Int): Boolean =
    tokens match {
      case Nil => true
      case Cond(bit) :: rest =>
        from < masks.length && ((masks(from) >> bit) & 1) == 1 && ref(masks, rest, from + 1)
      case AnyOne :: rest => from < masks.length && ref(masks, rest, from + 1)
      case AnyGap :: rest =>
        (from to masks.length).exists(p => ref(masks, rest, p))
    }
  private def refContains(masks: Array[Int], tokens: Array[Token]): Boolean =
    (0 to masks.length).exists(s => ref(masks, tokens.toList, s))

  test("parser: tokens and rejection") {
    assert(parse("(?1).*(?2)").toSeq === Seq(Cond(0), AnyGap, Cond(1)))
    assert(parse("(?3).(?1)").toSeq === Seq(Cond(2), AnyOne, Cond(0)))
    intercept[IllegalArgumentException](parse("(?t<=3600)(?1)"))
    intercept[IllegalArgumentException](parse("(?0)"))
    intercept[IllegalArgumentException](parse(".*"))
    intercept[IllegalArgumentException](parse("(?1"))
    intercept[IllegalArgumentException](parse("abc"))
  }

  test("adjacency vs gap semantics") {
    // events: cond1, cond1, cond2  (masks 1,1,2)
    val m = Array(1, 1, 2)
    assert(matches(m, parse("(?1)(?2)")))      // adjacent pair exists (idx 1,2)
    assert(matches(m, parse("(?1).*(?2)")))
    assert(!matches(m, parse("(?2)(?1)")))     // no cond2-then-cond1
    assert(matches(m, parse("(?1).(?2)")))     // one-any between idx 0 and 2
    assert(!matches(Array(1, 2), parse("(?1).(?2)"))) // nothing between
    // multi-condition event: one event satisfying both conds is NOT two events
    assert(!matches(Array(3), parse("(?1)(?2)").toArray))
    assert(matches(Array(3), parse("(?1)").toArray))
    assert(matches(Array(3), parse("(?2)").toArray))
  }

  test("fuzz: NFA matcher equals brute-force reference") {
    val rnd = new Random(42)
    val patterns = Seq("(?1).*(?2)", "(?1)(?2)", "(?2).*(?1).*(?3)",
      "(?1).(?2)", "(?3)", "(?1).*(?1)(?2)", ".(?1).")
      .map(p => p -> parse(p))
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(10)
      val masks = Array.fill(n)(rnd.nextInt(8))
      patterns.foreach { case (p, toks) =>
        assert(matches(masks, toks) === refContains(masks, toks),
          s"pattern $p over ${masks.mkString(",")}")
      }
    }
  }

  test("merge-order invariance: partial buffers in any order agree") {
    val rnd = new Random(7)
    val toks = parse("(?1).*(?2).*(?3)")
    for (_ <- 1 to 50) {
      val events = (1 to 30).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(8)))
      val agg = SequenceMatchAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(1), "(?1).*(?2).*(?3)")
      def bufOf(es: Seq[(Long, Int)]): ArrayBuffer[Long] = {
        val b = ArrayBuffer.empty[Long]
        es.foreach { case (t, m) => b += t; b += m.toLong }
        b
      }
      val whole = agg.eval(bufOf(events))
      val shuffled = rnd.shuffle(events.grouped(7).toSeq)
      val merged = shuffled.map(bufOf).reduce((a, b) => agg.merge(a, b))
      assert(agg.eval(merged) === whole)
      // reference on the time-sorted sequence
      val sortedMasks = events.sortBy(e => (e._1, e._2)).map(_._2).toArray
      assert(whole === refContains(sortedMasks, toks))
    }
  }

  /** Reference non-overlap counter: repeatedly find the earliest-ending
    * match via brute force, restart after its end. */
  private def refCount(masks: Array[Int], tokens: Array[Token]): Int = {
    var pos = 0
    var count = 0
    var found = true
    while (found && pos <= masks.length) {
      // earliest end e >= pos such that some match lies within [pos, e)
      val ends = (pos to masks.length).find { e =>
        val window = masks.slice(pos, e)
        // a match that ENDS exactly at e: last token consumed at e-1 or
        // empty-tail gaps; approximate by: contains-match in window but
        // not in window minus last event (forces the match to need e-1)
        refContains(window, tokens) && (e == pos || !refContains(masks.slice(pos, e - 1), tokens))
      }
      ends match {
        case Some(e) if refContains(masks.slice(pos, e), tokens) =>
          count += 1
          pos = e.max(pos + 1)
        case _ => found = false
      }
    }
    count
  }

  test("count: non-overlapping chains, greedy earliest end") {
    assert(countMatches(Array(1, 2, 1, 2), parse("(?1).*(?2)")) === 2)
    assert(countMatches(Array(1, 1, 1), parse("(?1)")) === 3)
    assert(countMatches(Array(1, 0, 2, 1, 2), parse("(?1)(?2)")) === 1)
    assert(countMatches(Array(1, 2, 0, 1, 2), parse("(?1)(?2)")) === 2)
    assert(countMatches(Array.empty[Int], parse("(?1)")) === 0)
    assert(countMatches(Array(2, 2, 1), parse("(?1).*(?2)")) === 0)
  }

  test("count fuzz: agrees with brute-force earliest-end reference") {
    val rnd = new Random(99)
    val patterns = Seq("(?1)", "(?1)(?2)", "(?1).*(?2)", "(?1).(?2)")
      .map(p => p -> parse(p))
    for (_ <- 1 to 300) {
      val masks = Array.fill(rnd.nextInt(12))(rnd.nextInt(4))
      patterns.foreach { case (p, toks) =>
        assert(countMatches(masks, toks) === refCount(masks, toks),
          s"pattern $p over ${masks.mkString(",")}")
      }
    }
  }

  test("SQL surface over grouped events") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "signup"), (1L, 20L, "purchase"),     // matches
      (2L, 10L, "purchase"), (2L, 20L, "signup"),     // wrong order
      (3L, 10L, "view"), (3L, 11L, "signup")          // no purchase
    ).toDF("user_id", "tus", "event_type")
      .withColumn("mask", when($"event_type" === "signup", 1)
        .when($"event_type" === "purchase", 2).otherwise(0))
    df.createOrReplaceTempView("seq_events")
    val out = spark.sql(
      """SELECT user_id, sequence_match_agg(tus, mask, '(?1).*(?2)') AS m
         FROM seq_events GROUP BY user_id ORDER BY user_id""").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, true), (2L, false), (3L, false)))
  }

  test("time edges: parse validation") {
    assert(parse("(?1)(?t<=3600)(?2)").toSeq ===
      Seq(Cond(0), TimeEdge("<=", 3600L), Cond(1)))
    assert(parse("(?1)(?t>10).(?t<5)(?2)").toSeq ===
      Seq(Cond(0), TimeEdge(">", 10L), AnyOne, TimeEdge("<", 5L), Cond(1)))
    // an edge needs a CONSUMING token directly on each side
    intercept[IllegalArgumentException](parse("(?t<=1)(?1)"))      // nothing before
    intercept[IllegalArgumentException](parse("(?1)(?t<=1)"))      // nothing after
    intercept[IllegalArgumentException](parse("(?1).*(?t<=1)(?2)")) // gap before
    intercept[IllegalArgumentException](parse("(?1)(?t<=1).*(?2)")) // gap after
    intercept[IllegalArgumentException](parse("(?1)(?t~5)(?2)"))   // bad operator
    intercept[IllegalArgumentException](parse("(?1)(?t<=x)(?2)"))  // bad value
    intercept[IllegalArgumentException](parse("(?1)(?t<=-5)(?2)")) // negative
  }

  test("time edges: constraint between consecutive events, all operators") {
    val masks = Array(1, 2)
    def m(pat: String, tss: Array[Long]): Boolean = matches(masks, parse(pat), tss)
    // delta = 100
    val tss = Array(0L, 100L)
    assert(m("(?1)(?t<=100)(?2)", tss) && !m("(?1)(?t<100)(?2)", tss))
    assert(m("(?1)(?t>=100)(?2)", tss) && !m("(?1)(?t>100)(?2)", tss))
    assert(m("(?1)(?t==100)(?2)", tss) && !m("(?1)(?t!=100)(?2)", tss))
    assert(m("(?1)(?t<=99)(?2)", Array(0L, 99L)) && !m("(?1)(?t<=99)(?2)", tss))
    // the constraint binds CONSECUTIVE events: cond1 at t=0, fodder at
    // t=1000, cond2 at t=1001 — '(?1)(?2)' fails on adjacency anyway;
    // '(?1).(?2)' with an edge on the final step sees delta 1, not 1001
    val masks3 = Array(1, 0, 2)
    assert(matches(masks3, parse("(?1).(?t<=1)(?2)"), Array(0L, 1000L, 1001L)))
    assert(!matches(masks3, parse("(?1).(?t>1)(?2)"), Array(0L, 1000L, 1001L)))
    assert(matches(masks3, parse("(?1)(?t<=2000).(?2)"), Array(0L, 1000L, 1001L)))
    // count: only pairs within the window are counted
    val cm = Array(1, 2, 1, 2)
    assert(countMatches(cm, parse("(?1)(?t<=10)(?2)"), Array(0L, 5L, 100L, 200L)) === 1)
    assert(countMatches(cm, parse("(?1)(?t<=10)(?2)"), Array(0L, 5L, 100L, 105L)) === 2)
  }

  /** Time-aware exponential reference (same consecutive-delta
    * semantics as the compiled steps — edges never cross gaps). */
  private def refT(tss: Array[Long], masks: Array[Int],
      steps: List[(Token, Option[TimeEdge])], from: Int): Boolean =
    steps match {
      case Nil => true
      case (Cond(bit), e) :: rest =>
        from < masks.length && ((masks(from) >> bit) & 1) == 1 &&
          e.forall(ed => from >= 1 && edgeOk(ed, tss(from) - tss(from - 1))) &&
          refT(tss, masks, rest, from + 1)
      case (AnyOne, e) :: rest =>
        from < masks.length &&
          e.forall(ed => from >= 1 && edgeOk(ed, tss(from) - tss(from - 1))) &&
          refT(tss, masks, rest, from + 1)
      case (AnyGap, _) :: rest =>
        (from to masks.length).exists(p => refT(tss, masks, rest, p))
      case _ => false
    }

  test("time-edge fuzz: NFA matcher equals time-aware brute force") {
    val rnd = new Random(1234)
    val patterns = Seq(
      "(?1)(?t<=50)(?2)", "(?1)(?t>50)(?2)", "(?1).*(?2)(?t<100)(?3)",
      "(?1)(?t>=30).(?t<30)(?2)", "(?2)(?t!=40)(?1)", ".(?t<=60)(?1)")
      .map(p => p -> parse(p))
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(10)
      val masks = Array.fill(n)(rnd.nextInt(8))
      // non-decreasing timestamps with deltas straddling the thresholds
      val tss = masks.scanLeft(0L)((t, _) => t + rnd.nextInt(80)).drop(1)
      patterns.foreach { case (p, toks) =>
        val steps = compile(toks).toList
        assert(matches(masks, toks, tss) ===
          (0 to masks.length).exists(s => refT(tss, masks, steps, s)),
          s"pattern $p masks=${masks.mkString(",")} tss=${tss.mkString(",")}")
      }
    }
  }

  /** Time-aware earliest-end reference counter (mirrors refCount with
    * refT as the containment probe). */
  private def refCountT(tss: Array[Long], masks: Array[Int],
      tokens: Array[Token]): Int = {
    val steps = compile(tokens).toList
    def containsT(from: Int, until: Int): Boolean =
      (from to until).exists(s => refT(tss.slice(from, until), masks.slice(from, until), steps, s - from))
    var pos = 0
    var count = 0
    var found = true
    while (found && pos <= masks.length) {
      val ends = (pos to masks.length).find { e =>
        containsT(pos, e) && (e == pos || !containsT(pos, e - 1))
      }
      ends match {
        case Some(e) if containsT(pos, e) =>
          count += 1
          pos = e.max(pos + 1)
        case _ => found = false
      }
    }
    count
  }

  test("count time-edge fuzz: agrees with time-aware earliest-end reference") {
    // slicing in containsT is sound: parse guarantees the FIRST token
    // of any pattern is unconstrained, so an edge-guarded token always
    // consumes at slice position >= 1 and its delta pairs two events
    // both inside the window — identical to the full-array delta
    // (slicing preserves adjacency)
    val rnd = new Random(4242)
    val patterns = Seq("(?1)(?t<=50)(?2)", "(?1)(?t>40)(?2)", "(?1)(?t!=30)(?1)")
      .map(p => p -> parse(p))
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(12)
      val masks = Array.fill(n)(rnd.nextInt(4))
      val tss = masks.scanLeft(0L)((t, _) => t + rnd.nextInt(60)).drop(1)
      patterns.foreach { case (p, toks) =>
        assert(countMatches(masks, toks, tss) === refCountT(tss, masks, toks),
          s"pattern $p masks=${masks.mkString(",")} tss=${tss.mkString(",")}")
      }
    }
  }

  test("time edges: SQL surface") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, "signup"), (1L, 100L, "purchase"),   // within 200
      (2L, 0L, "signup"), (2L, 500L, "purchase"),   // beyond 200
      (3L, 0L, "signup"), (3L, 100L, "view"), (3L, 150L, "purchase") // not adjacent
    ).toDF("user_id", "tus", "event_type")
      .withColumn("mask", when($"event_type" === "signup", 1)
        .when($"event_type" === "purchase", 2).otherwise(0))
    df.createOrReplaceTempView("seq_events_t")
    val out = spark.sql(
      """SELECT user_id,
                sequence_match_agg(tus, mask, '(?1)(?t<=200)(?2)') AS w
         FROM seq_events_t GROUP BY user_id ORDER BY user_id""").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, true), (2L, false), (3L, false)))
  }
}
