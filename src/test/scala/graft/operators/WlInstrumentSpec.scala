package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The round-12 workload-count instruments (Bench's `wl` gate families
 * bm25 / semdedup / knn / knn_hier / ivfpq): each exposes the EXACT
 * candidate cardinality its measured pipeline processes, so the scale
 * gate can certify linearity from deterministic counts instead of
 * storm-prone wall clock. These specs pin the three properties the
 * gate relies on: (1) the count is deterministic run to run, (2) at
 * the exact gate the candidate set has a provable closed-form size
 * (every ordered pair exactly once), and (3) the candidate set is a
 * superset of what the pipeline returns — the instrument cannot
 * undercount the plan it certifies.
 */
class WlInstrumentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def docs = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
  private def emb = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private val terms = Seq("dup", "merge", "window")

  test("bm25Candidates: only query-term postings, deterministic, nonzero") {
    val cand = TextPipeline.bm25Candidates(docs, "doc_id", "text", terms)
    val n1 = cand.count()
    val n2 = TextPipeline.bm25Candidates(docs, "doc_id", "text", terms).count()
    assert(n1 === n2)
    assert(n1 > 0, "sf fixture documents contain the query terms")
    val badTerms = cand.filter(!col("term").isin(terms: _*)).count()
    assert(badTerms === 0)
  }

  test("bm25Candidates doc set covers bm25TopK's results (no undercount)") {
    val topDocs = TextPipeline.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val candDocs = TextPipeline.bm25Candidates(docs, "doc_id", "text", terms)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(topDocs.nonEmpty && topDocs.subsetOf(candDocs))
  }

  test("knnGraphCandidates: exact gate scores every ordered pair once") {
    val corpus = emb.filter(col("vec_id") < 40)
    val n = corpus.count()
    // nprobe = nlist probes every cell; each vector lives in exactly
    // one cell => each ordered (q, v != q) pair appears exactly once
    val c = Similarity.knnGraphCandidates(corpus, nlist = 4, nprobe = 4)
    assert(c.count() === n * (n - 1))
    // and exactly once, not just in total: no duplicate pairs
    assert(c.distinct().count() === n * (n - 1))
  }

  test("knnGraphCandidates: approximate regime is a superset of the graph and deterministic") {
    val corpus = emb.filter(col("vec_id") < 60)
    val mk = () => Similarity.knnGraphCandidates(corpus, nlist = 8, nprobe = 2,
      trainFraction = 1.0)
    assert(mk().count() === mk().count())
    val graph = Similarity.knnGraph(corpus, k = 3, nlist = 8, nprobe = 2,
      trainFraction = 1.0)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = mk().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(graph.nonEmpty && graph.subsetOf(cand))
  }

  test("knnGraphHierCandidates: exact gate scores every ordered pair once") {
    val corpus = emb.filter(col("vec_id") < 40)
    val n = corpus.count()
    // superProbe = nlist covers every super (k1 <= nlist); nprobe =
    // nlist keeps every leaf => all cells probed
    val c = Similarity.knnGraphHierCandidates(corpus, nlist = 4, nprobe = 4,
      superProbe = 4, trainCap = 100000)
    assert(c.count() === n * (n - 1))
  }

  test("ivfPqCandidates: exact gate pairs every query with all other vectors") {
    val corpus = emb.filter(col("vec_id") < 40)
    val queries = corpus.filter(col("vec_id") < 5)
    val n = corpus.count()
    val nq = queries.count()
    val c = Similarity.ivfPqCandidates(corpus, queries, nlist = 4, nprobe = 4)
    assert(c.count() === nq * (n - 1))
  }

  test("ivfPqCandidates covers ivfPqTopK's results (shared pipeline, hier regime)") {
    val corpus = emb.filter(col("vec_id") < 60)
    val queries = corpus.filter(col("vec_id") < 5)
    val top = Similarity.ivfPqTopK(corpus, queries, k = 3, nlist = 8, nprobe = 2,
      m = 4, codebook = null, lossless = false, hierRouting = true)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Similarity.ivfPqCandidates(corpus, queries, nlist = 8, nprobe = 2,
      hierRouting = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top.nonEmpty && top.subsetOf(cand))
    // deterministic across runs (hash-ranked train sample, seeded Lloyd)
    assert(cand.size === Similarity.ivfPqCandidates(corpus, queries,
      nlist = 8, nprobe = 2, hierRouting = true).count())
  }

  test("semDeDupCandidates: exactly sum c*(c-1)/2 over cluster sizes, deterministic") {
    val clustered = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label").cast("string").as("cluster"))
    val expected = clustered.groupBy("cluster").count()
      .agg(sum(expr("count * (count - 1) / 2"))).collect()(0).getDouble(0).toLong
    val c1 = Dedup.semDeDupCandidates(clustered, "vec_id", "embedding", "cluster").count()
    val c2 = Dedup.semDeDupCandidates(clustered, "vec_id", "embedding", "cluster").count()
    assert(c1 === c2)
    assert(c1 === expected, "rank join admits each within-cluster unordered pair once")
    assert(c1 > 0)
  }

  test("candidate instruments carry no cartesian / broadcast-nested-loop node") {
    // the candidate functions are not registry keys, so PlanLintSpec's
    // repo-wide guard doesn't see them — but Bench executes them at 1x
    // AND 10x every sweep, so an accidental all-pairs join here is a
    // real scale hazard, not just a test artifact
    val clustered = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label").cast("string").as("cluster"))
    val corpus = emb
    // "knn" (the flat form) is allowed one BroadcastNestedLoopJoin:
    // probeCells crossJoins the nlist-row centroid routing table — the
    // same bounded broadcast PlanLintSpec allowlists for q_knn_graph
    // ("centroid table bounded by nlist")
    val plans = Seq(
      ("bm25", TextPipeline.bm25Candidates(docs, "doc_id", "text", terms), false),
      ("semdedup", Dedup.semDeDupCandidates(clustered, "vec_id", "embedding", "cluster"), false),
      ("knn", Similarity.knnGraphCandidates(corpus, nlist = 8, nprobe = 2), true),
      ("knn_hier", Similarity.knnGraphHierCandidates(corpus, nlist = 8, nprobe = 2,
        superProbe = 2), false),
      ("ivfpq", Similarity.ivfPqCandidates(corpus,
        corpus.filter(col("vec_id") < 5), nlist = 8, nprobe = 2, hierRouting = true), false))
    SparkTestBase.withAqeDisabled {
      plans.foreach { case (tag, df, allowBoundedBnlj) =>
        val s = df.queryExecution.executedPlan.toString
        assert(!s.contains("CartesianProduct"),
          s"candidate instrument '$tag' plans a cartesian product")
        if (!allowBoundedBnlj)
          assert(!s.contains("BroadcastNestedLoopJoin"),
            s"candidate instrument '$tag' plans an all-pairs join")
      }
    }
  }

  test("semDeDupCandidates covers semDeDup's dropped ids (no undercount)") {
    // at eps = 0 every candidate pair verifies, so every id with an
    // earlier-ranked cluster-mate must be dropped — the candidate set
    // and the drop set are tied exactly
    val clustered = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label").cast("string").as("cluster"))
      .filter(col("vec_id") < 60)
    val droppedIds = Dedup.semDeDup(clustered, "vec_id", "embedding", "cluster",
      eps = 1e-9).filter(!col("kept")).select("id")
      .collect().map(_.getLong(0)).toSet
    val candIdA = Dedup.semDeDupCandidates(clustered, "vec_id", "embedding", "cluster")
      .select("id_a").distinct().collect().map(_.getLong(0)).toSet
    // eps ~ 0 still requires cosine >= eps, which holds for the
    // non-negative-similarity fixture clusters; drop set == rank-loser set
    assert(droppedIds.subsetOf(candIdA))
    assert(candIdA.nonEmpty)
  }

  test("bpePairCount equals brute-force distinct adjacent pairs and is deterministic") {
    import spark.implicits._
    // round-13 wl family `bpe`: the pass-1 aggregate's GROUP count —
    // brute force straight from the tokenizer contract (lower, split
    // on non-alphanumeric runs, distinct WORDS, adjacent char pairs)
    val texts = Seq(
      (1L, "Spark splits Words; spark splits again!"),
      (2L, "aaab aab 99x"),
      (3L, "  -- punctuation only --  "),
      (4L, "mixedCASE mixedcase"))
    val df = texts.toDF("doc_id", "text")
    val words = texts.flatMap(_._2.toLowerCase.split("[^a-z0-9]+")).filter(_.nonEmpty).distinct
    val truth = words.flatMap(w => w.sliding(2).filter(_.length == 2)
      .map(p => (p.substring(0, 1), p.substring(1)))).distinct.size
    val got = TextPipeline.bpePairCount(df, "text")
    assert(got === truth.toLong)
    assert(got === TextPipeline.bpePairCount(df, "text"))
    // and on the bench fixture: nonzero (the wl dead-zone gate's
    // known-nonzero premise for this family)
    assert(TextPipeline.bpePairCount(docs, "text") > 0L)
  }
}
