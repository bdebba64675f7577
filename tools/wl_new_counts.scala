// Round-12 (verdict item 3): empirical probe of the FIVE new
// workload-count instruments (bm25, semdedup, knn, knn_hier, ivfpq)
// before wiring them into the Bench count gate -- verifies (a) each 1x
// count is nonzero (the gate's collapse check needs known-nonzero
// baselines), (b) the 10x/1x ratio sits where the family's regime
// predicts (bm25/ivfpq ~1 fixed-query serving; semdedup exactly 10;
// knn/knn_hier ~10 with cell-balance wiggle), and (c) counts are
// DETERMINISTIC run to run (two reads each).
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val keyShift = 100000000L
def docsAt(copies: Int) = {
  val d = spark.read.parquet(s"$sf/documents.parquet")
  val alpha = "abcdefghij"
  (0 until copies).map { i =>
    val mapped = if (i == 0) col("text")
      else translate(col("text"), alpha, alpha.drop(i) + alpha.take(i))
    d.select((col("doc_id") + lit(i * keyShift)).as("doc_id"), mapped.as("text"))
  }.reduce(_ unionByName _)
}
def embAt(copies: Int) = {
  val e = spark.read.parquet(s"$sf/embeddings.parquet")
  (0 until copies).map { i =>
    val emb = if (i == 0) col("embedding")
      else concat(slice(col("embedding"), i + 1, 64 - i),
        slice(col("embedding"), 1, i))
    e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"),
      concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
      emb.as("embedding"))
  }.reduce(_ unionByName _)
}
def probe(fam: String)(mk: Int => Long): Unit = {
  val a1 = mk(1); val b1 = mk(1)
  val a10 = mk(10); val b10 = mk(10)
  println(f"WLPROBE $fam 1x=$a1 (rerun $b1, det=${a1 == b1}) 10x=$a10 (rerun $b10, det=${a10 == b10}) ratio=${a10.toDouble / a1}%.2f")
}
probe("bm25") { c =>
  graft.operators.TextPipeline.bm25Candidates(
    docsAt(c), "doc_id", "text", Seq("dup", "merge", "window")).count()
}
probe("semdedup") { c =>
  // rank-join candidate pairs, NOT drops: the natural corpus has zero
  // >= eps pairs (BENCH_NOTES round 9 injects duplicates for the drop
  // cert), so drops would read 0 and trip the collapse gate
  graft.operators.Dedup.semDeDupCandidates(
    embAt(c), "vec_id", "embedding", "cluster").count()
}
probe("knn") { c =>
  graft.operators.Similarity.knnGraphCandidates(
    embAt(c).select(col("vec_id"), col("embedding")),
    nlist = 16 * c, nprobe = 4, trainFraction = 0.5).count()
}
probe("knn_hier") { c =>
  graft.operators.Similarity.knnGraphHierCandidates(
    embAt(c).select(col("vec_id"), col("embedding")),
    nlist = 16 * c, nprobe = 4, superProbe = 2,
    trainCap = math.max(100000, 16 * c)).count()
}
probe("ivfpq") { c =>
  graft.operators.Similarity.ivfPqCandidates(
    embAt(c).select(col("vec_id"), col("embedding")),
    embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
    nlist = 16 * c, nprobe = 4, trainFraction = 0.5, hierRouting = true).count()
}
System.exit(0)
