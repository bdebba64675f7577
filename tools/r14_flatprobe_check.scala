// Round-14: verify the expression-based flat probe (knnCellsAndProbes)
// is output-identical to the old window form and count-identical on the
// wl instrument, and time the scale_knn shapes.
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min
val keyShift = 100000000L
def embAt(copies: Int) = {
  val e = spark.read.parquet(s"$sf/embeddings.parquet")
  (0 until copies).map { i =>
    val emb = if (i == 0) col("embedding")
      else concat(slice(col("embedding"), i + 1, 64 - i),
        slice(col("embedding"), 1, i))
    e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"),
      emb.as("embedding"))
  }.reduce(_ unionByName _)
}
import graft.operators.Similarity
val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
val corpus10 = embAt(10).select(col("vec_id"), col("embedding"))

// wl counts must be byte-identical to the recorded values
val c1 = Similarity.knnGraphCandidates(embAt(1).select(col("vec_id"), col("embedding")),
  nlist = 16, nprobe = 4, trainFraction = 0.5).count()
val c10 = Similarity.knnGraphCandidates(corpus10, nlist = 160, nprobe = 4,
  trainFraction = 0.5).count()
println(s"WLCOUNT knn 1x=$c1 (expect 997301) 10x=$c10 (expect 10004209)")

// exact-gate graph result vs brute force (the oracle argument)
val g = Similarity.knnGraph(emb1, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5)
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
val bf = Similarity.bruteForceTopK(emb1, emb1, 3)
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
println(s"EXACT-GATE identity vs brute force: ${g == bf} (${g.size} rows)")

// timings
force(Similarity.knnGraph(corpus10, k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5))
val t10 = minOf(3)(force(Similarity.knnGraph(corpus10, k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5)))
val t1 = minOf(3)(force(Similarity.knnGraph(embAt(1).select(col("vec_id"), col("embedding")), k = 3, nlist = 16, nprobe = 4, trainFraction = 0.5)))
val tg = minOf(3)(force(Similarity.knnGraph(emb1, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5)))
println(f"TIME scale_knn_10x=$t10%.2f scale_knn_1x=$t1%.2f q_knn_graph=$tg%.2f")
System.exit(0)
