// Round-14: decompose scale_knn_10x (flat kNN graph, nlist=160,
// nprobe=4) into fit / cells / probe-ranking / full.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  call_function("vec_dot", a, b)
val corpus = embAt(10)
// warm
force(Similarity.knnGraph(corpus, k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5))

val tFit = minOf(2) {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector
  val withVec = corpus.select(col("vec_id"), col("embedding"))
    .withColumn("features", array_to_vector(col("embedding")))
  val trainRows = withVec.sample(withReplacement = false, 0.5, seed = 42L)
  new KMeans().setK(160).setSeed(42L).setMaxIter(5).setInitMode("random")
    .fit(trainRows.select("features"))
}
println(f"10x fit=$tFit%.2f")
val tCells = minOf(2) {
  val (cand, _) = Similarity.buildIvfIndex(corpus, 160, 0.5)
  force(cand)
}
println(f"10x fit+cells=$tCells%.2f")
val tProbes = minOf(2) {
  val (cand, centroidDf) = Similarity.buildIvfIndex(corpus, 160, 0.5)
  val q = corpus.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    .withColumn("q_norm", sqrt(dot(col("q_emb"), col("q_emb"))))
  val probes = q.crossJoin(broadcast(centroidDf))
    .withColumn("dist", -(dot(col("q_emb"), col("centroid")) /
      (sqrt(dot(col("q_emb"), col("q_emb"))) * sqrt(dot(col("centroid"), col("centroid"))))))
    .withColumn("cell_rank", row_number().over(
      Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
    .filter(col("cell_rank") <= 4)
    .select("q_id", "q_emb", "q_norm", "cell")
  force(probes)
}
println(f"10x fit+cells?+probes=$tProbes%.2f")
val tFull = minOf(2) {
  force(Similarity.knnGraph(corpus, k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5))
}
println(f"10x full=$tFull%.2f")
System.exit(0)
