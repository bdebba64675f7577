// Round-14: decompose q_knn_graph / q_knn_graph_hier wall time into
// train / encode / probe / score stages (spark-shell -i, same flags as
// scale100.scala).
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min

val emb = spark.read.parquet(s"$sf/embeddings.parquet")
println(s"N_embeddings = ${emb.count()}")

import graft.operators.Similarity
// warm
(1 to 2).foreach { _ =>
  force(Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5))
  force(Similarity.knnGraphHier(emb, k = 3, nlist = 16, nprobe = 16, superProbe = 4))
}

// flat: fit alone
val tFit = minOf(3) {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector
  val withVec = emb.select(col("vec_id"), col("embedding"))
    .withColumn("features", array_to_vector(col("embedding")))
  val trainRows = withVec.sample(withReplacement = false, 0.5, seed = 42L)
  new KMeans().setK(16).setSeed(42L).setMaxIter(5).setInitMode("random")
    .fit(trainRows.select("features"))
}
println(f"FLAT fit=$tFit%.2f")
// flat: fit + transform force
val tCells = minOf(3) {
  val (cand, _) = Similarity.buildIvfIndex(emb, 16, 0.5)
  force(cand)
}
println(f"FLAT fit+cells=$tCells%.2f")
// flat full
val tFull = minOf(3) {
  force(Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5))
}
println(f"FLAT full=$tFull%.2f")

// hier: train alone
val tHTrain = minOf(3) { Similarity.trainHierRouter(emb, 16) }
println(f"HIER train=$tHTrain%.2f")
// hier: train + cells
val tHCells = minOf(3) {
  val (cells, _, _) = Similarity.buildIvfIndexHier(emb, 16)
  force(cells)
}
println(f"HIER train+cells=$tHCells%.2f")
// hier full
val tHFull = minOf(3) {
  force(Similarity.knnGraphHier(emb, k = 3, nlist = 16, nprobe = 16, superProbe = 4))
}
println(f"HIER full=$tHFull%.2f")
System.exit(0)
