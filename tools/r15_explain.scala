// Round-14 optimization round: dump .explain("formatted") for a set of
// registry keys and bench scale shapes into plans/r15/<key>_<tag>.txt.
// Usage (spark-shell -i, same flags as scale100.scala):
//   SPARK_GRAFT_PLAN_KEYS=q_tpch_q21,scale_knn_10x \
//   SPARK_GRAFT_PLAN_TAG=before \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --jars target/scala-2.13/duckdbextensionclickhousenativespark_2.13-0.1.0.jar \
//     -i tools/r14_explain.scala
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
val keys = sys.env.getOrElse("SPARK_GRAFT_PLAN_KEYS", "")
  .split(",").map(_.trim).filter(_.nonEmpty).toSeq

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
def lineitemAt(copies: Int) = {
  val l = spark.read.parquet(s"$sf/lineitem.parquet")
  (0 until copies).map(i =>
    l.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift)))
    .reduce(_ unionByName _)
}
def ordersAt(copies: Int) = {
  val o = spark.read.parquet(s"$sf/orders.parquet")
  (0 until copies).map(i =>
    o.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift)))
    .reduce(_ unionByName _)
}

// mirror of Bench.scala's scale shapes (kept in sync by hand; plans only)
def scaleShape(name: String): Option[org.apache.spark.sql.DataFrame] = name match {
  case "scale_knn_1x" => Some(graft.operators.Similarity.knnGraph(
    embAt(1).select(col("vec_id"), col("embedding")),
    k = 3, nlist = 16, nprobe = 4, trainFraction = 0.5))
  case "scale_knn_10x" => Some(graft.operators.Similarity.knnGraph(
    embAt(10).select(col("vec_id"), col("embedding")),
    k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5))
  case "scale_knn_hier_10x" => Some(graft.operators.Similarity.knnGraphHier(
    embAt(10).select(col("vec_id"), col("embedding")),
    k = 3, nlist = 160, nprobe = 4, superProbe = 2, trainCap = 100000))
  case "scale_ivfpq_10x" => Some(graft.operators.Similarity.ivfPqTopK(
    embAt(10).select(col("vec_id"), col("embedding")),
    embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
    k = 10, nlist = 160, nprobe = 4, m = 4,
    codebook = null, lossless = false, trainFraction = 0.5, hierRouting = true))
  case "scale_dedup_10x" => Some(graft.operators.Dedup.minhashPairs(
    docsAt(10), "doc_id", "text", threshold = 0.5))
  case "scale_containment_10x" => Some(graft.operators.Dedup
    .containmentPairsExact(docsAt(10), "doc_id", "text", theta = 0.9))
  case "scale_spans_10x" => Some(graft.operators.Dedup.spanDedup(
    docsAt(10), "doc_id", "text", w = 8))
  case "scale_cc_10x" => Some(graft.operators.DedupClusters.assign(
    graft.operators.Dedup.minhashPairs(docsAt(10), "doc_id", "text",
      threshold = 0.5).select(col("id_a"), col("id_b"))))
  case "scale_semdedup_10x" => Some(graft.operators.Dedup.semDeDup(
    embAt(10), "vec_id", "embedding", "cluster", eps = 0.95))
  case "scale_bm25_10x" => Some(graft.operators.TextPipeline.bm25TopK(
    docsAt(10), "doc_id", "text", Seq("dup", "merge", "window"), k = 10))
  case _ => None
}

Files.createDirectories(Paths.get("plans/r15"))
for (k <- keys) {
  val df = scaleShape(k).orElse(
    graft.SparkEntry.queries.get(k).map(_(spark, sf)))
  df match {
    case Some(d) =>
      val plan = d.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/r15/${k}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"WROTE plans/r15/${k}_$tag.txt (${plan.length} chars)")
    case None => println(s"UNKNOWN KEY $k")
  }
}
System.exit(0)
