// Round-10 A/B #3: shuffle.partitions 32 vs 64 across ALL scale_*_10x
// shapes -- is partition-count-proportional-to-data a uniform win or a
// containment-only one?
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
  (0 until copies).map(i =>
    e.withColumn("vec_id", col("vec_id") + lit(i * keyShift)))
    .reduce(_ unionByName _)
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
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min

val shapes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
  "containment" -> (() => graft.operators.Dedup.containmentPairsExact(docsAt(10), "doc_id", "text", theta = 0.9)),
  "spans" -> (() => graft.operators.Dedup.spanDedup(docsAt(10), "doc_id", "text", w = 8)),
  "cc" -> (() => graft.operators.DedupClusters.assign(
    graft.operators.Dedup.minhashPairs(docsAt(10), "doc_id", "text", threshold = 0.5)
      .select(col("id_a"), col("id_b")))),
  "dedup" -> (() => graft.operators.Dedup.minhashPairs(docsAt(10), "doc_id", "text", threshold = 0.5)),
  "knn" -> (() => graft.operators.Similarity.knnGraph(
    embAt(10).select(col("vec_id"), col("embedding")),
    k = 3, nlist = 160, nprobe = 4, trainFraction = 0.5)),
  "join" -> (() => lineitemAt(10)
    .join(ordersAt(10), col("l_orderkey") === col("o_orderkey"))
    .groupBy("o_orderpriority")
    .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))))

// warm every shape once untimed
shapes.foreach { case (_, mk) => force(mk()) }
shapes.foreach { case (name, mk) =>
  val t32 = minOf(3)(force(mk()))
  spark.conf.set("spark.sql.shuffle.partitions", "64")
  val t64 = minOf(3)(force(mk()))
  spark.conf.set("spark.sql.shuffle.partitions", "32")
  println(f"AB3 $name%-14s 10x@32=$t32%.2f 10x@64=$t64%.2f delta=${(t64 - t32) / t32 * 100}%+.0f%%")
}
System.exit(0)
