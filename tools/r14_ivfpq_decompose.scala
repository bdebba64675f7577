// Round-14: decompose scale_ivfpq_10x (hier routing, sampled codebook,
// m=4, nlist=160, nprobe=4, fixed 20-query set).
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
val corpus = embAt(10).select(col("vec_id"), col("embedding"))
val queries = embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20)
def full() = Similarity.ivfPqTopK(corpus, queries, k = 10, nlist = 160, nprobe = 4,
  m = 4, codebook = null, lossless = false, trainFraction = 0.5, hierRouting = true)
// warm
force(full())
// stage: candidates (IVF routing only)
val tCand = minOf(2) { force(Similarity.ivfPqCandidates(corpus, queries,
  nlist = 160, nprobe = 4, trainFraction = 0.5, hierRouting = true)) }
println(f"ivfpq10 candidates=$tCand%.2f")
// stage: sampled codebook alone
val tCb = minOf(2) { force(Similarity.pqCodebookSampled(corpus, 4, 64)) }
println(f"ivfpq10 codebook=$tCb%.2f")
// stage: codebook + argmin encode (replicating adcTopK's non-equality encode)
def subVectors(df: org.apache.spark.sql.DataFrame) =
  df.select(col("vec_id"),
    posexplode(transform(sequence(lit(0), lit(3)),
      s => slice(col("embedding"), s * 16 + 1, lit(16)))).as(Seq("s", "sub")))
val tEnc = minOf(2) {
  val cb = Similarity.pqCodebookSampled(corpus, 4, 64)
  val subs = subVectors(corpus)
  val dist = lit(-2.0) * dot(col("sub"), col("centroid")) +
    dot(col("centroid"), col("centroid"))
  val enc = subs.join(cb, "s")
    .withColumn("rnk", row_number().over(Window.partitionBy("vec_id", "s")
      .orderBy(dist, col("code"))))
    .filter(col("rnk") === 1)
    .select(col("vec_id"), col("s"), col("code"))
  force(enc)
}
println(f"ivfpq10 codebook+encode(window)=$tEnc%.2f")
// variant: argmin via min(struct) aggregate instead of the window
val tEncAgg = minOf(2) {
  val cb = Similarity.pqCodebookSampled(corpus, 4, 64)
  val subs = subVectors(corpus)
  val dist = lit(-2.0) * dot(col("sub"), col("centroid")) +
    dot(col("centroid"), col("centroid"))
  val enc = subs.join(cb, "s")
    .select(col("vec_id"), col("s"), struct(dist.as("d"), col("code")).as("dc"))
    .groupBy("vec_id", "s").agg(min(col("dc")).as("m"))
    .select(col("vec_id"), col("s"), col("m.code").as("code"))
  force(enc)
}
println(f"ivfpq10 codebook+encode(agg)=$tEncAgg%.2f")
val tFull = minOf(2) { force(full()) }
println(f"ivfpq10 full=$tFull%.2f")
System.exit(0)
