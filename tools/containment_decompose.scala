// Round-13: decompose scale_containment_10x wall into (a) prefix
// machinery + candidate join (the count the wl instrument runs) vs
// (b) the full pipeline with verify -- tells us whether the verify
// stage is even the cost center before optimizing it further.
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
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min

def candOnly(c: Int) = graft.operators.Dedup
  .containmentCandidates(docsAt(c), "doc_id", "text", theta = 0.9)
def full(c: Int) = graft.operators.Dedup
  .containmentPairsExact(docsAt(c), "doc_id", "text", theta = 0.9)

// warm
(1 to 2).foreach { _ => force(candOnly(10)); force(full(10)) }
for (c <- Seq(1, 10)) {
  val tc = minOf(3)(force(candOnly(c)))
  val tf = minOf(3)(force(full(c)))
  println(f"DECOMP ${c}x candidates=$tc%.2f full=$tf%.2f verify-delta=${tf - tc}%.2f")
}
val nc = candOnly(10).count()
val nv = full(10).count()
println(s"DECOMP 10x n_candidates=$nc n_verified=$nv")
// payload stats: containee/container df>1 sizes over candidate pairs
val d10 = docsAt(10)
val sh = d10.select(col("doc_id"), graft.operators.Dedup.shinglesCol(col("text"), 3).as("sh"))
  .filter(size(col("sh")) > 0).select(col("doc_id"), size(col("sh")).as("n"))
val cands = candOnly(10)
val stats = cands.join(sh.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
  .join(sh.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
  .agg(sum("n_a").as("sum_na"), sum("n_b").as("sum_nb"),
    avg("n_a").as("avg_na"), avg("n_b").as("avg_nb")).collect()(0)
println(s"DECOMP payload sum_na=${stats.get(0)} sum_nb=${stats.get(1)} avg_na=${stats.get(2)} avg_nb=${stats.get(3)}")
System.exit(0)
