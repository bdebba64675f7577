// Round-10 measurement: prefixOrdered df>1 pre-filter shape --
// containment and ngram at 1x/10x, warm, min-of-3.
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
def contain(c: Int) = graft.operators.Dedup
  .containmentPairsExact(docsAt(c), "doc_id", "text", theta = 0.9)
def ngram(c: Int) = graft.operators.Dedup
  .ngramPairsExact(docsAt(c), "doc_id", "text", theta = 0.8)
(1 to 2).foreach { _ => force(contain(10)); force(ngram(1)) }
val c10 = minOf(3)(force(contain(10)))
val c1 = minOf(3)(force(contain(1)))
val n1 = minOf(3)(force(ngram(1)))
val n10 = minOf(3)(force(ngram(10)))
println(f"NEW containment 1x=$c1%.2f 10x=$c10%.2f ratio=${c10 / c1}%.2f")
println(f"NEW ngram       1x=$n1%.2f 10x=$n10%.2f ratio=${n10 / n1}%.2f")
// sanity: pair counts at 1x (documents fixture) for oracle cross-check
println("NEW counts contain1x=" + contain(1).count() + " ngram1x=" + ngram(1).count())
System.exit(0)
