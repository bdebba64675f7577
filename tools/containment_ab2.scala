// Round-10 A/B #2: AQE initialPartitionNum variants for containment.
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
def contain(c: Int) = graft.operators.Dedup
  .containmentPairsExact(docsAt(c), "doc_id", "text", theta = 0.9)
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min
(1 to 2).foreach(_ => force(contain(10)))
def ab(label: String)(setup: => Unit)(teardown: => Unit): Unit = {
  setup
  try {
    val t10 = minOf(3)(force(contain(10)))
    val t1 = minOf(3)(force(contain(1)))
    println(f"AB $label%-40s 1x=$t1%.2f 10x=$t10%.2f ratio=${t10 / t1}%.2f")
  } finally teardown
}
val IPN = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
ab("baseline (32 parts)") {} {}
ab("AQE initialPartitionNum=64") { spark.conf.set(IPN, "64") } { spark.conf.unset(IPN) }
ab("AQE initialPartitionNum=128") { spark.conf.set(IPN, "128") } { spark.conf.unset(IPN) }
ab("AQE initialPartitionNum=256") { spark.conf.set(IPN, "256") } { spark.conf.unset(IPN) }
ab("shuffle.partitions=64 (recheck)") {
  spark.conf.set("spark.sql.shuffle.partitions", "64")
} { spark.conf.set("spark.sql.shuffle.partitions", "32") }
System.exit(0)
