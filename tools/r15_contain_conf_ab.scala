// Round-15: interleaved same-session A/B of the containment broadcast
// bypass (spark.sql.autoBroadcastJoinThreshold default vs -1), with
// ngram as the NOISE CONTROL: ngram's strategy pins are unconditional,
// so its plan is conf-invariant, so any spread in its numbers across the
// interleaved rounds measures session drift, not the conf.
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
val thr0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
// warm both plan shapes
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
force(contain(10)); force(ngram(10))
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)
force(contain(10)); force(ngram(10))
for (round <- 1 to 3; (name, thr) <- Seq("bypass" -> thr0, "pinned" -> "-1")) {
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  val c10 = minOf(2)(force(contain(10)))
  val c1 = minOf(2)(force(contain(1)))
  val n10 = minOf(2)(force(ngram(10)))
  println(f"ROUND $round $name%-7s contain 1x=$c1%.2f 10x=$c10%.2f ngramCtl 10x=$n10%.2f")
}
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0)
println("COUNTS contain1x=" + contain(1).count() + " pinned=" + {
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
  val n = contain(1).count()
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr0); n })
System.exit(0)
