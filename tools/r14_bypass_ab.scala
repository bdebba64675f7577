// Round-14 A/B: per-operator value of the leavesKnownSmall broadcast
// bypass at sf0.1, measured by flipping autoBroadcastJoinThreshold
// (-1 activates every corpusSide/fetchSide pin AND disables Catalyst's
// own broadcasts -- for these operators there are no explicit
// broadcast() calls, so -1 IS the fully-pinned plan).
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min
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
import graft.operators.Dedup
val docs1 = spark.read.parquet(s"$sf/documents.parquet")
val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
def withThr(v: String)(f: => Double): Double = {
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
  try f finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
}
def ab(name: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
  // warm both shapes
  withThr("10485760") { force(mk()); 0.0 }
  withThr("-1") { force(mk()); 0.0 }
  val on = withThr("10485760")(minOf(3)(force(mk())))
  val off = withThr("-1")(minOf(3)(force(mk())))
  println(f"BYPASS $name: bypass-on=$on%.2f pinned(-1)=$off%.2f")
}
ab("minhash_1x", () => Dedup.minhashPairs(docs1, "doc_id", "text", threshold = 0.5))
ab("minhash_10x", () => Dedup.minhashPairs(docsAt(10), "doc_id", "text", threshold = 0.5))
ab("embedding_lsh", () => Dedup.embeddingPairs(emb1, "vec_id", "embedding", 0.9))
ab("containment_1x", () => Dedup.containmentPairsExact(docs1, "doc_id", "text", 0.9))
ab("ngram_1x", () => Dedup.ngramPairsExact(docs1, "doc_id", "text", 0.5))
ab("simhash_1x", () => Dedup.simhashPairs(docs1, "doc_id", "text", 3))
System.exit(0)
