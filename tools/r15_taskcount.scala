// Round-15 task-count audit (VERDICT item 5): for each 10x family that
// showed ~no core sensitivity at sf0.1 (ivfpq, spans, dedup, semdedup),
// record every stage's task count while the shape runs. The question:
// is any family's max-stage task count bounded BELOW the core count
// (a real scale bug the sf0.1 sweep would hide), or is the
// insensitivity just fixed stage-scheduling overhead at this SF?
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

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
  (0 until copies).map { i =>
    val emb = if (i == 0) col("embedding")
      else concat(slice(col("embedding"), i + 1, 64 - i),
        slice(col("embedding"), 1, i))
    e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"),
      concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
      emb.as("embedding"))
  }.reduce(_ unionByName _)
}
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

val stages = ArrayBuffer[(Int, Int, Long)]() // (stageId, numTasks, ms)
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
    stages.synchronized { stages += ((si.stageId, si.numTasks, ms)) }
  }
}
spark.sparkContext.addSparkListener(listener)

def audit(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
  stages.synchronized { stages.clear() }
  force(df)
  Thread.sleep(500)
  val snap = stages.synchronized { stages.toList }.sortBy(-_._3)
  val maxTasks = snap.map(_._2).max
  val heavy = snap.take(8).map { case (id, n, ms) => s"stage$id tasks=$n ms=$ms" }
  println(s"AUDIT $name nStages=${snap.length} maxTasks=$maxTasks")
  heavy.foreach(h => println(s"AUDIT $name   $h"))
}

audit("ivfpq_10x")(graft.operators.Similarity.ivfPqTopK(
  embAt(10).select(col("vec_id"), col("embedding")),
  embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
  k = 10, nlist = 160, nprobe = 4, m = 4,
  codebook = null, lossless = false, trainFraction = 0.5, hierRouting = true))
audit("spans_10x")(graft.operators.Dedup.spanDedup(docsAt(10), "doc_id", "text", w = 8))
audit("dedup_10x")(graft.operators.Dedup.minhashPairs(docsAt(10), "doc_id", "text", threshold = 0.5))
audit("semdedup_10x")(graft.operators.Dedup.semDeDup(
  embAt(10), "vec_id", "embedding", "cluster", eps = 0.95))
System.exit(0)
