// Round-10: containment 10x repeated-execution curve -- this sweep's
// rep curve [7.59, 14.41, 13.98] had rep1 FASTEST; is repeated
// execution in one session degrading (heap debt / shuffle
// accumulation), and does it recover after a GC + heal?
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
val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
def gcMillis(): Long = { var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s }
// warm once
force(contain(10))
(1 to 8).foreach { i =>
  val g0 = gcMillis()
  val w = time(force(contain(10)))
  println(f"REPEAT rep$i wall=$w%.2f gc=${(gcMillis() - g0) / 1e3}%.2f")
}
println("-- System.gc + heal pass --")
System.gc()
(1 to 2).foreach { _ =>
  spark.read.parquet(s"$sf/lineitem.parquet")
    .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1))).collect()
}
(1 to 3).foreach { i =>
  val g0 = gcMillis()
  val w = time(force(contain(10)))
  println(f"REPEAT postgc rep$i wall=$w%.2f gc=${(gcMillis() - g0) / 1e3}%.2f")
}
System.exit(0)
