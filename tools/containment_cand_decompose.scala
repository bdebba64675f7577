// Round-13: decompose the containment CANDIDATE stage (5.2 of 5.9 s
// at 10x -- the real cost center, not the verify). Replicates
// Dedup.prefixOrdered + the candidate join in-shell (same code shape,
// same confs) to time each sub-stage and count pre-distinct rows.
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val keyShift = 100000000L
val theta = 0.9
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

def shingled(c: Int) = docsAt(c)
  .select(col("doc_id").as("id"), graft.operators.Dedup.shinglesCol(col("text"), 3).as("sh"))
  .filter(size(col("sh")) > 0)
def exOf(c: Int) = shingled(c).select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
def dfreqOf(c: Int) = exOf(c).groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") > 1)
def orderedOf(c: Int) = exOf(c).join(dfreqOf(c).hint("shuffle_hash"), "g").groupBy("id")
  .agg(max(col("n")).cast("long").as("n"),
    sort_array(collect_list(struct(col("df"), col("g")))).as("dg2"))
  .withColumn("n1", col("n") - size(col("dg2")))
def keysOf(c: Int, pfx: Boolean) = {
  val base = orderedOf(c)
    .select(col("id"), col("n"), col("n1"), posexplode(col("dg2")).as(Seq("j0", "dg")))
    .select(col("id"), col("n"), (col("n1") + col("j0") + 1).as("p"), col("dg.g").as("g"))
  if (pfx) base.filter(col("p") <= col("n") - ceil(lit(theta) * col("n")).cast("long") + 2L)
  else base
}
def candJoin(c: Int) = {
  val aKeys = keysOf(c, true)
  val bKeys = keysOf(c, false)
  val minOverlap = lit(theta) * col("n_a")
  aKeys.select(col("g"), col("id").as("id_a"), col("n").as("n_a"), col("p").as("p_a"))
    .join(bKeys.select(col("g").as("g_b"), col("id").as("id_b"),
        col("n").as("n_b"), col("p").as("p_b")).hint("shuffle_merge"),
      col("g") === col("g_b") && col("id_a") =!= col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          lit(theta) * col("n_a") - lit(1e-6) &&
        (least(col("p_a"), col("p_b"))
          + least(col("n_a") - col("p_a"), col("n_b") - col("p_b")))
          .cast("double") >= minOverlap - lit(1e-6))
}
// warm
force(candJoin(10).select("id_a", "id_b").distinct())
val c = 10
val tEx = minOf(2)(force(exOf(c)))
val tDf = minOf(2)(force(dfreqOf(c)))
val tOrd = minOf(2)(force(orderedOf(c)))
val tKeysB = minOf(2)(force(keysOf(c, false)))
val tJoin = minOf(2)(force(candJoin(c).select("id_a", "id_b")))
val tDist = minOf(2)(force(candJoin(c).select("id_a", "id_b").distinct()))
println(f"CAND ex=$tEx%.2f dfreq=$tDf%.2f ordered=$tOrd%.2f keysB=$tKeysB%.2f joinNoDist=$tJoin%.2f joinDist=$tDist%.2f")
val nB = keysOf(c, false).count()
val nA = keysOf(c, true).count()
val nPre = candJoin(c).count()
println(s"CAND rows aKeys=$nA bKeys=$nB preDistinct=$nPre")
// positional-B bound (round-13 idea): the globally rarest SHARED
// element sits within B's first n_b - ceil(theta*n_a) + 1 positions
// too (two-sided prefix theorem for overlap joins) -- how many join
// output rows does p_b <= n_b - theta*n_a + 1 (+ulp guard) drop?
val nPreB = candJoin(c)
  .filter(col("p_b").cast("double") <=
    col("n_b") - lit(theta) * col("n_a") + 2.0).count()
println(s"CAND preDistinct after B-positional bound: $nPreB (was $nPre)")
System.exit(0)
