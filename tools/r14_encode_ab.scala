// Round-14: same-session A/B of the PQ encode argmin variants.
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
def subVectors(df: org.apache.spark.sql.DataFrame) =
  df.select(col("vec_id"),
    posexplode(transform(sequence(lit(0), lit(3)),
      s => slice(col("embedding"), s * 16 + 1, lit(16)))).as(Seq("s", "sub")))
val cb = Similarity.pqCodebookSampled(corpus, 4, 64)

def encWindow() = {
  val dist = lit(-2.0) * dot(col("sub"), col("centroid")) +
    dot(col("centroid"), col("centroid"))
  subVectors(corpus).join(cb, "s")
    .withColumn("rnk", row_number().over(Window.partitionBy("vec_id", "s")
      .orderBy(dist, col("code"))))
    .filter(col("rnk") === 1)
    .select(col("vec_id"), col("s"), col("code"))
}
def encAgg() = {
  val dist = lit(-2.0) * dot(col("sub"), col("centroid")) +
    dot(col("centroid"), col("centroid"))
  subVectors(corpus).join(cb, "s")
    .select(col("vec_id"), col("s"), struct(dist.as("d"), col("code")).as("dc"))
    .groupBy("vec_id", "s").agg(min(col("dc")).as("m"))
    .select(col("vec_id"), col("s"), col("m.code").as("code"))
}
def encArr() = {
  val cents = cb
    .select(col("s"), struct(col("code"), col("centroid"),
      dot(col("centroid"), col("centroid")).as("c2")).as("e"))
    .groupBy("s").agg(collect_list(col("e")).as("cents"))
  subVectors(corpus).join(broadcast(cents), "s")
    .select(col("vec_id"), col("s"),
      array_min(transform(col("cents"), e =>
        struct((lit(-2.0) * dot(col("sub"), e.getField("centroid"))
            + e.getField("c2")).as("d"),
          e.getField("code").as("code"))))
        .getField("code").as("code"))
}
// warm all
force(encWindow()); force(encAgg()); force(encArr())
val tW = minOf(3)(force(encWindow()))
val tA = minOf(3)(force(encAgg()))
val tR = minOf(3)(force(encArr()))
println(f"ENC window=$tW%.2f agg=$tA%.2f arr=$tR%.2f")
// identity
val w = encWindow().collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
val g = encAgg().collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
val a = encArr().collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
println(s"ENC identity window==agg:${w == g} window==arr:${w == a} n=${w.size}")
System.exit(0)
