// Round-14 A/B: semDeDup's within-cluster rank join under (a) the
// production corpusSide pin (small-corpus broadcast bypass active at
// sf0.1) vs (b) an unconditional shuffle_hash pin, plus the spans fix.
import org.apache.spark.sql.functions._
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
      concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
      emb.as("embedding"))
  }.reduce(_ unionByName _)
}
import graft.operators.{Dedup, Similarity}
def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  call_function("vec_dot", a, b)
def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

def withSimOf(df: org.apache.spark.sql.DataFrame) = {
  val base = df.select(col("vec_id").as("id"), col("embedding").as("emb"),
    col("cluster"))
  val cents = Similarity.labelCentroids(base, "emb", "cluster")
    .groupBy(col("label").as("c_cluster"))
    .agg(expr("transform(sort_array(collect_list(struct(dim, mean))), x -> x.mean)")
      .as("cent"))
  base.join(broadcast(cents), col("cluster") === col("c_cluster"))
    .withColumn("cent_sim", round(cosine(col("emb"), col("cent")), 4))
    .select(col("id"), col("emb"), col("cluster"), col("cent_sim"))
}
def variant2(df: org.apache.spark.sql.DataFrame, pin: String, eps: Double) = {
  val withSim = withSimOf(df)
  val l = withSim.select(col("cluster").as("cl_a"), col("id").as("id_a"),
    col("emb").as("emb_a"), col("cent_sim").as("cs_a"))
  val r0 = withSim.select(col("cluster").as("cl_b"), col("id").as("id_b"),
    col("emb").as("emb_b"), col("cent_sim").as("cs_b"))
  val lp = if (pin == "") l else l.hint(pin)
  val rp = if (pin == "") r0 else r0.hint(pin)
  val dropped = lp.join(rp, col("cl_a") === col("cl_b") &&
      (col("cs_b") < col("cs_a") ||
        (col("cs_b") === col("cs_a") && col("id_b") < col("id_a"))))
    .filter(round(cosine(col("emb_a"), col("emb_b")), 4) >= eps)
    .select(col("id_a").as("id")).distinct()
  withSim.join(dropped.withColumn("hit", lit(true)), Seq("id"), "left")
    .select(col("id"), col("cluster"), col("cent_sim"), col("hit").isNull.as("kept"))
}
val e1 = embAt(1); val e10 = embAt(10)
force(Dedup.semDeDup(e10, "vec_id", "embedding", "cluster", 0.95))
force(variant2(e10, "shuffle_hash", 0.95))
val p0_1 = minOf(3)(force(Dedup.semDeDup(e1, "vec_id", "embedding", "cluster", 0.95)))
val p0_10 = minOf(3)(force(Dedup.semDeDup(e10, "vec_id", "embedding", "cluster", 0.95)))
val h_1 = minOf(3)(force(variant2(e1, "shuffle_hash", 0.95)))
val h_10 = minOf(3)(force(variant2(e10, "shuffle_hash", 0.95)))
val m_10 = minOf(3)(force(variant2(e10, "shuffle_merge", 0.95)))
println(f"SEMDEDUP prod 1x=$p0_1%.2f 10x=$p0_10%.2f | hash 1x=$h_1%.2f 10x=$h_10%.2f | merge 10x=$m_10%.2f")
val a = Dedup.semDeDup(e1, "vec_id", "embedding", "cluster", 0.95)
  .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
val b = variant2(e1, "shuffle_hash", 0.95)
  .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
println(s"SEMDEDUP identity: ${a == b} (${a.size})")

// spans after-fix timing (code already changed in the jar)
def docsAt(copies: Int) = {
  val d = spark.read.parquet(s"$sf/documents.parquet")
  val alpha = "abcdefghij"
  (0 until copies).map { i =>
    val mapped = if (i == 0) col("text")
      else translate(col("text"), alpha, alpha.drop(i) + alpha.take(i))
    d.select((col("doc_id") + lit(i * keyShift)).as("doc_id"), mapped.as("text"))
  }.reduce(_ unionByName _)
}
force(Dedup.spanDedup(docsAt(10), "doc_id", "text", 8))
val sp10 = minOf(3)(force(Dedup.spanDedup(docsAt(10), "doc_id", "text", 8)))
val sp1 = minOf(3)(force(Dedup.spanDedup(docsAt(1), "doc_id", "text", 8)))
println(f"SPANS after-fix 1x=$sp1%.2f 10x=$sp10%.2f")
System.exit(0)
