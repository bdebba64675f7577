package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("approx_count_distinct within 5% of exact (HLL accuracy bound)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = QueryRegistry.queries("q_agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("approx quantile within 2% of exact (sketch accuracy bound)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = QueryRegistry.queries("q_agg_approx_quantile")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) / e < 0.02, s"$k: approx=$a exact=$e")
    }
  }

  test("every declared oracle key produces a non-empty, re-runnable result") {
    // cheap structural guard at sf0.001: all keys run and yield rows
    QueryRegistry.all.foreach { case (name, q) =>
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("stratified sample hits the requested per-stratum fractions (seeded)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val totals = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = QueryRegistry.queries("q_sample_stratified")(spark, dir)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.25, "3-MEDIUM" -> 0.1,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.1)
    want.foreach { case (k, f) =>
      val n = totals(k)
      val got = sampled.getOrElse(k, 0L).toDouble / n
      // Bernoulli sampling: 4-sigma tolerance around the target fraction
      val tol = 4 * math.sqrt(f * (1 - f) / n)
      assert(math.abs(got - f) <= tol, s"$k: got $got want $f ± $tol (n=$n)")
    }
  }

  test("bucketed tables co-locate: equi-join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    // bucketing requires the table catalog; explicit path options keep
    // all data under the temp dir (the in-memory catalog holds metadata)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    s.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/cust_b").mode("overwrite").saveAsTable("cust_b")
    s.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")
    val joined = s.table("cust_b").join(s.table("ord_b"),
      org.apache.spark.sql.functions.col("c_custkey") === org.apache.spark.sql.functions.col("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000)) // co-located: zero shuffles
    assert(joined.count() ===
      spark.read.parquet(s"$dir/customer.parquet").join(
        spark.read.parquet(s"$dir/orders.parquet"),
        org.apache.spark.sql.functions.col("c_custkey") === org.apache.spark.sql.functions.col("o_custkey")).count())
    s.sql("DROP TABLE IF EXISTS cust_b"); s.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("broadcast hint survives into the physical plan") {
    val plan = QueryRegistry.queries("q_join_broadcast")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("topk compiles to TakeOrderedAndProject (no global sort)") {
    val plan = QueryRegistry.queries("q_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("parquet scans prune columns and push filters") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 49.0).select("l_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"),
      scan.take(2000))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      scan.take(2000))
  }
}
