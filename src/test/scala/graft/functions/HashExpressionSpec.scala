package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class HashExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("SQL functions registered via GraftExtensions, codegen path") {
    val out = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .selectExpr("doc_id", "text", "fnv1a64(text) AS h", "simhash64(text) AS s")
      .limit(20).collect()
    out.foreach { r =>
      assert(r.getLong(2) === TextHash.fnv1a64(r.getString(1)))
      assert(r.getLong(3) === TextHash.simhash64(r.getString(1)))
    }
    assert(out.nonEmpty)
  }

  test("interpreted (non-codegen) path agrees with codegen") {
    val df = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet").limit(10)
    val withCodegen = df.selectExpr("fnv1a64(text)").collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.selectExpr("fnv1a64(text)").collect().map(_.getLong(0)).toSeq
      assert(interpreted === withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("UTF8String-native fnv1a64 equals the String-based implementation") {
    Seq("", "a", "hello world", "café 中文").foreach { s =>
      assert(HashExpressions.fnv1a64(UTF8String.fromString(s)) === TextHash.fnv1a64(s))
    }
  }

  test("shingle_hashes generator emits exactly TextHash.shingleHashes rows") {
    val docs = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet").limit(20)
    val viaGen = docs.selectExpr("doc_id", "shingle_hashes(text, 3) AS sh")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> TextHash.shingleHashes(r.getString(1), 3).toSet
    }.toMap
    assert(viaGen === expected)
  }

  test("vec_dot equals the higher-order-function formulation bit-for-bit") {
    val emb = spark.read.parquet(s"${SparkTestBase.sfDir}/embeddings.parquet").limit(50)
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val hof = emb.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).collect().map(_.getDouble(0)).toSeq
    val native = emb.selectExpr("vec_dot(a, b)").collect().map(_.getDouble(0)).toSeq
    assert(native.map(java.lang.Double.doubleToLongBits) ===
      hof.map(java.lang.Double.doubleToLongBits))
  }

  test("vec_dot rejects mismatched lengths instead of null-padding") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] { df.selectExpr("vec_dot(a, b)").collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("lengths differ")))
  }

  test("expression stays inside whole-stage codegen (plan check)") {
    val df = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .selectExpr("fnv1a64(text)")
    df.collect()
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fnv1a64"), plan.take(1000))
  }

  test("minhash_sig / shingle_array equal the TextHash reference implementations") {
    val out = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .selectExpr("text", "minhash_sig(text, 64, 3) AS sig", "shingle_array(text, 3) AS sh")
      .limit(20).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val text = r.getString(0)
      assert(r.getSeq[Long](1).toArray ===
        TextHash.minhashSignature(TextHash.shingleHashes(text, 3), 64))
      // shingleHashes builds from a HashSet — order is arbitrary but
      // deterministic; compare as sets AND lengths (distinctness)
      val sh = r.getSeq[Long](2)
      val ref = TextHash.shingleHashes(text, 3)
      assert(sh.toSet === ref.toSet)
      assert(sh.length === ref.length)
    }
  }

  test("sig_agree / hamming64 / rolling_fingerprint equal their Scala forms") {
    import spark.implicits._
    val df = Seq(
      ("alpha beta gamma delta epsilon", "alpha beta gamma delta zeta"),
      ("one two three", "one two three"),
      ("completely different words here", "nothing shared at all end"))
      .toDF("ta", "tb")
      .selectExpr("ta", "tb",
        "sig_agree(minhash_sig(ta, 128, 3), minhash_sig(tb, 128, 3)) AS agree",
        "hamming64(simhash64(ta), simhash64(tb)) AS ham",
        "rolling_fingerprint(ta) AS fp")
    df.collect().foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(r.getDouble(2) === TextHash.estJaccard(
        TextHash.minhashSignature(TextHash.shingleHashes(ta, 3), 128),
        TextHash.minhashSignature(TextHash.shingleHashes(tb, 3), 128)))
      assert(r.getInt(3) === TextHash.hamming(
        TextHash.simhash64(ta), TextHash.simhash64(tb)))
      assert(r.getLong(4) === TextHash.rollingFingerprint(ta))
    }
  }

  test("sig_agree rejects mismatched signature widths") {
    import spark.implicits._
    val df = Seq(("a b c d e")).toDF("t")
    val e = intercept[Exception] {
      df.selectExpr("sig_agree(minhash_sig(t, 64, 3), minhash_sig(t, 128, 3))").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("widths differ")))
  }

  test("dedup pipelines carry no Scala UDF (expression tier end-to-end)") {
    val docs = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
    val plans = Seq(
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3),
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3),
      graft.operators.Dedup.verifiedPairs(docs, "doc_id", "text",
        graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3),
        minJaccard = 0.3))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      // ScalaUDF prints as "UDF(" in physical plans; the codegen'd
      // expressions print under their own prettyNames
      assert(!p.contains("UDF("), p.take(1500))
    }
  }
}
