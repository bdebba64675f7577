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

  test("expression stays inside whole-stage codegen (plan check)") {
    val df = spark.read.parquet(s"${SparkTestBase.sfDir}/documents.parquet")
      .selectExpr("fnv1a64(text)")
    df.collect()
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fnv1a64"), plan.take(1000))
  }
}
