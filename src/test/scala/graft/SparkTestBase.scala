package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.native.NativeCatalog")
      .config("spark.sql.catalog.graft.warehouse",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  /** Every node of a physical plan, recursing through
    * AdaptiveSparkPlanExec's inner plan AND expression-hosted subquery
    * plans (scalar subqueries hang off expressions, not children — a
    * children-only walk misses e.g. a global window inside one). */
  def walkPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p.children.flatMap(walkPlan) ++
      p.subqueries.flatMap(walkPlan) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walkPlan(a.inputPlan)
        case _ => Seq.empty
      }))

  /** Run `body` with AQE off (exchanges are inserted inside
    * AdaptiveSparkPlanExec's preparation, invisible to a plan walk of
    * an un-executed query), restoring the PRIOR setting afterwards. */
  def withAqeDisabled[A](body: => A): A =
    withSQLConf("spark.sql.adaptive.enabled" -> "false")(body)

  /** Run `body` with the given SQL confs set, restoring the PRIOR
    * values (or unsetting) afterwards. */
  def withSQLConf[A](pairs: (String, String)*)(body: => A): A = {
    val priors = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally priors.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
