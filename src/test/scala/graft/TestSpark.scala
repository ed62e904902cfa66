package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${graft.core.Tables.tmpDir}/spark-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Scratch dir for a test, under the relocatable [[graft.core.Tables.tmpDir]]
    * (never a hardcoded checkout path — honors the GRAFT_TMP_DIR
    * override the production code documents). */
  def tmpPath(prefix: String): java.nio.file.Path = {
    val base = java.nio.file.Paths.get(graft.core.Tables.tmpDir)
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix)
  }

  /** Flatten a physical plan INCLUDING the interior of AQE wrappers —
    * AdaptiveSparkPlanExec is a leaf node, so a plain `collect` sees
    * nothing beneath it and node-level assertions become vacuous.
    * Shared by PlanSpec and PlanFingerprintSpec so the traversal
    * cannot drift between them. */
  def planNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    p +: (p match {
      case a: AdaptiveSparkPlanExec => planNodes(a.initialPlan)
      case _ => p.children.flatMap(planNodes)
    })
  }
}
