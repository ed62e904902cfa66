package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // iteration aid (mirrors Bench): SPARK_GRAFT_ONLY=a,b,c dumps just
    // those queries; the driver never sets it, so the gate is unaffected
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Failures must be LOUD in the artifact, not just stderr: in round 6
    // twelve queries threw at analysis time and the only artifact signal
    // was their ABSENCE from CORRECTNESS (the driver records no row for a
    // query with no parquet dump). verify_errors.json makes a failing
    // query impossible to miss next to oracle_sql.json.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // first line(s) only — a full Spark stack trace per failure would
        // bloat the artifact without adding diagnostic value
        val msg = s"${e.getClass.getName}: ${e.getMessage}".take(400)
        errors(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
      }
      // reap per-query staging dirs so a full-gate run stays bounded
      graft.core.Tables.clearStaged()
    }
    def q(s: String): String = graft.core.Json.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    // summary stays on stderr; rc stays 0 so the driver still records
    // the queries that DID pass (a nonzero rc could void the whole run)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size}/${selected.size} queries FAILED: " +
          errors.keys.mkString(", "))
    spark.stop()
  }
}
