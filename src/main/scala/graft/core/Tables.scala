package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over the driver's TESTDATA layout.
  *
  * Mirrors the reference's `pg-tap` source (reference
  * src/common/trgx.clj:96-108): a named-table handle that yields a tuple
  * stream. Here the storage is parquet-per-table; column pruning and
  * filter pushdown reach the scan via Catalyst, which `pg-tap` (all
  * columns as String over JDBC) never had.
  */
object Tables {
  /** Read one named table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (for spark.sql use). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
