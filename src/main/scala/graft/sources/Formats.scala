package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Additional source/sink formats (SURVEY §2.1: the reference imports
  * hfs-delimited / hfs-seqfile / JDBC taps; parquet is the primary
  * store, these cover the rest of the IO surface).
  *
  * JDBC (the pg-tap equivalent proper) is a thin passthrough —
  * unexercised in this container (no database), kept to one line each
  * so the mapping is documented without dead machinery. */
object Formats {

  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** pg-tap: `spark.read.jdbc` with pushdown; `-`→`_` column rewrite is
    * the caller's `toDF`. */
  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table).load()

  def writeJdbc(df: DataFrame, url: String, table: String): Unit =
    df.write.format("jdbc").option("url", url)
      .option("dbtable", table).mode("append").save()
}
