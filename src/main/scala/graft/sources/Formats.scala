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

  /** hfs-seqfile tap (reference d_bolome_order.clj:4-5 imports
    * hfs-seqfile): Hadoop SequenceFile of (LongWritable key,
    * Text value) where the value is the row's remaining columns as a
    * JSON line — JSON because Cascalog tuples carry nulls and a bare
    * Text can't (to_json omits null fields, from_json restores them
    * as nulls). Scale shape: SequenceFiles are block-splittable, so
    * the read is one task per split with zero shuffle; the JSON
    * decode is per-row CPU, no exchange. Rerun-safe: the target dir
    * is deleted before write (saveAsSequenceFile has no overwrite
    * mode).
    *
    * Interchange caveat: the encoding (LongWritable, Text-of-JSON)
    * round-trips within THIS framework but is NOT binary-compatible
    * with the reference's Cascalog hfs-seqfile tuple serialization
    * (BytesWritable of Kryo/Hadoop-serialized Cascading tuples) —
    * capability parity for the tap shape, not a reader of
    * reference-produced files.
    *
    * The key must be non-null after the long cast: a null key has no
    * LongWritable representation, and silently dropping or zeroing
    * rows would corrupt the sink — fail fast and loud instead (the
    * null edge-endpoint drop elsewhere is a semantic choice for
    * graphs; a TAP must not invent one). */
  def writeSequenceFile(df: DataFrame, keyCol: String, path: String,
      codec: Option[Class[_ <: org.apache.hadoop.io.compress
        .CompressionCodec]] = None): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val payload = df.columns.filterNot(_ == keyCol)
    df.select(col(keyCol).cast("long").as("__k"),
        to_json(struct(payload.map(col): _*)).as("__v"))
      .rdd.map { r =>
        require(!r.isNullAt(0),
          s"writeSequenceFile: null key in column '$keyCol' " +
            "(SequenceFile keys are LongWritable — filter or fill " +
            "null keys before writing)")
        (r.getLong(0), r.getString(1))
      }
      .saveAsSequenceFile(path, codec)
  }

  /** Read back a [[writeSequenceFile]] dir: `keyName` gets the
    * LongWritable key, the Text JSON payload is decoded with the
    * caller's explicit `payloadSchema` (never inferred — schema
    * inference would be a second full scan at 100 TB). */
  def readSequenceFile(spark: SparkSession, path: String,
                       keyName: String,
                       payloadSchema: StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    import spark.implicits._
    spark.sparkContext.sequenceFile[Long, String](path)
      .toDF(keyName, "__v")
      .select(col(keyName),
        from_json(col("__v"), payloadSchema).as("__r"))
      .select(col(keyName) +: payloadSchema.fieldNames
        .map(f => col(s"__r.$f")): _*)
  }

  /** pg-tap: `spark.read.jdbc` with pushdown; `-`→`_` column rewrite is
    * the caller's `toDF`. */
  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url)
      .option("dbtable", table).load()

  def writeJdbc(df: DataFrame, url: String, table: String): Unit =
    df.write.format("jdbc").option("url", url)
      .option("dbtable", table).mode("append").save()
}
