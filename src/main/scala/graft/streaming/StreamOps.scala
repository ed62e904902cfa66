package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming parity layer (SURVEY §2.10).
  *
  * The reference has no streaming — its incremental behavior is batch
  * micro-increments with `_rng` bookkeeping. This module provides the
  * upgrade path the survey sketches: `Trigger.AvailableNow` micro-batch
  * over the same tables, with watermarked event-time windows, so the
  * batch pipelines scale out to continuous ingestion unchanged.
  */
object StreamOps {

  /** Streaming read of a parquet table directory. */
  def readTableStream(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked tumbling-window counts per key — the streaming twin of
    * the `events_windowed_agg` batch query. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(18,3)")).cast("decimal(38,3)")
             .as("sum_val"))
      .select(col("w.start").as("window_start"), col(keyCol), col("cnt"),
              col("sum_val"))

  /** Run a streaming DataFrame to a named in-memory sink, processing all
    * available input (AvailableNow = the `_rng`-style batch increment),
    * then stop. Returns the completed query for assertions. */
  def runAvailableNowToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
