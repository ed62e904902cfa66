package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Driver-side orchestration operators (SURVEY §2.1 "JDBC driver-side
  * SQL" + §2.10 incremental bookkeeping). The reference runs these as
  * DDL/DML on Postgres around Cascalog flows (reference
  * src/common/trgx.clj:110-193, src/bolome/mlin/d_bolome_user_order
  * .clj:52-62,181-184); here the warehouse is parquet directories, so
  * they become explicit, non-exception-swallowing filesystem + DataFrame
  * steps.
  */
object TableOps {

  private def rm(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  /** `create-table-if` (trgx.clj:121-127): materialize an empty table
    * with the given schema if absent. */
  def createTableIf(spark: SparkSession, path: String, schema: StructType): Unit =
    if (!Files.exists(Paths.get(path)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                            schema)
        .write.mode("overwrite").parquet(path)

  /** `truncate-tab` (mlin/d_bolome_user_order.clj:52-53). */
  def truncateTab(spark: SparkSession, path: String): Unit = {
    val schema = spark.read.parquet(path).schema
    rm(Paths.get(path))
    createTableIf(spark, path, schema)
  }

  /** `switch-tab` (mlin/d_bolome_user_order.clj:59-62): 3-way atomic-ish
    * rename swap: live ↔ shadow via a tmp name. */
  def switchTab(live: String, shadow: String): Unit = {
    val l = Paths.get(live); val s = Paths.get(shadow)
    val tmp = Paths.get(live + "__swap_tmp")
    Files.move(l, tmp, StandardCopyOption.ATOMIC_MOVE)
    Files.move(s, l, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, s, StandardCopyOption.ATOMIC_MOVE)
  }

  /** `replace-into-ods` (trgx.clj:188-193): publish a staged build over
    * the target (DROP + RENAME equivalent). */
  def replaceInto(staged: String, target: String): Unit = {
    val t = Paths.get(target)
    rm(t)
    Files.move(Paths.get(staged), t, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Small-file compaction — the 100 TB operational companion to the
    * incremental append patterns above (every `_rng` micro-increment
    * appends a few files; after thousands of loads the scan cost is
    * dominated by file-open overhead). Rewrites the table into
    * ceil(bytes / targetBytes) files via a shadow dir + atomic swap.
    * Returns (files before, files after). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    def parts(p: String): Seq[java.io.File] =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-")).toSeq
    require(new java.io.File(path).isDirectory,
      s"compact: no table directory at $path")
    val before = parts(path)
    val n = math.max(1,
      math.ceil(before.map(_.length).sum.toDouble / targetBytes).toInt)
    val staged = path + "__compact"
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(staged)
    replaceInto(staged, path)
    (before.size, parts(path).size)
  }

  /** `detele-report!` ranged delete (trgx.clj:118-119): rewrite the table
    * without rows in [startDt, endDt] — parquet has no in-place DELETE,
    * so this is a filtered rewrite through a staged dir. */
  def deleteRange(spark: SparkSession, path: String, dtCol: String,
                  startDt: String, endDt: String): Unit = {
    val staged = path + "__staged"
    spark.read.parquet(path)
      .filter(!col(dtCol).between(startDt, endDt))
      .write.mode("overwrite").parquet(staged)
    replaceInto(staged, path)
  }

  /** `report->next-dt` (trgx.clj:110-116): resume range = MAX(dw_dt)+1
    * day → tomorrow; `defaultStart` when the table is empty. */
  def reportNextDt(df: DataFrame, dtCol: String, defaultStart: String,
                   endDt: String): (String, String) = {
    val maxDt = df.agg(max(col(dtCol))).first().getString(0)
    val start =
      if (maxDt == null) defaultStart
      else java.time.LocalDate.parse(maxDt).plusDays(1).toString
    (start, endDt)
  }

  /** `save-and-load-rng-dt!` (trgx.clj:130-164): record the load's
    * [min, max] range + row count into the `<stg>_rng` bookkeeping
    * table; returns the recorded range. */
  def saveAndLoadRng(spark: SparkSession, stg: DataFrame, dtCol: String,
                     rngPath: String): (String, String, Long) = {
    val r = stg.agg(min(col(dtCol)).as("mn"), max(col(dtCol)).as("mx"),
                    count(lit(1)).as("cnt")).first()
    val (mn, mx, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
    import spark.implicits._
    Seq((mn, mx, cnt)).toDF("dw_bgn_dt", "dw_end_dt", "dw_ld_cnt")
      .write.mode("append").parquet(rngPath)
    (mn, mx, cnt)
  }

  /** Delta/shadow/switch incremental pattern
    * (model/d_bolome_order_show_debut.clj:61-99,150-183): apply a delta
    * to the current snapshot via a caller-supplied merge, build the next
    * snapshot in a shadow dir, then swap. */
  def deltaShadowSwitch(spark: SparkSession, livePath: String,
                        delta: DataFrame,
                        mergeFn: (DataFrame, DataFrame) => DataFrame): Unit = {
    val current = spark.read.parquet(livePath)
    val shadow = livePath + "__shadow"
    mergeFn(delta, current).write.mode("overwrite").parquet(shadow)
    replaceInto(shadow, livePath)
  }
}
