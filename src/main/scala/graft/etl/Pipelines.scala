package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.trgx.Trgx

/** Composed ETL pipelines (SURVEY §3 entry points; SURVEY §7
  * `graft.etl`).
  */
object Pipelines {

  /** EP-3: the ODS merge load (reference
    * src/bolome/ods/d_bolome_show.clj:58-83): bookkeeping → full-outer
    * stg⊕ods merge preserving surrogate ids → new-row id assignment →
    * staged write → atomic publish. Returns the published row count.
    *
    * The reference alternates driver-JDBC and cluster dataflow four
    * times; here the same choreography is explicit and
    * non-exception-swallowing. */
  def odsMerge(spark: SparkSession, stg: DataFrame, odsPath: String,
               naturalKey: Seq[String], valueCols: Seq[String],
               idCol: String, orderCol: String, dtCol: String,
               rngPath: String): Long = {
    // 0. heal a crashed previous publish FIRST: with the ods path
    // missing and the last build at __replaced, createTableIf would
    // otherwise re-create an EMPTY ods and the merge would silently
    // lose all history + reissue surrogate ids from 1
    TableOps.restoreInterrupted(odsPath)
    // 1. load-range bookkeeping (save-and-load-rng-dt!)
    TableOps.saveAndLoadRng(spark, stg, dtCol, rngPath)
    // 2. current ods (create if first load)
    TableOps.createTableIf(spark, odsPath,
      stg.schema.add(idCol, org.apache.spark.sql.types.LongType))
    val ods = spark.read.parquet(odsPath)
    // 3. merge: stg wins per column, ods ids preserved
    val merged = Relational.fullOuterMerge(
      stg.withColumn(idCol, lit(null).cast("long")), ods,
      naturalKey, valueCols :+ idCol)
    // 4. surrogate ids for new rows (load-max-dw-id + row-num)
    val maxId = ods.agg(max(col(idCol))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val keyed = Relational.surrogateKeysOrdered(merged, idCol, orderCol,
      maxId)
    // 5. staged write + atomic publish (replace-into-ods)
    val staged = odsPath + "__staged"
    keyed.write.mode("overwrite").parquet(staged)
    TableOps.replaceInto(staged, odsPath)
    spark.read.parquet(odsPath).count()
  }

  /** EP-1: the report-job `-main` lifecycle over the JDBC report sink
    * (SURVEY §3; m_cocacola_score_overall.clj:82-86 + trgx.clj:110-116):
    * resume range = MAX(dw-dt)+1 of this report's rows in the sink →
    * build the report for that range → append through the all-String
    * `-`→`_` tap. Returns the range that ran. Unlike the reference's
    * `(try … (catch Exception _))`, failures propagate.
    *
    * Crash boundary (the reference's too — same MAX+1 resume over the
    * same non-transactional multi-statement append): a crash MID-append
    * commits some partitions' rows, inflating MAX(dw-dt), so the next
    * run resumes past dates whose rows only partially landed. MAX+1
    * cannot distinguish that state without an intent log the reference
    * doesn't keep; the recovery procedure is [[graft.sources.Jdbc
    * .deleteRange]] over the suspect range (the reference's
    * `detele-report!` exists for exactly this) followed by a rerun.
    * Exactly-once needs a transactional sink. */
  def runReportJob(spark: SparkSession, url: String, reportTable: String,
                   reportName: String, defaultStart: String, endDt: String,
                   build: ((String, String)) => DataFrame): (String, String) = {
    import graft.sources.Jdbc
    val existing = Jdbc.readTable(spark, url, reportTable,
        Seq("dw-dt", "report"))
      .filter(col("report") === reportName)
      .select(col("dw-dt").as("dw_dt"))
    val rng = TableOps.reportNextDt(existing, "dw_dt", defaultStart, endDt)
    Jdbc.writeTable(build(rng), url, reportTable)
    rng
  }

  /** mlvar tree build (reference
    * src/bolome/mlvar/d_bolome_user_order.clj:75-141): roll each user's
    * rows into a trgx tree keyed by `pathCols` (the reference nests
    * user → dw-dt → order → product), DATA attached at the leaf, stored
    * as a canonical-JSON TEXT column — the EDN-in-TEXT storage boundary.
    */
  def mlvarUserOrderTrees(orders: DataFrame, userCol: String,
                          pathCols: Seq[String],
                          dataCols: Seq[String]): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select(col(userCol).cast("long"),
        array(pathCols.map(c => col(c).cast("string")): _*),
        map(dataCols.flatMap(c =>
          Seq(lit(c), col(c).cast("string"))): _*))
      .as[(Long, Seq[String], Map[String, String])]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        val tree = rows.foldLeft(Map.empty: Trgx.Tree) {
          case (acc, (_, path, data)) => Trgx.assocIn(acc, path, data)
        }
        (uid, Trgx.toJson(tree))
      }
      .toDF(userCol, "trgx")
  }

  /** mlvar shift-cut features (reference
    * src/bolome/mlvar/d_bolome_user_order_stat.clj:97-135): slice each
    * user's tree into k lookback windows ending at `asOf`, summing the
    * numeric field per window. */
  def shiftCutFeatures(trees: DataFrame, userCol: String, asOf: String,
                       windowDays: Int, numWindows: Int, field: String,
                       leafDepthBelowDate: Int = 1): DataFrame = {
    val spark = trees.sparkSession
    import spark.implicits._
    trees.select(col(userCol).cast("long"), col("trgx"))
      .as[(Long, String)]
      .flatMap { case (uid, json) =>
        Trgx.shiftCut(Trgx.fromJson(json), asOf, windowDays, numWindows,
            leafDepthBelowDate)
          .flatMap { case (w, sums) =>
            sums.get(field).map(v => (uid, w, v))
          }
      }
      .toDF(userCol, "w", field + "_sum")
  }
}
