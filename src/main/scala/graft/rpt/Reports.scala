package graft.rpt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Composable report pipelines (SURVEY §7 `graft.rpt`) — the shapes
  * behind the reference's 26 report jobs under src/cocacola/rpt/,
  * expressed as DataFrame functions over any fact table.
  */
object Reports {

  /** The canonical sliding-score report (18 of 26 reference reports;
    * m_cocacola_score_overall.clj:42-86): monthly fact → collect-kv →
    * month-axis lag deltas → tr-dimension-metrics pair-tree JSON per
    * selector. `fact` must carry groupCols + dtCol(yyyy-MM-dd month-end)
    * + valCol(string-formatted decimal). */
  def slidingScoreReport(fact: DataFrame, groupCols: Seq[String],
                         dtCol: String, valCol: String, axisStart: String,
                         axisEnd: String,
                         metrics: Seq[(String, Column)]): DataFrame = {
    val sliding = Relational.slidingScores(fact, groupCols, dtCol, valCol,
      axisStart, axisEnd)
    Relational.reportShape(sliding, groupCols, Seq("dt"), metrics)
  }

  /** Share-of-voice with an "Others" remainder row
    * (m_cocacola_sovi_brand.clj:46-48: Others = 100 − Σ brand shares).
    * Shares in integer milli-percent so the remainder is exact at any
    * scale (no float accumulation). */
  def shareWithOthers(df: DataFrame, groupCol: String, brandCol: String):
      DataFrame = {
    val counts = df.groupBy(col(groupCol), col(brandCol))
      .agg(count(lit(1)).as("cnt"))
    val totals = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("total"))
    val shares = counts.join(totals, Seq(groupCol))
      .select(col(groupCol), col(brandCol).as("brand"),
        expr("cnt * 100000 div total").as("share_milli"))
    val others = shares.groupBy(col(groupCol))
      .agg((lit(100000L) - sum(col("share_milli"))).as("share_milli"))
      .select(col(groupCol), lit("Others").as("brand"),
              col("share_milli"))
    shares.unionByName(others)
  }

  /** Ranking report (m_cocacola_score_top_bottom5_ranking.clj:83-98):
    * ships *all* rows with rank columns carried as data — ordering is
    * deferred to the serving layer, the sink stays an unordered
    * relation. Ranks are global but computed WITHOUT a single-partition
    * window: each direction is a distributed range-partitioned
    * row_number (Relational.globalRowNumber), so the operator survives
    * inputs far past report grain. */
  def withRankColumns(df: DataFrame, orderCol: Column,
                      tieBreak: Column, nPartitions: Int = 32): DataFrame = {
    val top = Relational.globalRowNumber(df,
      Seq(orderCol.desc, tieBreak.asc), "rank_top", nPartitions)
    Relational.globalRowNumber(top,
      Seq(orderCol.asc, tieBreak.asc), "rank_bottom", nPartitions)
      .withColumn("rank_top", col("rank_top").cast("int"))
      .withColumn("rank_bottom", col("rank_bottom").cast("int"))
  }
}
