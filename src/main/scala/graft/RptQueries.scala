package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Functions._
import graft.ops.Relational
import graft.rpt.Reports

/** Full report-pipeline probes — the composed shapes of the reference's
  * rpt jobs (sliding score report, share-with-Others, ranking report,
  * mlin denormalization), each oracle-checked end-to-end. */
object RptQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** The KPI config tree behind the opportunity/details reports —
    * driver-side, like the reference's conf.trgx_cocacola fetch
    * (trgx.clj:198-210 latest-trgx-kpi). Node keys carry their join id
    * in square brackets (`node->id`, trgx.clj:49); display text
    * deliberately differs from the score rows' code-item strings so the
    * tests prove the attach matches on the BRACKETED ID, not the label.
    * (cat, code, configKey) rows; two category roots. */
  private val kpiCats: Seq[(String, String, String)] = Seq(
    ("0_distribution", "1", "[1]Urgent KPI"),
    ("0_distribution", "2", "[2]High KPI"),
    ("1_execution", "3", "[3]Medium KPI"),
    ("1_execution", "4", "[4]Unspecified KPI"),
    ("1_execution", "5", "[5]Low KPI"))

  private lazy val kpiConfigTree: graft.trgx.Trgx.Tree =
    kpiCats.groupBy(_._1).view.mapValues(ls =>
      graft.trgx.TrgxNode(Map.empty,
        ls.map(l => l._3 -> graft.trgx.TrgxNode.empty).toMap)).toMap

  /** Shared synthetic score fact for the opportunity/details reports:
    * the reference reads model.d_cocacola_score (dw_dt, bg, bottler,
    * code, item, value, *_sort); here the same grain is derived from the
    * star schema. The *selector* carries the SORT columns, not the
    * display names — a reference quirk both compositions preserve
    * (m_cocacola_score_opportunity.clj:66). Built over [[starFact]]
    * so a family run's shared staged star serves these members too. */
  private def scoreFact(s: SparkSession, dir: String): DataFrame =
    starFact(s, dir)
      .select(
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dw_dt"),
        col("r_name").as("bg"),
        col("n_name").as("bottler"),
        concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
               lit("_"), col("r_name")).as("bg_sort"),
        concat(col("n_nationkey").cast("string"), lit("_"), col("n_name"))
          .as("bottler_sort"),
        substring(col("o_orderpriority"), 1, 1).as("code"),
        col("o_orderpriority").as("item"),
        col("o_totalprice"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // nested tr-dimension-metrics (m_cocacola_anal_rep_kpis.clj:38-50):
    // an INNER {period→value} pair-tree JSON is embedded as a metric
    // value in an OUTER product pivot — aggregate-of-aggregate JSON,
    // string-escaped at the outer render like the reference's
    // pair-edn->json does to the inner EDN string
    "report_nested_kpis" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
                 col("o_orderpriority").as("prio"),
                 date_format(date_trunc("month", col("o_orderdate")),
                             "yyyy-MM-dd").as("mo"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
      val inner = monthly.groupBy("seg", "prio")
        .agg(graft.agg.Aggregators.trDimensionMetrics(
          array(concat_ws("=", lit("period"), col("mo"))),
          map(lit("value"), col("val"))).as("period_value"))
        .withColumn("c_sort", substring(col("prio"), 1, 1))
      Relational.reportShape(inner, Seq("seg"), Seq("prio"),
          Seq("c_sort" -> col("c_sort"),
              "period_value" -> col("period_value")))
        .orderBy("seg")
    }),

    // deep-dive shape (m_cocacola_gt_score_deep_dive.clj:36-48): the
    // get-item-json-string payload sits in the dimension KEY position
    // of tr-dimension-metrics [:item :period] — the key's embedded
    // quotes/braces must survive the outer pair-edn->json escape
    "report_deep_dive" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
                 col("o_orderpriority").as("prio"),
                 date_format(date_trunc("month", col("o_orderdate")),
                             "yyyy-MM-dd").as("period"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
        .withColumn("item",
          concat(lit("{\"item_name\":\""), col("prio"),
                 lit("\",\"c_sort\":"), substring(col("prio"), 1, 1),
                 lit("}")))
      Relational.reportShape(m, Seq("seg"), Seq("item", "period"),
          Seq("value" -> col("val")))
        .orderBy("seg")
    }),

    // gt_rural_bg's totals-row selector, verbatim
    // (m_cocacola_score_gt_rural_bg.clj:65): the UTF-8 suffix regex
    // `\S*全体$|\S*全国总体$` picks the aggregate rows by NAME — a
    // load-bearing business constant, exercised here unanchored-find
    // style exactly as `re-find` applies it
    "report_rural_totals_filter" -> ((s, dir) => {
      val totals = Seq("China Total / 全国总体", "SBL Total / 全体",
        "CBL Total / 全体", "BIG Total / 全体", "Zhuhai Total / 全体")
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .select(when(col("n_nationkey") < 5,
            element_at(array(totals.map(lit): _*),
              col("n_nationkey").cast("int") + 1))
          .otherwise(col("n_name")).as("bottler"))
        .filter(col("bottler").rlike("\\S*全体$|\\S*全国总体$"))
        .groupBy("bottler").agg(count(lit(1)).as("cnt"))
        .orderBy("bottler")
    }),

    // the flagship score_overall pipeline end-to-end
    // (m_cocacola_score_overall.clj:42-86)
    "report_score_overall" -> ((s, dir) => {
      val m = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
                 date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
                   .as("dt"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
      val rng = m.agg(min("dt"), max("dt")).first()
      Reports.slidingScoreReport(m, Seq("seg"), "dt", "val",
          rng.getString(0), rng.getString(1),
          Seq("score" -> col("value")))
        .orderBy("seg")
    }),

    // share-of-voice with exact "Others" remainder
    // (m_cocacola_sovi_brand.clj:46-48)
    "report_share_others" -> ((s, dir) =>
      Reports.shareWithOthers(
          t(s, dir, "customer")
            .join(broadcast(t(s, dir, "nation")),
                  col("c_nationkey") === col("n_nationkey")),
          "c_mktsegment", "n_name")
        .orderBy("c_mktsegment", "brand")),

    // ranking report: all rows shipped with rank sort-keys as data
    // (m_cocacola_score_top_bottom5_ranking.clj:83-98)
    "report_ranking" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("revenue"))
      Reports.withRankColumns(base, col("revenue"), col("n_name"))
        .withColumn("revenue", col("revenue").cast("string"))
        .orderBy("n_name")
    }),

    // the concrete channel report with the reference's verbatim UTF-8
    // constants (m_cocacola_score_channel.clj:72-79): (not !code),
    // split-first kpi + 产品铺货率→产品铺货 remap, ^全体$ kpi filter,
    // "Total / 所有渠道" channel exclusion, and the three bottler
    // exclusion regexes (\S*区域$ / \S*辽宁$ / Tier\d). The score-table
    // shape is synthesized from the star schema with those constants
    // injected so every filter provably keeps AND drops rows.
    "report_score_channel" -> ((s, dir) => {
      val base = starFact(s, dir)
      val fact = base.select(
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dw_dt"),
        col("r_name").as("bg"),
        when(col("n_nationkey") % 7 === 0, concat(col("n_name"), lit("区域")))
          .when(col("n_nationkey") % 7 === 1,
                concat(col("n_name"), lit("辽宁")))
          .when(col("n_nationkey") % 7 === 2,
                concat(lit("Tier"), (col("n_nationkey") % 3 + 1)
                  .cast("string")))
          .otherwise(col("n_name")).as("bottler"),
        when(col("c_mktsegment") === "MACHINERY", lit("Total / 所有渠道"))
          .otherwise(col("c_mktsegment")).as("channel"),
        when(col("o_orderkey") % 10 === 0, lit("X"))
          .otherwise(lit(null).cast("string")).as("code"),
        // exactly one item survives the kpi filter per group (the
        // reference's score table carries one 全体 item per grain; two
        // surviving items would race in the last-write-wins dim path)
        when(col("o_orderpriority") === "1-URGENT", lit("单品分销-整体"))
          .when(col("o_orderpriority") === "2-HIGH", lit("产品铺货率-整体"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("全体"))
          .otherwise(lit("冰柜纯净度-纯净度")).as("item"),
        col("o_totalprice"))
      val m = fact
        .groupBy("bg", "bottler", "channel", "code", "item", "dw_dt")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
      val rng = m.agg(min("dw_dt"), max("dw_dt")).first()
      val sliding = Relational.slidingScores(m,
        Seq("bg", "bottler", "channel", "code", "item"), "dw_dt", "val",
        rng.getString(0), rng.getString(1))
      val kpi0 = element_at(split(col("item"), "-"), 1)
      val filtered = sliding
        .filter(col("code").isNull) // (not !code)
        .withColumn("kpi",
          when(kpi0 === "产品铺货率", lit("产品铺货")).otherwise(kpi0))
        .filter(col("kpi").rlike("^全体$"))
        .filter(col("channel") =!= "Total / 所有渠道")
        .filter(!col("bottler").rlike("\\S*区域$") &&
                !col("bottler").rlike("\\S*辽宁$") &&
                !col("bottler").rlike("Tier\\d"))
      val withSel = filtered.withColumn("selector",
        concat(lit("[\"period="), col("dt"), lit("\",\"bg="), col("bg"),
               lit("\",\"bottler="), col("bottler"), lit("\"]")))
      Relational.reportShape(withSel.withColumnRenamed("dt", "dw_dt"),
          Seq("dw_dt", "selector"), Seq("channel"),
          Seq("score" -> col("value"),
              "pp_score" -> col("prev_mom"),
              "vs_pp_score" -> col("delta_mom"),
              "last_dec_score" -> col("prev_ytd"),
              "vs_last_dec_score" -> col("delta_ytd"),
              "last_year_same_month_score" -> col("prev_yoy"),
              "vs_last_year_same_month_score" -> col("delta_yoy")))
        .withColumnRenamed("report", "dimension_metrics")
        .select(col("dw_dt"), lit("cocacola").as("project"),
                lit("score").as("category"), lit("channel").as("report"),
                col("selector"), lit("").as("selector_desc"),
                col("dimension_metrics"))
        .orderBy("dw_dt", "selector")
    }),

    // three constants-only instantiations of the sliding family
    // (Reports.slidingSelectorReport scaladoc): each reference job
    // below differs from the covered score_channel shape only in its
    // verbatim constants — filters, selector keys, dims, metrics.

    // m_cocacola_sku6_bottler.clj:64-74: bottler != "Total",
    // sku_type == "6 SKU", selector [period, channel=channel_sort],
    // dims [bg, bottler], metrics = 7 sliding + abbr(bottler_sort)
    "report_sku6_bottler" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(skuFactCols: _*),
        Seq("bg", "bottler", "bottler_sort", "channel", "channel_sort",
            "sku_type"))
      Reports.slidingSelectorReport(m,
          Seq("bg", "bottler", "bottler_sort", "channel",
              "channel_sort", "sku_type"), "dw_dt", "val",
          rowFilter = col("bottler") =!= "Total" &&
            col("sku_type") === "6 SKU",
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("bg", "bottler"),
          metrics = slidingMetrics7 :+ ("abbr" -> col("bottler_sort")),
          "cocacola", "score", "sku6_bottler")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_sku6_bg.clj:61-69 — sku6_bottler's EXACT sibling with
    // the inverse bottler filter (= ?bottler "Total"): the per-BG
    // rollup keeps only the Total rows the bottler report drops, and
    // the dim tree flattens to one level [:bg]
    "report_sku6_bg" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(skuFactCols: _*),
        Seq("bg", "bottler", "bottler_sort", "channel", "channel_sort",
            "sku_type"))
      Reports.slidingSelectorReport(m,
          Seq("bg", "bottler", "bottler_sort", "channel",
              "channel_sort", "sku_type"), "dw_dt", "val",
          rowFilter = col("bottler") === "Total" &&
            col("sku_type") === "6 SKU",
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("bg"),
          metrics = slidingMetrics7,
          "cocacola", "score", "sku6_bg")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_cooler_brand.clj:61-68 — activation_brand's exact
    // sibling: same market filter, same 4-key selector, dim key
    // renamed to cooler_type with its own type constants
    "report_cooler_brand" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit("OPEN_TOP")).otherwise(lit("CLOSED")).as("cooler_type"),
          concat(lit("Brand-"), col("o_orderstatus")).as("brand")): _*),
        sparkMarketKeys ++ Seq("cooler_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("cooler_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d"),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("cooler_type", "brand"),
          metrics = slidingMetrics7,
          "cocacola", "score", "cooler_brand")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_sovi_period_trend.clj:68-79 — the availability trend
    // shape over the SOVI share fact: pinned 9999-12-31 dw_dt, market
    // filter, (= ?brand "KO") filter, kpi "SOVI", juice_sovi_type =
    // juice "_" sovi concat, dims [bottler=bottler_sort, period].
    // The reference's Others-remainder injection (its score-brand
    // pre-stage, the shareWithOthers pattern) is OUTPUT-DEAD here:
    // the (= ?brand "KO") filter can only keep original KO rows, and
    // injecting Others never creates one — elided, documented.
    "report_sovi_period_trend" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          concat(lit("J"), (col("o_orderkey") % 2).cast("string"),
            lit("_"), col("o_orderstatus")).as("juice_sovi_type"),
          when(col("o_orderpriority") === "1-URGENT", lit("KO"))
            .otherwise(concat(lit("Brand-"), col("o_orderstatus")))
            .as("brand")): _*),
        sparkMarketKeys ++ Seq("juice_sovi_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("juice_sovi_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d") &&
            col("brand") === "KO",
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel_sort"),
              lit("\",\"kpi=SOVI\",\"juice_sovi_type="),
              col("juice_sovi_type"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "period" -> col("dt"),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("bottler", "period"),
          metrics = ("bg" -> col("bg")) +: slidingMetrics7,
          "cocacola", "score", "sovi_period_trend")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_activation_brand.clj:62-70: (not (re-find
    // #"^China Tier\d" market)), selector [period, bg=bg_sort,
    // bottler=bottler_sort, channel=channel_sort],
    // dims [activation_type, brand], the 7 sliding metrics
    "report_activation_brand" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit("PURITY")).otherwise(lit("CHARGING"))
            .as("activation_type"),
          concat(lit("Brand-"), col("o_orderstatus")).as("brand")): _*),
        sparkMarketKeys ++ Seq("activation_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("activation_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d"),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("activation_type", "brand"),
          metrics = slidingMetrics7,
          "cocacola", "score", "activation_brand")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_availability_period_trend.clj:60-70: dw-dt PINNED to
    // "9999-12-31", the market filter, sku_type = sku "_" sku_detail,
    // selector [channel=channel_sort, kpi="AVAILABILITY", sku_type,
    // bottler=bottler_sort], dims [bottler=bottler_sort, period=dt],
    // metrics = bg + the 7 sliding scores
    "report_availability_period_trend" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          concat(lit("S"), (col("o_orderkey") % 3).cast("string"),
            lit("_"), col("o_orderstatus")).as("sku_type")): _*),
        sparkMarketKeys :+ "sku_type")
      Reports.slidingSelectorReport(m,
          sparkMarketKeys :+ "sku_type", "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d"),
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel_sort"),
              lit("\",\"kpi=AVAILABILITY\",\"sku_type="), col("sku_type"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            // dim VALUES are the sort key and the source month
            // (tr-dimension-metrics [:bottler :period] ?bottler_sort
            // ?src-dw-dt — the reference renders the SORT as the key)
            "period" -> col("dt"),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("bottler", "period"),
          metrics = ("bg" -> col("bg")) +: slidingMetrics7,
          "cocacola", "score", "availability_period_trend")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_skus.clj:61-67: the sku tap with NO row filter —
    // every (bottler incl. Total, sku_type incl. ALL SKU) row reports;
    // selector 4-key, one-level [sku_type] dims, abbr carries the
    // bottler sort
    "report_skus" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(skuFactCols: _*),
        Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
            "channel_sort", "sku_type"))
      Reports.slidingSelectorReport(m,
          Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
              "channel_sort", "sku_type"), "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("sku_type"),
          metrics = slidingMetrics7 :+ ("abbr" -> col("bottler_sort")),
          "cocacola", "score", "skus")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_sku6_period_bg.clj:62-70: pinned 9999-12-31 dw_dt,
    // the Total+6-SKU filters, the verbatim `button=test` selector
    // pair, dims [period, bg], abbr = the (constant) Total sort
    "report_sku6_period_bg" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(skuFactCols: _*),
        Seq("bg", "bottler", "bottler_sort", "channel", "channel_sort",
            "sku_type"))
      Reports.slidingSelectorReport(m,
          Seq("bg", "bottler", "bottler_sort", "channel",
              "channel_sort", "sku_type"), "dw_dt", "val",
          rowFilter = col("bottler") === "Total" &&
            col("sku_type") === "6 SKU",
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel_sort"),
              lit("\",\"button=test\"]")),
            "period" -> col("dt"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("period", "bg"),
          metrics = slidingMetrics7 :+ ("abbr" -> col("bottler_sort")),
          "cocacola", "score", "sku6_period_bg")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_activation_period_trend.clj:63-72: the trend shape
    // over the activation tap — KO-brand filter, kpi "ACTIVATION",
    // activation_type in the selector, dims [bottler=sort, period]
    "report_activation_period_trend" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit("PURITY")).otherwise(lit("CHARGING"))
            .as("activation_type"),
          when(col("o_orderpriority") === "1-URGENT", lit("KO"))
            .otherwise(concat(lit("Brand-"), col("o_orderstatus")))
            .as("brand")): _*),
        sparkMarketKeys ++ Seq("activation_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("activation_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d") &&
            col("brand") === "KO",
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel_sort"),
              lit("\",\"kpi=ACTIVATION\",\"activation_type="),
              col("activation_type"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "period" -> col("dt"),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("bottler", "period"),
          metrics = ("bg" -> col("bg")) +: slidingMetrics7,
          "cocacola", "score", "activation_period_trend")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_cooler_period_trend.clj:63-72: same trend shape over
    // the cooler tap — kpi "COOLER", cooler_type in the selector
    "report_cooler_period_trend" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit("OPEN_TOP")).otherwise(lit("CLOSED")).as("cooler_type"),
          when(col("o_orderpriority") === "1-URGENT", lit("KO"))
            .otherwise(concat(lit("Brand-"), col("o_orderstatus")))
            .as("brand")): _*),
        sparkMarketKeys ++ Seq("cooler_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("cooler_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d") &&
            col("brand") === "KO",
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel_sort"),
              lit("\",\"kpi=COOLER\",\"cooler_type="),
              col("cooler_type"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "period" -> col("dt"),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("bottler", "period"),
          metrics = ("bg" -> col("bg")) +: slidingMetrics7,
          "cocacola", "score", "cooler_period_trend")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_activation_sub_brand.clj:63-70 — report field
    // "activation_brand_sub" (the reference's own name/file mismatch,
    // preserved verbatim): brand != "KB" filter, THREE-level dims
    // [activation_type, activation_type_sub, brand]
    "report_activation_sub_brand" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit("PURITY")).otherwise(lit("CHARGING"))
            .as("activation_type"),
          concat(
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              lit("PURITY")).otherwise(lit("CHARGING")),
            lit("/"), (col("o_orderkey") % 2).cast("string"))
            .as("activation_type_sub"),
          when(col("o_orderstatus") === "F", lit("KB"))
            .otherwise(concat(lit("Brand-"), col("o_orderstatus")))
            .as("brand")): _*),
        sparkMarketKeys ++ Seq("activation_type", "activation_type_sub",
          "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("activation_type",
            "activation_type_sub", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d") &&
            col("brand") =!= "KB",
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("activation_type", "activation_type_sub",
            "brand"),
          metrics = slidingMetrics7,
          "cocacola", "score", "activation_brand_sub")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_sovi_period_trend6.clj:64-73: sovi_type == "Total"
    // filter, selector WITHOUT period [bg, bottler, channel],
    // FOUR-level dims [period, brand, juice_type, sovi_type]
    "report_sovi_period_trend6" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          concat(lit("J"), (col("o_orderkey") % 2).cast("string"))
            .as("juice_type"),
          when(col("o_orderstatus") === "O", lit("Total"))
            .otherwise(concat(lit("Sub-"), col("o_orderstatus")))
            .as("sovi_type"),
          when(col("o_orderpriority") === "1-URGENT", lit("KO"))
            .otherwise(concat(lit("Brand-"), col("o_orderstatus")))
            .as("brand")): _*),
        sparkMarketKeys ++ Seq("juice_type", "sovi_type", "brand"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("juice_type", "sovi_type", "brand"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d") &&
            col("sovi_type") === "Total",
          derive = Seq(
            "selector" -> concat(lit("[\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "period" -> col("dt"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("period", "brand", "juice_type", "sovi_type"),
          metrics = slidingMetrics7,
          "cocacola", "score", "sovi_period_trend6")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_availability_brand.clj:62-69: 2-level [sku,
    // sku_detail] dims whose leaves ALSO carry the group's brand and
    // order attributes as metrics (both group-constant tap columns)
    "report_availability_brand" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(marketFactCols ++ Seq(
          concat(lit("S"), (col("o_orderkey") % 3).cast("string"))
            .as("sku"),
          col("o_orderstatus").as("sku_detail"),
          when(col("o_orderkey") % 3 === 0, lit("KO"))
            .otherwise(concat(lit("B"),
              (col("o_orderkey") % 3).cast("string"))).as("brand"),
          ascii(substring(col("o_orderstatus"), 1, 1)).as("n_ord")): _*),
        sparkMarketKeys ++ Seq("sku", "sku_detail", "brand", "n_ord"))
      Reports.slidingSelectorReport(m,
          sparkMarketKeys ++ Seq("sku", "sku_detail", "brand", "n_ord"),
          "dw_dt", "val",
          rowFilter = !col("market").rlike("^China Tier\\d"),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"),
              lit("\",\"channel="), col("channel_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("sku", "sku_detail"),
          metrics = slidingMetrics7 ++ Seq("brand" -> col("brand"),
            "order" -> col("n_ord")),
          "cocacola", "score", "availability_brand")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_by_bg.clj:35-42 / m_cocacola_score_tier.clj:
    // 35-42 — NOT sliding: a straight pivot of the score tap (pinned
    // dw_dt, (not !code) filter, [bg, bottler, period] dims with ONE
    // score metric); the two files are byte-twins except the report
    // name and the selector's second key (kpi vs facts)
    "report_by_bg" -> ((s, dir) =>
      scorePivotReport(s, dir, "kpi", "report_by_bg")),
    "report_bottler_tier" -> ((s, dir) =>
      scorePivotReport(s, dir, "facts", "by_bottler_tier")),

    // m_cocacola_score_kpi.clj:59-71: the score tap sliced to the
    // Total / 所有渠道 channel, 全体 kpi EXCLUDED, the three bottler
    // exclusion regexes; dims [kpi]. The filters are row predicates of
    // the synthesized tap and apply pre-aggregation (the oracle's m
    // WHERE), exactly as report_score_channel established.
    "report_score_kpi" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(scoreTapFactCols: _*)
          .filter(col("code").isNull &&
            col("channel") === "Total / 所有渠道" &&
            col("kpi") =!= "全体" && bottlerKept),
        scoreTapKeys)
      Reports.slidingSelectorReport(m, scoreTapKeys, "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("kpi"),
          metrics = slidingMetrics7,
          "cocacola", "score", "kpi")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_kpi_bg.clj:59-70: kpi sibling WITHOUT the 全体
    // exclusion, two-level [kpi, bottler=sort] dims, selector drops bg
    "report_score_kpi_bg" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(scoreTapFactCols: _*)
          .filter(col("code").isNull &&
            col("channel") === "Total / 所有渠道" && bottlerKept),
        scoreTapKeys)
      Reports.slidingSelectorReport(m, scoreTapKeys, "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> col("dt")),
          dimCols = Seq("kpi", "bottler"),
          metrics = slidingMetrics7,
          "cocacola", "score", "kpi_bg")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_channel_bg.clj:59-70: the ^全体$ kpi slice
    // across ALL channels, dims [channel, bottler=sort]
    "report_score_channel_bg" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(scoreTapFactCols: _*)
          .filter(col("code").isNull &&
            col("kpi").rlike("^全体$") && bottlerKept),
        scoreTapKeys)
      Reports.slidingSelectorReport(m, scoreTapKeys, "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "bottler" -> col("bottler_sort"),
            "dw_dt" -> col("dt")),
          dimCols = Seq("channel", "bottler"),
          metrics = slidingMetrics7,
          "cocacola", "score", "channel_bg")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_gt_rural.clj:62-70 — report field "GT_Rural"
    // (verbatim capitalization): the rural score tap with the
    // 全体/全国总体 totals-row EXCLUSION (the exact complement of
    // report_rural_totals_filter's keep set — Cascalog's nil-to-?var
    // mapfn drops the tuple), `button=test` selector, abbr metric
    "report_score_gt_rural" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("dw_dt"),
          col("r_name").as("bg"),
          when(col("n_nationkey") < 5,
            element_at(array(Seq("China Total / 全国总体",
              "SBL Total / 全体", "CBL Total / 全体", "BIG Total / 全体",
              "Zhuhai Total / 全体").map(lit): _*),
              col("n_nationkey").cast("int") + 1))
            .otherwise(col("n_name")).as("bottler"),
          concat(lit("A_"), col("n_nationkey").cast("string"))
            .as("abbr"),
          col("o_totalprice"))
          .filter(!col("bottler").rlike("\\S*全体$") &&
            !col("bottler").rlike("\\S*全国总体$")),
        Seq("bg", "bottler", "abbr"))
      Reports.slidingSelectorReport(m, Seq("bg", "bottler", "abbr"),
          "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"button=test\"]")),
            "dw_dt" -> col("dt")),
          dimCols = Seq("bg", "bottler"),
          metrics = ("abbr" -> col("abbr")) +: slidingMetrics7,
          "cocacola", "score", "GT_Rural")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_gt_rural_period_bg.clj:62-70 — "GT_Rural_
    // period_bg": the rural trend slice that KEEPS only the totals
    // rows gt_rural excludes (the inverse suffix regex, a keep-filter
    // this time), pinned dw_dt, dims [period, bg], channel-value
    // selector. The synthesized tap aggregates the per-bg totals rows
    // to one row per (bg, channel, month) so the pair-tree write is
    // deterministic (a bg can hold several totals bottlers here).
    "report_score_gt_rural_period_bg" -> ((s, dir) => {
      val m = monthAgg(starFact(s, dir).select(
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("dw_dt"),
          col("r_name").as("bg"),
          when(col("n_nationkey") < 5,
            element_at(array(Seq("China Total / 全国总体",
              "SBL Total / 全体", "CBL Total / 全体", "BIG Total / 全体",
              "Zhuhai Total / 全体").map(lit): _*),
              col("n_nationkey").cast("int") + 1))
            .otherwise(col("n_name")).as("bottler"),
          col("c_mktsegment").as("channel"),
          col("o_totalprice"))
          .filter(col("bottler").rlike("\\S*全体$|\\S*全国总体$")),
        Seq("bg", "channel"))
      Reports.slidingSelectorReport(m, Seq("bg", "channel"),
          "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"channel="), col("channel"),
              lit("\",\"button=test\"]")),
            "period" -> col("dt"),
            "dw_dt" -> lit("9999-12-31")),
          dimCols = Seq("period", "bg"),
          metrics = slidingMetrics7,
          "cocacola", "score", "GT_Rural_period_bg")
        .orderBy("dw_dt", "selector")
    }),

    // m_cocacola_score_period.clj:59-95 — the trgx composition
    // (kv->trgx attach → take-last 3 → split-at 4 → PATH/SUBTREE →
    // pad 4 "TOTAL"): its net effect is the periodPathConfig node-id
    // lookup (the tree ops themselves are pinned by trgx_tree_ops /
    // report_opportunity); then the verbatim path filters, the
    // 全体-Total kpi split-first remap, dims [bottler=sort, period],
    // the 7-metric leaf incl. the config's c_total_score/c_weight and
    // the group's numeric max_value, pinned dw_dt
    "report_score_period" -> ((s, dir) => {
      val joined = periodSliding(s, dir)
        .withColumn("selector",
          concat(lit("[\"channel="), col("cfg_channel"),
            lit("\",\"kpi="), col("kpis"),
            lit("\",\"metrics="), col("cfg_metrics"),
            lit("\",\"bottler="), col("bottler_sort"), lit("\"]")))
        .withColumn("dw_dt", lit("9999-12-31"))
        .withColumn("period", col("dt"))
        .withColumn("bottler", col("bottler_sort"))
      reportWrap(Relational.reportShape(joined, Seq("dw_dt", "selector"),
        Seq("bottler", "period"), periodMetrics), "period")
    }),

    // m_cocacola_score_period_months.clj:71-105 — same composition,
    // selector [bg, bottler, channel, kpi, metrics], dims
    // [year=substr(dt,1,4), period]
    "report_score_period_months" -> ((s, dir) => {
      val joined = periodSliding(s, dir)
        .withColumn("selector",
          concat(lit("[\"bg="), col("bg_sort"),
            lit("\",\"bottler="), col("bottler_sort"),
            lit("\",\"channel="), col("cfg_channel"),
            lit("\",\"kpi="), col("kpis"),
            lit("\",\"metrics="), col("cfg_metrics"), lit("\"]")))
        .withColumn("dw_dt", lit("9999-12-31"))
        .withColumn("year", substring(col("dt"), 1, 4))
        .withColumn("period", col("dt"))
      reportWrap(Relational.reportShape(joined, Seq("dw_dt", "selector"),
        Seq("year", "period"), periodMetrics), "period_months")
    }),

    // m_cocacola_score_bottler_ranking.clj:63-85 — same composition,
    // NOT pinned (dw_dt = the axis month), dims [bg=bg_sort,
    // bottler=NAME], metrics drop the yoy lag and add abbr
    "report_score_bottler_ranking" -> ((s, dir) => {
      val joined = periodSliding(s, dir)
        .withColumn("selector",
          concat(lit("[\"period="), col("dt"),
            lit("\",\"channel="), col("cfg_channel"),
            lit("\",\"kpi="), col("kpis"),
            lit("\",\"metrics="), col("cfg_metrics"), lit("\"]")))
        .withColumn("dw_dt", col("dt"))
        .withColumn("bg", col("bg_sort"))
      reportWrap(Relational.reportShape(joined, Seq("dw_dt", "selector"),
        Seq("bg", "bottler"),
        Seq("c_total_score" -> col("c_total_score"),
          "c_weight" -> col("c_weight"),
          "value" -> col("value"),
          "pp_value" -> col("prev_mom"),
          "last_dec_value" -> col("prev_ytd"),
          "abbr" -> col("bottler_sort"))), "bottler_ranking")
    }),

    // m_cocacola_score_channel_metrics_opportunity.clj:65-78 — the
    // latest-trgx-kpi composition (leaf-trunc 1 → (channel, metrics)
    // paths, nullable abbreviation in the node DATA, the verbatim
    // hyphenated `last-dec-value` metric key), dims [metrics],
    // selector [period, bg, bottler]
    "report_channel_metrics_opportunity" -> ((s, dir) => {
      val cfg = {
        import s.implicits._
        cmPathConfig.map(r => (r._1, r._2, r._3, r._4.orNull, r._5,
            r._6))
          .toDF("code", "cm_channel", "cm_metrics", "abbreviation",
            "c_total_score", "c_weight")
      }
      val joined = scoreSlidingWithCfg(s, dir, cfg, "rpt_cm")
        .withColumn("selector",
          concat(lit("[\"period="), col("dt"),
            lit("\",\"bg="), col("bg_sort"),
            lit("\",\"bottler="), col("bottler_sort"), lit("\"]")))
        .withColumn("dw_dt", col("dt"))
        .withColumn("metrics", col("cm_metrics"))
      reportWrap(Relational.reportShape(joined, Seq("dw_dt", "selector"),
          Seq("metrics"),
          Seq("channel" -> col("cm_channel"),
            "c_total_score" -> col("c_total_score"),
            "c_weight" -> col("c_weight"),
            "abbreviation" -> col("abbreviation"),
            "value" -> col("value"),
            "pp_value" -> col("prev_mom"),
            "last-dec-value" -> col("prev_ytd"))),
        "channel_metrics_opportunity")
    }),

    // gt_score_deep_dive_with_ko / without_ko — two TABLES, one
    // pipeline (deepDiveKoReport scaladoc)
    "report_deep_dive_with_ko" -> ((s, dir) =>
      deepDiveKoReport(s, dir, "gt_score_deep_dive_with_ko",
        withKo = true)),
    "report_deep_dive_without_ko" -> ((s, dir) =>
      deepDiveKoReport(s, dir, "gt_score_deep_dive_without_ko",
        withKo = false)),

    // m_cocacola_availability_rural.clj:55-62 — report field
    // "Availability_Rural" (verbatim): no filters, THREE-level dims
    // [product_group, product=item, channel]
    "report_availability_rural" -> ((s, dir) => {
      val m = monthAgg(starFactEndToEnd(s, dir).select(
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("dw_dt"),
          col("r_name").as("bg"),
          concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
            lit("_"), col("r_name")).as("bg_sort"),
          col("n_name").as("bottler"),
          concat(col("n_nationkey").cast("string"), lit("_"),
            col("n_name")).as("bottler_sort"),
          col("c_mktsegment").as("channel"),
          concat(lit("PG"), (col("o_orderkey") % 2).cast("string"))
            .as("product_group"),
          concat(lit("P-"), col("o_orderpriority")).as("item"),
          col("o_totalprice")),
        Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
            "product_group", "item"))
      Reports.slidingSelectorReport(m,
          Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
              "product_group", "item"), "dw_dt", "val",
          rowFilter = lit(true),
          derive = Seq(
            "selector" -> concat(lit("[\"period="), col("dt"),
              lit("\",\"bg="), col("bg_sort"),
              lit("\",\"bottler="), col("bottler_sort"), lit("\"]")),
            "product" -> col("item"),
            "dw_dt" -> col("dt")),
          dimCols = Seq("product_group", "product", "channel"),
          metrics = slidingMetrics7,
          "cocacola", "score", "Availability_Rural")
        .orderBy("dw_dt", "selector")
    }),

    // the achievement-rate per-grain pair
    // (m_cocacola_score_achievement_rate.clj:43-64): two queries into
    // one sink — the base grain plus the bg-all variant that keeps only
    // the five verbatim Total bottlers and rebinds the bg selector to
    // the literal "0.2_BGs"; sentinel dw_dt 9999-12-31; 2-level
    // [:bottler :period] dimension path with 3 metrics.
    "report_achievement_rate" -> ((s, dir) => {
      val totals = Seq("China Total / 全国总体", "SBL Total / 全体",
        "CBL Total / 全体", "BIG Total / 全体", "Zhuhai Total / 全体")
      val base = starFact(s, dir)
        .select(
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("period"),
          col("r_name").as("bg"),
          when(col("n_nationkey") < 5,
            element_at(array(totals.map(lit): _*),
              col("n_nationkey").cast("int") + 1))
            .otherwise(col("n_name")).as("bottler"),
          col("c_mktsegment").as("channel"),
          col("o_orderpriority").as("item"),
          col("o_totalprice"), col("o_custkey"))
      // both grains reshape this aggregate; Catalyst's ReuseExchange
      // already shares its shuffle between them (persisting it was
      // measured SLOWER — cache-write overhead for no saved work)
      val m = base.groupBy("bg", "bottler", "channel", "item", "period")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
               .cast("decimal(38,2)").cast("string").as("value"),
             count(lit(1)).cast("string").as("c_total_score"),
             countDistinct(col("o_custkey")).cast("string").as("c_weight"))
      def shape(df: DataFrame, selBg: org.apache.spark.sql.Column) =
        Relational.reportShape(
          df.withColumn("selector",
            concat(lit("[\"bg="), selBg, lit("\",\"channel="),
                   col("channel"), lit("\",\"kpi="), col("item"),
                   lit("\"]"))),
          Seq("selector"), Seq("bottler", "period"),
          Seq("c_total_score" -> col("c_total_score"),
              "c_weight" -> col("c_weight"),
              "value" -> col("value")))
      val g1 = shape(m, col("bg"))
      val g2 = shape(m.filter(col("bottler").isin(totals: _*)),
        lit("0.2_BGs"))
      g1.unionByName(g2)
        .withColumnRenamed("report", "dimension_metrics")
        .select(lit("9999-12-31").as("dw_dt"),
                lit("cocacola").as("project"), lit("score").as("category"),
                lit("achievement_rate").as("report"), col("selector"),
                lit("").as("selector_desc"), col("dimension_metrics"))
        .orderBy("selector")
    }),

    // core_sku shape: per-grain reports UNION-appended to one sink,
    // each shaped through tr-dimension-metrics
    // (m_cocacola_core_sku.clj:44-95)
    "report_core_sku" -> ((s, dir) => {
      val cn = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))
      val g1 = cn.groupBy(col("n_name").as("name"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("grain", lit("nation"))
      val g2 = cn.groupBy(col("r_name").as("name"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("grain", lit("region"))
      Relational.reportShape(g1.unionByName(g2),
          Seq("grain", "name"), Seq("seg"), Seq("cnt" -> col("cnt")))
        .orderBy("grain", "name")
    }),

    // tree-shaped KPI report (m_cocacola_score_period.clj:60-78 shape):
    // driver-side config tree, kv->trgx attaches per-leaf metrics,
    // canonical (sorted-key, DATA-then-CHILDREN) tree JSON per root —
    // which the oracle reconstructs with ordered string_agg.
    "report_tree_kpi" -> ((s, dir) => {
      import s.implicits._
      import graft.trgx.{Trgx, TrgxNode}
      val regionNations: Map[String, Seq[String]] =
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")),
                col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "n_name").collect()
          .map(r => (r.getString(0), r.getString(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val scores: Map[String, Map[String, String]] = {
        // driver-fetched leaf metrics, bounded by dimension cardinality
        // (the reference's config-tree pattern, trgx.clj:198-207) —
        // guard so a mis-grained input fails loudly instead of OOMing
        // the driver
        val rows = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
                col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("cnt"))
          .limit(100001).collect()
        require(rows.length <= 100000,
          "report_tree_kpi: score dimension exceeds the driver-side " +
            "config-tree bound — this report expects dimension-grain input")
        rows.map(r =>
          r.getString(0) -> Map("score" -> r.getLong(1).toString)).toMap
      }
      val rows = regionNations.toSeq.sortBy(_._1).map { case (region, ns) =>
        val config: Trgx.Tree = Map(region -> TrgxNode(Map.empty,
          ns.map(n => n -> TrgxNode.empty).toMap))
        (region, Trgx.toJson(Trgx.kvToTrgx(config, scores)))
      }
      rows.toDF("r_name", "kpi_tree")
    }),

    // the opportunity report composition, end-to-end
    // (m_cocacola_score_opportunity.clj:54-67): sliding scores per
    // (bg, bottler, code-item) → vars->kv 5-metric leaf map →
    // collect-kv per code-item → kv->trgx attach onto the KPI config
    // tree (matching on the bracketed node id, trgx.clj:49-55) →
    // tr-dimension-metrics [] [:trgx-data] wrap. The [] wrapper
    // collapses to a single-key object spliced INLINE (the reference
    // serializes the whole EDN structure once — the tree is never a
    // pre-rendered string at wrap time).
    // Scale: one shuffle to score grain, one to selector grain; the
    // collected kv per selector is config-bounded (≤ #KPIs entries),
    // and the config tree is driver-side like the reference's conf
    // fetch — nothing here grows with fact rows.
    "report_opportunity" -> ((s, dir) => {
      val m = scoreFact(s, dir)
        .groupBy("bg", "bottler", "bg_sort", "bottler_sort", "code",
                 "item", "dw_dt")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
      val rng = m.agg(min("dw_dt"), max("dw_dt")).first()
      val sliding = Relational.slidingScores(m,
        Seq("bg", "bottler", "bg_sort", "bottler_sort", "code", "item"),
        "dw_dt", "val", rng.getString(0), rng.getString(1))
      // vars->kv [:value :max_value :pp_value :last_dec_value
      // :last_year_same_month_score] — nil entries KEPT (cheshire
      // renders them as JSON null), unlike the reportShape leaves
      val leaf = map(
        lit("value"), col("value"),
        lit("max_value"), col("max_value").cast("string"),
        lit("pp_value"), col("prev_mom"),
        lit("last_dec_value"), col("prev_ytd"),
        lit("last_year_same_month_score"), col("prev_yoy"))
      val grouped = sliding
        .select(col("dt"), col("bg"), col("bottler"), col("bg_sort"),
          col("bottler_sort"),
          concat(lit("["), col("code"), lit("]"), col("item"))
            .as("code_item"),
          leaf.as("leaf"))
        .groupBy("dt", "bg", "bottler", "bg_sort", "bottler_sort")
        .agg(map_from_entries(
          collect_list(struct(col("code_item"), col("leaf")))).as("kv"))
      // cfg is a DRIVER-HELD config tree riding the UDF closure — the
      // intended contract (the reference fetches report config on the
      // driver too, m_cocacola_score_opportunity.clj:54). It is
      // config-bounded (KBs) and Spark ships closures to executors via
      // the broadcast mechanism already; rewriting this into a join
      // would shuffle the fact rows for nothing.
      val cfg = kpiConfigTree
      val attach = udf((kv: Map[String, Map[String, String]]) => {
        import graft.trgx.Trgx
        val byId = kv.map { case (k, v) => Trgx.nodeId(k) -> v }
        Trgx.toJson(Trgx.kvToTrgx(cfg, byId, Trgx.nodeId))
      })
      grouped.select(col("dt").as("dw_dt"),
          lit("cocacola").as("project"), lit("score").as("category"),
          lit("opportunity").as("report"),
          concat(lit("[\"period="), col("dt"), lit("\",\"bg="),
            col("bg_sort"), lit("\",\"bottler="), col("bottler_sort"),
            lit("\"]")).as("selector"),
          lit("").as("selector_desc"),
          concat(lit("{\"trgx-data\":"), attach(col("kv")), lit("}"))
            .as("dimension_metrics"))
        .orderBy("dw_dt", "selector")
    }),

    // the details report composition, end-to-end
    // (m_cocacola_score_details.clj:35-52): nested
    // tr-dimension-metrics [:period] [:value] per code-item →
    // vars->kv [:period_value] → collect-kv → kv->trgx attach →
    // identity dimension-metrics (no outer tdm wrap), sentinel dw_dt.
    // The nested pair-tree stays a STRUCTURE until the single final
    // serialize, so it splices inline under "period_value" (not
    // escaped as a string). Tree render here is ordered-aggregation
    // over the broadcast config grid — the Spark-native equivalent of
    // the reference's driver-side map walk; group sizes are bounded by
    // config cardinality, not fact rows.
    "report_details" -> ((s, dir) => {
      import s.implicits._
      val m0 = scoreFact(s, dir)
        .groupBy("bg", "bottler", "bg_sort", "bottler_sort", "code",
                 "item", "dw_dt")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val"))
        .groupBy("bg", "bottler", "bg_sort", "bottler_sort", "code",
                 "item")
        .agg(graft.agg.Aggregators.trDimensionMetrics(
          array(concat_ws("=", lit("period"), col("dw_dt"))),
          map(lit("value"), col("val"))).as("pv"))
      // report-grain m is tiny; stage it so BOTH consumers (the
      // selector-universe distinct and the grid join) read the staged
      // table — without this the selector side re-scans the whole fact
      // (column-pruned, but still a second 100 TB pass) just to
      // enumerate (bg, bottler) pairs. Lifetime owned by Tables.staged.
      val m = Tables.staged(m0, "rpt_details_m")
      val cfgDf = kpiCats.toDF("cat", "code", "cfg_key")
      val grid = m.select("bg", "bottler", "bg_sort", "bottler_sort")
        .distinct()
        .crossJoin(broadcast(cfgDf))
      val node = concat(lit("\""), col("cfg_key"), lit("\":{\"DATA\":"),
        when(col("pv").isNull, lit("{}"))
          .otherwise(concat(lit("{\"period_value\":"), col("pv"),
            lit("}"))),
        lit(",\"CHILDREN\":{}}"))
      val cats = grid
        .join(m.select("bg", "bottler", "code", "pv"),
          Seq("bg", "bottler", "code"), "left")
        .select(col("bg_sort"), col("bottler_sort"), col("cat"),
          node.as("node"))
        .groupBy("bg_sort", "bottler_sort", "cat")
        // sort_array, not array_sort: same ordering on these never-null
        // strings (collect_list drops nulls; they differ only on null
        // placement), but sort_array is codegen'd while array_sort is a
        // CodegenFallback HOF — these two renders were the family run's
        // last interpreted per-row expressions
        .agg(concat(lit("\""), col("cat"),
          lit("\":{\"DATA\":{},\"CHILDREN\":{"),
          array_join(sort_array(collect_list(col("node"))), ","),
          lit("}}")).as("catnode"))
      cats.groupBy("bg_sort", "bottler_sort")
        .agg(concat(lit("{"),
          array_join(sort_array(collect_list(col("catnode"))), ","),
          lit("}")).as("dimension_metrics"))
        .select(lit("9999-12-31").as("dw_dt"),
          lit("cocacola").as("project"), lit("score").as("category"),
          lit("details").as("report"),
          concat(lit("[\"bg="), col("bg_sort"), lit("\",\"bottler="),
            col("bottler_sort"), lit("\"]")).as("selector"),
          lit("").as("selector_desc"), col("dimension_metrics"))
        .orderBy("selector")
    }),

    // build-delta debut shape (model/d_bolome_order_show_debut.clj:60-76):
    // collect-set membership flag + sorted pay-date keys + first key +
    // conditional debut date, per entity
    "model_debut" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      val agg = o.groupBy(col("o_custkey").as("custkey"))
        .agg(
          sortKeys(graft.agg.Aggregators.collectKv(col("dt"),
            col("o_orderkey").cast("string"))).as("pay_dts_arr"),
          max(col("o_orderpriority") === "1-URGENT").cast("int")
            .as("exist_urgent"))
      agg.select(col("custkey"), col("exist_urgent"),
          array_join(col("pay_dts_arr"), "|").as("pay_dts"),
          element_at(col("pay_dts_arr"), 1).as("min_pay_dt"),
          cif(col("exist_urgent") === 1,
              prevLastDay(element_at(col("pay_dts_arr"), 1)),
              element_at(col("pay_dts_arr"), 1)).as("debut_dt"))
        .orderBy("custkey")
    }),

    // mlin denormalization: star join + flag encoders in one pass
    // (mlin/d_bolome_user_order.clj:73-92)
    "mlin_denormalize" -> ((s, dir) => {
      val df = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
              col("c_nationkey") === col("n_nationkey"))
      val segFlags = mark(col("c_mktsegment"),
        Seq("AUTOMOBILE", "BUILDING", "MACHINERY"))
      val cmp = compareMark(col("o_totalprice"), lit(150000.0))
      df.select(col("o_orderkey"), col("c_custkey"), col("n_name"),
          segFlags(0).cast("int").as("seg_auto"),
          segFlags(1).cast("int").as("seg_bld"),
          segFlags(2).cast("int").as("seg_mach"),
          cmp(0).cast("int").as("big_lt"), cmp(2).cast("int").as("big_gt"),
          cGtDefault(when(col("c_acctbal") < 0, lit(null))
            .otherwise(col("c_acctbal")), lit(5000.0)).cast("int")
            .as("rich"))
        .orderBy("o_orderkey")
    }),

    // the production family run as an oracle-checked probe: THREE
    // members (one per tap family: sku, score-tap, custom rural)
    // through runReportFamily — shared staged star, one sink append,
    // one next-dt bookkeeping pass; oracle = UNION ALL of the
    // members' own oracles (the family must change NOTHING about any
    // member's rows). The sink scratch dir is created OUTSIDE
    // runReportFamily's stagedScope so the returned frame survives it.
    "report_family_run" -> ((s, dir) => {
      val sink = graft.core.Tables.scratchDir(s, "family_sink")
      val (_, out) = runReportFamily(s, dir, sink, familyProbeMembers)
      out.orderBy("report", "dw_dt", "selector")
    }),

    // the FULL production deployment unit: all 31 family members in
    // ONE runReportFamily pass (the reference's cascalog.sh:37-120
    // serial loop), shared staged star, one sink append, one next-dt
    // pass. This is what a load window actually costs — the standing
    // bench number for the shared-star saving vs 31 standalone runs.
    // Ordered on every sink column so the positional oracle compare is
    // total even if (report, dw_dt, selector) ever ties.
    "report_family_full" -> ((s, dir) => {
      val sink = graft.core.Tables.scratchDir(s, "family_full_sink")
      val (_, out) = runReportFamily(s, dir, sink, familyNames)
      out.orderBy(graft.rpt.Reports.sinkColumns.map(col): _*)
    })
  )

  /** Spark-side shared star join for the sliding-family facts (every
    * report in the family synthesizes its score tap from the same
    * 4-table join, then differs only in derived columns). During a
    * family run ([[runReportFamily]]) this returns the ONE staged copy
    * instead of re-deriving the join per member — standalone query
    * runs see an empty cache and build their own. */
  private def starFact(s: SparkSession, dir: String): DataFrame = {
    val shared = sharedStar.get(dir)
    if (shared != null) shared
    else starMemo.synchronized {
      // standalone runs share the star through a MEMO table (the
      // LinkRanks discipline): the 4-table join is a deterministic
      // function of the sfDir's tables consumed by ~30 standalone
      // member queries — the first builds it into a memo dir, later
      // ones read the staged copy (byte-equal rows: a parquet round
      // trip, the same argument ReportFamilySpec pins for the family's
      // shared star). Lifetime owned by Tables.memoDir (clearMemo /
      // shutdown); existence revalidated before reuse.
      // report_availability_rural deliberately BYPASSES the memo
      // ([[starFactEndToEnd]]) — it remains the standing full-chain
      // member benchmark, the link_pagerank convention.
      def exists(p: String): Boolean = {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).exists(hp)
      }
      val schemaOf = buildStarFact(s, dir).schema
      starMemo.get(dir).filter(exists) match {
        case Some(p) => graft.core.Tables.readAsWritten(s, p, schemaOf)
        case None =>
          val p = graft.core.Tables.memoDir(s, "rpt_star")
          buildStarFact(s, dir).write.mode("overwrite").parquet(p)
          starMemo(dir) = p
          graft.core.Tables.readAsWritten(s, p, schemaOf)
      }
    }
  }

  /** Driver-side memo of the standalone-run star table, keyed by
    * sfDir — see [[starFact]]. */
  private val starMemo = scala.collection.mutable.HashMap[String, String]()

  /** The un-memoized standalone star — the full end-to-end chain for
    * the designated standing member benchmark (inside a family run the
    * shared staged star still applies). */
  private def starFactEndToEnd(s: SparkSession, dir: String): DataFrame = {
    val shared = sharedStar.get(dir)
    if (shared != null) shared else buildStarFact(s, dir)
  }

  private def buildStarFact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))

  /** Driver-side shared-fact registry for family runs, keyed by sfDir.
    * Populated only inside [[withSharedStar]]; the values are
    * Tables.staged frames (a parquet round-trip of the identical
    * rows), so a member's output is byte-equal either way —
    * ReportFamilySpec pins that. */
  private val sharedStar =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Stage the star fact once and let every [[starFact]] /
    * [[scoreFact]] call reuse it for the duration of `f`. */
  private[graft] def withSharedStar[T](s: SparkSession, dir: String)(
      f: => T): T = {
    val star = graft.core.Tables.staged(buildStarFact(s, dir),
      "rpt_family_star")
    sharedStar.put(dir, star)
    try f finally sharedStar.remove(dir)
  }

  /** The `ms.report`-sink family — the report jobs the reference's
    * cascalog.sh:37-120 loop runs per load window (every registered
    * report query whose output is the 7-column ms.report shape; the
    * non-member report_* probes cover sub-operators with their own
    * shapes). */
  private[graft] val familyNames: Seq[String] = Seq(
    "report_score_channel", "report_score_channel_bg",
    "report_score_kpi", "report_score_kpi_bg",
    "report_opportunity", "report_channel_metrics_opportunity",
    "report_score_bottler_ranking", "report_score_period",
    "report_score_period_months", "report_score_gt_rural",
    "report_score_gt_rural_period_bg", "report_skus",
    "report_sku6_bg", "report_sku6_bottler", "report_sku6_period_bg",
    "report_availability_brand", "report_availability_period_trend",
    "report_availability_rural", "report_sovi_period_trend",
    "report_sovi_period_trend6", "report_cooler_brand",
    "report_cooler_period_trend", "report_activation_period_trend",
    "report_activation_brand", "report_activation_sub_brand",
    "report_by_bg", "report_bottler_tier", "report_achievement_rate",
    "report_deep_dive_with_ko", "report_deep_dive_without_ko",
    "report_details")

  /** Members of the registered family probe — one per tap type. */
  private[graft] val familyProbeMembers: Seq[String] =
    Seq("report_sku6_bg", "report_score_kpi", "report_availability_rural")

  /** Run the report family the way production runs it
    * (Reports.runFamily scaladoc): shared star staged ONCE, all
    * members executed against it, one sink append, one next-dt
    * bookkeeping pass. `sinkPath` must be created OUTSIDE any
    * stagedScope if the caller reads it after this returns. */
  def runReportFamily(s: SparkSession, dir: String, sinkPath: String,
                      members: Seq[String] = familyNames)
      : ((String, String), DataFrame) = {
    require(!members.contains("report_family_run"),
      "the family probe cannot be its own member")
    graft.core.Tables.stagedScope {
      withSharedStar(s, dir) {
        Reports.runFamily(s,
          members.map(n => n -> (() => queries(n)(s, dir))), sinkPath)
      }
    }
  }

  /** Spark-side twins of [[skuBaseCols]] / [[marketBaseCols]] plus the
    * month-grain aggregation every sliding report starts from. */
  private def skuFactCols: Seq[org.apache.spark.sql.Column] = Seq(
    date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dw_dt"),
    col("r_name").as("bg"),
    concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
      lit("_"), col("r_name")).as("bg_sort"),
    when(col("n_nationkey") % 6 === 0, lit("Total"))
      .otherwise(col("n_name")).as("bottler"),
    when(col("n_nationkey") % 6 === 0, lit("99_Total"))
      .otherwise(concat(col("n_nationkey").cast("string"), lit("_"),
        col("n_name"))).as("bottler_sort"),
    col("c_mktsegment").as("channel"),
    ascii(substring(col("c_mktsegment"), 1, 1)).as("channel_sort"),
    when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
      lit("6 SKU")).otherwise(lit("ALL SKU")).as("sku_type"),
    col("o_totalprice"))

  private def marketFactCols: Seq[org.apache.spark.sql.Column] = Seq(
    date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dw_dt"),
    when(col("n_nationkey") % 5 === 0,
      concat(lit("China Tier"), (col("n_nationkey") % 3 + 1)
        .cast("string")))
      .otherwise(concat(col("n_name"), lit(" Market"))).as("market"),
    col("r_name").as("bg"),
    concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
      lit("_"), col("r_name")).as("bg_sort"),
    col("n_name").as("bottler"),
    concat(col("n_nationkey").cast("string"), lit("_"), col("n_name"))
      .as("bottler_sort"),
    col("c_mktsegment").as("channel"),
    ascii(substring(col("c_mktsegment"), 1, 1)).as("channel_sort"),
    col("o_totalprice"))

  private def monthAgg(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy((keys :+ "dw_dt").map(col): _*)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("string").as("val"))

  private val slidingMetrics7: Seq[(String, org.apache.spark.sql.Column)] =
    Seq(
      "score" -> col("value"),
      "pp_score" -> col("prev_mom"),
      "vs_pp_score" -> col("delta_mom"),
      "last_dec_score" -> col("prev_ytd"),
      "vs_last_dec_score" -> col("delta_ytd"),
      "last_year_same_month_score" -> col("prev_yoy"),
      "vs_last_year_same_month_score" -> col("delta_yoy"))

  private val sparkMarketKeys = Seq("market", "bg", "bg_sort", "bottler",
    "bottler_sort", "channel", "channel_sort")

  /** Spark twin of [[scoreTapCols]] — the model.d_cocacola_score tap
    * synthesis with report_score_channel's verbatim constants (the
    * 区域/辽宁/Tier bottler classes, the Total / 所有渠道 channel, the
    * four code-item strings). `kpi` is item's split-first with the
    * 产品铺货率→产品铺货 remap, written directly from the priority
    * (equivalent on the four synthesized items). */
  private def scoreTapFactCols: Seq[org.apache.spark.sql.Column] = Seq(
    date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dw_dt"),
    col("r_name").as("bg"),
    concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
      lit("_"), col("r_name")).as("bg_sort"),
    when(col("n_nationkey") % 7 === 0, concat(col("n_name"), lit("区域")))
      .when(col("n_nationkey") % 7 === 1,
        concat(col("n_name"), lit("辽宁")))
      .when(col("n_nationkey") % 7 === 2,
        concat(lit("Tier"), (col("n_nationkey") % 3 + 1).cast("string")))
      .otherwise(col("n_name")).as("bottler"),
    concat(col("n_nationkey").cast("string"), lit("_"), col("n_name"))
      .as("bottler_sort"),
    when(col("c_mktsegment") === "MACHINERY", lit("Total / 所有渠道"))
      .otherwise(col("c_mktsegment")).as("channel"),
    when(col("o_orderkey") % 10 === 0, lit("X"))
      .otherwise(lit(null).cast("string")).as("code"),
    when(col("o_orderpriority") === "1-URGENT", lit("单品分销"))
      .when(col("o_orderpriority") === "2-HIGH", lit("产品铺货"))
      .when(col("o_orderpriority") === "3-MEDIUM", lit("全体"))
      .otherwise(lit("冰柜纯净度")).as("kpi"),
    col("o_totalprice"))

  private val scoreTapKeys =
    Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel", "kpi")

  private def bottlerKept = !col("bottler").rlike("\\S*区域$") &&
    !col("bottler").rlike("\\S*辽宁$") && !col("bottler").rlike("Tier\\d")

  /** Driver-held KPI-path config for the trgx-composition reports
    * (m_cocacola_score_period.clj:66-74 and siblings): the reference
    * attaches the score kv to conf.trgx_cocacola (kv->trgx), takes the
    * last 3 levels, splits at depth 4, and reads each node's PATH back
    * as (channel, kpi, metrics) with `pad 4 "TOTAL"` plus the config's
    * own c_total_score/c_weight DATA — a tree round-trip whose net
    * effect is THIS node-id lookup. Rows cover every filter the
    * reports must prove: a Total-channel kpi the 全体-Total
    * split-first remap rewrites, one kpi from the verbatim five-entry
    * exclusion set, a depth-3 node whose metrics slot pads to
    * "TOTAL" (kept), and a depth-1 node whose channel pads to
    * "TOTAL" (dropped). */
  private val periodPathConfig
      : Seq[(String, String, String, String, Int, Int)] = Seq(
    ("1", "全体-Total / 所有渠道", "单品分销-整体", "WTD", 100, 10),
    ("2", "全体-Total / 所有渠道", "全体-HMKT / 大卖场", "WTD", 90, 9),
    ("3", "全体-MT / 现代渠道", "冰柜纯净度-纯净度", "MTD", 60, 6),
    ("4", "全体-MT / 现代渠道", "产品铺货率-整体", "TOTAL", 40, 4),
    ("5", "TOTAL", "TOTAL", "TOTAL", 0, 0))

  /** The verbatim kpi exclusion set (m_cocacola_score_period.clj:70). */
  private val periodKpiExclude = Seq("全体-HMKT / 大卖场",
    "全体-SMKT / 超市", "全体-GT / 传统食杂",
    "全体-E&D M/H / 中高档餐饮", "全体-E&D Trad / 传统餐饮")

  private val periodCfgValuesSql = periodPathConfig.map { case (c, ch, k, mt, ts, w) =>
    s"('$c', '$ch', '$k', '$mt', $ts, $w)"
  }.mkString(",\n             ")

  private val periodKpiExcludeSql =
    periodKpiExclude.map(k => s"'$k'").mkString(", ")

  /** Oracle base for the score_period family — [[scoreFact]]'s twin. */
  private val periodBaseCols =
    """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS dt,
             r_name AS bg,
             n_name AS bottler,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             substr(o_orderpriority, 1, 1) AS code,
             o_orderpriority AS item,
             o_totalprice"""

  private val periodMKeys =
    Seq("bg", "bottler", "bg_sort", "bottler_sort", "code", "item")

  /** The shared post-m CTEs: the config VALUES table and the per-group
    * numeric max (slidingScores' max_value twin, DECIMAL(28,3)
    * rendering). */
  private val periodPostMCtes =
    s"""cfg(code, cfg_channel, cfg_kpi, cfg_metrics,
             c_total_score, c_weight) AS (VALUES
             $periodCfgValuesSql),
         mx AS (SELECT bg, bottler, bg_sort, bottler_sort, code, item,
             CAST(CAST(max(val) AS DECIMAL(28,3)) AS VARCHAR) AS mval
           FROM m GROUP BY 1, 2, 3, 4, 5, 6)"""

  private val periodSJoins =
    """JOIN cfg ON cfg.code = a.code
           JOIN mx ON mx.bg = a.bg AND mx.bottler = a.bottler
             AND mx.code = a.code AND mx.item = a.item"""

  private val periodSExtraCols = """
             cfg.cfg_channel, cfg.cfg_kpi, cfg.cfg_metrics,
             cfg.c_total_score, cfg.c_weight, mx.mval AS max_value,
             CASE WHEN cfg.cfg_channel = '全体-Total / 所有渠道'
                  THEN string_split(cfg.cfg_kpi, '-')[1]
                  ELSE cfg.cfg_kpi END AS kpis,"""

  private val periodSWhere =
    s"cfg_channel <> 'TOTAL' AND cfg_kpi NOT IN ($periodKpiExcludeSql)"

  /** The report-row output contract every rpt query ends with: rename
    * the pair-tree column, attach the row constants, order for the
    * gate. */
  private def reportWrap(df: DataFrame, report: String): DataFrame =
    df.withColumnRenamed("report", "dimension_metrics")
      .select(col("dw_dt"), lit("cocacola").as("project"),
        lit("score").as("category"), lit(report).as("report"),
        col("selector"), lit("").as("selector_desc"),
        col("dimension_metrics"))
      .orderBy("dw_dt", "selector")

  /** Sliding over the score fact + a broadcast config join — the
    * shared first half of the four trgx-composition reports. The
    * month fact is STAGED once: the axis one-row fetch and the
    * sliding pipeline would otherwise each recompute the star-join
    * subtree (the slidingSelectorReport argument). */
  private def scoreSlidingWithCfg(s: SparkSession, dir: String,
      cfg: DataFrame, tag: String): DataFrame = {
    val m = graft.core.Tables.staged(
      scoreFact(s, dir)
        .groupBy("bg", "bottler", "bg_sort", "bottler_sort", "code",
                 "item", "dw_dt")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").cast("string").as("val")),
      tag)
    val rng = m.agg(min("dw_dt"), max("dw_dt")).first()
    Relational.slidingScores(m, periodMKeys, "dw_dt", "val",
        rng.getString(0), rng.getString(1))
      .join(broadcast(cfg), Seq("code"))
  }

  /** Spark side of the score_period composition: sliding over the
    * score fact, the broadcast config-path lookup standing in for the
    * kv->trgx round-trip (the tree ops themselves are covered by
    * trgx_tree_ops / report_opportunity), the verbatim path filters,
    * and the 全体-Total kpi split-first remap. */
  private def periodSliding(s: SparkSession, dir: String): DataFrame = {
    val cfg = {
      import s.implicits._
      periodPathConfig.toDF("code", "cfg_channel", "cfg_kpi",
        "cfg_metrics", "c_total_score", "c_weight")
    }
    scoreSlidingWithCfg(s, dir, cfg, "rpt_period")
      .filter(col("cfg_channel") =!= "TOTAL" &&
        !col("cfg_kpi").isin(periodKpiExclude: _*))
      .withColumn("kpis",
        when(col("cfg_channel") === "全体-Total / 所有渠道",
          element_at(split(col("cfg_kpi"), "-"), 1))
          .otherwise(col("cfg_kpi")))
  }

  private val periodMetrics: Seq[(String, org.apache.spark.sql.Column)] =
    Seq(
      "c_total_score" -> col("c_total_score"),
      "c_weight" -> col("c_weight"),
      "value" -> col("value"),
      "max_value" -> col("max_value").cast("string"),
      "pp_value" -> col("prev_mom"),
      "last_dec_value" -> col("prev_ytd"),
      "last_year_same_month_score" -> col("prev_yoy"))

  /** channel_metrics_opportunity's OWN config (latest-trgx-kpi,
    * leaf-trunc 1 → 2-level (channel, metrics) paths; the node DATA
    * carries a nullable abbreviation). Metrics labels are unique per
    * node — two nodes sharing a label would collide in the one-level
    * [metrics] pair-tree. */
  private val cmPathConfig
      : Seq[(String, String, String, Option[String], Int, Int)] = Seq(
    ("1", "全体-Total / 所有渠道", "M1", Some("AB1"), 100, 10),
    ("2", "全体-HMKT / 大卖场", "M2", Some("AB2"), 90, 9),
    ("3", "全体-MT / 现代渠道", "M3", None, 60, 6),
    ("4", "全体-GT / 传统食杂", "M4", Some("AB4"), 40, 4),
    ("5", "全体-E&D", "M5", Some("AB5"), 20, 2))

  private val cmCfgValuesSql = cmPathConfig.map {
    case (c, ch, mt, ab, ts, w) =>
      s"('$c', '$ch', '$mt', ${ab.map(a => s"'$a'").getOrElse("NULL")}, $ts, $w)"
  }.mkString(",\n             ")

  /** The gt_score_deep_dive tap twins (m_cocacola_gt_score_deep_dive_
    * with_ko.clj:39-46 / without_ko.clj:39-46 — byte-identical
    * pipelines over two different TABLES; the synthesized without_ko
    * tap drops the 1-URGENT item class to model the narrower table):
    * a straight pivot with the item's get-item-json-string payload as
    * the dim KEY (escaped by pairTreeToJson), dims [item, period],
    * one `value` metric, pinned dw_dt, selector [bg, bottler] sorts.
    * A NULL p_item renders as "" — the reference's (str nil) quirk. */
  private def deepDiveKoReport(s: SparkSession, dir: String,
      report: String, withKo: Boolean): DataFrame = {
    val base = starFact(s, dir)
      .select(
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
          .as("dt"),
        concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
          lit("_"), col("r_name")).as("bg_sort"),
        concat(col("n_nationkey").cast("string"), lit("_"),
          col("n_name")).as("bottler_sort"),
        col("o_orderpriority").as("item"),
        when(col("o_orderstatus") === "O", lit(null).cast("string"))
          .otherwise(concat(lit("P-"), col("o_orderstatus")))
          .as("p_item"),
        substring(col("o_orderpriority"), 1, 1).as("item_order"),
        ascii(substring(col("o_orderstatus"), 1, 1)).as("item_weight"),
        length(col("o_orderpriority")).as("total_score"),
        col("o_totalprice"))
      .filter(if (withKo) lit(true) else col("item") =!= "1-URGENT")
    val m = base
      .groupBy("bg_sort", "bottler_sort", "item", "p_item",
        "item_order", "item_weight", "total_score", "dt")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("string").as("val"))
    val withSel = m
      .withColumn("item_json",
        concat(lit("{\"item_name\":\""), col("item"),
          lit("\",\"p_item\":\""), coalesce(col("p_item"), lit("")),
          lit("\",\"c_sort\":"), col("item_order"),
          lit(",\"c_weight\":"), col("item_weight"),
          lit(",\"c_total_score\":"), col("total_score"), lit("}")))
      .withColumn("item", col("item_json"))
      .withColumn("selector", concat(lit("[\"bg="), col("bg_sort"),
        lit("\",\"bottler="), col("bottler_sort"), lit("\"]")))
      .withColumn("dw_dt", lit("9999-12-31"))
      .withColumn("period", col("dt"))
    reportWrap(Relational.reportShape(withSel, Seq("dw_dt", "selector"),
      Seq("item", "period"), Seq("value" -> col("val"))), report)
  }

  /** Oracle twin of [[deepDiveKoReport]]. */
  private def deepDiveKoOracleSql(report: String,
      withKo: Boolean): String =
    slidingOracleSql(report,
      """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             o_orderpriority AS item,
             CASE WHEN o_orderstatus = 'O' THEN NULL
                  ELSE 'P-' || o_orderstatus END AS p_item,
             substr(o_orderpriority, 1, 1) AS item_order,
             ascii(substr(o_orderstatus, 1, 1)) AS item_weight,
             length(o_orderpriority) AS total_score,
             o_totalprice""",
      mKeys = Seq("bg_sort", "bottler_sort", "item", "p_item",
        "item_order", "item_weight", "total_score"),
      where = if (withKo) "TRUE" else "item <> '1-URGENT'",
      selectorSql = """'["bg=' || bg_sort || '","bottler='
               || bottler_sort || '"]'""",
      dims = Seq(
        "item" -> """('{"item_name":"' || item || '","p_item":"'
               || coalesce(p_item, '') || '","c_sort":' || item_order
               || ',"c_weight":' || item_weight
               || ',"c_total_score":' || total_score || '}')""",
        "period" -> "dt"),
      metrics = Seq("value" -> "score"),
      pinnedDwDt = Some("9999-12-31"),
      escapeDims = Set("item"))

  /** The score-tap straight pivot shared by report_by_bg /
    * report_bottler_tier (m_cocacola_score_by_bg.clj:35-42 and
    * m_cocacola_score_tier.clj:35-42 are byte-twins except report name
    * and the selector's second key): pinned dw_dt, (not !code), dims
    * [bg=bg_sort, bottler=bottler_sort, period], ONE score metric —
    * no sliding. The synthesized tap aggregates to one row per
    * (channel, kpi, bg, bottler, month) so the pair-tree write is
    * deterministic (the reference tap relies on grain uniqueness). */
  private def scorePivotReport(s: SparkSession, dir: String,
      selKey: String, report: String): DataFrame = {
    val m = starFact(s, dir)
      .select(
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("dt"),
        concat(lit("0."), (col("r_regionkey") + 1).cast("string"),
          lit("_"), col("r_name")).as("bg_sort"),
        concat(col("n_nationkey").cast("string"), lit("_"),
          col("n_name")).as("bottler_sort"),
        ascii(substring(col("c_mktsegment"), 1, 1)).as("channel_sort"),
        substring(col("o_orderpriority"), 1, 1).as("kpi_sort"),
        when(col("o_orderkey") % 10 === 0, lit("X"))
          .otherwise(lit(null).cast("string")).as("code"),
        col("o_totalprice"))
      .filter(col("code").isNull)
      .groupBy("bg_sort", "bottler_sort", "channel_sort", "kpi_sort",
               "dt")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)").cast("string").as("val"))
    val withSel = m
      .withColumn("selector",
        concat(lit("[\"channel="), col("channel_sort"),
          lit("\",\"" + selKey + "="), col("kpi_sort"), lit("\"]")))
      .withColumn("dw_dt", lit("9999-12-31"))
      .withColumn("bg", col("bg_sort"))
      .withColumn("bottler", col("bottler_sort"))
      .withColumn("period", col("dt"))
    reportWrap(Relational.reportShape(withSel, Seq("dw_dt", "selector"),
      Seq("bg", "bottler", "period"), Seq("score" -> col("val"))),
      report)
  }

  /** DuckDB oracle GENERATOR for the sliding-family reports — one
    * template for what was becoming a per-report ~80-line SQL clone
    * (the first six variants shipped as clones; this is their
    * refactor). Shape: star-join fact synthesis (`baseCols`) → m
    * (grouped month fact, `where` filter — group-constant, so it
    * commutes with sliding) → s (the 3 lag self-joins: prev month end,
    * prev Dec end, same month last year) → leaf JSON (metric names
    * ALPHABETICAL, null entries dropped — the trDimensionMetrics
    * contract) → one string_agg per dim level, innermost first, keys
    * ordered by their VARCHAR rendering (Spark sorts pair-tree keys in
    * UTF-8 byte order).
    *
    * `mKeys` are m's group cols (dt is implicit); `dims` are
    * (key, value-SQL-over-s) outermost first; `metrics` are
    * (name, value-SQL-over-s) — wrap string-valued metrics in
    * to_json(...); `pinnedDwDt` pins the output dw_dt (trend reports)
    * vs None = the axis month;
    * `escapeDims` names dim keys whose VALUES contain JSON (the
    * deep-dive item payload) — their rendered key goes through
    * to_json, exactly as pairTreeToJson escapes it, while the sort
    * stays on the raw key string.
    *
    * The trgx-composition reports additionally thread a driver-held
    * config through the pipeline: `postMCtes` appends CTEs after m
    * (a config VALUES table, a per-group max), `sJoins`/`sExtraCols`
    * extend the lag-join stage with those lookups, and `sWhere`
    * filters the joined rows (the reference's post-attach path
    * filters) before the leaf render. */
  private def slidingOracleSql(report: String, baseCols: String,
      mKeys: Seq[String], where: String, selectorSql: String,
      dims: Seq[(String, String)], metrics: Seq[(String, String)],
      pinnedDwDt: Option[String] = None,
      escapeDims: Set[String] = Set.empty,
      postMCtes: String = "",
      sJoins: String = "",
      sExtraCols: String = "",
      sWhere: String = "TRUE"): String = {
    val lagJoin = (a: String, dtExpr: String) =>
      s"""LEFT JOIN m $a ON ${
        mKeys.map(k => s"$a.$k = a.$k").mkString("\n             AND ")}
             AND $a.dt = $dtExpr"""
    val metricList = metrics.sortBy(_._1).map { case (n, e) =>
      s"""'"$n":' || $e"""
    }.mkString(",\n                 ")
    val dimAliases = dims.zipWithIndex.map { case ((_, v), i) =>
      s"$v AS __d$i"
    }.mkString(", ")
    val grpCols = if (pinnedDwDt.isEmpty) "dt, selector" else "selector"
    // one aggregation level per dim, innermost (last) first; the child
    // of level i is the braced node of level i+1, or the leaf itself
    val k = dims.length
    def keyedChild(i: Int, child: String): String =
      if (escapeDims.contains(dims(i)._1))
        s"""to_json('${dims(i)._1}=' || __d$i) || ':' || $child"""
      else s"""'"${dims(i)._1}=' || __d$i || '":' || $child"""
    val levels = (k - 1) to 1 by -1
    val aggCtes = levels.map { i =>
      val child = if (i == k - 1) "leaf" else "'{' || node || '}'"
      val carried = (0 until i).map(j => s"__d$j").mkString(", ")
      val carriedSel = if (carried.isEmpty) "" else s"$carried,"
      s"""n$i AS (SELECT $grpCols, $carriedSel
             string_agg(${keyedChild(i, child)},
               ',' ORDER BY CAST(__d$i AS VARCHAR)) AS node
           FROM ${if (i == k - 1) "leafed" else s"n${i + 1}"}
           GROUP BY $grpCols${if (carried.isEmpty) "" else s", $carried"})"""
    }.mkString(",\n         ")
    val topChild = if (k == 1) "leaf" else "'{' || node || '}'"
    val topFrom = if (k == 1) "leafed" else "n1"
    val dwDtOut = pinnedDwDt.map(d => s"'$d'").getOrElse("dt")
    s"""WITH base AS (
           SELECT $baseCols
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         m AS (SELECT ${mKeys.mkString(", ")}, dt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS val
           FROM base
           WHERE $where
           GROUP BY ${(1 to mKeys.length + 1).mkString(", ")})${
             if (postMCtes.isEmpty) "" else s",\n         $postMCtes"},
         s AS (SELECT a.*,$sExtraCols
             CAST(a.val AS VARCHAR) AS score,
             CAST(mom.val AS VARCHAR) AS pp_score,
             CAST(CAST(a.val - mom.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_pp_score,
             CAST(ytd.val AS VARCHAR) AS last_dec_score,
             CAST(CAST(a.val - ytd.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_last_dec_score,
             CAST(yoy.val AS VARCHAR) AS last_year_same_month_score,
             CAST(CAST(a.val - yoy.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_last_year_same_month_score
           FROM m a
           ${lagJoin("mom",
             """strftime(last_day(CAST(a.dt AS DATE)
               - INTERVAL 1 MONTH), '%Y-%m-%d')""")}
           ${lagJoin("ytd",
             """strftime(last_day(date_trunc('year',
               CAST(a.dt AS DATE)) - INTERVAL 1 MONTH), '%Y-%m-%d')""")}
           ${lagJoin("yoy",
             """strftime(last_day(CAST(a.dt AS DATE)
               - INTERVAL 12 MONTH), '%Y-%m-%d')""")}
           $sJoins),
         leafed AS (SELECT dt, $selectorSql AS selector, $dimAliases,
             '{' || array_to_string(list_filter([
                 $metricList],
               x -> x IS NOT NULL), ',') || '}' AS leaf
           FROM s WHERE $sWhere)${
             if (aggCtes.isEmpty) "" else s",\n         $aggCtes"}
         SELECT $dwDtOut AS dw_dt, 'cocacola' AS project,
           'score' AS category, '$report' AS report, selector,
           '' AS selector_desc,
           '{' || string_agg(${keyedChild(0, topChild)},
             ',' ORDER BY CAST(__d0 AS VARCHAR)) || '}'
             AS dimension_metrics
         FROM $topFrom GROUP BY $grpCols
         ORDER BY dw_dt, selector"""
  }

  /** Oracle twin of [[scorePivotReport]] — reuses the sliding
    * generator with a single `score` metric (the lag joins are
    * computed and unused; output-identical). */
  private def scorePivotOracleSql(selKey: String,
      report: String): String =
    slidingOracleSql(report,
      """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             ascii(substr(c_mktsegment, 1, 1)) AS channel_sort,
             substr(o_orderpriority, 1, 1) AS kpi_sort,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' END AS code,
             o_totalprice""",
      mKeys = Seq("bg_sort", "bottler_sort", "channel_sort",
        "kpi_sort"),
      where = "code IS NULL",
      selectorSql = s"""'["channel=' || channel_sort || '","$selKey='
               || kpi_sort || '"]'""",
      dims = Seq("bg" -> "bg_sort", "bottler" -> "bottler_sort",
        "period" -> "dt"),
      metrics = Seq("score" -> "score"),
      pinnedDwDt = Some("9999-12-31"))

  /** The seven lag metrics every sliding report emits, by their s-CTE
    * column names. */
  private val lag7: Seq[(String, String)] = Seq(
    "score" -> "score", "pp_score" -> "pp_score",
    "vs_pp_score" -> "vs_pp_score", "last_dec_score" -> "last_dec_score",
    "vs_last_dec_score" -> "vs_last_dec_score",
    "last_year_same_month_score" -> "last_year_same_month_score",
    "vs_last_year_same_month_score" -> "vs_last_year_same_month_score")

  /** Shared oracle-side fact synthesis for the sku-tap family
    * (model.d_cocacola_sku: sku6_bottler / sku6_bg / sku6_period_bg /
    * skus). */
  private val skuBaseCols =
    """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS dt,
             r_name AS bg,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CASE WHEN n_nationkey % 6 = 0 THEN 'Total'
                  ELSE n_name END AS bottler,
             CASE WHEN n_nationkey % 6 = 0 THEN '99_Total'
                  ELSE CAST(n_nationkey AS VARCHAR) || '_' || n_name
                  END AS bottler_sort,
             c_mktsegment AS channel,
             ascii(substr(c_mktsegment, 1, 1)) AS channel_sort,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN '6 SKU' ELSE 'ALL SKU' END AS sku_type,
             o_totalprice"""

  /** Shared oracle-side columns for the market-keyed taps (activation /
    * cooler / availability / sovi summaries): the ^China Tier\d market
    * synthesis plus the geo/channel sorts; each report appends its own
    * type/brand columns. */
  private val marketBaseCols =
    """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS dt,
             CASE WHEN n_nationkey % 5 = 0
                  THEN 'China Tier' || CAST(n_nationkey % 3 + 1
                    AS VARCHAR)
                  ELSE n_name || ' Market' END AS market,
             r_name AS bg,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             n_name AS bottler,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             c_mktsegment AS channel,
             ascii(substr(c_mktsegment, 1, 1)) AS channel_sort,
             o_totalprice"""

  private val marketKeys = Seq("market", "bg", "bg_sort", "bottler",
    "bottler_sort", "channel", "channel_sort")

  private val marketWhere = """NOT regexp_matches(market, '^China Tier\d')"""

  private val selector4Key =
    """'["period=' || dt || '","bg=' || bg_sort || '","bottler='
               || bottler_sort || '","channel=' || channel_sort || '"]'"""

  private val selectorPeriodChannel =
    """'["period=' || dt || '","channel=' || channel_sort || '"]'"""

  /** Oracle twin of [[scoreTapFactCols]]. */
  private val scoreTapCols =
    """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS dt,
             r_name AS bg,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CASE WHEN n_nationkey % 7 = 0 THEN n_name || '区域'
                  WHEN n_nationkey % 7 = 1 THEN n_name || '辽宁'
                  WHEN n_nationkey % 7 = 2
                    THEN 'Tier' || CAST(n_nationkey % 3 + 1 AS VARCHAR)
                  ELSE n_name END AS bottler,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN 'Total / 所有渠道'
                  ELSE c_mktsegment END AS channel,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' END AS code,
             CASE o_orderpriority
                  WHEN '1-URGENT' THEN '单品分销'
                  WHEN '2-HIGH' THEN '产品铺货'
                  WHEN '3-MEDIUM' THEN '全体'
                  ELSE '冰柜纯净度' END AS kpi,
             o_totalprice"""

  private val scoreTapOracleKeys =
    Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel", "kpi")

  private val bottlerKeptSql =
    """NOT regexp_matches(bottler, '\S*区域$')
             AND NOT regexp_matches(bottler, '\S*辽宁$')
             AND NOT regexp_matches(bottler, 'Tier\d')"""

  private val baseOracles: Map[String, String] = Map(
    "report_rural_totals_filter" ->
      """WITH b AS (SELECT CASE CAST(n_nationkey AS INT)
             WHEN 0 THEN 'China Total / 全国总体'
             WHEN 1 THEN 'SBL Total / 全体'
             WHEN 2 THEN 'CBL Total / 全体'
             WHEN 3 THEN 'BIG Total / 全体'
             WHEN 4 THEN 'Zhuhai Total / 全体'
             ELSE n_name END AS bottler
           FROM customer JOIN nation ON n_nationkey = c_nationkey)
         SELECT bottler, count(*) AS cnt FROM b
         WHERE regexp_matches(bottler, '\S*全体$|\S*全国总体$')
         GROUP BY bottler ORDER BY bottler""",
    "report_nested_kpis" ->
      """WITH m AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mo,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS VARCHAR) AS val
           FROM orders JOIN customer ON c_custkey = o_custkey
           GROUP BY 1, 2, 3),
         inner_j AS (SELECT seg, prio,
             '{' || string_agg('"period=' || mo || '":{"value":' || val
               || '}', ',' ORDER BY mo) || '}' AS period_value
           FROM m GROUP BY seg, prio)
         SELECT seg, '{' || string_agg('"prio=' || prio
             || '":{"c_sort":' || substr(prio, 1, 1)
             || ',"period_value":' || to_json(period_value) || '}',
             ',' ORDER BY prio) || '}' AS report
         FROM inner_j GROUP BY seg ORDER BY seg""",
    "report_deep_dive" ->
      """WITH m AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
               AS period,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS VARCHAR) AS val
           FROM orders JOIN customer ON c_custkey = o_custkey
           GROUP BY 1, 2, 3),
         j AS (SELECT seg, period, val,
             '{"item_name":"' || prio || '","c_sort":'
               || substr(prio, 1, 1) || '}' AS item_json
           FROM m),
         lvl2 AS (SELECT seg, item_json,
             '{' || string_agg('"period=' || period || '":{"value":'
               || val || '}', ',' ORDER BY period) || '}' AS periods
           FROM j GROUP BY seg, item_json)
         SELECT seg, '{' || string_agg(to_json('item=' || item_json)
             || ':' || periods, ',' ORDER BY 'item=' || item_json)
             || '}' AS report
         FROM lvl2 GROUP BY seg ORDER BY seg""",
    "report_score_overall" ->
      """WITH m AS (SELECT c_mktsegment AS seg,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS val
           FROM orders JOIN customer ON c_custkey = o_custkey
           GROUP BY 1, 2)
         SELECT seg, '{' || string_agg('"dt=' || dt || '":{"score":'
             || val || '}', ',' ORDER BY dt) || '}' AS report
         FROM m GROUP BY seg ORDER BY seg""",
    "report_share_others" ->
      """WITH base AS (SELECT c_mktsegment, n_name FROM customer
           JOIN nation ON c_nationkey = n_nationkey),
         counts AS (SELECT c_mktsegment, n_name AS brand,
             count(*) AS cnt FROM base GROUP BY 1, 2),
         totals AS (SELECT c_mktsegment, count(*) AS total FROM base
           GROUP BY 1),
         shares AS (SELECT c.c_mktsegment, brand,
             CAST(cnt * 100000 // total AS BIGINT) AS share_milli
           FROM counts c JOIN totals t USING (c_mktsegment))
         SELECT c_mktsegment, brand, share_milli FROM shares
         UNION ALL
         SELECT c_mktsegment, 'Others',
           CAST(100000 - sum(share_milli) AS BIGINT)
         FROM shares GROUP BY c_mktsegment
         ORDER BY c_mktsegment, brand""",
    "report_ranking" ->
      """WITH base AS (SELECT n_name,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS revenue
           FROM orders JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name)
         SELECT n_name, CAST(revenue AS VARCHAR) AS revenue,
           CAST(row_number() OVER (ORDER BY revenue DESC, n_name)
             AS INT) AS rank_top,
           CAST(row_number() OVER (ORDER BY revenue ASC, n_name)
             AS INT) AS rank_bottom
         FROM base ORDER BY n_name""",
    "report_achievement_rate" ->
      """WITH base AS (
           SELECT strftime(last_day(CAST(o_orderdate AS DATE)),
               '%Y-%m-%d') AS period,
             r_name AS bg,
             CASE CAST(n_nationkey AS INT)
                  WHEN 0 THEN 'China Total / 全国总体'
                  WHEN 1 THEN 'SBL Total / 全体'
                  WHEN 2 THEN 'CBL Total / 全体'
                  WHEN 3 THEN 'BIG Total / 全体'
                  WHEN 4 THEN 'Zhuhai Total / 全体'
                  ELSE n_name END AS bottler,
             c_mktsegment AS channel,
             o_orderpriority AS item,
             o_totalprice, o_custkey
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         m AS (SELECT bg, bottler, channel, item, period,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS VARCHAR) AS value,
             CAST(count(*) AS VARCHAR) AS c_total_score,
             CAST(count(DISTINCT o_custkey) AS VARCHAR) AS c_weight
           FROM base GROUP BY 1, 2, 3, 4, 5),
         b1 AS (SELECT bg, channel, item, bottler,
             '"bottler=' || bottler || '":{' ||
             string_agg('"period=' || period || '":{"c_total_score":'
               || c_total_score || ',"c_weight":' || c_weight
               || ',"value":' || value || '}', ',' ORDER BY period)
             || '}' AS bnode
           FROM m GROUP BY bg, channel, item, bottler),
         g1 AS (SELECT '["bg=' || bg || '","channel=' || channel
               || '","kpi=' || item || '"]' AS selector,
             '{' || string_agg(bnode, ',' ORDER BY bottler) || '}'
               AS dimension_metrics
           FROM b1 GROUP BY bg, channel, item),
         b2 AS (SELECT channel, item, bottler,
             '"bottler=' || bottler || '":{' ||
             string_agg('"period=' || period || '":{"c_total_score":'
               || c_total_score || ',"c_weight":' || c_weight
               || ',"value":' || value || '}', ',' ORDER BY period)
             || '}' AS bnode
           FROM m
           WHERE bottler IN ('China Total / 全国总体', 'SBL Total / 全体',
             'CBL Total / 全体', 'BIG Total / 全体', 'Zhuhai Total / 全体')
           GROUP BY channel, item, bottler),
         g2 AS (SELECT '["bg=0.2_BGs","channel=' || channel
               || '","kpi=' || item || '"]' AS selector,
             '{' || string_agg(bnode, ',' ORDER BY bottler) || '}'
               AS dimension_metrics
           FROM b2 GROUP BY channel, item),
         u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
         SELECT '9999-12-31' AS dw_dt, 'cocacola' AS project,
           'score' AS category, 'achievement_rate' AS report,
           selector, '' AS selector_desc, dimension_metrics
         FROM u ORDER BY selector""",
    "report_score_channel" ->
      """WITH base AS (
           SELECT strftime(last_day(CAST(o_orderdate AS DATE)),
               '%Y-%m-%d') AS dw_dt,
             r_name AS bg,
             CASE WHEN n_nationkey % 7 = 0 THEN n_name || '区域'
                  WHEN n_nationkey % 7 = 1 THEN n_name || '辽宁'
                  WHEN n_nationkey % 7 = 2
                    THEN 'Tier' || CAST(n_nationkey % 3 + 1 AS VARCHAR)
                  ELSE n_name END AS bottler,
             CASE WHEN c_mktsegment = 'MACHINERY' THEN 'Total / 所有渠道'
                  ELSE c_mktsegment END AS channel,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X' END AS code,
             CASE o_orderpriority
                  WHEN '1-URGENT' THEN '单品分销-整体'
                  WHEN '2-HIGH' THEN '产品铺货率-整体'
                  WHEN '3-MEDIUM' THEN '全体'
                  ELSE '冰柜纯净度-纯净度' END AS item,
             o_totalprice
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         m AS (SELECT bg, bottler, channel, item, dw_dt,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS val
           FROM base
           WHERE code IS NULL
             AND regexp_matches(CASE WHEN string_split(item, '-')[1]
                 = '产品铺货率' THEN '产品铺货'
                 ELSE string_split(item, '-')[1] END, '^全体$')
             AND channel <> 'Total / 所有渠道'
             AND NOT regexp_matches(bottler, '\S*区域$')
             AND NOT regexp_matches(bottler, '\S*辽宁$')
             AND NOT regexp_matches(bottler, 'Tier\d')
           GROUP BY 1, 2, 3, 4, 5),
         s AS (SELECT a.bg, a.bottler, a.channel, a.dw_dt,
             CAST(a.val AS VARCHAR) AS score,
             CAST(mom.val AS VARCHAR) AS pp_score,
             CAST(CAST(a.val - mom.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_pp_score,
             CAST(ytd.val AS VARCHAR) AS last_dec_score,
             CAST(CAST(a.val - ytd.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_last_dec_score,
             CAST(yoy.val AS VARCHAR) AS last_year_same_month_score,
             CAST(CAST(a.val - yoy.val AS DECIMAL(28,3)) AS VARCHAR)
               AS vs_last_year_same_month_score
           FROM m a
           LEFT JOIN m mom ON mom.bg = a.bg AND mom.bottler = a.bottler
             AND mom.channel = a.channel AND mom.item = a.item
             AND mom.dw_dt = strftime(last_day(CAST(a.dw_dt AS DATE)
               - INTERVAL 1 MONTH), '%Y-%m-%d')
           LEFT JOIN m ytd ON ytd.bg = a.bg AND ytd.bottler = a.bottler
             AND ytd.channel = a.channel AND ytd.item = a.item
             AND ytd.dw_dt = strftime(last_day(date_trunc('year',
               CAST(a.dw_dt AS DATE)) - INTERVAL 1 MONTH), '%Y-%m-%d')
           LEFT JOIN m yoy ON yoy.bg = a.bg AND yoy.bottler = a.bottler
             AND yoy.channel = a.channel AND yoy.item = a.item
             AND yoy.dw_dt = strftime(last_day(CAST(a.dw_dt AS DATE)
               - INTERVAL 12 MONTH), '%Y-%m-%d')),
         leafed AS (SELECT dw_dt,
             '["period=' || dw_dt || '","bg=' || bg || '","bottler='
               || bottler || '"]' AS selector,
             channel,
             '{' || array_to_string(list_filter([
                 '"last_dec_score":' || last_dec_score,
                 '"last_year_same_month_score":'
                   || last_year_same_month_score,
                 '"pp_score":' || pp_score,
                 '"score":' || score,
                 '"vs_last_dec_score":' || vs_last_dec_score,
                 '"vs_last_year_same_month_score":'
                   || vs_last_year_same_month_score,
                 '"vs_pp_score":' || vs_pp_score],
               x -> x IS NOT NULL), ',') || '}' AS leaf
           FROM s)
         SELECT dw_dt, 'cocacola' AS project, 'score' AS category,
           'channel' AS report, selector, '' AS selector_desc,
           '{' || string_agg('"channel=' || channel || '":' || leaf,
             ',' ORDER BY channel) || '}' AS dimension_metrics
         FROM leafed GROUP BY dw_dt, selector
         ORDER BY dw_dt, selector""",
    "report_sku6_bottler" -> slidingOracleSql("sku6_bottler",
      skuBaseCols,
      mKeys = Seq("bg", "bottler", "bottler_sort", "channel",
        "channel_sort", "sku_type"),
      where = "bottler <> 'Total' AND sku_type = '6 SKU'",
      selectorSql = selectorPeriodChannel,
      dims = Seq("bg" -> "bg", "bottler" -> "bottler"),
      metrics = lag7 :+ ("abbr" -> "to_json(bottler_sort)")),
    "report_sku6_bg" -> slidingOracleSql("sku6_bg",
      skuBaseCols,
      mKeys = Seq("bg", "bottler", "bottler_sort", "channel",
        "channel_sort", "sku_type"),
      where = "bottler = 'Total' AND sku_type = '6 SKU'",
      selectorSql = selectorPeriodChannel,
      dims = Seq("bg" -> "bg"),
      metrics = lag7),
    "report_cooler_brand" -> slidingOracleSql("cooler_brand",
      marketBaseCols + """,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'OPEN_TOP' ELSE 'CLOSED' END AS cooler_type,
             'Brand-' || o_orderstatus AS brand""",
      mKeys = marketKeys ++ Seq("cooler_type", "brand"),
      where = marketWhere,
      selectorSql = selector4Key,
      dims = Seq("cooler_type" -> "cooler_type", "brand" -> "brand"),
      metrics = lag7),
    "report_sovi_period_trend" -> slidingOracleSql("sovi_period_trend",
      marketBaseCols + """,
             'J' || CAST(o_orderkey % 2 AS VARCHAR) || '_'
               || o_orderstatus AS juice_sovi_type,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'KO'
                  ELSE 'Brand-' || o_orderstatus END AS brand""",
      mKeys = marketKeys ++ Seq("juice_sovi_type", "brand"),
      where = marketWhere + " AND brand = 'KO'",
      selectorSql = """'["channel=' || channel_sort
               || '","kpi=SOVI","juice_sovi_type=' || juice_sovi_type
               || '","bottler=' || bottler_sort || '"]'""",
      dims = Seq("bottler" -> "bottler_sort", "period" -> "dt"),
      metrics = ("bg" -> "to_json(bg)") +: lag7,
      pinnedDwDt = Some("9999-12-31")),
    "report_skus" -> slidingOracleSql("skus",
      skuBaseCols,
      mKeys = Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
        "channel_sort", "sku_type"),
      where = "TRUE",
      selectorSql = selector4Key,
      dims = Seq("sku_type" -> "sku_type"),
      metrics = lag7 :+ ("abbr" -> "to_json(bottler_sort)")),
    "report_sku6_period_bg" -> slidingOracleSql("sku6_period_bg",
      skuBaseCols,
      mKeys = Seq("bg", "bottler", "bottler_sort", "channel",
        "channel_sort", "sku_type"),
      where = "bottler = 'Total' AND sku_type = '6 SKU'",
      selectorSql =
        """'["channel=' || channel_sort || '","button=test"]'""",
      dims = Seq("period" -> "dt", "bg" -> "bg"),
      metrics = lag7 :+ ("abbr" -> "to_json(bottler_sort)"),
      pinnedDwDt = Some("9999-12-31")),
    "report_activation_period_trend" ->
      slidingOracleSql("activation_period_trend",
        marketBaseCols + """,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'PURITY' ELSE 'CHARGING' END AS activation_type,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'KO'
                  ELSE 'Brand-' || o_orderstatus END AS brand""",
        mKeys = marketKeys ++ Seq("activation_type", "brand"),
        where = marketWhere + " AND brand = 'KO'",
        selectorSql = """'["channel=' || channel_sort
               || '","kpi=ACTIVATION","activation_type='
               || activation_type
               || '","bottler=' || bottler_sort || '"]'""",
        dims = Seq("bottler" -> "bottler_sort", "period" -> "dt"),
        metrics = ("bg" -> "to_json(bg)") +: lag7,
        pinnedDwDt = Some("9999-12-31")),
    "report_cooler_period_trend" ->
      slidingOracleSql("cooler_period_trend",
        marketBaseCols + """,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'OPEN_TOP' ELSE 'CLOSED' END AS cooler_type,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'KO'
                  ELSE 'Brand-' || o_orderstatus END AS brand""",
        mKeys = marketKeys ++ Seq("cooler_type", "brand"),
        where = marketWhere + " AND brand = 'KO'",
        selectorSql = """'["channel=' || channel_sort
               || '","kpi=COOLER","cooler_type=' || cooler_type
               || '","bottler=' || bottler_sort || '"]'""",
        dims = Seq("bottler" -> "bottler_sort", "period" -> "dt"),
        metrics = ("bg" -> "to_json(bg)") +: lag7,
        pinnedDwDt = Some("9999-12-31")),
    "report_activation_sub_brand" ->
      slidingOracleSql("activation_brand_sub",
        marketBaseCols + """,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'PURITY' ELSE 'CHARGING' END AS activation_type,
             (CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'PURITY' ELSE 'CHARGING' END) || '/'
               || CAST(o_orderkey % 2 AS VARCHAR)
               AS activation_type_sub,
             CASE WHEN o_orderstatus = 'F' THEN 'KB'
                  ELSE 'Brand-' || o_orderstatus END AS brand""",
        mKeys = marketKeys ++ Seq("activation_type",
          "activation_type_sub", "brand"),
        where = marketWhere + " AND brand <> 'KB'",
        selectorSql = selector4Key,
        dims = Seq("activation_type" -> "activation_type",
          "activation_type_sub" -> "activation_type_sub",
          "brand" -> "brand"),
        metrics = lag7),
    "report_sovi_period_trend6" ->
      slidingOracleSql("sovi_period_trend6",
        marketBaseCols + """,
             'J' || CAST(o_orderkey % 2 AS VARCHAR) AS juice_type,
             CASE WHEN o_orderstatus = 'O' THEN 'Total'
                  ELSE 'Sub-' || o_orderstatus END AS sovi_type,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 'KO'
                  ELSE 'Brand-' || o_orderstatus END AS brand""",
        mKeys = marketKeys ++ Seq("juice_type", "sovi_type", "brand"),
        where = marketWhere + " AND sovi_type = 'Total'",
        selectorSql = """'["bg=' || bg_sort || '","bottler='
               || bottler_sort || '","channel=' || channel_sort
               || '"]'""",
        dims = Seq("period" -> "dt", "brand" -> "brand",
          "juice_type" -> "juice_type", "sovi_type" -> "sovi_type"),
        metrics = lag7,
        pinnedDwDt = Some("9999-12-31")),
    "report_availability_brand" ->
      slidingOracleSql("availability_brand",
        marketBaseCols + """,
             'S' || CAST(o_orderkey % 3 AS VARCHAR) AS sku,
             o_orderstatus AS sku_detail,
             CASE WHEN o_orderkey % 3 = 0 THEN 'KO'
                  ELSE 'B' || CAST(o_orderkey % 3 AS VARCHAR)
                  END AS brand,
             ascii(substr(o_orderstatus, 1, 1)) AS n_ord""",
        mKeys = marketKeys ++ Seq("sku", "sku_detail", "brand",
          "n_ord"),
        where = marketWhere,
        selectorSql = selector4Key,
        dims = Seq("sku" -> "sku", "sku_detail" -> "sku_detail"),
        metrics = lag7 ++ Seq("brand" -> "to_json(brand)",
          "order" -> "n_ord")),
    "report_by_bg" -> scorePivotOracleSql("kpi", "report_by_bg"),
    "report_bottler_tier" ->
      scorePivotOracleSql("facts", "by_bottler_tier"),
    "report_score_kpi" -> slidingOracleSql("kpi",
      scoreTapCols,
      mKeys = scoreTapOracleKeys,
      where = s"""code IS NULL AND channel = 'Total / 所有渠道'
             AND kpi <> '全体' AND $bottlerKeptSql""",
      selectorSql = """'["period=' || dt || '","bg=' || bg_sort
               || '","bottler=' || bottler_sort || '"]'""",
      dims = Seq("kpi" -> "kpi"),
      metrics = lag7),
    "report_score_kpi_bg" -> slidingOracleSql("kpi_bg",
      scoreTapCols,
      mKeys = scoreTapOracleKeys,
      where = s"""code IS NULL AND channel = 'Total / 所有渠道'
             AND $bottlerKeptSql""",
      selectorSql = """'["period=' || dt || '","bottler='
               || bottler_sort || '"]'""",
      dims = Seq("kpi" -> "kpi", "bottler" -> "bottler_sort"),
      metrics = lag7),
    "report_score_channel_bg" -> slidingOracleSql("channel_bg",
      scoreTapCols,
      mKeys = scoreTapOracleKeys,
      where = s"""code IS NULL AND regexp_matches(kpi, '^全体$$')
             AND $bottlerKeptSql""",
      selectorSql = """'["period=' || dt || '","bottler='
               || bottler_sort || '"]'""",
      dims = Seq("channel" -> "channel", "bottler" -> "bottler_sort"),
      metrics = lag7),
    "report_score_gt_rural" -> slidingOracleSql("GT_Rural",
      """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             r_name AS bg,
             CASE CAST(n_nationkey AS INT)
                  WHEN 0 THEN 'China Total / 全国总体'
                  WHEN 1 THEN 'SBL Total / 全体'
                  WHEN 2 THEN 'CBL Total / 全体'
                  WHEN 3 THEN 'BIG Total / 全体'
                  WHEN 4 THEN 'Zhuhai Total / 全体'
                  ELSE n_name END AS bottler,
             'A_' || CAST(n_nationkey AS VARCHAR) AS abbr,
             o_totalprice""",
      mKeys = Seq("bg", "bottler", "abbr"),
      where = """NOT regexp_matches(bottler, '\S*全体$')
             AND NOT regexp_matches(bottler, '\S*全国总体$')""",
      selectorSql = """'["period=' || dt || '","button=test"]'""",
      dims = Seq("bg" -> "bg", "bottler" -> "bottler"),
      metrics = ("abbr" -> "to_json(abbr)") +: lag7),
    "report_score_gt_rural_period_bg" ->
      slidingOracleSql("GT_Rural_period_bg",
        """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             r_name AS bg,
             CASE CAST(n_nationkey AS INT)
                  WHEN 0 THEN 'China Total / 全国总体'
                  WHEN 1 THEN 'SBL Total / 全体'
                  WHEN 2 THEN 'CBL Total / 全体'
                  WHEN 3 THEN 'BIG Total / 全体'
                  WHEN 4 THEN 'Zhuhai Total / 全体'
                  ELSE n_name END AS bottler,
             c_mktsegment AS channel,
             o_totalprice""",
        mKeys = Seq("bg", "channel"),
        where = """regexp_matches(bottler, '\S*全体$|\S*全国总体$')""",
        selectorSql =
          """'["channel=' || channel || '","button=test"]'""",
        dims = Seq("period" -> "dt", "bg" -> "bg"),
        metrics = lag7,
        pinnedDwDt = Some("9999-12-31")),
    "report_score_period" -> slidingOracleSql("period",
      periodBaseCols,
      mKeys = periodMKeys,
      where = "TRUE",
      selectorSql = """'["channel=' || cfg_channel || '","kpi='
               || kpis || '","metrics=' || cfg_metrics
               || '","bottler=' || bottler_sort || '"]'""",
      dims = Seq("bottler" -> "bottler_sort", "period" -> "dt"),
      metrics = Seq("c_total_score" -> "c_total_score",
        "c_weight" -> "c_weight", "value" -> "score",
        "max_value" -> "max_value", "pp_value" -> "pp_score",
        "last_dec_value" -> "last_dec_score",
        "last_year_same_month_score" -> "last_year_same_month_score"),
      pinnedDwDt = Some("9999-12-31"),
      postMCtes = periodPostMCtes,
      sJoins = periodSJoins,
      sExtraCols = periodSExtraCols,
      sWhere = periodSWhere),
    "report_score_period_months" -> slidingOracleSql("period_months",
      periodBaseCols,
      mKeys = periodMKeys,
      where = "TRUE",
      selectorSql = """'["bg=' || bg_sort || '","bottler='
               || bottler_sort || '","channel=' || cfg_channel
               || '","kpi=' || kpis || '","metrics=' || cfg_metrics
               || '"]'""",
      dims = Seq("year" -> "substr(dt, 1, 4)", "period" -> "dt"),
      metrics = Seq("c_total_score" -> "c_total_score",
        "c_weight" -> "c_weight", "value" -> "score",
        "max_value" -> "max_value", "pp_value" -> "pp_score",
        "last_dec_value" -> "last_dec_score",
        "last_year_same_month_score" -> "last_year_same_month_score"),
      pinnedDwDt = Some("9999-12-31"),
      postMCtes = periodPostMCtes,
      sJoins = periodSJoins,
      sExtraCols = periodSExtraCols,
      sWhere = periodSWhere),
    "report_score_bottler_ranking" -> slidingOracleSql("bottler_ranking",
      periodBaseCols,
      mKeys = periodMKeys,
      where = "TRUE",
      selectorSql = """'["period=' || dt || '","channel='
               || cfg_channel || '","kpi=' || kpis || '","metrics='
               || cfg_metrics || '"]'""",
      dims = Seq("bg" -> "bg_sort", "bottler" -> "bottler"),
      metrics = Seq("abbr" -> "to_json(bottler_sort)",
        "c_total_score" -> "c_total_score", "c_weight" -> "c_weight",
        "value" -> "score", "pp_value" -> "pp_score",
        "last_dec_value" -> "last_dec_score"),
      postMCtes = periodPostMCtes,
      sJoins = periodSJoins,
      sExtraCols = periodSExtraCols,
      sWhere = periodSWhere),
    "report_channel_metrics_opportunity" ->
      slidingOracleSql("channel_metrics_opportunity",
        periodBaseCols,
        mKeys = periodMKeys,
        where = "TRUE",
        selectorSql = """'["period=' || dt || '","bg=' || bg_sort
               || '","bottler=' || bottler_sort || '"]'""",
        dims = Seq("metrics" -> "cm_metrics"),
        metrics = Seq("channel" -> "to_json(cm_channel)",
          "c_total_score" -> "c_total_score",
          "c_weight" -> "c_weight",
          "abbreviation" -> ("""CASE WHEN abbreviation IS NULL
               THEN NULL ELSE to_json(abbreviation) END"""),
          "value" -> "score", "pp_value" -> "pp_score",
          "last-dec-value" -> "last_dec_score"),
        postMCtes = s"""cfg(code, cm_channel, cm_metrics, abbreviation,
             c_total_score, c_weight) AS (VALUES
             $cmCfgValuesSql)""",
        sJoins = "JOIN cfg ON cfg.code = a.code",
        sExtraCols = """
             cfg.cm_channel, cfg.cm_metrics, cfg.abbreviation,
             cfg.c_total_score, cfg.c_weight,"""),
    "report_deep_dive_with_ko" ->
      deepDiveKoOracleSql("gt_score_deep_dive_with_ko", withKo = true),
    "report_deep_dive_without_ko" ->
      deepDiveKoOracleSql("gt_score_deep_dive_without_ko",
        withKo = false),
    "report_availability_rural" -> slidingOracleSql("Availability_Rural",
      """strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS dt,
             r_name AS bg,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             n_name AS bottler,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             c_mktsegment AS channel,
             'PG' || CAST(o_orderkey % 2 AS VARCHAR) AS product_group,
             'P-' || o_orderpriority AS item,
             o_totalprice""",
      mKeys = Seq("bg", "bg_sort", "bottler", "bottler_sort", "channel",
        "product_group", "item"),
      where = "TRUE",
      selectorSql = """'["period=' || dt || '","bg=' || bg_sort
               || '","bottler=' || bottler_sort || '"]'""",
      dims = Seq("product_group" -> "product_group",
        "product" -> "item", "channel" -> "channel"),
      metrics = lag7),
    "report_activation_brand" -> slidingOracleSql("activation_brand",
      marketBaseCols + """,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'PURITY' ELSE 'CHARGING' END AS activation_type,
             'Brand-' || o_orderstatus AS brand""",
      mKeys = marketKeys ++ Seq("activation_type", "brand"),
      where = marketWhere,
      selectorSql = selector4Key,
      dims = Seq("activation_type" -> "activation_type",
        "brand" -> "brand"),
      metrics = lag7),
    "report_availability_period_trend" ->
      slidingOracleSql("availability_period_trend",
        marketBaseCols + """,
             'S' || CAST(o_orderkey % 3 AS VARCHAR) || '_'
               || o_orderstatus AS sku_type""",
        mKeys = marketKeys :+ "sku_type",
        where = marketWhere,
        selectorSql = """'["channel=' || channel_sort
               || '","kpi=AVAILABILITY","sku_type=' || sku_type
               || '","bottler=' || bottler_sort || '"]'""",
        dims = Seq("bottler" -> "bottler_sort", "period" -> "dt"),
        metrics = ("bg" -> "to_json(bg)") +: lag7,
        pinnedDwDt = Some("9999-12-31")),
    "report_core_sku" ->
      """WITH cn AS (SELECT c_mktsegment AS seg, n_name, r_name
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         g AS (SELECT 'nation' AS grain, n_name AS name, seg,
             count(*) AS cnt FROM cn GROUP BY 2, 3
           UNION ALL
           SELECT 'region' AS grain, r_name AS name, seg, count(*)
           FROM cn GROUP BY 2, 3)
         SELECT grain, name, '{' || string_agg('"seg=' || seg ||
             '":{"cnt":' || cnt || '}', ',' ORDER BY seg) || '}'
             AS report
         FROM g GROUP BY grain, name ORDER BY grain, name""",
    "report_tree_kpi" ->
      """WITH s AS (SELECT n_name, r_name, count(*) AS cnt
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY n_name, r_name)
         SELECT r_name,
           '{"' || r_name || '":{"DATA":{},"CHILDREN":{' ||
           string_agg('"' || n_name || '":{"DATA":{"score":"' || cnt
             || '"},"CHILDREN":{}}', ',' ORDER BY n_name) ||
           '}}}' AS kpi_tree
         FROM s GROUP BY r_name ORDER BY r_name""",
    "report_opportunity" ->
      """WITH base AS (
           SELECT strftime(last_day(CAST(o_orderdate AS DATE)),
               '%Y-%m-%d') AS dw_dt,
             r_name AS bg, n_name AS bottler,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             substr(o_orderpriority, 1, 1) AS code,
             o_orderpriority AS item, o_totalprice
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         m AS (SELECT bg, bottler, bg_sort, bottler_sort, code, item,
             dw_dt,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS VARCHAR) AS val
           FROM base GROUP BY 1, 2, 3, 4, 5, 6, 7),
         mm AS (SELECT m.*,
             CAST(max(CAST(val AS DECIMAL(28,3))) OVER (PARTITION BY
               bg, bottler, code, item) AS VARCHAR) AS max_value
           FROM m),
         s AS (SELECT a.dw_dt, a.bg, a.bottler, a.bg_sort,
             a.bottler_sort, a.code, a.val, a.max_value,
             mom.val AS pp_value, ytd.val AS last_dec_value,
             yoy.val AS yoy_value
           FROM mm a
           LEFT JOIN m mom ON mom.bg = a.bg AND mom.bottler = a.bottler
             AND mom.code = a.code AND mom.item = a.item
             AND mom.dw_dt = strftime(last_day(CAST(a.dw_dt AS DATE)
               - INTERVAL 1 MONTH), '%Y-%m-%d')
           LEFT JOIN m ytd ON ytd.bg = a.bg AND ytd.bottler = a.bottler
             AND ytd.code = a.code AND ytd.item = a.item
             AND ytd.dw_dt = strftime(last_day(date_trunc('year',
               CAST(a.dw_dt AS DATE)) - INTERVAL 1 MONTH), '%Y-%m-%d')
           LEFT JOIN m yoy ON yoy.bg = a.bg AND yoy.bottler = a.bottler
             AND yoy.code = a.code AND yoy.item = a.item
             AND yoy.dw_dt = strftime(last_day(CAST(a.dw_dt AS DATE)
               - INTERVAL 12 MONTH), '%Y-%m-%d')),
         cfg AS (SELECT * FROM (VALUES
             ('0_distribution', '1', '[1]Urgent KPI'),
             ('0_distribution', '2', '[2]High KPI'),
             ('1_execution', '3', '[3]Medium KPI'),
             ('1_execution', '4', '[4]Unspecified KPI'),
             ('1_execution', '5', '[5]Low KPI'))
           t(cat, code, cfg_key)),
         sel AS (SELECT DISTINCT dw_dt, bg, bottler, bg_sort,
             bottler_sort FROM s),
         leaves AS (SELECT g.dw_dt, g.bg_sort, g.bottler_sort, c.cat,
             '"' || c.cfg_key || '":{"DATA":' ||
             CASE WHEN s.val IS NULL THEN '{}'
               ELSE '{"last_dec_value":'
                 || coalesce('"' || s.last_dec_value || '"', 'null')
                 || ',"last_year_same_month_score":'
                 || coalesce('"' || s.yoy_value || '"', 'null')
                 || ',"max_value":"' || s.max_value
                 || '","pp_value":'
                 || coalesce('"' || s.pp_value || '"', 'null')
                 || ',"value":"' || s.val || '"}'
             END || ',"CHILDREN":{}}' AS node
           FROM sel g CROSS JOIN cfg c
           LEFT JOIN s ON s.dw_dt = g.dw_dt AND s.bg = g.bg
             AND s.bottler = g.bottler AND s.code = c.code),
         cats AS (SELECT dw_dt, bg_sort, bottler_sort, cat,
             '"' || cat || '":{"DATA":{},"CHILDREN":{'
             || string_agg(node, ',' ORDER BY node) || '}}' AS catnode
           FROM leaves GROUP BY 1, 2, 3, 4)
         SELECT dw_dt, 'cocacola' AS project, 'score' AS category,
           'opportunity' AS report,
           '["period=' || dw_dt || '","bg=' || bg_sort || '","bottler='
             || bottler_sort || '"]' AS selector,
           '' AS selector_desc,
           '{"trgx-data":{' || string_agg(catnode, ',' ORDER BY catnode)
             || '}}' AS dimension_metrics
         FROM cats GROUP BY dw_dt, bg_sort, bottler_sort
         ORDER BY dw_dt, selector""",
    "report_details" ->
      """WITH base AS (
           SELECT strftime(last_day(CAST(o_orderdate AS DATE)),
               '%Y-%m-%d') AS dw_dt,
             r_name AS bg, n_name AS bottler,
             '0.' || CAST(r_regionkey + 1 AS VARCHAR) || '_' || r_name
               AS bg_sort,
             CAST(n_nationkey AS VARCHAR) || '_' || n_name
               AS bottler_sort,
             substr(o_orderpriority, 1, 1) AS code,
             o_orderpriority AS item, o_totalprice
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         md AS (SELECT bg, bottler, bg_sort, bottler_sort, code, item,
             dw_dt,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(38,2)) AS VARCHAR) AS val
           FROM base GROUP BY 1, 2, 3, 4, 5, 6, 7),
         m AS (SELECT bg, bottler, bg_sort, bottler_sort, code, item,
             '{' || string_agg('"period=' || dw_dt || '":{"value":'
               || val || '}', ',' ORDER BY dw_dt) || '}' AS pv
           FROM md GROUP BY 1, 2, 3, 4, 5, 6),
         cfg AS (SELECT * FROM (VALUES
             ('0_distribution', '1', '[1]Urgent KPI'),
             ('0_distribution', '2', '[2]High KPI'),
             ('1_execution', '3', '[3]Medium KPI'),
             ('1_execution', '4', '[4]Unspecified KPI'),
             ('1_execution', '5', '[5]Low KPI'))
           t(cat, code, cfg_key)),
         sel AS (SELECT DISTINCT bg, bottler, bg_sort, bottler_sort
           FROM m),
         leaves AS (SELECT g.bg_sort, g.bottler_sort, c.cat,
             '"' || c.cfg_key || '":{"DATA":' ||
             CASE WHEN m.pv IS NULL THEN '{}'
               ELSE '{"period_value":' || m.pv || '}' END
             || ',"CHILDREN":{}}' AS node
           FROM sel g CROSS JOIN cfg c
           LEFT JOIN m ON m.bg = g.bg AND m.bottler = g.bottler
             AND m.code = c.code),
         cats AS (SELECT bg_sort, bottler_sort, cat,
             '"' || cat || '":{"DATA":{},"CHILDREN":{'
             || string_agg(node, ',' ORDER BY node) || '}}' AS catnode
           FROM leaves GROUP BY 1, 2, 3)
         SELECT '9999-12-31' AS dw_dt, 'cocacola' AS project,
           'score' AS category, 'details' AS report,
           '["bg=' || bg_sort || '","bottler=' || bottler_sort || '"]'
             AS selector,
           '' AS selector_desc,
           '{' || string_agg(catnode, ',' ORDER BY catnode) || '}'
             AS dimension_metrics
         FROM cats GROUP BY bg_sort, bottler_sort
         ORDER BY selector""",
    "model_debut" ->
      """WITH k AS (SELECT o_custkey AS custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS dt, o_orderpriority
           FROM orders),
         agg AS (SELECT custkey,
             string_agg(DISTINCT dt, '|' ORDER BY dt) AS pay_dts,
             min(dt) AS min_pay_dt,
             CAST(max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                  ELSE 0 END) AS INT) AS exist_urgent
           FROM k GROUP BY custkey)
         SELECT custkey, exist_urgent, pay_dts, min_pay_dt,
           CASE WHEN exist_urgent = 1
                THEN strftime(last_day(CAST(min_pay_dt AS DATE)
                     - INTERVAL 1 MONTH), '%Y-%m-%d')
                ELSE min_pay_dt END AS debut_dt
         FROM agg ORDER BY custkey""",
    "mlin_denormalize" ->
      """SELECT o_orderkey, c_custkey, n_name,
         CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS seg_auto,
         CAST(c_mktsegment = 'BUILDING' AS INT) AS seg_bld,
         CAST(c_mktsegment = 'MACHINERY' AS INT) AS seg_mach,
         CAST(coalesce(o_totalprice < 150000.0, FALSE) AS INT) AS big_lt,
         CAST(coalesce(o_totalprice > 150000.0, FALSE) AS INT) AS big_gt,
         CAST(coalesce(CASE WHEN c_acctbal < 0 THEN NULL
           ELSE c_acctbal END > 5000.0, FALSE) AS INT) AS rich
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY o_orderkey"""
  )

  /** Oracle for the family probe: the members' own oracles, UNION ALL,
    * re-ordered on the family sink's natural key. */
  val oracles: Map[String, String] = baseOracles +
    ("report_family_run" ->
      ("SELECT * FROM ((" +
        familyProbeMembers.map(baseOracles).mkString(") UNION ALL (") +
        ")) AS u ORDER BY report, dw_dt, selector")) +
    ("report_family_full" ->
      ("SELECT * FROM ((" +
        familyNames.map(baseOracles).mkString(") UNION ALL (") +
        ")) AS u ORDER BY " +
        Reports.sinkColumns.map(_ + " NULLS FIRST").mkString(", ")))
}
