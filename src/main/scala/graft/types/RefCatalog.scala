package graft.types

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tap-header catalog (SURVEY §7 `graft.types`): every table the
  * reference reads or writes, with the exact `-`-form column lists its
  * pg-tap declarations carry. The reference's scheme is all-String
  * (trgx.clj:105-106), so a column-name list IS the schema; pair with
  * `graft.sources.Jdbc.readTable/writeTable` to read or publish any
  * reference table unchanged.
  *
  * Where the reference declares a table at two widths (score 13/14,
  * score_rural 10/11) the widest form is kept — narrower readers
  * simply select fewer columns. Citations: tap headers at
  * m_cocacola_*.clj:38-41, ods/stg taps at d_bolome_show.clj:34-37,
  * mlvar taps at d_bolome_user_order.clj:40-43, report sink at
  * m_cocacola_score_overall.clj:40, config tree at trgx.clj:198.
  */
object RefCatalog {

  val tables: Map[String, Seq[String]] = Map(
    // config tree (driver-fetched, kv->trgx input)
    "conf.trgx_cocacola" ->
      Seq("key", "data", "dw_in_use", "dw_ld_ts"),
    // cocacola fact tables (model.*)
    "model.d_cocacola_score" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort",
        "channel_sort", "kpi_sort"),
    "model.d_cocacola_score_rural" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation"),
    "model.d_cocacola_score_tier" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort",
        "channel_sort", "kpi_sort"),
    "model.d_cocacola_achievement_rate" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort",
        "c_total_score", "c_weight"),
    "model.d_cocacola_gt_score_deep_dive" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort", "p_item",
        "item_weight", "item_order", "total_score"),
    "model.d_cocacola_gt_score_deep_dive_with_ko" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort", "p_item",
        "item_weight", "item_order", "total_score"),
    "model.d_cocacola_gt_score_deep_dive_without_ko" ->
      Seq("dw-dt", "period", "mbd", "bg", "bottler", "channel", "code",
        "item", "fact", "value", "abbrevation", "bg_sort", "p_item",
        "item_weight", "item_order", "total_score"),
    "model.d_cocacola_anal_rep_kpis" ->
      Seq("dw-dt", "market", "bg", "bottler", "channel", "kpi",
        "kpi_details", "item", "product", "value", "xorder", "level",
        "bg_sort", "abbrevation", "channel_sort"),
    "model.d_cocacola_core_sku" ->
      Seq("dw-dt", "bg", "bottler", "channel", "product", "xorder",
        "kpi_type", "value", "bg_sort", "abbrevation", "channel_sort"),
    "model.d_cocacola_sku" ->
      Seq("dw-dt", "period", "mbd", "bottler_group", "bottler",
        "channel", "sku_type", "product", "abbrevation", "channel_sort",
        "bg_sort"),
    "model.d_cocacola_sku_mapping" ->
      Seq("dw-dt", "period", "market", "bg", "bottler", "channel",
        "sku", "brand", "sku_detail", "orders", "value", "bg_sort",
        "abbrevation", "channel_sort"),
    "model.d_cocacola_sovi" ->
      Seq("dw-dt", "bg", "bottler", "channel", "market", "vendor",
        "product_category", "sovi_type", "value", "bg_sort",
        "abbrevation", "channel_sort"),
    "model.d_cocacola_availability_rural" ->
      Seq("dw-dt", "bgs", "bottlers", "channel", "item",
        "product_group", "value", "abbrevation", "bg_sort"),
    "model.d_cocacola_activation_summary" ->
      Seq("dw-dt", "market", "bg", "bottler", "channel", "vendor",
        "fact", "value", "bg_sort", "abbrevation", "channel_sort"),
    "model.d_cocacola_activation_detail" ->
      Seq("dw-dt", "market", "bg", "bottler", "channel", "vendor",
        "detail", "fact", "value", "bg_sort", "abbrevation",
        "channel_sort"),
    "model.d_cocacola_cooler" ->
      Seq("dw-dt", "market", "bg", "bottler", "channel", "vendor",
        "fact", "value", "bg_sort", "abbrevation", "channel_sort"),
    // bolome staging / ods / model chain
    "stg.d_bolome_show" ->
      Seq("show-id", "show-name", "begin-time", "end-time"),
    "ods.d_bolome_show" ->
      Seq("dw-dt", "dw-ts", "dw-id", "show-id", "show-name",
        "begin-time", "end-time"),
    "model.d_bolome_show" ->
      Seq("dw-dt", "dw-ts", "dw-id", "show-id", "show-name",
        "begin-time", "end-time"),
    "stg.d_bolome_product_category" ->
      Seq("barcode", "product-name", "category-1", "category-2"),
    "ods.d_bolome_product_category" ->
      Seq("dw-dt", "dw-ts", "dw-id", "barcode", "product-name",
        "category-1", "category-2"),
    "model.d_bolome_event" ->
      Seq("dw-dt", "event-id", "type-name", "event-name", "create-date"),
    // mlvar tree tables (trgx TEXT column)
    "mlvar.d_bolome_user_order" -> Seq("dw-src-id", "trgx"),
    // report sink
    "ms.report" ->
      Seq("dw-dt", "project", "category", "report", "selector",
        "selector-desc", "dimension-metrics"))

  /** All-String StructType for a catalog table (the tap scheme). */
  def schemaOf(table: String): StructType =
    StructType(tables(table).map(c =>
      StructField(c, StringType, nullable = true)))

  /** Read a reference table through the pg-tap-semantics JDBC source
    * using its catalog column list. `dbTable` defaults to the catalog
    * name (Postgres `schema.table` form); override for stores without
    * schema qualifiers (e.g. embedded Derby in tests). */
  def readRef(spark: SparkSession, url: String, table: String,
              dbTable: String = null): DataFrame =
    graft.sources.Jdbc.readTable(spark, url,
      Option(dbTable).getOrElse(table), tables(table))
}
