package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Custom aggregation functions (SURVEY §2.5).
  *
  * All plan as ObjectHashAggregate with **map-side partial aggregation**:
  * the buffer is keyed by group content (bounded by key cardinality), not
  * by row count — the scale-safe shape the round-1 verdict demanded
  * (never a `collect_list` row buffer on hot groups). The three group
  * collectors (collect-kv, collect-kvs, tr-dimension-metrics) are
  * native Catalyst TypedImperativeAggregates (NativeAggs.scala): raw
  * InternalRow updates, compact byte-buffer partials, no encoder serde.
  */
object Aggregators {

  // ---- Column-level entry points -----------------------------------

  /** collect_kv(k, v) → MapType column — the native
    * TypedImperativeAggregate (NativeAggs.scala): raw InternalRow
    * updates, compact byte-buffer partials, no encoder serde. */
  def collectKv(k: Column, v: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CollectKvAgg(GraftBridge.expression(k),
      GraftBridge.expression(v)).toAggregateExpression())
  }

  /** collect_kvs(k, v) → Map[String, Array[String]] multimap column —
    * native TypedImperativeAggregate (NativeAggs.scala): O(1) HashSet
    * dedup per row where the former typed Aggregator paid a
    * `Seq.contains` scan (O(V²) on a hot group), values emitted
    * sorted. */
  def collectKvs(k: Column, v: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CollectKvsAgg(GraftBridge.expression(k),
      GraftBridge.expression(v)).toAggregateExpression())
  }

  /** tr_dimension_metrics(array(dims...), map(metricName, value, ...))
    * → nested-JSON string column — the native TypedImperativeAggregate
    * (NativeAggs.scala). */
  def trDimensionMetrics(dims: Column, metrics: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TrDimensionMetricsAgg(GraftBridge.expression(dims),
      GraftBridge.expression(metrics)).toAggregateExpression())
  }


  /** Raw native string extremes — ObjectHashAggregate instead of the
    * SortAggregate the built-in Min/Max force on StringType (which
    * full-sorts the input on both aggregation sides just to keep one
    * extreme per group; see NativeAggs.StrExtremumAgg). Same binary
    * UTF-8 ordering and null-skipping as the built-ins. */
  def strMaxRaw(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(StrExtremumAgg(GraftBridge.expression(c),
      isMax = true).toAggregateExpression())
  }
  def strMinRaw(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(StrExtremumAgg(GraftBridge.expression(c),
      isMax = false).toAggregateExpression())
  }

  /** `str-max` / `str-min` (trgx.clj:63-69): lexicographic extremes
    * skipping null and the "null" sentinel — the native extremum over
    * the normalized column (ONE normalization, `convertNull`, so the
    * sentinel contract cannot drift between call sites). */
  def strMax(c: Column): Column =
    strMaxRaw(graft.functions.Functions.convertNull(c))
  def strMin(c: Column): Column =
    strMinRaw(graft.functions.Functions.convertNull(c))

  /** kll_sketch_agg(x, k) → serialized KLL quantile sketch (binary) —
    * the mergeable unbounded-cardinality quantile state for the
    * dataset card (KllAggs.scala; Spark's own DataSketches jar). */
  def kllSketch(c: Column, k: Int = 200): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(KllSketchAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())
  }

  /** kll_merge_agg(sketch) → merged serialized KLL sketch — the
    * card-time union over persisted per-shard sketch rows. */
  def kllMerge(c: Column, k: Int = 200): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(KllMergeAgg(GraftBridge.expression(c), k)
      .toAggregateExpression())
  }

  /** `merge-with union` of two map-of-array columns (snapshot self-join
    * merge, model/d_bolome_order_show_debut.clj:89) — pure Catalyst
    * higher-order functions, no UDF. */
  def mapSetUnion(a: Column, b: Column): Column =
    map_zip_with(a, b, (_, v1, v2) =>
      when(v1.isNull, array_sort(v2))
        .when(v2.isNull, array_sort(v1))
        .otherwise(array_sort(array_distinct(concat(v1, v2)))))
}
