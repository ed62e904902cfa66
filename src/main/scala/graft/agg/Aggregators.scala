package graft.agg

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregation functions (SURVEY §2.5).
  *
  * All plan as ObjectHashAggregate with **map-side partial aggregation**:
  * the buffer is keyed by group content (bounded by key cardinality), not
  * by row count — the scale-safe shape the round-1 verdict demanded
  * (never a `collect_list` row buffer on hot groups). The two hottest
  * (collect-kv, tr-dimension-metrics) are native Catalyst
  * TypedImperativeAggregates (NativeAggs.scala); collect-kvs stays a
  * typed `Aggregator` via `functions.udaf`.
  */
object Aggregators {

  /** `collect-kvs`: multimap `{k → set(v)}` per group
    * (mlin/d_bolome_user_order.clj:42). Values deduped and sorted so the
    * output is deterministic across merge orders. */
  class CollectKvs extends Aggregator[(String, String),
                                      Map[String, Seq[String]],
                                      Map[String, Seq[String]]] {
    def zero: Map[String, Seq[String]] = Map.empty
    def reduce(b: Map[String, Seq[String]], in: (String, String)) =
      if (in._1 == null) b
      else {
        val cur = b.getOrElse(in._1, Vector.empty)
        if (cur.contains(in._2)) b else b.updated(in._1, cur :+ in._2)
      }
    def merge(a: Map[String, Seq[String]], b: Map[String, Seq[String]]) =
      b.foldLeft(a) { case (acc, (k, vs)) =>
        acc.updated(k, (acc.getOrElse(k, Vector.empty) ++ vs).distinct)
      }
    def finish(b: Map[String, Seq[String]]) =
      b.map { case (k, vs) => k -> vs.sorted }
    def bufferEncoder: Encoder[Map[String, Seq[String]]] =
      ExpressionEncoder[Map[String, Seq[String]]]()
    def outputEncoder: Encoder[Map[String, Seq[String]]] = bufferEncoder
  }

  // ---- Column-level entry points -----------------------------------

  /** collect_kv(k, v) → MapType column — the native
    * TypedImperativeAggregate (NativeAggs.scala): raw InternalRow
    * updates, compact byte-buffer partials, no encoder serde. */
  def collectKv(k: Column, v: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CollectKvAgg(GraftBridge.expression(k),
      GraftBridge.expression(v)).toAggregateExpression())
  }

  /** collect_kvs(k, v) → Map[String, Seq[String]] column. */
  def collectKvs(k: Column, v: Column): Column =
    udaf(new CollectKvs).apply(k, v)

  /** tr_dimension_metrics(array(dims...), map(metricName, value, ...))
    * → nested-JSON string column — the native TypedImperativeAggregate
    * (NativeAggs.scala). */
  def trDimensionMetrics(dims: Column, metrics: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(TrDimensionMetricsAgg(GraftBridge.expression(dims),
      GraftBridge.expression(metrics)).toAggregateExpression())
  }


  /** `str-max` / `str-min` (trgx.clj:63-69): lexicographic extremes
    * skipping null and the "null" sentinel — built-ins suffice once the
    * sentinel is normalized. */
  def strMax(c: Column): Column =
    max(when(lower(c) === "null", lit(null)).otherwise(c))
  def strMin(c: Column): Column =
    min(when(lower(c) === "null", lit(null)).otherwise(c))

  /** `merge-with union` of two map-of-array columns (snapshot self-join
    * merge, model/d_bolome_order_show_debut.clj:89) — pure Catalyst
    * higher-order functions, no UDF. */
  def mapSetUnion(a: Column, b: Column): Column =
    map_zip_with(a, b, (_, v1, v2) =>
      when(v1.isNull, array_sort(v2))
        .when(v2.isNull, array_sort(v1))
        .otherwise(array_sort(array_distinct(concat(v1, v2)))))
}
