package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles — the threshold primitive behind
  * percentile-based corpus quality cuts ("keep the top quartile of
  * docs per language", "what length is the p95 of this 100 TB
  * corpus").
  *
  * Spark's own exact `percentile` aggregate buffers every value of a
  * group in ONE executor (OpenHashMap per group — fine for report
  * grain, a scale-killer on a corpus-sized group), and
  * `percentile_approx` trades the answer away. This is the third
  * path: SQL `percentile_cont` semantics, computed exactly, with no
  * per-group value buffer anywhere — one range-partitioned rank pass
  * ([[Relational.groupedRowNumber]], already skew-safe when one group
  * dominates the corpus) and one slim aggregation over at most
  * 2·|probs| contributing rows per group.
  *
  * Definition (SQL percentile_cont / DuckDB quantile_cont): with the
  * group's non-null values v₁ ≤ … ≤ vₙ and h = p·(n−1) (0-based),
  * q = v⌊h⌋₊₁·(1−f) + v⌊h⌋₊₂·f where f = h−⌊h⌋. Ranks only depend on
  * the sorted multiset, so tie order inside the rank pass cannot
  * change the answer. f is computed from the same IEEE product
  * p·(n−1) every SQL engine uses, so oracle parity holds to the ulp;
  * when p is a dyadic rational (0.25/0.5/0.75) and values are
  * integers, the result is EXACT — the property the percentile-filter
  * thresholds rely on (no boundary-row flapping against an oracle).
  */
object Quantiles {

  /** Per-group exact `percentile_cont(p)` for every p in `probs`.
    * Returns one row per (group × prob): groupCols ++ (prob double,
    * quantile double). Null values are excluded (SQL aggregate
    * semantics); a group with zero non-null values emits no rows
    * (matching `percentile_cont` over an empty set = NULL, which a
    * grouped SQL aggregate also never materializes without the
    * group). Scale: one rank shuffle over the data + an aggregation
    * whose input is ≤ 2·|probs| rows per group. */
  def groupedQuantileCont(df: DataFrame, groupCols: Seq[String],
                          valCol: String, probs: Seq[Double],
                          nPartitions: Int = 0): DataFrame = {
    require(probs.nonEmpty, "groupedQuantileCont: no probs given")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"groupedQuantileCont: probs must lie in [0,1], got $probs")
    val clean = df.filter(col(valCol).isNotNull)
      .select(groupCols.map(col) :+
        col(valCol).cast("double").as("__v"): _*)
    val ranked = Relational.groupedRowNumber(clean, groupCols,
      Seq(col("__v").asc), "__rk", "__n", nPartitions)
    val probArr = array(probs.map(p => lit(p)): _*)
    val e = ranked.select(groupCols.map(col) :+ col("__v") :+
      col("__rk") :+ col("__n") :+ explode(probArr).as("prob"): _*)
    // h in [0, n-1]; the row at 1-based rank ⌊h⌋+1 contributes (1−f),
    // its successor f (only when f > 0 — at f = 0 the successor may
    // not exist and must not contribute)
    val h = col("prob") * (col("__n") - lit(1L)).cast("double")
    val f = h - floor(h)
    val lo = floor(h).cast("long") + lit(1L)
    val w = when(col("__rk") === lo, lit(1.0) - f)
      .when(col("__rk") === lo + lit(1L) && f > lit(0.0), f)
    e.filter(w.isNotNull)
      .select(groupCols.map(col) :+ col("prob") :+
        (col("__v") * w).as("__c"): _*)
      // ≤ 2 contributions per (group, prob): IEEE addition of two
      // terms is commutative, so aggregation order cannot move a bit
      .groupBy(groupCols.map(col) :+ col("prob"): _*)
      .agg(sum(col("__c")).as("quantile"))
  }

  /** Global exact `percentile_cont` — the one-group form. The rank
    * pass range-partitions on the value itself, so the "group" still
    * spans every partition (no single-task bottleneck). */
  def quantileCont(df: DataFrame, valCol: String, probs: Seq[Double],
                   nPartitions: Int = 0): DataFrame =
    groupedQuantileCont(df, Seq.empty, valCol, probs, nPartitions)

  /** Percentile-threshold filter — "keep each group's rows at or
    * above its own p-quantile of `valCol`" (the per-language quality
    * cut of a training-data pipeline; `keepLower` flips it to a
    * contamination-style cut BELOW the threshold). Thresholds are one
    * row per group, broadcast back — the corpus is scanned twice
    * (once ranked, once filtered), never collected. Rows whose group
    * has no threshold (all-null valCol) are dropped, like the join
    * they fail. */
  def percentileFilter(df: DataFrame, groupCols: Seq[String],
                       valCol: String, p: Double,
                       keepLower: Boolean = false,
                       nPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty,
      "percentileFilter: empty groupCols (use quantileCont + a " +
        "literal filter for the global form)")
    val thr = groupedQuantileCont(df, groupCols, valCol, Seq(p),
        nPartitions)
      .select(groupCols.map(col) :+ col("quantile").as("__thr"): _*)
    val cond: Column =
      if (keepLower) col(valCol) <= col("__thr")
      else col(valCol) >= col("__thr")
    df.join(broadcast(thr), groupCols).filter(cond).drop("__thr")
  }
}
