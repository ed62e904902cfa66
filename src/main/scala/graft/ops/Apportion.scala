package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact integer apportionment — the budgeted-stage primitive. */
object Apportion {

  /** Hamilton (largest-remainder) apportionment: split an integer
    * `total` across rows proportionally to the non-negative Long
    * `weightCol`, EXACTLY — Σ quota = total, every quota is
    * floor(total·w ÷ W) or that plus one, and the +1s go to the
    * largest remainders (ties broken by `keyCols` ascending, so the
    * split is deterministic). This is the op every budgeted stage
    * needs — crawl fetches per domain, sample counts per stratum,
    * rows per shard — where per-row rounding over- or under-shoots
    * the budget and this never does.
    *
    * All arithmetic is Long (floors/remainders are exact integer
    * division, identical in every engine); the caller keeps
    * total · W inside Long — guarded with a loud require. Zero
    * weights always get quota 0: k = Σrem ÷ W and every remainder is
    * strictly below W, so k is strictly less than the count of
    * positive remainders — a +1 never reaches a zero-remainder row.
    * W = 0 (all weights zero) is rejected loudly.
    *
    * Scale shape: one aggregate for (W, min w, Σ floor), floors and
    * remainders map-side, and the +1 election rides the two-phase
    * [[Relational.globalRowNumber]] — no single-partition window.
    * The input is staged once (it feeds both the aggregate and the
    * ranked projection).
    *
    * Output: keyCols ++ (weightCol, quota). */
  def largestRemainder(df: DataFrame, keyCols: Seq[String],
                       weightCol: String, total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0: $total")
    val w = graft.core.Tables.staged(
      df.select((keyCols.map(col) :+
        col(weightCol).cast("long").as("__w")): _*), "apportion_w")
    val stats = w.agg(sum(col("__w")).as("W"), min(col("__w")).as("mn"),
      count(lit(1)).as("n")).first()
    require(!stats.isNullAt(0) && stats.getLong(0) > 0,
      "largestRemainder: total weight must be positive")
    val bigW = stats.getLong(0)
    require(stats.getLong(1) >= 0,
      s"largestRemainder: negative weight (min ${stats.getLong(1)})")
    require(total == 0 || bigW <= Long.MaxValue / total,
      s"largestRemainder: total*W overflows Long ($total * $bigW)")
    val floors = w.withColumn("__fl",
        expr(s"(${total}L * __w) div ${bigW}L"))
      .withColumn("__rem", expr(s"(${total}L * __w) % ${bigW}L"))
    val k = total - (if (total == 0) 0L
      else floors.agg(sum(col("__fl"))).first().getLong(0))
    Relational.globalRowNumber(floors,
        col("__rem").desc +: keyCols.map(col), "__rk")
      .select((keyCols.map(col) :+ col("__w").as(weightCol) :+
        (col("__fl") + when(col("__rk") <= k, 1L).otherwise(0L))
          .as("quota")): _*)
  }
}
