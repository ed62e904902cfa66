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
  /** Epoch-capped apportionment — exact water-filling: split `total`
    * proportionally to `weightCol` like [[largestRemainder]], but no
    * row may receive more than its `capCol` (for a training-data
    * mixture, cap = max-epochs × available tokens — the
    * data-constrained regime of Muennighoff et al. 2023, where a
    * small high-weight source must not be asked for 40 epochs of
    * itself and its excess share flows to the sources that still have
    * headroom).
    *
    * Closed-form water-fill, no iteration: sort rows by cap/weight
    * ascending (the order in which caps bind as the water level
    * rises), find the longest prefix where each row's cap is at or
    * below its proportional share of what remains
    * (cap_i · W_i ≤ R_i · w_i, compared EXACTLY in decimal(38,0) —
    * R_i/W_i the running remaining budget/weight), saturate that
    * prefix at cap, and Hamilton-apportion the remaining budget over
    * the suffix ([[largestRemainder]], so Σ quota = total exactly
    * whenever Σ cap ≥ total, else Σ quota = Σ cap). The suffix quota
    * is clamped at cap as a belt: the prefix test makes every suffix
    * share strictly below its cap under the sort order, so the clamp
    * only ever fires in the measure-zero case where two IEEE-rounded
    * ratios tie across the stop boundary — and then it UNDER-allocates
    * rather than ever exceeding an epoch cap.
    *
    * Determinism: the sort key is the IEEE double cap/weight (exact
    * division of two < 2^53 Longs — engine-identical), ties broken by
    * `keyCols`; everything downstream is integer arithmetic. Weights
    * must be strictly positive (a zero-weight source does not belong
    * in a mixture — rejected loudly); caps non-negative; weight, cap,
    * total < 2^53 so the double sort key and the decimal products stay
    * exact.
    *
    * Scale shape: the sort/rank and BOTH running sums ride one fused
    * two-phase pass ([[rankedPrefix]] — globalRowNumber's
    * range-partition + driver-offset pattern carrying the prefix sums
    * alongside the rank; 1 shuffle, 2 jobs) — no single-partition
    * window, so this holds for per-DOMAIN caps (millions of rows),
    * not just per-source config tables. Driver fetches: the stats
    * row, the per-partition subtotal array, the stop rank, and the
    * saturated-cap sum.
    *
    * Output: keyCols ++ (weightCol, capCol, quota). */
  def cappedLargestRemainder(df: DataFrame, keyCols: Seq[String],
                             weightCol: String, capCol: String,
                             total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0: $total")
    val lim = 1L << 53
    val w0 = graft.core.Tables.staged(
      df.select((keyCols.map(col) :+
        col(weightCol).cast("long").as("__w") :+
        col(capCol).cast("long").as("__c")): _*), "capfill_w")
    val stats = w0.agg(min(col("__w")), max(col("__w")),
      min(col("__c")), max(col("__c")), sum(col("__w")),
      count(lit(1))).first()
    require(stats.getLong(5) > 0, "cappedLargestRemainder: empty input")
    require(stats.getLong(0) > 0,
      s"cappedLargestRemainder: weights must be > 0 (min ${
        stats.getLong(0)})")
    require(stats.getLong(2) >= 0,
      s"cappedLargestRemainder: negative cap (min ${stats.getLong(2)})")
    require(stats.getLong(1) < lim && stats.getLong(3) < lim &&
      total < lim && stats.getLong(4) < lim,
      "cappedLargestRemainder: weight/cap/total must stay < 2^53 " +
        "for the exact double sort key and decimal(38,0) products")
    val bigW = stats.getLong(4)
    // the Hamilton suffix stage runs largestRemainder(rest, ΣunsatW)
    // with rest ≤ total and ΣunsatW ≤ ΣW, so mirroring its stricter
    // total·W < 2^63 guard HERE rejects contract-legal-looking inputs
    // up front instead of aborting mid-plan inside the suffix call
    require(total == 0 || bigW <= Long.MaxValue / total,
      s"cappedLargestRemainder: total * sum(weights) must stay inside " +
        s"Long for the Hamilton suffix (total=$total, W=$bigW)")
    val cum = graft.core.Tables.staged(rankedPrefix(w0, keyCols),
      "capfill_cum")
    // saturation test on the running remainders, exact in decimal:
    // cap_i · W_i ≤ R_i · w_i with R_i = total − caps already bound,
    // W_i = weight not yet bound (both inclusive of row i)
    val dec = "decimal(38,0)"
    val flagged = cum
      .withColumn("__ri", lit(total) - (col("__ccap") - col("__c")))
      .withColumn("__wi", lit(bigW) - (col("__cw") - col("__w")))
      .withColumn("__sat",
        col("__c").cast(dec) * col("__wi").cast(dec) <=
          col("__ri").cast(dec) * col("__w").cast(dec))
    val stop = flagged.filter(!col("__sat"))
      .agg(min(col("__rk"))).first() match {
        case r if r.isNullAt(0) => Long.MaxValue
        case r => r.getLong(0)
      }
    val satPart = flagged.filter(col("__rk") < stop)
      .select((keyCols.map(col) :+ col("__w") :+ col("__c") :+
        col("__c").as("quota")): _*)
    val unsat = flagged.filter(col("__rk") >= stop)
    val unsatPart =
      if (stop == Long.MaxValue)
        unsat.select((keyCols.map(col) :+ col("__w") :+ col("__c") :+
          lit(0L).as("quota")): _*)
      else {
        val bound = satPart.agg(coalesce(sum(col("__c")), lit(0L)))
          .first().getLong(0)
        val rest = total - bound
        largestRemainder(unsat, keyCols, "__w", rest)
          .withColumnRenamed("__w", "__hw")
          .join(unsat.select((keyCols.map(col) :+ col("__w") :+
            col("__c")): _*), keyCols)
          .select((keyCols.map(col) :+ col("__w") :+ col("__c") :+
            least(col("quota"), col("__c")).as("quota")): _*)
      }
    satPart.unionByName(unsatPart)
      .withColumnRenamed("__w", weightCol)
      .withColumnRenamed("__c", capCol)
  }

  /** ONE two-phase pass computing the water-fill's global rank AND
    * both running sums over the ratio order — globalRowNumber's
    * range-partition + driver-offset pattern extended to carry the
    * (cap, weight) prefix sums, replacing rank + 2 cumsum passes
    * (3 shuffles, 6 jobs) with 1 shuffle, 2 jobs. Both jobs run over
    * the SAME shuffled RDD instance (identical sampled boundaries,
    * the globalRowNumber contract), and the map pass re-checks each
    * partition's subtotals against the counting job's — loud failure
    * over silent corruption (the groupedPrefix discipline).
    * Input: (keyCols, __w, __c); appends (__rk, __ccap, __cw). */
  private def rankedPrefix(w0: DataFrame,
                           keyCols: Seq[String]): DataFrame = {
    Relational.recordTwoPhase()
    val spark = w0.sparkSession
    val schema = w0.schema
    val sortCols =
      (col("__c").cast("double") / col("__w").cast("double")).asc +:
        keyCols.map(col(_).asc)
    val rdd = w0.repartitionByRange(
        spark.sessionState.conf.numShufflePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd
    val cIdx = schema.fieldIndex("__c")
    val wIdx = schema.fieldIndex("__w")
    val parts = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var sc = 0L; var sw = 0L
      it.foreach { r =>
        n += 1; sc += r.getLong(cIdx); sw += r.getLong(wIdx)
      }
      Iterator((i, (n, sc, sw)))
    }.collect().sortBy(_._1).map(_._2)
    val offs = parts.scanLeft((0L, 0L, 0L)) {
      case ((n, c, w), (n2, c2, w2)) => (n + n2, c + c2, w + w2)
    }
    val bc = spark.sparkContext.broadcast((offs, parts))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val (offsets, totals) = bc.value
      var (n, cc, cw) = offsets(i)
      var rn = 0L; var rc = 0L; var rw = 0L
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && i < totals.length) {
            val t = totals(i)
            if (t != ((rn, rc, rw))) sys.error(
              s"rankedPrefix: partition $i subtotal ($rn, $rc, $rw) " +
                s"!= counting job's $t — upstream recomputed " +
                "nondeterministically")
          }
          h
        }
        def next(): org.apache.spark.sql.Row = {
          val r = it.next()
          val c = r.getLong(cIdx); val w = r.getLong(wIdx)
          n += 1; cc += c; cw += w; rn += 1; rc += c; rw += w
          org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(n, cc, cw))
        }
      }
    }
    import org.apache.spark.sql.types.LongType
    spark.createDataFrame(out, schema
      .add("__rk", LongType, nullable = false)
      .add("__ccap", LongType, nullable = false)
      .add("__cw", LongType, nullable = false))
  }

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

  /** Temperature-flattened mixture apportionment — the multilingual
    * α-sampling standard (Lample & Conneau 2019; XLM-R): a source's
    * share of the budget is proportional to count^α with α < 1
    * flattening the distribution toward rare sources, so a
    * high-resource language does not drown the tail; the flattened
    * weights feed [[largestRemainder]], so Σ quota = total EXACTLY.
    *
    * α is restricted to {1.0, 0.5, 0.25} deliberately: IEEE-754 sqrt
    * is CORRECTLY ROUNDED while pow is not (libm and the JVM may
    * differ in the last ulp, which the round() below amplifies into a
    * ±1 integer weight and a DIFFERENT apportionment), so count^(1/2)
    * and count^(1/4) — one and two sqrt applications — are the
    * temperatures computable bit-identically in every engine. The
    * flattened weight is round(sqrt^k(count) · 10^6): an exact
    * integer micro-weight (sqrt of a < 2^53 count is < 2^26.5;
    * times 10^6 stays < 2^47, far inside the double-exact range).
    * Counts must be non-negative (a zero-count source gets weight 0
    * and quota 0).
    *
    * Scale shape: one map-side weight projection on top of
    * [[largestRemainder]]'s aggregate + two-phase rank — no new
    * shuffles. Output: keyCols ++ (countCol, weight, quota). */
  def temperatureQuota(df: DataFrame, keyCols: Seq[String],
                       countCol: String, total: Long,
                       alpha: Double = 0.5): DataFrame = {
    val c = col(countCol).cast("long")
    val w = alpha match {
      case 1.0 => c
      case 0.5 =>
        round(sqrt(c.cast("double")) * 1000000.0).cast("long")
      case 0.25 =>
        round(sqrt(sqrt(c.cast("double"))) * 1000000.0).cast("long")
      case a => throw new IllegalArgumentException(
        "alpha must be 1.0, 0.5, or 0.25 — dyadic sqrt chains are " +
          s"the correctly-rounded, engine-exact temperatures: $a")
    }
    largestRemainder(
      df.select((keyCols.map(col) :+ c.as(countCol) :+
        w.as("weight")): _*),
      keyCols :+ countCol, "weight", total)
  }
}
