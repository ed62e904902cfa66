package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fullOuterMerge: stg wins when present, ods preserved otherwise") {
    val stg = Seq((1, "a1"), (2, "a2")).toDF("k", "v")
    val ods = Seq((2, "b2"), (3, "b3")).toDF("k", "v")
    val out = Relational.fullOuterMerge(stg, ods, Seq("k"), Seq("v"))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a1", 2 -> "a2", 3 -> "b3"))
  }

  test("dimLookup keeps unmatched fact rows (left outer, !!var)") {
    val fact = Seq((1, "x"), (2, "y")).toDF("k", "f")
    val dim = Seq((1, "d1")).toDF("k", "d")
    val out = Relational.dimLookup(fact, dim, Seq("k"))
      .as[(Int, String, Option[String])].collect()
    assert(out.map(_._1).toSet == Set(1, 2))
    assert(out.find(_._1 == 2).get._3.isEmpty)
  }

  test("slidingScores computes mom/ytd/yoy deltas via map lookup") {
    val m = Seq(
      ("g", "2016-01-31", "100.00"), ("g", "2016-02-29", "130.00"),
      ("g", "2015-12-31", "90.00"), ("g", "2015-02-28", "80.00"))
      .toDF("g", "dt", "v")
    val out = Relational.slidingScores(m, Seq("g"), "dt", "v",
        "2015-02-28", "2016-02-29")
      .select($"dt", $"delta_mom".cast("string"),
              $"delta_ytd".cast("string"), $"delta_yoy".cast("string"))
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 2016-02-29: mom vs 2016-01-31 (+30), ytd vs 2015-12-31 (+40),
    // yoy vs 2015-02-28... 2015-02-28 is the Feb-2015 month end (+50)
    assert(out("2016-02-29") == (("30.000", "40.000", "50.000")))
    // 2016-01-31: mom vs 2015-12-31 (+10); yoy 2015-01-31 missing → null
    assert(out("2016-01-31")._1 == "10.000")
    assert(out("2016-01-31")._3 == null)

    // ?max-value: numeric max over the group's map (not lexicographic)
    val mx = Relational.slidingScores(m, Seq("g"), "dt", "v",
        "2015-02-28", "2016-02-29")
      .select($"max_value".cast("string")).distinct().as[String].collect()
    assert(mx.toSeq == Seq("130.000"))
  }

  test("surrogateKeys keeps existing ids, continues from max") {
    val df = Seq((10L, Some(10L)), (11L, None), (12L, Some(3L)),
                 (13L, None))
      .toDF("k", "dw_id")
    val out = Relational.surrogateKeys(df, "dw_id", "k", 10L, lit(0), 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 10L, 11L -> 11L, 12L -> 3L, 13L -> 12L))
  }

  test("surrogateKeysDistributed: dense ids, no single-partition funnel") {
    val df = spark.range(0, 1000, 1, 8)
      .select($"id".as("k"),
        when($"id" % 3 === 0, $"id" + 5000).cast("long").as("dw_id"))
    val out = Relational.surrogateKeysDistributed(df, "dw_id", 9000L)
    val ids = out.select("dw_id").as[Long].collect()
    assert(ids.distinct.length == 1000)          // unique
    val newIds = ids.filter(_ > 9000).sorted     // dense from max+1
    assert(newIds.head == 9001L &&
      newIds.last == 9000L + newIds.length)
  }

  test("surrogateKeysOrdered matches the orderCol-window reference " +
       "sequence") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 500, 1, 8)
      .select(($"id" * 7 % 501).as("k"), // shuffled unique order col
        when($"id" % 4 === 0, $"id" + 9000).cast("long").as("dw_id"))
    val out = Relational.surrogateKeysOrdered(df, "dw_id", "k", 20000L,
        nPartitions = 8)
      .select($"k", $"dw_id").as[(Long, Long)].collect().toMap
    // reference: ids assigned in k order among null-id rows
    val ref = df
      .withColumn("dw_id", coalesce($"dw_id",
        lit(20000L) + org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy($"dw_id".isNull).orderBy($"k"))))
      .select($"k", $"dw_id").as[(Long, Long)].collect().toMap
    assert(out == ref)
  }

  test("globalRowNumber equals a global window row_number, without a " +
       "single-partition plan") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 1000, 1, 8)
      .select(($"id" * 13 % 1009).as("v"), $"id".as("tie"))
    val out = Relational.globalRowNumber(df,
        Seq($"v".desc, $"tie".asc), "rn", nPartitions = 8)
      .select($"v", $"tie", $"rn").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ref = df.withColumn("rn",
        org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy($"v".desc, $"tie".asc)).cast("long"))
      .select($"v", $"tie", $"rn").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == ref)
  }

  test("groupedRowNumber equals the per-group window rank/ntile AND " +
       "spreads a dominant group over many partitions") {
    import org.apache.spark.sql.expressions.Window
    // skewed 2-lang fixture: 'en' holds 90% of rows — the window form
    // would funnel it through one task
    val df = spark.range(0, 1000, 1, 8)
      .select(when($"id" % 10 === 9, "zh").otherwise("en").as("lang"),
        ($"id" * 13 % 1009).as("v"), $"id".as("tie"))
    val out = Relational.groupedRowNumber(df, Seq("lang"),
        Seq($"v".asc, $"tie".asc), "rk", "n", nPartitions = 8)
    val got = out.withColumn("b", expr("(rk - 1) * 3 DIV n + 1"))
      .select($"lang", $"v", $"tie", $"rk", $"b")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    val w = Window.partitionBy($"lang").orderBy($"v".asc, $"tie".asc)
    val ref = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("b", ntile(3).over(w).cast("long"))
      .select($"lang", $"v", $"tie", $"rk", $"b")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    assert(got == ref)
    // the scale property: the dominant group's rows live in >1 of the
    // range partitions (the sort keys extend the range key, so a giant
    // group is split — the exact opposite of PARTITION BY lang)
    val langIdx = df.schema.fieldIndex("lang")
    val partsWithEn = df
      .repartitionByRange(8, $"lang", $"v".asc, $"tie".asc)
      .rdd.mapPartitionsWithIndex { (i, it) =>
        Iterator((i, it.exists(r => r.getString(langIdx) == "en")))
      }.collect().filter(_._2)
    assert(partsWithEn.length > 1,
      s"dominant lang collapsed to ${partsWithEn.length} partition")
  }

  test("ntileFromRank equals SQL ntile for every k, including the " +
       "n=7/k=5 case where the DIV shorthand diverges") {
    import org.apache.spark.sql.expressions.Window
    for (k <- Seq(1, 2, 3, 4, 5, 8, 16); n <- Seq(1, 2, 3, 6, 7, 15, 100)) {
      val df = spark.range(0, n, 1, 4)
        .select(lit("g").as("grp"), $"id".as("v"))
      val got = Relational.groupedRowNumber(df, Seq("grp"),
          Seq($"v".asc), "rk", "cnt", nPartitions = 4)
        .select($"v", Relational.ntileFromRank($"rk", $"cnt", k).as("b"))
        .as[(Long, Long)].collect().toMap
      val ref = df.withColumn("b", ntile(k).over(
          Window.partitionBy($"grp").orderBy($"v".asc)).cast("long"))
        .select($"v", $"b").as[(Long, Long)].collect().toMap
      assert(got == ref, s"n=$n k=$k: $got != $ref")
    }
  }

  test("groupedCumSum equals the per-group running-sum window on a " +
       "90%-one-source fixture") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 800, 1, 8)
      .select(when($"id" % 10 === 0, "rare").otherwise("cc").as("src"),
        $"id".as("id"), ($"id" * 7 % 113).as("n_tok"))
    val out = Relational.groupedCumSum(df, Seq("src"),
        Seq($"n_tok".desc, $"id".asc), "n_tok", "cum", nPartitions = 8)
      .select($"src", $"id", $"cum").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ref = df.withColumn("cum", sum($"n_tok").over(
        Window.partitionBy($"src").orderBy($"n_tok".desc, $"id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"src", $"id", $"cum").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == ref)
    // null source rows group together (the edge-audit corpus has one)
    val withNull = spark.range(0, 40, 1, 4)
      .select(when($"id" % 2 === 0, "s").as("src"), $"id".as("id"),
        lit(5L).as("n_tok"))
    val cums = Relational.groupedCumSum(withNull, Seq("src"),
        Seq($"id".asc), "n_tok", "cum", nPartitions = 4)
      .filter($"src".isNull).select($"cum").as[Long].collect().sorted
    assert(cums.toSeq == (1L to 20L).map(_ * 5))
    // SQL frame semantics for null VALUES: the running sum is NULL
    // until the frame holds a non-null weight — so a group whose
    // weights are ALL null yields all-NULL sums (review-caught: "null
    // weighs 0" kept such rows where the window form dropped them),
    // and a trailing null weight carries the previous sum
    val nullW = Seq(
      ("a", 1L, Some(3L)), ("a", 2L, None), ("a", 3L, Some(4L)),
      ("b", 1L, None), ("b", 2L, None))
      .toDF("src", "id", "w")
    val got = Relational.groupedCumSum(nullW, Seq("src"),
        Seq($"id".asc), "w", "cum", nPartitions = 4)
      .select($"src", $"id", $"cum").as[(String, Long, Option[Long])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val refNull = nullW.withColumn("cum", sum($"w").over(
        Window.partitionBy($"src").orderBy($"id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"src", $"id", $"cum").as[(String, Long, Option[Long])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == refNull)
    assert(got(("b", 1L)).isEmpty && got(("b", 2L)).isEmpty)
    assert(got(("a", 2L)).contains(3L) && got(("a", 3L)).contains(7L))
  }

  test("reportShape groups dimension metrics under selectors") {
    val df = Seq(("s1", "d1", 10L), ("s1", "d2", 20L), ("s2", "d1", 5L))
      .toDF("sel", "dim", "m")
    val out = Relational.reportShape(df, Seq("sel"), Seq("dim"),
        Seq("cnt" -> col("m")))
      .as[(String, String)].collect().toMap
    assert(out("s1") == """{"dim=d1":{"cnt":10},"dim=d2":{"cnt":20}}""")
    assert(out("s2") == """{"dim=d1":{"cnt":5}}""")
  }

  test("funnel: strict-after ordering, incomplete stages stay null") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 00:00:$sec%02d")
    // u1 completes in order; u2 clicked BEFORE viewing (stage 2 null,
    // purchase therefore unreachable); u3 never purchases; u4 never
    // enters (no view)
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      (1L, "click", ts(5)), // later click must not shift min
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      (3L, "view", ts(1)), (3L, "click", ts(4)),
      (4L, "click", ts(1)), (4L, "purchase", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val out = Relational.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select($"user_id", $"ts_1", $"ts_2", $"ts_3").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))  // u4 absent
    val u1 = out(0); val u2 = out(1); val u3 = out(2)
    assert(u1.getTimestamp(1) == ts(1) && u1.getTimestamp(2) == ts(2) &&
      u1.getTimestamp(3) == ts(3))
    assert(u2.getTimestamp(1) == ts(2) && u2.getTimestamp(2) == null &&
      u2.getTimestamp(3) == null)
    assert(u3.getTimestamp(2) == ts(4) && u3.getTimestamp(3) == null)
  }

  test("cohortRetention: staggered cohorts, churn, re-activation") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day}%02d 12:00:00")
    // u1: cohort wk0, active wk0+wk1; u2: cohort wk0 only;
    // u3: cohort wk1, skips wk2, returns wk3 (gap must not re-cohort)
    val ev = Seq(
      (1L, ts(2)), (1L, ts(9)),
      (2L, ts(3)),
      (3L, ts(10)), (3L, ts(24)))
      .toDF("user_id", "ts")
    val out = Relational.cohortRetention(ev, "user_id", "ts",
        "2024-01-01", periodDays = 7)
      .orderBy("cohort", "week_offset")
      .as[(Int, Int, Long)].collect().toSeq
    assert(out == Seq((0, 0, 2L), (0, 1, 1L), (1, 0, 1L), (1, 2, 1L)))
  }
}
