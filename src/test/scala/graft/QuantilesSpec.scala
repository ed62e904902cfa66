package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantileCont matches SQL percentile_cont on a known vector") {
    // 1..10: p50 = 5.5, p25 = 3.25, p90 = 9.1, endpoints exact
    val df = (1 to 10).toDF("v")
    val out = Quantiles.quantileCont(df, "v",
        Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .as[(Double, Double)].collect().toMap
    assert(out(0.0) == 1.0)
    assert(out(0.25) == 3.25)
    assert(out(0.5) == 5.5)
    assert(math.abs(out(0.9) - 9.1) < 1e-12)
    assert(out(1.0) == 10.0)
  }

  test("groupedQuantileCont equals Spark's window percentile_cont " +
      "per group (random data, skewed groups)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      // 90% of rows in one group — the dominant-group regime the
      // rank machinery exists for
      val g = if (rng.nextInt(10) < 9) "big" else s"g${rng.nextInt(4)}"
      (g, rng.nextInt(1000))
    }
    val df = rows.toDF("g", "v").repartition(8)
    val got = Quantiles.groupedQuantileCont(df, Seq("g"), "v",
        Seq(0.1, 0.5, 0.75))
      .as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    val want = df.groupBy($"g").agg(
        expr("percentile(v, array(0.1D, 0.5D, 0.75D))").as("qs"))
      .as[(String, Seq[Double])].collect()
      .flatMap { case (g, qs) =>
        Seq((g, 0.1) -> qs(0), (g, 0.5) -> qs(1), (g, 0.75) -> qs(2)) }
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, q) =>
      assert(math.abs(q - want(k)) < 1e-9, s"$k: $q vs ${want(k)}") }
  }

  test("dyadic probs over integer values are bit-exact (the " +
      "percentile-filter threshold guarantee)") {
    val df = Seq(("a", 1), ("a", 2), ("a", 4), ("a", 100),
                 ("b", 7)).toDF("g", "v")
    val out = Quantiles.groupedQuantileCont(df, Seq("g"), "v",
        Seq(0.75)).as[(String, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // a: h = 0.75*3 = 2.25 → v3*(0.75) + v4*(0.25) = 3 + 25 = 28
    assert(out("a") == 28.0)
    assert(out("b") == 7.0)
  }

  test("nulls excluded; all-null group emits no rows") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(3)),
                 ("z", None)).toDF("g", "v")
    val out = Quantiles.groupedQuantileCont(df, Seq("g"), "v",
        Seq(0.5)).as[(String, Double, Double)].collect()
    assert(out.toSeq == Seq(("a", 0.5, 2.0)))
  }

  test("percentileFilter keeps rows at or above the group threshold") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
                 ("b", 10), ("b", 20)).toDF("g", "v")
    // a: p75 over 1..4 → h = 2.25 → 3.25; b: p75 over {10,20} → 17.5
    val kept = Quantiles.percentileFilter(df, Seq("g"), "v", 0.75)
      .as[(String, Int)].collect().toSet
    assert(kept == Set(("a", 4), ("b", 20)))
    val lower = Quantiles.percentileFilter(df, Seq("g"), "v", 0.75,
        keepLower = true).as[(String, Int)].collect().toSet
    assert(lower == Set(("a", 1), ("a", 2), ("a", 3), ("b", 10)))
  }

  test("probs outside [0,1] and empty probs fail loudly") {
    val df = Seq(1, 2).toDF("v")
    intercept[IllegalArgumentException] {
      Quantiles.quantileCont(df, "v", Seq(1.5)) }
    intercept[IllegalArgumentException] {
      Quantiles.quantileCont(df, "v", Seq.empty) }
  }
}
