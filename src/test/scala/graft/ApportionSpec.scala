package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Apportion

class ApportionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("largestRemainder: quotas sum EXACTLY to total, each is floor " +
       "or floor+1, zero weights get zero") {
    val w = Seq(("a", 3L), ("b", 3L), ("c", 3L), ("z", 0L))
      .toDF("k", "wt")
    // total 10, W 9: floors (3,3,3,0)=9, k=1 → one +1 by remainder
    // 10*3%9=3 equal three ways → tie to smallest key 'a'
    val out = Apportion.largestRemainder(w, Seq("k"), "wt", 10L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out == Map("a" -> 4L, "b" -> 3L, "c" -> 3L, "z" -> 0L))
  }

  test("largestRemainder invariants hold on an adversarial spread") {
    val w = (1 to 200).map(i => (i.toLong, (i * i % 97).toLong))
      .toDF("k", "wt")
    val total = 12345L
    val bigW = (1 to 200).map(i => (i * i % 97).toLong).sum
    val out = Apportion.largestRemainder(w, Seq("k"), "wt", total)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sum == total, "quotas must sum to total")
    out.foreach { case (k, wt, q) =>
      val fl = total * wt / bigW
      assert(q == fl || q == fl + 1, s"key $k: quota $q vs floor $fl")
      if (wt == 0) assert(q == 0L, s"zero weight got quota $q")
    }
  }

  test("largestRemainder fails loudly on zero mass, negative weights, " +
       "and Long overflow") {
    intercept[IllegalArgumentException] {
      Apportion.largestRemainder(Seq(("a", 0L)).toDF("k", "wt"),
        Seq("k"), "wt", 10L)
    }
    intercept[IllegalArgumentException] {
      Apportion.largestRemainder(Seq(("a", -1L), ("b", 5L))
        .toDF("k", "wt"), Seq("k"), "wt", 10L)
    }
    intercept[IllegalArgumentException] {
      Apportion.largestRemainder(Seq(("a", Long.MaxValue / 2))
        .toDF("k", "wt"), Seq("k"), "wt", 1000L)
    }
  }
}
