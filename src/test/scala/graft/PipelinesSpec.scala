package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipelines

class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("odsMerge: upsert preserving ids, new ids continue from max") {
    val base = "/root/repo/target/graft_tmp/ods_spec"
    val odsPath = s"$base/ods"; val rngPath = s"$base/rng"
    // start clean
    import java.nio.file.{Files, Paths}
    def rmrf(p: String): Unit = {
      val pp = Paths.get(p)
      if (Files.exists(pp))
        Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
    }
    rmrf(base)

    // load 1: two shows
    val stg1 = Seq(("s1", "Show One", "2016-01-01"),
                   ("s2", "Show Two", "2016-01-02"))
      .toDF("show_id", "title", "dt")
    val n1 = Pipelines.odsMerge(spark, stg1, odsPath, Seq("show_id"),
      Seq("title", "dt"), "dw_id", "show_id", "dt", rngPath)
    assert(n1 == 2)
    val ids1 = spark.read.parquet(odsPath)
      .select("show_id", "dw_id").as[(String, Long)].collect().toMap

    // load 2: s2 retitled + new s3 — s2 keeps its id, s3 continues
    val stg2 = Seq(("s2", "Show Two v2", "2016-01-05"),
                   ("s3", "Show Three", "2016-01-06"))
      .toDF("show_id", "title", "dt")
    val n2 = Pipelines.odsMerge(spark, stg2, odsPath, Seq("show_id"),
      Seq("title", "dt"), "dw_id", "show_id", "dt", rngPath)
    assert(n2 == 3)
    val after = spark.read.parquet(odsPath)
      .select("show_id", "title", "dw_id")
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(after("s1")._1 == "Show One")
    assert(after("s2")._1 == "Show Two v2")
    assert(after("s2")._2 == ids1("s2"))           // id preserved
    assert(after("s3")._2 == ids1.values.max + 1)  // continues from max
    // rng bookkeeping recorded both loads
    assert(spark.read.parquet(rngPath).count() == 2)
  }

  test("mlvar tree build + shift-cut features end-to-end") {
    val orders = Seq(
      (1L, "2016-01-10", "o1", 10.0), (1L, "2016-02-10", "o2", 20.0),
      (2L, "2016-02-11", "o3", 5.0))
      .toDF("user_id", "dt", "order_id", "price")
    val trees = Pipelines.mlvarUserOrderTrees(orders, "user_id", "dt",
      "order_id", Seq("price"))
    assert(trees.count() == 2)
    val feats = Pipelines.shiftCutFeatures(trees, "user_id",
        "2016-02-15", 30, 2, "price")
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(feats((1L, 0)) == 20.0)  // window ending 2016-02-15
    assert(feats((1L, 1)) == 10.0)  // previous 30-day window
    assert(feats((2L, 0)) == 5.0)
  }
}
