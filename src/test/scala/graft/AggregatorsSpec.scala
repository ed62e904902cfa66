package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Aggregators

class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collectKv folds (k,v) into a map per group (trgx.clj:45)") {
    val df = Seq(("g1", "2016-01-31", "10"), ("g1", "2016-02-29", "20"),
                 ("g2", "2016-01-31", "5"))
      .toDF("g", "dt", "v")
    val out = df.groupBy("g")
      .agg(Aggregators.collectKv($"dt", $"v").as("m"))
      .as[(String, Map[String, String])].collect().toMap
    assert(out("g1") == Map("2016-01-31" -> "10", "2016-02-29" -> "20"))
    assert(out("g2") == Map("2016-01-31" -> "5"))
  }

  test("collectKvs builds a sorted multimap (mlin clj:42)") {
    val df = Seq(("g", "k1", "b"), ("g", "k1", "a"), ("g", "k1", "a"),
                 ("g", "k2", "z")).toDF("g", "k", "v")
    val out = df.groupBy("g")
      .agg(Aggregators.collectKvs($"k", $"v").as("m"))
      .as[(String, Map[String, Seq[String]])].head()._2
    assert(out == Map("k1" -> Seq("a", "b"), "k2" -> Seq("z")))
  }

  test("collectKvs sorts values in UTF-8 byte order, not UTF-16 " +
       "code-unit order") {
    // U+1F600 (😀) encodes as F0 9F 98 80 in UTF-8 but as the surrogate
    // pair D83D DE00 in UTF-16: bytewise it sorts AFTER U+FFFD (EF BF
    // BD), while Java String order puts it BEFORE — the exact collation
    // divergence vs the DuckDB oracle
    val emoji = "😀"; val fffd = "�"
    assert(emoji.compareTo(fffd) < 0, "sanity: Java order is inverted")
    val df = Seq(("g", "k", emoji), ("g", "k", fffd), ("g", "k", "z"))
      .toDF("g", "k", "v")
    val out = df.groupBy("g")
      .agg(Aggregators.collectKvs($"k", $"v").as("m"))
      .as[(String, Map[String, Seq[String]])].head()._2
    assert(out("k") == Seq("z", fffd, emoji),
      "values must sort by UTF-8 bytes (z < U+FFFD < U+1F600)")
  }

  test("collectKv resolves duplicate keys deterministically " +
       "(UTF-8-binary max, partition-order-independent)") {
    val rows = Seq(("g", "k", "a"), ("g", "k", "c"), ("g", "k", "b"),
                   ("g", "k2", "x"))
    // same data, opposite row order, different partitioning — the
    // surviving VALUE must be identical (merge order must not matter)
    val outs = Seq(rows, rows.reverse).map { rs =>
      rs.toDF("g", "k", "v").repartition(3).groupBy("g")
        .agg(Aggregators.collectKv($"k", $"v").as("m"))
        .as[(String, Map[String, String])].head()._2
    }
    assert(outs.head == Map("k" -> "c", "k2" -> "x"))
    assert(outs(0) == outs(1), "duplicate-key winner depends on order")
  }

  test("trDimensionMetrics: null-bearing paths are skipped, shared " +
       "paths merge metrics order-independently") {
    val rows = Seq(
      (1, Seq("seg=A"), Map("v" -> "1")),
      (1, Seq("seg=A"), Map("v" -> "2", "w" -> "9")),  // same path
      (1, Seq[String](null), Map("x" -> "3")))         // null path key
    // opposite input order must yield byte-identical JSON
    val outs = Seq(rows, rows.reverse).map(_
      .toDF("g", "dims", "mets")
      .repartition(3).groupBy("g")
      .agg(Aggregators.trDimensionMetrics($"dims", $"mets").as("j"))
      .select("j").as[String].head())
    assert(outs(0) == """{"seg=A":{"v":2,"w":9}}""",
      "binary-max per metric key; the null-path row must vanish")
    assert(outs(0) == outs(1))
  }

  test("trDimensionMetrics emits canonical nested pair-tree JSON") {
    val df = Seq(("s", Seq("d1", "x"), Map("m" -> "1")),
                 ("s", Seq("d1", "y"), Map("m" -> "2", "n" -> "3")),
                 ("s", Seq("d0", "x"), Map("m" -> "9")))
      .toDF("sel", "dims", "metrics")
    val out = df.groupBy("sel")
      .agg(Aggregators.trDimensionMetrics($"dims", $"metrics").as("j"))
      .as[(String, String)].head()._2
    assert(out ==
      """{"d0":{"x":{"m":9}},"d1":{"x":{"m":1},"y":{"m":2,"n":3}}}""")
  }

  test("trDimensionMetrics with empty dims renders a bare leaf array " +
       "(score_overall's [] dimensions)") {
    val df = Seq(("s", Seq.empty[String], Map("score" -> "1.5",
                                              "pp" -> "0.5")))
      .toDF("sel", "dims", "metrics")
    val out = df.groupBy("sel")
      .agg(Aggregators.trDimensionMetrics($"dims", $"metrics").as("j"))
      .as[(String, String)].head()._2
    // matches the reference's flat metrics object for [] dimensions
    assert(out == """{"pp":0.5,"score":1.5}""")
  }

  test("strMax/strMin skip the null sentinel (trgx.clj:63-69)") {
    val df = Seq(("g", "b"), ("g", "null"), ("g", "a"), ("g", "NULL"))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(Aggregators.strMax($"v"), Aggregators.strMin($"v"))
      .as[(String, String, String)].head()
    assert((out._2, out._3) == ("b", "a"))
  }

  test("native strMaxRaw/strMinRaw match built-in min/max bit-for-bit " +
      "and plan ObjectHashAggregate, not SortAggregate") {
    val rnd = new scala.util.Random(7)
    // nulls, empties, ASCII, CJK and a supplementary-plane codepoint
    // (UTF-8 byte order vs UTF-16 code-unit order diverge there)
    val pool = Seq(null, "", "a", "ab", "z", "中文",
      new String(Character.toChars(0x1F600)), "�", "0", "~")
    val rows = (1 to 400).map(i =>
      (s"g${i % 13}", pool(rnd.nextInt(pool.size))))
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(Aggregators.strMaxRaw($"v").as("mx"),
           Aggregators.strMinRaw($"v").as("mn"))
    val want = df.groupBy("g")
      .agg(max($"v").as("mx"), min($"v").as("mn"))
    assert(got.orderBy("g").collect().toSeq ==
      want.orderBy("g").collect().toSeq)
    // all-null group evaluates to null like the built-ins
    val allNull = Seq(("g", null: String), ("g", null: String))
      .toDF("g", "v")
      .groupBy("g").agg(Aggregators.strMaxRaw($"v").as("mx"))
      .as[(String, Option[String])].head()
    assert(allNull._2.isEmpty)
    val nodes = TestSpark.planNodes(
      got.queryExecution.executedPlan).map(_.nodeName)
    assert(nodes.exists(_.contains("ObjectHashAggregate")), nodes)
    assert(!nodes.exists(_.contains("SortAggregate")), nodes)
  }

  test("mapSetUnion merges map-of-set columns (merge-with union)") {
    val df = Seq((Map("a" -> Seq("1"), "b" -> Seq("2")),
                  Map("a" -> Seq("3", "1"), "c" -> Seq("4"))))
      .toDF("m1", "m2")
    val out = df.select(Aggregators.mapSetUnion($"m1", $"m2"))
      .as[Map[String, Seq[String]]].head()
    assert(out == Map("a" -> Seq("1", "3"), "b" -> Seq("2"),
                      "c" -> Seq("4")))
  }
}
