package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRankScaled: one iteration matches the hand computation, " +
       "dangling mass is dropped, duplicate edges collapse") {
    // A→B, B→A, A→C (C dangling); duplicate A→B row must not double
    // A's out-degree or B's in-mass
    val edges = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("A", "C"))
      .toDF("src", "dst")
    val r1 = Graph.pageRankScaled(edges, "src", "dst", 1)
      .as[(String, Long)].collect().toMap
    // N=3, S=10^12: r0 = 333333333333 each; base = 15S div 300 =
    // 50000000000. contrib: A sends r0 div 2 = 166666666666 to B and
    // C; B sends 333333333333 to A.
    assert(r1("A") == 50000000000L + 85L * 333333333333L / 100L)
    assert(r1("B") == 50000000000L + 85L * 166666666666L / 100L)
    assert(r1("C") == r1("B"))
    // C has no out-edges: its mass leaks, total shrinks below S
    assert(r1.values.sum < Graph.Scale)
  }

  test("pageRankScaled: a sink-free cycle conserves total mass to " +
       "within integer-division truncation, hub outranks leaves") {
    // leaves all point at the hub, hub points back at every leaf —
    // no dangling nodes
    val leaves = (1 to 9).map(i => s"leaf$i")
    val edges = (leaves.map(_ -> "hub") ++ leaves.map("hub" -> _))
      .toDF("src", "dst")
    val r = Graph.pageRankScaled(edges, "src", "dst", 5)
      .as[(String, Long)].collect().toMap
    assert(leaves.forall(l => r("hub") > r(l)),
      s"hub must dominate: $r")
    // each of the 5 iterations truncates < 1 unit per node per div,
    // so 10 nodes × 5 rounds × 2 divisions bounds the leak
    assert(Graph.Scale - r.values.sum >= 0 &&
      Graph.Scale - r.values.sum < 10L * 5L * 2L * 2L,
      s"mass leak beyond truncation: ${Graph.Scale - r.values.sum}")
    // leaves are symmetric: identical ranks
    assert(leaves.map(r).distinct.size == 1)
  }

  test("extractLinks: attribute order, uppercase tags, and the " +
       "no-href trap") {
    import graft.llm.HtmlText
    val html =
      """<html><body>
        <a href="https://a.example.com/1">one</a>
        <a class="x" id="y" href="https://b.example.com/2?q=1">two</a>
        <A HREF="HTTPS://C.EXAMPLE.COM/3">three</A>
        <a name="no-href">trap: value contains href but no attr</a>
        <a href='https://single.quoted.out.of.contract/4'>skipped</a>
        </body></html>"""
    val out = Seq(html).toDF("h")
      .select(explode(HtmlText.extractLinks(col("h"))).as("u"))
      .as[String].collect().toSeq
    assert(out == Seq("https://a.example.com/1",
      "https://b.example.com/2?q=1", "HTTPS://C.EXAMPLE.COM/3"))
  }
}
