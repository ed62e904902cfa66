package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.trgx.{Trgx, TrgxNode}

class TrgxSpec extends AnyFunSuite {
  import Trgx._

  private val tree: Tree = Map(
    "2016-01-01" -> TrgxNode(Map("d" -> "r"), Map(
      "o1" -> TrgxNode(Map("price" -> "10.00"), Map.empty),
      "o2" -> TrgxNode(Map("price" -> "20.00"), Map.empty))),
    "2016-02-01" -> TrgxNode(Map.empty, Map(
      "o3" -> TrgxNode(Map("price" -> "5.00"), Map.empty))))

  test("json codec round-trips (json_to_trgx ∘ trgx_to_json = id)") {
    assert(fromJson(toJson(tree)) == tree)
  }

  test("toJson canonical key order is UTF-8 bytes, not UTF-16 units") {
    // U+1F600 (surrogate pair) sorts before U+FFFD in Java String
    // order but after in UTF-8 bytes — the DuckDB oracle's collation
    val emoji = "😀"; val fffd = "�"
    assert(emoji.compareTo(fffd) < 0, "sanity: Java order is inverted")
    val t: Tree = Map(
      emoji -> TrgxNode(Map(emoji -> "1", fffd -> "2", "z" -> "3"),
        Map.empty),
      fffd -> TrgxNode(Map.empty, Map.empty),
      "z" -> TrgxNode(Map.empty, Map.empty))
    val js = toJson(t)
    assert(js.indexOf("\"z\"") < js.indexOf(s""""$fffd"""") &&
           js.indexOf(s""""$fffd"""") < js.indexOf(s""""$emoji""""),
      s"keys must collate by UTF-8 bytes: $js")
    assert(js == toJsonJackson(t),
      "StringBuilder writer must stay byte-identical to the Jackson form")
    assert(fromJson(js) == t)
  }

  test("codec round-trip holds for seeded random trees (property)") {
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): TrgxNode = TrgxNode(
      data = (0 until rnd.nextInt(3))
        .map(i => s"k$i" -> rnd.nextInt(100).toString).toMap,
      children =
        if (depth == 0) Map.empty
        else (0 until rnd.nextInt(3))
          .map(i => s"c${rnd.nextInt(50)}" -> gen(depth - 1)).toMap)
    (1 to 50).foreach { _ =>
      val t: Tree = Map("root" -> gen(3))
      assert(fromJson(toJson(t)) == t, s"round-trip failed for $t")
    }
  }

  test("getIn / assocIn (trgx.clj:215-218)") {
    assert(getIn(tree, Seq("2016-01-01", "o2")).get.data("price")
      == "20.00")
    val t2 = assocIn(tree, Seq("2016-03-01", "o9"), Map("price" -> "1"))
    assert(getIn(t2, Seq("2016-03-01", "o9")).get.data("price") == "1")
  }

  test("pathSeq lists sorted root-to-leaf paths (trgx.clj:226)") {
    assert(pathSeq(tree) == Seq(
      Seq("2016-01-01", "o1"), Seq("2016-01-01", "o2"),
      Seq("2016-02-01", "o3")))
  }

  test("depth / take / takeLast (trgx.clj:229-244)") {
    assert(depth(tree) == 2)
    assert(depth(take(tree, 1)) == 1)
    // take-last keeps the first n levels + each chain's deepest leaf:
    // on a 2-level tree with n=1 that reproduces the tree itself
    assert(takeLast(tree, 1) == tree)
    // 3-level chain a→b→c, n=1 → middle level cut: a→c
    val deep: Tree = Map("a" -> TrgxNode(Map("d" -> "1"), Map(
      "b" -> TrgxNode(Map.empty, Map(
        "c" -> TrgxNode(Map("x" -> "9"), Map.empty))))))
    val cut = takeLast(deep, 1)
    assert(getIn(cut, Seq("a", "c")).get.data("x") == "9")
    assert(getIn(cut, Seq("a", "b")).isEmpty)
  }

  test("splitAt emits every node path of length <= n, subtree keyed " +
       "by the node's OWN key (trgx.clj:246-247 exact shape)") {
    val parts = splitAt(tree, 1)
    assert(parts.map(_._1) == Seq(Seq("2016-01-01"), Seq("2016-02-01")))
    // the reference's {:PATH p :SUBTREE {(last p) node}} — self-keyed
    assert(parts.head._2.keySet == Set("2016-01-01"))
    assert(parts.head._2("2016-01-01").children.keySet == Set("o1", "o2"))
    // n=2 also emits the leaf records; shallow branches are kept
    val deep = splitAt(tree, 2)
    assert(deep.map(_._1).contains(Seq("2016-01-01")))
    assert(deep.map(_._1).contains(Seq("2016-01-01", "o1")))
    assert(deep.size == 5)
  }

  test("leafTrunc re-homes leaf nodes at the given level (trgx.clj:265)") {
    val lt0 = leafTrunc(tree, 0)
    assert(lt0.keySet == Set("o1", "o2", "o3"))
    assert(lt0("o2").data("price") == "20.00")
    // depth-2 tree: same shape and leaf data (intermediate DATA is
    // dropped — the reference rebuilds from {} too)
    val lt1 = leafTrunc(tree, 1)
    assert(pathSeq(lt1) == pathSeq(tree))
    assert(getIn(lt1, Seq("2016-01-01", "o2")).get.data("price")
      == "20.00")
    // level >= depth: reference-exact — trgx->path's value INCLUDES
    // the leaf key, so take(level) keeps the whole path and the conj
    // appends a duplicated self-keyed tail: [d, o] -> [d, o, o]
    val lt2 = leafTrunc(tree, 2)
    assert(pathSeq(lt2) == Seq(
      Seq("2016-01-01", "o1", "o1"), Seq("2016-01-01", "o2", "o2"),
      Seq("2016-02-01", "o3", "o3")))
    assert(getIn(lt2, Seq("2016-01-01", "o2", "o2")).get.data("price")
      == "20.00")
  }

  test("leafPaths maps leaf keys to full paths (trgx->path)") {
    assert(leafPaths(tree)("o3") == Seq("2016-02-01", "o3"))
  }

  test("toKv flattens leaves; kvToTrgx attaches data to config leaves") {
    val kv = toKv(tree)
    assert(kv("2016-02-01/o3") == Map("price" -> "5.00"))
    val config: Tree = Map("KPI" -> TrgxNode(Map.empty, Map(
      "o1" -> TrgxNode(Map.empty, Map.empty))))
    val attached = kvToTrgx(config, Map("o1" -> Map("v" -> "9")))
    assert(getIn(attached, Seq("KPI", "o1")).get.data("v") == "9")
  }

  test("nodeId extracts bracketed ids; collapseGroups flattens the " +
       "conf BRANCH level (trgx.clj:49,202-210)") {
    assert(nodeId("产品铺货率[sku-31]") == "sku-31")
    assert(nodeId("[]plain") == "plain")
    assert(nodeId("plain") == "plain")
    val conf: Tree = Map("全体-Total / 所有渠道" -> TrgxNode(Map.empty, Map(
      "CODE" -> TrgxNode(Map.empty, Map(
        "k1[a]" -> TrgxNode.empty, "k2[b]" -> TrgxNode.empty)),
      "OTHER" -> TrgxNode(Map.empty, Map(
        "k3[c]" -> TrgxNode.empty)))))
    val merged = collapseGroups(conf, "全体-Total / 所有渠道")
    assert(getIn(merged, Seq("全体-Total / 所有渠道")).get.children.keySet
      == Set("k1[a]", "k2[b]", "k3[c]"))
    assert(groupSubtree(conf, "全体-Total / 所有渠道", "CODE").keySet
      == Set("k1[a]", "k2[b]"))
    // kvToTrgx with the nodeId normalization: data keyed by bare id
    val attached = kvToTrgx(merged, Map("a" -> Map("v" -> "1")), nodeId)
    assert(getIn(attached,
      Seq("全体-Total / 所有渠道", "k1[a]")).get.data("v") == "1")
  }

  test("query Range step compares keys in UTF-8 byte order, matching " +
       "the file-wide collation") {
    // U+1F600 (surrogate pair) < U+FFFD in Java UTF-16 order but
    // > in UTF-8 bytes: a Range spanning [U+FFFD, U+1F600] must
    // include BOTH keys, which plain String >=/<= would not
    val emoji = "😀"; val fffd = "�"
    assert(emoji.compareTo(fffd) < 0, "sanity: Java order is inverted")
    val t: Tree = Map(
      emoji -> TrgxNode(Map("v" -> "1"), Map.empty),
      fffd -> TrgxNode(Map("v" -> "2"), Map.empty),
      "z" -> TrgxNode(Map("v" -> "3"), Map.empty))
    val hits = query(t, Seq(Range(fffd, emoji)))
    assert(hits.map(_._1.last) == Seq(fffd, emoji),
      "range must span [U+FFFD, U+1F600] in UTF-8 order, 'z' excluded")
  }

  test("query supports wildcard, key-list, and [:range a b] path steps") {
    val hits = query(tree, Seq(Range("2016-01-01", "2016-01-31"),
      Wildcard))
    assert(hits.map(_._1.last) == Seq("o1", "o2"))
    val picked = query(tree, Seq(Wildcard, Keys(Set("o1", "o3"))))
    assert(picked.map(_._1.last) == Seq("o1", "o3"))
    assert(dataFieldValues(picked.head._2, Seq("price", "missing"))
      == Seq("10.00", null))
  }

  test("shiftCut aggregates windows of numeric DATA (mlvar:97-135)") {
    val fs = shiftCut(tree, "2016-02-15", 40, 2).toMap
    assert(fs(0)("price") == 5.0)  // window [2016-01-07, 2016-02-15]
    assert(fs(1)("price") == 30.0) // window [2015-11-28, 2016-01-06]
  }
}
