package graft

import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.trgx.{Trgx, TrgxNode}

/** ScalaCheck property tests for the tricky semantics (SURVEY §5c):
  * trgx codec round-trip, or-tuple coalesce laws, string-date ordering.
  * Driven through scalatest so one runner reports everything. */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val keyGen = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
  private val dataGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(keyGen, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("with \"quotes\" and \\slashes\n"),
      Gen.const("ctrl\u0001\u001f and caf\u00e9 \u4e2d\u6587"))))
      .map(_.take(3))

  private def nodeGen(depth: Int): Gen[TrgxNode] =
    if (depth == 0) dataGen.map(TrgxNode(_, Map.empty))
    else for {
      d <- dataGen
      n <- Gen.choose(0, 2)
      ch <- Gen.mapOfN(n, Gen.zip(keyGen, nodeGen(depth - 1)))
    } yield TrgxNode(d, ch)

  private val treeGen: Gen[Trgx.Tree] =
    Gen.mapOfN(2, Gen.zip(keyGen, nodeGen(3)))

  test("trgx codec: fromJson ∘ toJson = id (incl. escapes)") {
    check("roundtrip", Prop.forAll(treeGen) { t =>
      Trgx.fromJson(Trgx.toJson(t)) == t
    })
  }

  test("trgx toJson writer matches the Jackson tree-model render") {
    check("jackson-parity", Prop.forAll(treeGen) { t =>
      Trgx.toJson(t) == Trgx.toJsonJackson(t)
    })
  }

  test("trgx toJson is canonical: equal trees give equal JSON") {
    check("canonical", Prop.forAll(treeGen) { t =>
      // rebuild with reversed insertion order → same JSON
      val reordered: Trgx.Tree = t.toSeq.reverse.toMap
      Trgx.toJson(reordered) == Trgx.toJson(t)
    })
  }

  test("trgx take/depth laws") {
    check("take", Prop.forAll(treeGen, Gen.choose(0, 5)) { (t, n) =>
      Trgx.depth(Trgx.take(t, n)) <= n &&
        Trgx.depth(Trgx.take(t, n)) <= Trgx.depth(t)
    })
  }

  test("pathSeq paths all resolve via getIn") {
    check("paths", Prop.forAll(treeGen) { t =>
      Trgx.pathSeq(t).forall(p => Trgx.getIn(t, p).isDefined)
    })
  }

  test("string-date ordering == chronological ordering (trgx.clj:63)") {
    val dateGen = for {
      y <- Gen.choose(1990, 2030); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield java.time.LocalDate.of(y, m, d)
    check("dates", Prop.forAll(dateGen, dateGen) { (a, b) =>
      (a.toString < b.toString) == a.isBefore(b)
    })
  }

  test("Utf8Order code-point compare == UTF8String byte compare " +
       "(incl. supplementary-plane chars)") {
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.const("�"),  // BMP above the surrogate range
      Gen.const(new String(Character.toChars(0x1F600))), // astral pair
      Gen.const("中"), Gen.const("é"))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    check("utf8order", Prop.forAll(strGen, strGen) { (a, b) =>
      val byByte = Integer.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      Integer.signum(graft.functions.Utf8Order.ordering.compare(a, b)) ==
        byByte
    })
  }

  test("JsonShape.esc matches Jackson's string rendering byte-for-byte") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.const("\""), Gen.const("\\"), Gen.const("\b"), Gen.const("\f"),
      Gen.const("\n"), Gen.const("\r"), Gen.const("\t"),
      Gen.const("\u0001"), Gen.const("\u001f"), Gen.const("中"))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    check("jsonesc", Prop.forAll(strGen) { s =>
      "\"" + graft.functions.JsonShape.esc(s) + "\"" ==
        mapper.writeValueAsString(mapper.getNodeFactory.textNode(s))
    })
  }

  test("packed-decimal election key is order-isomorphic to the " +
       "(id, pos) pair, any id sign (Dedup.electionKey fast path)") {
    // the keeper elections rely on id·2^32 + pos in decimal(38,0)
    // ordering exactly like lexicographic (id, pos) for 0 <= pos < 2^32
    val pack = (id: Long, pos: Int) =>
      BigDecimal(id) * BigDecimal(4294967296L) + BigDecimal(pos)
    val idGen = Gen.chooseNum(Long.MinValue / 8589934592L,
      Long.MaxValue / 8589934592L)  // keeps packed inside decimal(38,0)
    val posGen = Gen.chooseNum(0, Int.MaxValue)
    check("electionPack", Prop.forAll(idGen, posGen, idGen, posGen) {
      (id1, p1, id2, p2) =>
        val pairCmp = if (id1 != id2) id1 < id2 else p1 < p2
        val packCmp = pack(id1, p1) < pack(id2, p2)
        (id1, p1) == (id2, p2) || pairCmp == packCmp
    })
  }

  test("MinHashSig kernel: permutation-invariant and monotone under " +
       "set union") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def sig(xs: Seq[Long]): Seq[Any] =
      graft.functions.MinHashSigUtil
        .compute(new GenericArrayData(xs.toArray), 16)
        .array.toSeq
    val hsGen = Gen.nonEmptyListOf(Gen.long).map(_.take(40))
    check("minhash-perm", Prop.forAll(hsGen) { hs =>
      sig(hs) == sig(hs.reverse)
    })
    check("minhash-mono", Prop.forAll(hsGen, Gen.long) { (hs, extra) =>
      sig(hs).zip(sig(hs :+ extra)).forall { case (a, b) =>
        b.asInstanceOf[Long] <= a.asInstanceOf[Long]
      }
    })
  }

  test("SimHash kernel: token-order invariant") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sh(ts: Seq[String]): Long =
      graft.functions.SimHash64Util.compute(new GenericArrayData(
        ts.map(UTF8String.fromString).toArray[Any]))
    val toksGen = Gen.nonEmptyListOf(keyGen).map(_.take(30))
    check("simhash-perm", Prop.forAll(toksGen) { ts =>
      sh(ts) == sh(ts.reverse)
    })
  }

  test("Trgx.nodeId: bracketed id wins; plain keys are fixpoints") {
    check("nodeid", Prop.forAll(keyGen, keyGen) { (name, id) =>
      Trgx.nodeId(s"$name[$id]") == id &&
        Trgx.nodeId(id) == id &&
        Trgx.nodeId(Trgx.nodeId(s"$name[$id]")) == Trgx.nodeId(s"$name[$id]")
    })
  }

  test("pairTreeToJson output is always Jackson-parseable JSON") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pathGen = Gen.listOfN(2, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const("k=\"quoted\" {brace}"),
      Gen.const("中文=值")))
    val metricsGen = Gen.mapOf(Gen.zip(keyGen, Gen.oneOf(
      Gen.const("12.5"), Gen.const("-3"),
      Gen.const("text \"v\""), Gen.const("{\"nested\":1}")))).map(_.take(3))
    val rowsGen = Gen.listOfN(4, Gen.zip(pathGen, metricsGen))
    check("parseable", Prop.forAll(rowsGen) { rows =>
      val json = graft.functions.JsonShape.pairTreeToJson(
        graft.functions.JsonShape.fromRows(
          rows.map { case (p, m) => (p: Seq[String], m.toSeq) }))
      mapper.readTree(json) != null // throws on invalid JSON
    })
  }

  test("JsonShape.fromRows: insertion-order independent") {
    import graft.functions.JsonShape
    val rowGen = Gen.listOfN(6,
      Gen.zip(Gen.listOfN(2, keyGen), Gen.zip(keyGen, keyGen)))
      .map(_.map { case (p, (k, v)) => (p.toSeq, Seq(k -> v)) })
      // last-write-wins makes duplicate paths order-sensitive by design;
      // dedupe paths to test pure shape canonicalization
      .map(_.distinctBy(_._1))
    check("fromRows", Prop.forAll(rowGen) { rows =>
      JsonShape.pairTreeToJson(JsonShape.fromRows(rows)) ==
        JsonShape.pairTreeToJson(JsonShape.fromRows(rows.reverse))
    })
  }

  test("semanticDedup's triangle block cover meets every unordered " +
      "id pair exactly once, for any bucket count and assignment") {
    // pure-logic replica of the salted self-join in Dedup.semanticDedup:
    // a row in bucket b joins as side A in blocks (b, j >= b) and as
    // side B in blocks (i <= b, b); same-bucket blocks additionally
    // require idA < idB. Every unordered pair must surface exactly once.
    val gen = for {
      n <- Gen.choose(2, 40)
      s <- Gen.choose(1, 6)
      buckets <- Gen.listOfN(n, Gen.choose(0, s - 1))
    } yield (s, buckets.zipWithIndex.map { case (b, id) => (id, b) })
    check("triangleCover", Prop.forAll(gen) { case (s, rows) =>
      val aSide = rows.flatMap { case (id, b) =>
        (b until s).map(j => ((b, j), id)) }
      val bSide = rows.flatMap { case (id, b) =>
        (0 to b).map(i => ((i, b), id)) }
      val met = for {
        (blkA, idA) <- aSide
        (blkB, idB) <- bSide
        if blkA == blkB && idA != idB &&
          (blkA._1 != blkA._2 || idA < idB)
      } yield (math.min(idA, idB), math.max(idA, idB))
      val ids = rows.map(_._1)
      val expected = (for { x <- ids; y <- ids if x < y } yield (x, y)).toSet
      met.toSet == expected &&
        met.groupBy(identity).forall(_._2.size == 1)
    })
  }
}
