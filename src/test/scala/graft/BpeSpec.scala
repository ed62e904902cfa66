package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Bpe

class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges is deterministic with lexicographic tie-breaks") {
    // "aaab"×3: pair (a,a) occurs 2×/word → count 6 beats (a,b) count 3.
    // Round 2: (aa,a) and (a,b) tie at 3 → lexicographic ("a","b") wins.
    val merges = Bpe.learnMerges(Seq("aaab" -> 3L), nMerges = 5)
    assert(merges.take(2) == Seq(("a", "a"), ("a", "b")))
    // exhaustion: once every word is a single symbol, learning stops
    // early instead of padding to nMerges
    val tiny = Bpe.learnMerges(Seq("ab" -> 1L), nMerges = 5)
    assert(tiny == Seq(("a", "b")))
  }

  test("encodeWord replays merge ranks lowest-first and round-trips") {
    val ranks = Seq(("a", "a"), ("a", "b")).zipWithIndex.toMap
    assert(Bpe.encodeWord("aaab", ranks).toSeq == Seq("aa", "ab"))
    // unseen word decomposes to chars merged only where ranks apply
    assert(Bpe.encodeWord("baab", ranks).toSeq == Seq("b", "aa", "b"))
    assert(Bpe.encodeWord("", ranks).isEmpty)
    // pathological word: single opaque token, round-trip preserved
    val long = "x" * 1000
    assert(Bpe.encodeWord(long, ranks).toSeq == Seq(long))
  }

  test("encodeWord round-trips on random words under corpus-trained merges") {
    val rnd = new scala.util.Random(7)
    val vocabChars = "abcde"
    val corpus = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(10)))
        .map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString
    }
    val freqs = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
    val ranks = Bpe.learnMerges(freqs, nMerges = 50).zipWithIndex.toMap
    corpus.distinct.foreach { w =>
      val toks = Bpe.encodeWord(w, ranks)
      assert(toks.mkString("") == w, s"round-trip failed for $w")
      assert(toks.nonEmpty && toks.length <= w.length)
    }
  }

  test("non-BMP characters seed ONE symbol per code point, keeping " +
       "the tokens<=chars oracle bound") {
    val emoji = new String(Character.toChars(0x1F600)) // surrogate pair
    // a lone word of one emoji must be 1 token, not 2 lone surrogates
    assert(Bpe.encodeWord(emoji, Map.empty).toSeq == Seq(emoji))
    assert(Bpe.encodeWord(emoji + "ab", Map.empty).toSeq ==
      Seq(emoji, "a", "b"))
    // distributed bound: n_bpe_tokens <= n_chars where n_chars is
    // Spark length() CODE POINTS — the exact invariant the oracle pins
    val df = Seq((1L, s"$emoji $emoji$emoji word")).toDF("doc_id", "text")
    val got = Bpe.encodeStats(df, "text", "doc_id", Seq.empty)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(got == ((1L, 3L, 7L, 7L, true)),
      s"3 words, 7 code points, 7 char tokens, round-trip; got $got")
  }

  test("maxWordLen guard measures CODE POINTS, not UTF-16 units — a " +
       "long all-emoji word still gets real subword tokens") {
    val emoji = new String(Character.toChars(0x1F600))
    // 300 code points = 600 UTF-16 units: within the 512-cp budget,
    // so it must seed 300 symbols, not return one opaque token
    val w = emoji * 300
    assert(w.length == 600)
    assert(Bpe.encodeWord(w, Map.empty).length == 300)
    // past the code-point budget it IS one opaque token
    assert(Bpe.encodeWord(emoji * 513, Map.empty).toSeq == Seq(emoji * 513))
  }

  test("encodeStats counts words/chars/tokens per doc; empty docs survive") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the"),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", nMerges = 20, maxWords = 100)
    val got = Bpe.encodeStats(df, "text", "doc_id", merges)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1).toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 6 && byId(1L)._3 == 17) // 6 words, 17 chars
    assert(byId(2L)._2 == 3 && byId(2L)._3 == 9)
    assert(byId(3L) == ((3L, 0L, 0L, 0L, true)))
    assert(byId(4L) == ((4L, 0L, 0L, 0L, true)))
    got.foreach { case (id, nw, nc, nb, rt) =>
      assert(rt, s"doc $id failed round-trip")
      assert(nb >= nw && nb <= nc || nw == 0, s"doc $id token bounds")
    }
    // "the" is the most frequent word → trained to a single token
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("the", ranks).length == 1)
  }
  test("trainDistributed is bit-identical to the driver-side learner " +
       "on the same corpus, stops on exhaustion, and fetches O(rounds)") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the thorn"),
      (3L, "mats that matter"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    // the bounded driver-side learner with maxWords covering the whole
    // vocab IS the reference semantics; distributed must match exactly
    val ref = Bpe.train(df, "text", nMerges = 15, maxWords = 100)
    val dist = Bpe.trainDistributed(df, "text", nMerges = 15)
    assert(dist == ref, s"distributed $dist != reference $ref")
    // exhaustion: a vocab this small runs out of pairs before 200
    // merges — both learners stop at the same realized merge count
    // (every word fully merged to one symbol), which also shows the
    // driver fetch is one argmax row per REALIZED round, not O(vocab)
    val refAll = Bpe.train(df, "text", nMerges = 200, maxWords = 100)
    val distAll = Bpe.trainDistributed(df, "text", nMerges = 200)
    assert(distAll == refAll && distAll.size < 200,
      s"exhaustion mismatch: ${distAll.size} vs ${refAll.size}")
  }
  test("learnMerges ties break in UTF-8 byte order — identical to " +
       "trainDistributed's Spark binary-string argmax on a " +
       "supplementary-plane vs BMP>=U+E000 tie (ADVICE r15 #4)") {
    // two words, one occurrence each: the pair counts TIE at 1, so
    // the argmax is decided purely by the pair ordering. U+E000 is
    // 3 UTF-8 bytes (EE 80 80) < U+1F600's 4 (F0 9F 98 80), so
    // UTF-8/code-point order picks the U+E000 pair — but Java's
    // UTF-16 compareTo sorts the emoji's high surrogate D83D BELOW
    // E000 and would have picked the emoji pair: exactly the
    // collation split that broke driver/distributed bit-identity.
    val e000 = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((1L, e000 + e000 + " " + emoji + emoji))
      .toDF("doc_id", "text")
    val ref = Bpe.train(df, "text", nMerges = 2, maxWords = 100)
    val dist = Bpe.trainDistributed(df, "text", nMerges = 2)
    assert(ref.head == ((e000, e000)),
      s"driver learner must pick the UTF-8-smaller pair, got $ref")
    assert(dist == ref, s"distributed $dist != reference $ref")
  }
}
