package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Corpus, Similarity}

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkDocuments covers every token with the documented windows") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 toks, w=3 s=2 → 3 chunks
      (2L, "a b"),                  // shorter than window → 1 chunk
      (3L, ""),                     // empty → one chunk, ZERO tokens
      (4L, null))                   // null behaves like empty
      .toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(docs, "doc_id", "text", 3, 2)
      .orderBy("doc_id", "chunk_idx")
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"n_tokens")
      .as[(Long, Int, String, Int)].collect().toSeq
    // empty/null docs keep their row (coverage guarantee) but report
    // n_tokens = 0, consistent with tokenCountWs('') = 0 — the phantom
    // token from split('', ' ') = [''] previously leaked into
    // packSequences offsets and defeated n_tokens > 0 filters
    assert(out == Seq(
      (1L, 0, "t1 t2 t3", 3), (1L, 1, "t3 t4 t5", 3),
      (1L, 2, "t5 t6 t7", 3),
      (2L, 0, "a b", 2),
      (3L, 0, "", 0),
      (4L, 0, "", 0)))
  }

  test("chunkDocuments last chunk reaches the final token at any length") {
    val docs = (4 to 12).map(n =>
      (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkDocuments(docs, "doc_id", "text", 4, 3)
    val last = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("mi"))
      .join(chunks, Seq("doc_id"))
      .filter($"chunk_idx" === $"mi")
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect()
    last.foreach { case (n, text) =>
      assert(text.endsWith(s"w$n"), s"doc $n last chunk: $text")
    }
  }

  test("chunkDocuments: native kernel == HOF baseline (edge + real docs)") {
    val edge = Seq[(Long, String)](
      (1L, "t1 t2 t3 t4 t5 t6 t7"), (2L, "a b"), (3L, ""),
      (4L, null.asInstanceOf[String]), (5L, " \t\n "),
      (6L, "one"), (7L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (8L, "UPPER Case 中文 😀 mixed…"))
      .toDF("doc_id", "text")
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    for (df <- Seq(edge, real); (w, s) <- Seq((3, 2), (32, 24), (5, 5))) {
      val nu = Corpus.chunkDocuments(df, "doc_id", "text", w, s)
        .orderBy("doc_id", "chunk_idx").collect().toSeq
      val hof = Corpus.chunkDocumentsHof(df, "doc_id", "text", w, s)
        .orderBy("doc_id", "chunk_idx").collect().toSeq
      assert(nu == hof, s"chunk parity broke at window=$w stride=$s")
    }
  }

  test("packSequences: bins are budget-sized slices of the token stream") {
    val docs = Seq((0L, 100), (8L, 200), (16L, 900), (24L, 150),
                   (1L, 50), (9L, 1100))
      .toDF("doc_id", "tok")
    // nBuckets=8: bucket 0 gets ids 0,8,16,24; bucket 1 gets 1,9
    val out = Corpus.packSequences(docs, "doc_id", "tok",
        budget = 1024, nBuckets = 8)
      .select($"doc_id", $"bucket", $"bin", $"offset_in_bin",
        $"crosses_bin")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(0L) == ((0L, 0L, 0L, false)))    // off 0
    assert(out(8L) == ((0L, 0L, 100L, false)))  // off 100
    assert(out(16L) == ((0L, 0L, 300L, true)))  // 300+900 > 1024
    assert(out(24L) == ((0L, 1L, 176L, false))) // off 1200
    assert(out(1L) == ((1L, 0L, 0L, false)))
    assert(out(9L) == ((1L, 0L, 50L, true)))    // 50+1100 > 1024
  }

  test("stratifiedSample honors per-stratum rates and is deterministic") {
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "rare")).toDF("id", "lang")
    val keep = Corpus.stratifiedSample(rows, col("id"), col("lang"),
      Map("en" -> 0.5, "rare" -> 1.0))
    val byLang = keep.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang("rare") == 1000L)           // rate 1.0 keeps all
    assert(byLang("en") > 350 && byLang("en") < 650) // ≈ 500
    // unknown stratum under defaultRate 0.0 drops everything
    val dropped = Corpus.stratifiedSample(
      Seq((1L, "xx")).toDF("id", "lang"), col("id"), col("lang"),
      Map("en" -> 0.5)).count()
    assert(dropped == 0L)
    // determinism + subset-stability: same keys keep membership when
    // the corpus grows
    val grown = (1L to 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "rare")).toDF("id", "lang")
    val keptSmall = keep.filter($"lang" === "en")
      .select("id").as[Long].collect().toSet
    val keptGrown = Corpus.stratifiedSample(grown, col("id"), col("lang"),
        Map("en" -> 0.5, "rare" -> 1.0))
      .filter($"lang" === "en" && $"id" <= 2000)
      .select("id").as[Long].collect().toSet
    assert(keptSmall == keptGrown)
  }

  test("shuffleShard: pos is a permutation, shards balanced within one, " +
       "order independent of input partitioning") {
    val ids = (0L until 1000L).toDF("id")
    val out = Corpus.shuffleShard(ids, col("id"), nShards = 8)
      .select($"id", $"pos", $"shard").as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == (1L to 1000L))
    val counts = out.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(counts.max - counts.min <= 1 && counts.size == 8)
    val again = Corpus.shuffleShard(ids.repartition(13), col("id"), 8)
      .select($"id", $"pos").as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, pos, _) => again(id) == pos })
    // the order is a genuine shuffle, not id order
    assert(out.sortBy(_._2).map(_._1).take(20).toSeq != (0L until 20L).toSeq)
  }

  test("rateSample: monotone in rate (kept sets nest), exact at 0 and 1") {
    val ids = (0L until 2000L).toDF("id")
    def kept(r: Double): Set[Long] =
      Corpus.rateSample(ids, col("id"), lit(r))
        .select($"id").as[Long].collect().toSet
    val k3 = kept(0.3); val k6 = kept(0.6)
    assert(k3.subsetOf(k6))          // raising the rate only ADDS rows
    assert(kept(0.0).isEmpty && kept(1.0).size == 2000)
    assert(k3.size > 450 && k3.size < 750) // ~0.3 of 2000
  }

  test("writeShards: shard dirs hold disjoint covering ids in pos order") {
    val dir = TestSpark.tmpPath("shards").toString
    val ids = (0L until 400L).toDF("id")
    Corpus.writeShards(ids, col("id"), nShards = 4, dir)
    val all = (0 until 4).flatMap { s =>
      val rows = spark.read.parquet(s"$dir/shard=$s")
        .select($"id", $"pos").as[(Long, Long)].collect().toSeq
      // within-file order IS training order
      assert(rows.map(_._2) == rows.map(_._2).sorted,
        s"shard $s not in pos order")
      assert(rows.forall { case (_, pos) => (pos - 1) % 4 == s })
      rows.map(_._1)
    }
    assert(all.size == 400 && all.toSet.size == 400)
    // the completeness manifest reflects what was WRITTEN: 4 shards of
    // 100 rows covering pos 1..400, and it hides from plain readers
    // (underscore dir — a reader of `dir` must still see 400 rows)
    val man = Corpus.shardManifest(spark, dir)
      .orderBy("shard")
      .select($"shard", $"n_rows", $"min_pos", $"max_pos")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(man.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(man.forall(_._2 == 100L))
    assert(man.map(m => (m._3, m._4)) ==
      Seq((1L, 397L), (2L, 398L), (3L, 399L), (4L, 400L)))
    assert(spark.read.parquet(dir).count() == 400)
    // empty corpus: write succeeds and the manifest is empty (the
    // read-back must not depend on schema inference over zero files)
    val emptyDir = TestSpark.tmpPath("shards0").toString
    Corpus.writeShards(ids.filter($"id" < 0L), col("id"), 4, emptyDir)
    assert(Corpus.shardManifest(spark, emptyDir).count() == 0)
  }

  test("mixtureSample: binding source keeps all, kept mass tracks the " +
       "target weights, unlisted sources drop") {
    // a: 1000 docs × 10 tok, w=0.8 → tokens/w = 12500 (binds)
    // b: 1000 docs × 10 tok, w=0.2 → rate = 0.2·12500/10000 = 0.25
    val docs = ((0 until 1000).map(i => (i.toLong, "a", 10)) ++
      (0 until 1000).map(i => (i.toLong + 10000, "b", 10)) ++
      Seq((99999L, "c", 10))).toDF("id", "src", "tok")
    val out = Corpus.mixtureSample(docs, col("id"), col("src"),
        col("tok"), Map("a" -> 0.8, "b" -> 0.2))
      .select($"id", $"src", $"rate").as[(Long, String, Double)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("a") == 1000)                  // binding: rate 1.0
    assert(!bySrc.contains("c"))                // unlisted: dropped
    // b samples at 0.25 via md5 threshold: near the rate, not exact
    assert(bySrc("b") > 180 && bySrc("b") < 320)
    assert(out.filter(_._2 == "b").forall(_._3 == 0.25))
    // determinism: same rows survive on a reshuffled input
    val again = Corpus.mixtureSample(docs.repartition(7), col("id"),
        col("src"), col("tok"), Map("a" -> 0.8, "b" -> 0.2))
      .select($"id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("zero-token sources drop without poisoning the other sources' " +
       "rates (mixtureSample and temperatureMixture)") {
    // source z is listed but has zero token mass: it must vanish from
    // the output while a/b sample exactly as if z were absent
    val docs = ((0 until 100).map(i => (i.toLong, "a", 10)) ++
      (0 until 100).map(i => (i.toLong + 1000, "b", 10)) ++
      Seq((5000L, "z", 0), (5001L, "z", 0))).toDF("id", "src", "tok")
    val mixed = Corpus.mixtureSample(docs, col("id"), col("src"),
        col("tok"), Map("a" -> 0.8, "b" -> 0.2, "z" -> 0.5))
      .select($"id", $"src").as[(Long, String)].collect()
    assert(!mixed.exists(_._2 == "z"))
    assert(mixed.count(_._2 == "a") == 100)   // a still binds at rate 1
    assert(mixed.count(_._2 == "b") > 0)
    val temp = Corpus.temperatureMixture(docs, col("id"), col("src"),
        col("tok"))
      .select($"id", $"src", $"rate").as[(Long, String, Double)].collect()
    assert(!temp.exists(_._2 == "z"))
    assert(temp.forall(r => !r._3.isNaN && r._3 > 0))
  }

  test("temperatureMixture: sqrt weights keep the smallest source " +
       "whole, larger sources downsample; alpha=1 is the identity mix") {
    // a: 40000 tok, b: 10000 tok, c: 2500 tok → u = 200/100/50;
    // tok/u = 200/100/50 → nmax = 50 (c binds, rate 1);
    // rate_b = 100·50/10000 = 0.5; rate_a = 200·50/40000 = 0.25
    val docs = ((0 until 4000).map(i => (i.toLong, "a", 10)) ++
      (0 until 1000).map(i => (i.toLong + 10000, "b", 10)) ++
      (0 until 250).map(i => (i.toLong + 20000, "c", 10)))
      .toDF("id", "src", "tok")
    val out = Corpus.temperatureMixture(docs, col("id"), col("src"),
        col("tok"))
      .select($"id", $"src", $"rate").as[(Long, String, Double)].collect()
    val rates = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(rates("c") == Set(1.0))
    assert(rates("b") == Set(0.5))
    assert(rates("a") == Set(0.25))
    val n = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(n("c") == 250)
    assert(n("b") > 400 && n("b") < 600)
    assert(n("a") > 850 && n("a") < 1150)
    // alpha = 1: weights equal natural shares → every rate is 1.0
    val nat = Corpus.temperatureMixture(docs, col("id"), col("src"),
        col("tok"), alpha = 1.0)
      .select($"rate").as[Double].collect()
    assert(nat.length == 5250 && nat.forall(_ == 1.0))
  }

  test("int8 quantization: max code ±127, reconstruction error ≤ scale/2") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(3.0f, 2.0f, -3.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector guard
      .toDF("vec_id", "embedding")
    val out = vecs
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("__q", Similarity.int8QuantStats(col("v")))
      .select($"vec_id", $"__q.scale".as("scale"),
        $"__q.codes".as("codes"), $"__q.max_err".as("err"))
      .as[(Long, Double, Seq[Int], Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 == Seq(64, -127, 32, 16))
    assert(out(1L)._2 == 1.0 / 127.0)
    assert(out(2L)._3 == Seq(127, 85, -127, 0))
    assert(out(3L)._2 == 0.0 && out(3L)._3 == Seq(0, 0, 0, 0) &&
      out(3L)._4 == 0.0)
    out.values.foreach { case (id, scale, _, err) =>
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err > scale/2")
    }
  }

  test("tokenBudgetSelect keeps the longest-first prefix within budget, " +
      "per source independently") {
    val docs = Seq(
      (1L, "a", "w w w w"),    // 4 toks
      (2L, "a", "x x x"),      // 3 toks
      (3L, "a", "y y y"),      // 3 toks — tie with doc 2, id breaks it
      (4L, "a", "z"),          // 1 tok  — would fit after the cut, but
                               //          prefix semantics end intake
      (5L, "b", "p p p p p p p p p p"), // 10 toks > budget alone
      (6L, "b", "q q"))        // 2 toks — still dropped: prefix, not skip
      .toDF("doc_id", "source", "text")
    val out = graft.llm.Corpus
      .tokenBudgetSelect(docs, "doc_id", "text", "source", 7L)
      .orderBy("source", "doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    // source a: 4 (cum 4) + 3 (doc 2, cum 7) fit; doc 3 would hit 10 —
    // dropped, and doc 4's single token is NOT backfilled.
    // source b: doc 5 alone exceeds 7, so b contributes nothing (doc 6
    // is behind it in the longest-first order).
    assert(out == Seq(("a", 1L, 4L, 4L), ("a", 2L, 3L, 7L)))
  }

  test("tokenBudgetSelectPerGroup: each group cuts at ITS OWN budget, " +
      "a null-keyed group still receives its budget row, an absent " +
      "budget keeps the group out") {
    val docs = Seq(
      (1L, Some("a"), "w w w w"),   // 4 toks
      (2L, Some("a"), "x x x"),     // 3 toks
      (3L, Some("b"), "p p"),       // 2 toks
      (4L, Some("b"), "q"),         // 1 tok
      (5L, None, "n n n"),          // 3 toks, null source
      (6L, Some("c"), "m m"))       // group with NO budget row
      .toDF("doc_id", "source", "text")
    val budgets = Seq((Some("a"), 4L), (Some("b"), 3L),
      (Option.empty[String], 3L)).toDF("source", "budget")
    val out = graft.llm.Corpus
      .tokenBudgetSelectPerGroup(docs, "doc_id", "text", "source",
        budgets)
      .orderBy("source", "doc_id")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // a: only doc 1 (cum 4 = budget; doc 2 would hit 7);
    // b: doc 3 (cum 2) + doc 4 (cum 3 = budget);
    // null: doc 5 via the null-safe join; c: no budget ⇒ nothing
    assert(out == Seq((null, 5L, 3L, 3L), ("a", 1L, 4L, 4L),
      ("b", 3L, 2L, 2L), ("b", 4L, 1L, 3L)))
  }

  test("distributionDrift: identical slices score ~0, a one-sided key " +
      "carries the drift; smoothing keeps absent keys finite") {
    val docs = Seq(
      // 'x' balanced 2/2, 'y' balanced 1/1, 'z' only in slice A
      (0L, "x"), (2L, "x"), (1L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"),
      (6L, "z"), (8L, "z"))
      .toDF("doc_id", "src")
    val out = graft.llm.Corpus
      .distributionDrift(docs, col("doc_id") % 2 === 0,
        Seq("src" -> col("src")))
      .orderBy("key")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._2 -> r).toMap
    // slice A: x=2, y=1, z=2 (ta=5); slice B: x=2, y=1, z=0 (tb=3); k=3
    assert(out("x")._3 == 2L && out("x")._4 == 2L)
    val pax = 3.0 / 8; val pbx = 3.0 / 6
    assert(out("x")._7 ==
      math.rint((pax - pbx) * math.log(pax / pbx) * 1e6) / 1e6)
    // z absent from B: smoothed p_b = 1/6 stays finite, term > 0
    assert(out("z")._4 == 0L && out("z")._7 > 0 &&
      !out("z")._7.isInfinite)
    // y has identical shares only pre-smoothing; smoothed shares
    // differ slightly, but the term stays tiny (< the x/z terms)
    assert(math.abs(out("y")._7) < math.abs(out("x")._7))
  }

  test("dsirImportance: target-heavy docs score positive, off-target " +
      "negative, and OOV-in-target tokens stay finite") {
    val docs = Seq(
      (1L, "en", "alpha alpha beta"),  // pure target vocabulary
      (2L, "en", "alpha beta beta"),
      (3L, "zh", "gamma gamma delta"), // disjoint raw-only vocabulary
      (4L, "zh", "gamma delta delta"))
      .toDF("doc_id", "lang", "text")
    val out = graft.llm.TextAnalysis
      .dsirImportance(docs, "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out.map(_._2) == Seq(3L, 3L, 3L, 3L))
    // target tokens: tc = rc (every occurrence is in-target), target
    // total is half the raw total → ln ratio > 0; raw-only tokens have
    // tc = 0 → smoothed ln((0+1)/(6+4)) - ln((3+1)/(12+4)) < 0, finite
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 > 0 && byId(1L)._4)
    assert(byId(2L)._3 > 0 && byId(2L)._4)
    assert(byId(3L)._3 < 0 && !byId(3L)._4)
    assert(byId(4L)._3 < 0 && !byId(4L)._4)
    // exact check on one doc pins the smoothing constants: doc 3 =
    // mean of ln((tc+1)/(T+V)) - ln((rc+1)/(R+V)) over its 3 tokens,
    // V=4 joint vocab, T=6 target tokens, R=12 raw tokens
    val expected3 = {
      val v = 4.0; val tT = 6.0; val tR = 12.0
      val g = math.log((0 + 1) / (tT + v)) - math.log((3 + 1) / (tR + v))
      val d = math.log((0 + 1) / (tT + v)) - math.log((3 + 1) / (tR + v))
      math.rint((g + g + d) / 3.0 * 1e4) / 1e4
    }
    assert(math.abs(byId(3L)._3 - expected3) < 1e-9)
  }

  test("releaseDiff: all four statuses, null≠empty, null key never pairs") {
    val a = Seq(
      (Some(1L), Some("same"), "en"),   // unchanged
      (Some(2L), Some("old"), "en"),    // changed (text revised in B)
      (Some(3L), Some("gone"), "de"),   // removed
      (Some(4L), None, "fr"),           // null text: distinct from ""
      (None: Option[Long], Some("nk"), "en")) // null key
      .toDF("doc_id", "text", "lang")
    val b = Seq(
      (Some(1L), Some("same"), "en"),
      (Some(2L), Some("new"), "en"),
      (Some(4L), Some(""), "fr"),       // null → empty IS a change
      (Some(5L), Some("fresh"), "zh"),  // added
      (None: Option[Long], Some("nk"), "en")) // same null-key content
      .toDF("doc_id", "text", "lang")
    val out = Corpus.releaseDiff(a, b, "doc_id", Seq("text", "lang"))
      .select($"doc_id", $"status")
      .as[(Option[Long], String)].collect().toSeq
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
    // the null-keyed rows never join even with identical content: one
    // 'removed' from A's side, one 'added' from B's — a silent null
    // pairing would hide a corrupted-id slice from the diff
    assert(out == Seq(
      (None, "added"), (None, "removed"),
      (Some(1L), "unchanged"), (Some(2L), "changed"),
      (Some(3L), "removed"), (Some(4L), "changed"),
      (Some(5L), "added")))
  }

  test("groupSampleExactK: exactly k per big group, whole small group, " +
       "stable under repartitioning") {
    val rows = ((1 to 50).map(i => (i.toLong, s"t$i", "en")) ++
      (51 to 53).map(i => (i.toLong, s"t$i", "zh")))
      .toDF("id", "text", "grp")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.groupSampleExactK(df, Seq("id", "text"), Seq("grp"), 10)
        .select($"grp", $"id", $"rk")
        .as[(String, Long, Long)].collect().toSeq.sorted
    val out = run(rows)
    assert(out.count(_._1 == "en") == 10, "exactly k from the big group")
    assert(out.count(_._1 == "zh") == 3, "small group kept whole")
    assert(out.filter(_._1 == "zh").map(_._3).sorted == Seq(1L, 2L, 3L))
    // membership is a pure function of (keys, seed, group contents)
    assert(run(rows.repartition(7)) == out)
    // a different seed carves a different holdout (50 choose 10 —
    // identical sets would mean the seed isn't reaching the hash)
    val reseeded = Corpus.groupSampleExactK(rows, Seq("id", "text"),
        Seq("grp"), 10, seed = "other")
      .select($"grp", $"id", $"rk")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(reseeded.map(_._2).toSet != out.map(_._2).toSet)
  }

  test("cardFromSketches over per-shard sketch state is bit-identical " +
       "to the re-scan card, including null lang/source/chars rows") {
    val rows = Seq(
      (1L, "alpha beta gamma", "en", "web", 16),
      (2L, "delta", "en", "book", 5),
      (3L, "epsilon zeta", "en", "web", 12),
      (4L, "eta theta iota kappa", "fr", "web", 20),
      (5L, "lambda", "fr", null.asInstanceOf[String], 6),
      (6L, null.asInstanceOf[String], null.asInstanceOf[String],
        "web", 0),
      (7L, "mu nu", "de", "wiki", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      // a real null in n_chars for doc 7 (excluded from quantiles,
      // kept in counts; the tuple Int can't carry one)
      .withColumn("n_chars",
        when($"doc_id" === 7L, lit(null)).otherwise($"n_chars"))
    // reference: the corpus_card re-scan shape
    def rescan = {
      val qs = graft.ops.Quantiles.groupedQuantileCont(rows,
          Seq("lang"), "n_chars", Seq(0.5, 0.9))
        .groupBy("lang").agg(
          round(sum(when($"prob" === 0.5, $"quantile")), 6)
            .as("p50_chars"),
          round(sum(when($"prob" === 0.9, $"quantile")), 6)
            .as("p90_chars"))
      rows.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(graft.llm.TextAnalysis.tokenCountWs(
            coalesce($"text", lit(""))).cast("long")).as("n_tokens"),
          countDistinct($"source").as("n_sources"))
        .join(broadcast(qs), Seq("lang"), "left")
    }
    // sketch across 3 shards, merged — must not move a bit
    val sk = Corpus.cardSketch(rows, "doc_id", "lang", "source",
      "text", "n_chars", nShards = 3)
    val got = Corpus.cardFromSketches(sk)
      .orderBy($"lang".asc_nulls_first).collect().toSeq
    val ref = rescan.orderBy($"lang".asc_nulls_first).collect().toSeq
    assert(got == ref, s"sketch card $got != re-scan card $ref")
    // and the sketch really is corpus-size-independent state: one row
    // per (shard, lang) pair present, each carrying set + histogram
    assert(sk.count() <= 3 * 4)
  }

  test("cross-release contract: the union of two releases' sketch " +
       "tables merges to the SAME card as one sketch over the " +
       "concatenated corpora (VERDICT r15 #1)") {
    // release A and an overlapping release B — shared docs (1, 2),
    // a revision (2's text), a removal (3), an addition (8), plus a
    // null-lang row so the null-key arm is exercised across releases
    val relA = Seq(
      (1L, "alpha beta", "en", "web", 10),
      (2L, "gamma delta epsilon", "en", "book", 19),
      (3L, "zeta", "fr", "web", 4),
      (6L, "eta", null.asInstanceOf[String], "web", 3)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val relB = Seq(
      (1L, "alpha beta", "en", "web", 10),
      (2L, "gamma delta epsilon rev2", "en", "book", 24),
      (8L, "theta iota", "fr", "wiki", 10),
      (6L, "eta", null.asInstanceOf[String], "web", 3)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      Corpus.cardSketch(df, "doc_id", "lang", "source", "text",
        "n_chars", nShards = 3)
    val unioned = Corpus.cardFromSketches(
        sketch(relA).unionByName(sketch(relB)))
      .orderBy($"lang".asc_nulls_first).collect().toSeq
    val whole = Corpus.cardFromSketches(
        sketch(relA.unionByName(relB)))
      .orderBy($"lang".asc_nulls_first).collect().toSeq
    assert(unioned == whole,
      s"sketch union $unioned != concatenated-corpus sketch $whole")
    // duplicated shared docs count twice — concatenation semantics,
    // not deduplication: en has 2 docs in each release
    assert(unioned.find(_.getString(0) == "en").get.getLong(1) == 4L)
  }

  test("KLL card sketch: merged per-shard quantiles honor the rank-" +
       "error band on a 20k-row skewed column, and sketch size is " +
       "independent of row count (VERDICT r15 #4)") {
    // 20k rows, value = i² (skewed spacing so rank errors show up in
    // value space), one lang — far past any exactness regime
    def mk(n: Int) = spark.range(n)
      .select($"id".as("doc_id"), lit("en").as("lang"),
        ($"id" * $"id").cast("double").as("v"))
    val sk = Corpus.cardKllSketch(mk(20000), "doc_id", "lang", "v",
      nShards = 5)
    val est = Corpus.cardKllQuantiles(sk, Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // true quantile of i² over i ∈ [0, n) at rank p is ~(p·n)²;
    // the k=200 sketch's 99% normalized rank error is ~1.65%, so the
    // returned value's true rank must sit within p ± 0.05 (3×)
    val n = 20000.0
    for ((p, v) <- est) {
      val (lo, hi) = (math.pow((p - 0.05) * n, 2),
        math.pow((p + 0.05) * n, 2))
      assert(v >= lo && v <= hi,
        s"quantile $p estimate $v outside value band [$lo, $hi]")
    }
    // size independence: the serialized merged sketch over 20k rows
    // is within 2x of the 2k-row one, and both stay a few KB
    def mergedBytes(rows: Int): Int = Corpus
      .cardKllSketch(mk(rows), "doc_id", "lang", "v", nShards = 5)
      .groupBy("lang")
      .agg(graft.agg.Aggregators.kllMerge($"kll").as("kll"))
      .select($"kll").collect().head.getAs[Array[Byte]](0).length
    val (small, big) = (mergedBytes(2000), mergedBytes(20000))
    assert(big < 8192 && big < small * 2,
      s"sketch must not grow with rows: 2k-row $small B, " +
        s"20k-row $big B")
  }
}
