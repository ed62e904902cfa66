package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class AsofRangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 100.0),
      (2L, "A", ts("2024-01-01 10:05:00"), 101.0),
      (3L, "A", ts("2024-01-01 09:00:00"), 99.0), // before any quote
      (4L, "B", ts("2024-01-01 10:00:00"), 50.0))
      .toDF("trade_id", "sym", "t", "px")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:30:00"), 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2.0), // tie with trade 1: inclusive
      ("A", ts("2024-01-01 10:04:00"), 3.0),
      ("B", ts("2024-01-01 09:59:00"), 9.0))
      .toDF("sym", "qt", "bid")
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        Seq("bid"))
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(2.0)) // equal ts ⇒ right row included
    assert(out(2L).contains(3.0))
    assert(out(3L).isEmpty)       // left-outer: no earlier quote
    assert(out(4L).contains(9.0))
  }

  test("asofJoin returns the as-of ROW's payload even when it is null, " +
       "and never tears fields across right rows") {
    // the as-of row (t=2) has p1 set but p2 null: per-column
    // last(ignoreNulls) carries would return the STALE t=1 p2 ("old2"),
    // fabricating a (p1, p2) pair that exists on no right row — the
    // struct carry must return exactly (new1, null)
    val left = Seq(("k", ts("2024-01-01 03:00:00"))).toDF("k", "t")
    val right = Seq(
      ("k", ts("2024-01-01 01:00:00"), "old1", "old2"),
      ("k", ts("2024-01-01 02:00:00"), "new1", null.asInstanceOf[String]))
      .toDF("k", "rt", "p1", "p2")
    val out = Relational.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("p1", "p2"))
      .select($"p1", $"p2").as[(Option[String], Option[String])]
      .collect().head
    assert(out == ((Some("new1"), None)),
      s"expected the t=2 row's exact fields incl. its null, got $out")
    // all-null payload on the as-of row: still that row, not the older one
    val right2 = Seq(
      ("k", ts("2024-01-01 01:00:00"), "old1"),
      ("k", ts("2024-01-01 02:00:00"), null.asInstanceOf[String]))
      .toDF("k", "rt", "p1")
    val out2 = Relational.asofJoin(left, right2, Seq("k"), "t", "rt",
        Seq("p1"))
      .select($"p1").as[Option[String]].collect().head
    assert(out2.isEmpty, s"expected the as-of row's null p1, got $out2")
  }

  test("asofJoin follows SQL ASOF semantics on NULLs: null keys never " +
       "match each other, null right ts matches nothing, null-key left " +
       "rows survive with null payload") {
    val trades = Seq(
      (1L, Some("A"), ts("2024-01-01 10:00:00")),
      (2L, None,      ts("2024-01-01 10:00:00")), // null key
      (3L, Some("A"), ts("2024-01-01 10:05:00")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (Some("A"), Option(ts("2024-01-01 09:30:00")), 1.0),
      (None,      Option(ts("2024-01-01 09:00:00")), 7.0),  // null key
      (Some("A"), Option.empty[Timestamp],           8.0))  // null ts
      .toDF("sym", "qt", "bid")
    val out = Relational.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        Seq("bid"))
      .select($"trade_id", $"bid").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).contains(1.0)) // NOT 8.0 — null-ts quote matches nothing
    assert(out(2L).isEmpty)       // NOT 7.0 — null = null is never true
    assert(out(3L).contains(1.0))
    assert(out.size == 3)         // left-outer: every left row survives
  }

  test("asofJoin carries left payload columns through untouched") {
    val left = Seq((1L, "A", ts("2024-01-01 12:00:00"), "keep-me"))
      .toDF("id", "k", "t", "note")
    val right = Seq(("A", ts("2024-01-01 11:00:00"), 7.5))
      .toDF("k", "rt", "v")
    val row = Relational.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("v")).select($"id", $"k", $"t", $"note", $"v")
      .as[(Long, String, Timestamp, String, Double)].collect().head
    assert(row == ((1L, "A", ts("2024-01-01 12:00:00"), "keep-me", 7.5)))
  }

  test("asofJoin refuses a payload name that collides with a left " +
       "column (would build an ambiguous union schema)") {
    val left = Seq((1L, "A", ts("2024-01-01 12:00:00"), 0.0))
      .toDF("id", "k", "t", "v")
    val right = Seq(("A", ts("2024-01-01 11:00:00"), 7.5))
      .toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      Relational.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofJoin matches the naive max-earlier-row reference on " +
       "seeded random data") {
    val rnd = new scala.util.Random(42)
    val left = (0 until 400).map(i => (i.toLong, (rnd.nextInt(6)).toString,
      ts(f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00")))
      .toDF("lid", "k", "t")
    // unique (k, rt): one quote per (key, hour) slot
    val right = (0 until 300).map { i =>
      (i % 6, 1 + (i / 6) % 28, (i / 168) % 24)
    }.distinct.filter(_ => rnd.nextBoolean()).map { case (k, d, h) =>
      (k.toString, ts(f"2024-01-$d%02d $h%02d:00:00"), rnd.nextDouble())
    }.toDF("k", "rt", "v")
    val asof = Relational.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("v"))
      .select($"lid", $"v").as[(Long, Option[Double])].collect().toMap
    // naive reference: max rt ≤ t per left row via theta join + groupBy
    // (rt ≤ t inside the join condition so matchless lids keep a null)
    val naive = left.join(right,
        left("k") === right("k") && right("rt") <= left("t"), "left_outer")
      .groupBy("lid")
      .agg(max_by(right("v"), right("rt")).as("v"))
      .select($"lid", $"v").as[(Long, Option[Double])].collect().toMap
    assert(asof.keySet == naive.keySet)
    naive.foreach { case (lid, v) =>
      assert(asof(lid) == v, s"lid $lid: asof ${asof(lid)} vs naive $v")
    }
  }

  test("rangeJoinBucketed matches the naive theta-join exactly") {
    val events = (0 until 200).map { i =>
      (i.toLong, (i % 5).toLong,
        ts(f"2024-03-${1 + i % 20}%02d ${i % 24}%02d:15:00"), i * 1.0)
    }.toDF("event_id", "uid", "t", "v")
    // uid 0 events land on days {1,6,11,16}; uid 3 on {4,9,14,19}
    val windows = Seq(
      (100L, 0L, ts("2024-03-01 00:00:00"), ts("2024-03-06 23:59:59")),
      (101L, 3L, ts("2024-03-09 00:00:00"), ts("2024-03-15 00:00:00")),
      (102L, 9L, ts("2024-03-01 00:00:00"), ts("2024-03-20 00:00:00")))
      .toDF("win_id", "wuid", "ws", "we")
    val bucketed = Relational.rangeJoinBucketed(events, "t", windows,
        "ws", "we", keys = Seq("uid" -> "wuid"))
      .select($"win_id", $"event_id").as[(Long, Long)].collect().toSet
    val naive = events.join(windows,
        $"uid" === $"wuid" && $"t" >= $"ws" && $"t" <= $"we")
      .select($"win_id", $"event_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty)
    assert(!naive.exists(_._1 == 102L)) // key with no events
    // boundary inclusivity on both ends
    val edge = Relational.rangeJoinBucketed(
      Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-03 00:00:00")),
        (3L, ts("2024-01-03 00:00:01"))).toDF("id", "t"),
      "t",
      Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
        .toDF("wid", "ws", "we"),
      "ws", "we")
      .select($"id").as[Long].collect().toSet
    assert(edge == Set(1L, 2L))
  }
}
