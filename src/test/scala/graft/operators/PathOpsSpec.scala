package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Path verbs (operators/PathOps.scala): gap-split sessions, total
  * (ts, id) ordering, maxLen truncation before the count shuffle,
  * transition probabilities normalized per from-type.
  */
class PathOpsSpec extends SparkSpec {
  import spark.implicits._

  // (user, event_id, type, ts): user A has two sessions split by a
  // > 100-unit gap; the ts tie at 20 orders by event_id (3 before 4)
  private val ev = Seq(
    ("A", 1L, "view", 10L), ("A", 3L, "click", 20L), ("A", 4L, "view", 20L),
    ("A", 5L, "buy", 30L),
    ("A", 6L, "view", 500L), ("A", 7L, "buy", 510L), // session 2
    ("B", 8L, "view", 10L), ("B", 9L, "click", 15L), ("B", 10L, "buy", 25L)
  ).toDF("u", "id", "t", "ts")

  test("sessionPaths: gap split, tie-break by id, truncation") {
    val paths = PathOps.sessionPaths(ev, "u", "t", "ts", "id", maxGap = 100L, maxLen = 8)
      .orderBy("u", "session")
      .select("u", "session", "path", "path_len")
      .as[(String, Long, String, Long)].collect().toSeq
    assert(paths == Seq(
      ("A", 1L, "view>click>view>buy", 4L),
      ("A", 2L, "view>buy", 2L),
      ("B", 1L, "view>click>buy", 3L)))
    // truncation: maxLen=2 keeps the session PREFIX
    val cut = PathOps.sessionPaths(ev, "u", "t", "ts", "id", maxGap = 100L, maxLen = 2)
      .filter(col("u") === "A" && col("session") === 1)
      .select("path", "path_len").as[(String, Long)].head()
    assert(cut == (("view>click", 2L)))
  }

  test("pathCounts groups identical routes across users") {
    val paths = PathOps.sessionPaths(ev, "u", "t", "ts", "id", maxGap = 100L, maxLen = 8)
    val counts = PathOps.pathCounts(paths)
      .orderBy(col("n_sessions").desc, col("path"))
      .as[(String, Long, Long)].collect().toSeq
    assert(counts == Seq(
      ("view>buy", 2L, 1L),
      ("view>click>buy", 3L, 1L),
      ("view>click>view>buy", 4L, 1L)))
  }

  test("attribution: range-window endpoints, lookback cut, null when no touch") {
    val ev2 = Seq(
      // A: ad(10) email(20) buy(30) — both touches in a 15-unit lookback? cut = 30-15=15: email only for first AND last
      ("A", 1L, "ad", 10L), ("A", 2L, "email", 20L), ("A", 3L, "buy", 30L),
      // B: touch outside lookback -> nulls
      ("B", 4L, "ad", 1L), ("B", 5L, "buy", 100L),
      // C: two touches inside; first=ad(90), last=email(95);
      // an EARLIER buy is not a touch
      ("C", 6L, "buy", 80L), ("C", 7L, "ad", 90L), ("C", 8L, "email", 95L),
      ("C", 9L, "buy", 100L)
    ).toDF("u", "id", "t", "ts")
    val out = PathOps.attribution(ev2, "u", "t", "ts", "id", Set("buy"), 15L)
      .orderBy("u", "ts")
      .select("u", "ts", "first_touch", "first_ts", "last_touch", "last_ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2), r.get(3), r.get(4), r.get(5)))
    assert(out.toSeq == Seq(
      ("A", 30L, "email", 20L, "email", 20L), // ad(10) is outside [15, 29]
      ("B", 100L, null, null, null, null),
      ("C", 80L, null, null, null, null),
      ("C", 100L, "ad", 90L, "email", 95L)))
  }

  test("attribution endpoints match a brute-force reference on random streams") {
    val rnd = new scala.util.Random(11)
    val types = Vector("ad", "email", "push", "buy")
    val ev2 = (1 to 400).map { i =>
      (s"u${rnd.nextInt(12)}", i.toLong, types(rnd.nextInt(types.size)),
        rnd.nextInt(500).toLong)
    }
    val lb = 60L
    val ref = ev2.filter(_._3 == "buy").map { case (u, id, _, ts) =>
      val win = ev2.filter(e => e._1 == u && e._3 != "buy" &&
        e._4 >= ts - lb && e._4 <= ts - 1)
      val keys = win.map(e => (e._4, e._3)).sorted
      (u, ts, id,
        keys.headOption.map(_._2).orNull, keys.headOption.map(_._1),
        keys.lastOption.map(_._2).orNull, keys.lastOption.map(_._1))
    }.toSet
    val got = PathOps.attribution(ev2.toDF("u", "id", "t", "ts"),
        "u", "t", "ts", "id", Set("buy"), lb)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.get(4), Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.get(6), Option(r.get(7)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == ref)
  }

  test("transitions: session-bounded pairs, per-from normalization") {
    val tr = PathOps.transitions(ev, "u", "t", "ts", "id", maxGap = 100L)
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n", "prob")
      .as[(String, String, Long, Double)].collect().toSeq
    // pairs: A s1 view>click, click>view, view>buy; A s2 view>buy
    // (the 30 -> 500 gap is NOT a transition); B view>click, click>buy
    assert(tr == Seq(
      ("click", "buy", 1L, 0.5),
      ("click", "view", 1L, 0.5),
      ("view", "buy", 2L, 0.5),
      ("view", "click", 2L, 0.5)))
  }
}
