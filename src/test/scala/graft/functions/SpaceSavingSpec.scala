package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SpaceSaving top-k sketch (functions/SpaceSaving.scala): exact mode,
  * merge/partitioning invariance in exact mode, the heavy-hitter
  * presence guarantee under eviction, and serde.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: capacity >= cardinality reproduces exact top-k") {
    // frequencies: item i appears i times, i = 1..20
    val rows = (1 to 20).flatMap(i => Seq.fill(i)(s"item$i"))
    val got = rows.toDF("v").repartition(5)
      .agg(call_function("graft_topk", col("v"), lit(3), lit(64)))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("item20", 20L), ("item19", 19L), ("item18", 18L)))
  }

  test("exact-mode ties order by item string ascending") {
    val rows = Seq("b", "a", "c", "a", "b", "c") // all count 2
    val got = rows.toDF("v")
      .agg(call_function("graft_topk", col("v"), lit(2), lit(16)))
      .head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(got == Seq("a", "b"))
  }

  test("exact mode is partitioning-invariant") {
    val rows = (1 to 500).map(i => s"k${i % 37}")
    val runs = Seq(1, 4, 11).map { p =>
      rows.toDF("v").repartition(p)
        .agg(call_function("graft_topk", col("v"), lit(5), lit(64)))
        .head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
    }
    assert(runs.distinct.size == 1, runs.toString)
  }

  test("heavy hitters survive eviction: freq > n/capacity is always kept") {
    // 10k rows: one item holds 20% of the stream, the rest is a long
    // tail of 5000 singletons+ — capacity 64 forces heavy eviction.
    val heavy = Seq.fill(2000)("HEAVY")
    val tail = (1 to 8000).map(i => s"tail${i % 5000}")
    val got = (heavy ++ tail).toDF("v").repartition(4)
      .agg(call_function("graft_topk", col("v"), lit(1), lit(64)))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(got.head.getString(0) == "HEAVY")
    // SpaceSaving overestimates, never underestimates
    assert(got.head.getLong(1) >= 2000L)
  }

  test("sketch state serde round-trips, including errors") {
    val st = new SpaceSavingState(4)
    Seq("a", "b", "c", "d", "e", "e", "a").foreach(st.update)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKSketch(Literal("x"), Literal(2), Literal(4))
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n == st.n)
    assert(back.counters.toMap == st.counters.toMap)
    assert(back.topK(4) == st.topK(4))
  }
}
