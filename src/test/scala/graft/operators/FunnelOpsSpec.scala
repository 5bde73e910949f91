package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel/cohort verbs (operators/FunnelOps.scala): strict step
  * ordering (later steps only count AFTER the previous step's time),
  * entities missing step 1 drop, cohort offsets are whole weeks.
  */
class FunnelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel enforces strict step order per user") {
    val ev = Seq(
      // A: clean path
      ("A", "view", 10L), ("A", "click", 20L), ("A", "purchase", 30L),
      // B: click before the view doesn't count; the later one does
      ("B", "click", 5L), ("B", "view", 10L), ("B", "click", 50L),
      // C: purchase BEFORE the view — must not complete the funnel
      ("C", "purchase", 1L), ("C", "view", 2L),
      // D: never views — not in the funnel at all
      ("D", "click", 1L), ("D", "purchase", 2L))
      .toDF("u", "t", "ts")
    val out = FunnelOps.funnel(ev, "u", "t", "ts", Seq("view", "click", "purchase"))
      .orderBy("u")
      .select("u", "t1", "t2", "t3")
      .collect()
      .map(r => (r.getString(0), r.get(1), r.get(2), r.get(3)))
    assert(out.toSeq == Seq(
      ("A", 10L, 20L, 30L),
      ("B", 10L, 50L, null),
      ("C", 2L, null, null)))
  }

  test("funnel ties: a step at exactly the previous time does not count") {
    val ev = Seq(("A", "view", 10L), ("A", "click", 10L), ("A", "click", 11L))
      .toDF("u", "t", "ts")
    val out = FunnelOps.funnel(ev, "u", "t", "ts", Seq("view", "click"))
      .select("t1", "t2").head
    assert(out.getLong(0) == 10L && out.getLong(1) == 11L)
  }

  test("cohort retention counts distinct returners per week offset") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    val ev = Seq(
      // cohort of Mon 2024-01-01: u1 active wk0+wk1, u2 wk0 only
      ("u1", ts(2)), ("u1", ts(3)), ("u1", ts(9)),
      ("u2", ts(4)),
      // cohort of Mon 2024-01-08: u3 active wk0 and wk2
      ("u3", ts(10)), ("u3", ts(22)))
      .toDF("u", "ts")
    val out = FunnelOps.cohortRetention(ev, "u", "ts")
      .select(col("cohort_week").cast("string"), col("offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", 0L, 2L),
      ("2024-01-01 00:00:00", 1L, 1L),
      ("2024-01-08 00:00:00", 0L, 1L),
      ("2024-01-08 00:00:00", 2L, 1L)))
  }
}
