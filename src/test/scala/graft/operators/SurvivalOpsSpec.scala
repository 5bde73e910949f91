package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kaplan–Meier verbs (operators/SurvivalOps.scala): risk sets,
  * censoring semantics, the product-limit recursion, terminal zero.
  */
class SurvivalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier matches the textbook product-limit example") {
    // classic: deaths at t=1 (n=5), t=3 (n=3); censored at t=2, t=4, t=5
    // S(1) = 4/5; S(3) = 4/5 · 2/3 = 8/15
    val ents = Seq((1L, true), (2L, false), (3L, true), (4L, false), (5L, false))
      .toDF("t", "death")
    val km = SurvivalOps.kaplanMeier(ents, "t", "death")
      .orderBy("t").select("t", "n_risk", "d", "s")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(km.map(r => (r._1, r._2, r._3)) == Seq((1L, 5L, 1L), (3L, 3L, 1L)))
    assert(math.abs(km(0)._4 - 4.0 / 5) < 1e-12)
    assert(math.abs(km(1)._4 - 8.0 / 15) < 1e-12)
  }

  test("kaplanMeier: curve hits exactly zero when the last risk set dies") {
    val ents = Seq((1L, true), (2L, true)).toDF("t", "death")
    val km = SurvivalOps.kaplanMeier(ents, "t", "death")
      .orderBy("t").select("t", "s").as[(Long, Double)].collect().toSeq
    assert(km == Seq((1L, 0.5), (2L, 0.0)))
  }

  test("lifetimes: censoring by trailing inactivity") {
    val ev = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-05"),   // gap to end = 9 → death
      ("b", "2024-01-02"), ("b", "2024-01-12"),   // gap 2 → censored
      ("c", "2024-01-14")                          // gap 0 → censored, t=0
    ).toDF("u", "d").withColumn("d", col("d").cast("date"))
    val lt = SurvivalOps.lifetimes(ev, "u", col("d"), censorDays = 7)
      .orderBy("u").select("u", "t", "death")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(lt == Seq(("a", 4L, true), ("b", 10L, false), ("c", 0L, false)))
  }
}
