package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Privacy-governance verbs (operators/PrivacyOps.scala): group sizes,
  * sensitive diversity, suppression verdicts, generalization ladder.
  */
class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  // QI = (city): NY×3 (sensitive 10,10,20), SF×1 (sensitive 30)
  private def df = Seq(
    ("NY", 10L), ("NY", 10L), ("NY", 20L), ("SF", 30L)
  ).toDF("city", "sens")

  test("kAnonymity: k, l and suppression per QI group") {
    val p = PrivacyOps.kAnonymity(df, Seq("city"), "sens", minK = 2L)
      .orderBy("city")
      .select("city", "k", "l", "suppress")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(p == Seq(("NY", 3L, 2L, false), ("SF", 1L, 1L, true)))
  }

  test("anonymitySummary aggregates the worst case and the row cost") {
    val s0 = PrivacyOps.anonymitySummary(
        PrivacyOps.kAnonymity(df, Seq("city"), "sens", minK = 2L))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s0 == ((2L, 1L, 1L, 1L, 4L))) // 2 groups, min k 1, min l 1, 1 row suppressed of 4
  }

  test("generalization widens groups: coarser bucket raises min k") {
    val vals = Seq(("A", 101.0), ("A", 199.0), ("A", 205.0)).toDF("g", "v")
    val fine = vals.withColumn("b", PrivacyOps.generalizeNum(col("v"), 100L))
      .groupBy("b").count().agg(min("count")).as[Long].head()
    val coarse = vals.withColumn("b", PrivacyOps.generalizeNum(col("v"), 1000L))
      .groupBy("b").count().agg(min("count")).as[Long].head()
    assert(fine == 1L && coarse == 3L)
    // negative values floor toward -inf (bucket -1000, not 0)
    val neg = Seq(("A", -1.0)).toDF("g", "v")
      .select(PrivacyOps.generalizeNum(col("v"), 1000L)).as[Long].head()
    assert(neg == -1000L)
  }
}
