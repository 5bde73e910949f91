package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics verbs over the events stream — ordered funnels
  * and cohort retention, the two queries every telemetry dashboard
  * grows once events carry a user id. Both are compositions of
  * aggregations that hash on the SAME entity key, so each op costs a
  * bounded chain of co-partitioned shuffles regardless of corpus
  * size, and both are integer-exact on the ns axis (oracle-friendly
  * by construction).
  */
object FunnelOps {

  /** Ordered funnel: per entity, t₁ = min time of step 1, and
    * t_k = min step-k time STRICTLY after t_{k−1} (the "did B happen
    * after A" semantics real funnels need — a purchase before the
    * view doesn't count). Returns one row per entity that reached
    * step 1, with nullable t1..tN columns.
    *
    * Scale shape: one filtered aggregation per step, every join and
    * groupBy keyed on the entity — the first aggregation's hash
    * partitioning is reused down the whole chain (no new exchange
    * family), and each step's filter pushes to the scan.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val k = i + 2
      val ev = df.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("_ts"))
      val keep = (userCol +: (1 until k).map(j => s"t$j")).map(col)
      acc = acc.join(ev, Seq(userCol), "left")
        .groupBy(keep: _*)
        .agg(min(when(col("_ts") > col(s"t${k - 1}"), col("_ts"))).as(s"t$k"))
    }
    acc
  }

  /** Cohort retention: cohort = the entity's first active ISO week,
    * cell (cohort, offset) = distinct entities of that cohort active
    * `offset` weeks later. The matrix behind every retention chart.
    *
    * Scale shape: distinct (entity, week) pairs → per-entity min
    * (both hash on the entity), then one count-distinct keyed on
    * (cohort, offset) — week arithmetic is integer epoch-seconds
    * division, exact on both engines.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = df.select(col(userCol),
      date_trunc("week", col(tsCol)).as("wk")).distinct()
    val cohort = uw.groupBy(col(userCol)).agg(min(col("wk")).as("cw"))
    uw.join(cohort, userCol)
      // calendar arithmetic, not epoch-seconds: date_trunc('week')
      // boundaries are session-tz midnights, so across a DST shift the
      // epoch delta is 604800±3600 s and a truncating divide lands on
      // the wrong offset. The day difference between two week-start
      // midnights is ALWAYS an exact multiple of 7 in any timezone.
      .withColumn("offset",
        floor(datediff(col("wk"), col("cw")) / lit(7)).cast("long"))
      .groupBy(col("cw").as("cohort_week"), col("offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
