package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over entity lifetimes — the
  * churn/retention curve with proper right-censoring (an entity still
  * active near the corpus end hasn't churned; it leaves the risk set
  * without counting as a death). The product-limit estimator
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
  *
  * Scale + determinism: entities collapse to one (lifetime, death)
  * row each (one shuffle); everything after runs on the LIFETIME
  * DOMAIN (≤ corpus day span — tens of rows), where risk-set suffix
  * sums and the cumulative product are TRIANGULAR SELF-JOINS on that
  * tiny frame, not global windows (the plan-gate rule). The product
  * is exp(Σ ln(1 − d/n)) with the identical shape in the oracle.
  */
object SurvivalOps {

  /** Per-lifetime KM curve from an entity frame with `tCol` (observed
    * lifetime, integer) and `deathCol` (false = right-censored).
    * Output: (t, n_risk, d, s) for each death time, ascending.
    */
  def kaplanMeier(entities: DataFrame, tCol: String,
                  deathCol: String): DataFrame = {
    val deaths = entities.where(col(deathCol))
      .groupBy(col(tCol).as("t")).agg(count(lit(1)).as("d"))
    val atT = entities.groupBy(col(tCol).as("t"))
      .agg(count(lit(1)).as("n_at"))
    // risk set: everyone (death or censored) whose observed time >= t —
    // a suffix sum over the tiny lifetime domain, via self-join
    // broadcast the domain-sized sides explicitly: a non-equi inner
    // join without a broadcastable side plans as CartesianProduct
    val risk = deaths.select(col("t"))
      .join(broadcast(atT.select(col("t").as("t2"), col("n_at"))),
        col("t2") >= col("t"))
      .groupBy("t").agg(sum(col("n_at")).cast("long").as("n_risk"))
    val j = deaths.join(risk, "t")
    // cumulative product over death times <= t: triangular self-join.
    // A time where everyone at risk dies (d = n) zeroes the curve from
    // there on — flagged explicitly, since ln(0) is out of domain.
    val terms = j.select(col("t").as("t2"),
      when(col("d") < col("n_risk"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk"))).as("lnterm"),
      when(col("d") === col("n_risk"), 1L).otherwise(0L).as("zero"))
    j.join(broadcast(terms), col("t2") <= col("t"))
      .groupBy("t", "n_risk", "d")
      .agg(when(max(col("zero")) === 1, lit(0.0))
        .otherwise(exp(sum(col("lnterm")))).as("s"))
      .select(col("t"), col("n_risk"), col("d"), col("s"))
  }

  /** Entity lifetimes from an event stream: first/last active day per
    * entity, observed lifetime in days, death = inactive for at least
    * `censorDays` before the corpus end (otherwise right-censored).
    */
  def lifetimes(events: DataFrame, entityCol: String, dayCol: Column,
                censorDays: Int): DataFrame = {
    val perUser = events.groupBy(col(entityCol))
      .agg(min(dayCol).as("fd"), max(dayCol).as("ld"))
    val mx = perUser.agg(max(col("ld")).as("maxd"))
    perUser.crossJoin(broadcast(mx))
      .select(col(entityCol),
        datediff(col("ld"), col("fd")).cast("long").as("t"),
        (datediff(col("maxd"), col("ld")) >= censorDays).as("death"))
  }
}
