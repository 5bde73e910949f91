package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality measurement: a one-pass column profiler and
  * a declarative constraint suite — the validation stage a training-data
  * pipeline runs before anything downstream trusts a new snapshot
  * (beside the drift monitors in DriftOps, which compare snapshots; this
  * judges ONE snapshot against absolute expectations).
  *
  * Scale: the profiler computes every metric for every column in a
  * SINGLE aggregation pass over the table (one scan, one reduce — the
  * long-format reshape happens on the one-row aggregate), and each
  * constraint is either another single-pass aggregate or a broadcast
  * anti-join for referential containment. Nothing is per-row on the
  * driver; the result is O(columns), not O(rows).
  */
object DataQualityOps {

  /** Long-format per-column profile: completeness (non-null ratio),
    * distinctness (exact distinct / rows), and for numeric columns
    * min / max / mean. One row per (column, metric); `value` is DOUBLE
    * (counts are exact integers widened losslessly).
    *
    * All metrics for all columns ride in ONE `agg(...)` so the plan is
    * a single partial/final aggregate pair over one scan; the
    * count(DISTINCT) columns share the same Expand pass.
    */
  def profile(df: DataFrame, numericCols: Seq[String]): DataFrame = {
    val cols = df.columns.toSeq
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("_rows")) ++
        cols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}__nonnull"),
            countDistinct(col(c)).as(s"${c}__distinct"))
        } ++
        numericCols.flatMap { c =>
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
            max(col(c)).cast("double").as(s"${c}__max"),
            (sum(col(c)) / count(col(c))).as(s"${c}__mean"))
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val metricExprs: Seq[(String, String, Column)] =
      cols.flatMap { c =>
        Seq(
          (c, "completeness",
            round(col(s"${c}__nonnull").cast("double") / col("_rows"), 4)),
          (c, "distinctness",
            round(col(s"${c}__distinct").cast("double") / col("_rows"), 4)))
      } ++
        numericCols.flatMap { c =>
          Seq((c, "min", col(s"${c}__min")),
            (c, "max", col(s"${c}__max")),
            (c, "mean", round(col(s"${c}__mean"), 4)))
        }
    val structs = metricExprs.map { case (c, m, v) =>
      struct(lit(c).as("col_name"), lit(m).as("metric"), v.as("value"))
    }
    one.select(explode(array(structs: _*)).as("kv"))
      .select(col("kv.col_name"), col("kv.metric"), col("kv.value"))
  }

  /** A declarative constraint: name + violation-count frame (one row,
    * one LONG column named `violations`).
    */
  final case class Check(name: String, violations: DataFrame)

  /** Uniqueness: rows minus distinct values of the key (null-free key
    * assumed counted by count(col)).
    */
  def uniqueCheck(df: DataFrame, keyCol: String): Check =
    Check(s"unique:$keyCol",
      df.agg((count(col(keyCol)) - countDistinct(col(keyCol)))
        .as("violations")))

  /** Predicate expectation: rows where `pred` is NOT true (null counts
    * as a violation — an unknown is not a pass).
    */
  def satisfiesCheck(df: DataFrame, name: String, pred: Column): Check =
    Check(s"satisfies:$name",
      df.agg(sum(when(pred.isNull || !pred, 1L).otherwise(0L))
        .as("violations")))

  /** Referential containment: values of `fkCol` absent from
    * `dim[pkCol]`. Broadcast anti-join — the dim side is the small
    * side by definition of a containment check.
    */
  def containedInCheck(fact: DataFrame, fkCol: String,
                       dim: DataFrame, pkCol: String): Check =
    Check(s"contained:$fkCol",
      fact.join(broadcast(dim.select(col(pkCol).as(fkCol)).distinct()),
          Seq(fkCol), "left_anti")
        .agg(count(lit(1)).as("violations")))

  /** Membership in an allowed-value set. */
  def inSetCheck(df: DataFrame, c: String, allowed: Seq[String]): Check =
    satisfiesCheck(df, s"in_set:$c", col(c).isin(allowed: _*))

  /** Benford first-digit profile of a positive numeric column: observed
    * first-significant-digit counts vs the Benford expectation
    * n·log10(1 + 1/d), with per-digit chi-square contributions —
    * the classic fabricated-amounts screen. The digit comes from the
    * INTEGER cents string (exact on both engines; a log10/floor digit
    * extraction can off-by-one at powers of ten).
    */
  def benfordProfile(df: DataFrame, c: Column): DataFrame = {
    val cents = round(c * 100).cast("long")
    // filter on cents >= 1, not c > 0: a value in (0, 0.005) rounds to
    // cents 0, whose "digit 0" row would make expected = n·log(1+1/0)
    // infinite and contrib NaN — sub-cent values are out of the
    // profile's domain, so exclude them at the source
    val digits = df.where(cents >= 1)
      .select(substring(cents.cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).cast("double").as("_n"))
    digits.crossJoin(broadcast(total))
      // ln-ratio, not a log10 builtin: the two engines' log10 can
      // differ in the last bit; ln(x)/ln(10) is the same ops both sides
      .withColumn("expected", col("_n") *
        (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))))
      .withColumn("contrib",
        (col("n_obs") - col("expected")) * (col("n_obs") - col("expected"))
          / col("expected"))
      .drop("_n")
  }

  /** Run a suite: one row per check with its violation count and
    * verdict. The per-check aggregates are tiny one-row frames; the
    * union is check-count-sized.
    */
  def runChecks(checks: Seq[Check]): DataFrame =
    checks.map { ch =>
      ch.violations.select(lit(ch.name).as("check_name"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0).as("passed"))
    }.reduce(_ unionAll _)
}
