package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-governance measurements over a release candidate: k-anonymity
  * (smallest quasi-identifier group a record hides in), l-diversity
  * (distinct sensitive values per QI group), and numeric generalization
  * (the coarsening step of the anonymization loop). The screening a
  * training-data release runs before person-adjacent tables ship —
  * complementary to the PII regex detectors in TextOps (those find
  * identifiers in TEXT; this measures re-identification risk in
  * STRUCTURED columns).
  *
  * Scale: everything is one groupBy over the QI columns — group count
  * is bounded by the QI domain product, far below row count when the
  * QIs are release-worthy at all. The distinct-sensitive count rides
  * the same shuffle (one Expand pass). Nothing is row-scale after the
  * aggregate.
  */
object PrivacyOps {

  /** Per-QI-group anonymity profile: k (group size), l (distinct
    * sensitive values), and the suppression verdict at threshold
    * `minK`. A group with k < minK would be dropped (suppressed) by a
    * k-anonymous release; `l` = 1 flags homogeneous groups where the
    * sensitive value leaks even at high k.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 minK: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("k"),
        countDistinct(col(sensitiveCol)).as("l"))
      .withColumn("suppress", col("k") < minK)

  /** Release-level summary: min/median-free aggregate of the profile —
    * smallest k, smallest l, and how many ROWS suppression would drop.
    */
  def anonymitySummary(profile: DataFrame): DataFrame =
    profile.agg(
      count(lit(1)).as("n_groups"),
      min(col("k")).as("min_k"),
      min(col("l")).as("min_l"),
      sum(when(col("suppress"), col("k")).otherwise(0L)).as("rows_suppressed"),
      sum(col("k")).as("rows_total"))

  /** Numeric generalization: coarsen a value to its bucket floor
    * (`width` units) — the standard ladder step that trades precision
    * for larger QI groups. Integer-exact for integer inputs.
    */
  def generalizeNum(c: Column, width: Long): Column =
    floor(c / width.toDouble).cast("long") * width
}
