package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance verbs: CDC changeset application (MERGE
  * semantics) and the slowly-changing-dimension type-2 interval build —
  * the snapshot-upkeep layer between the ingest path and the analytics
  * verbs (the batch analogue of the store's LWW compaction).
  *
  * Scale: applyChanges is one anti-join on the key (broadcastable when
  * the changeset is small — the common CDC shape — and a plain shuffled
  * join otherwise) plus a union; scd2 is one window pass per key plus a
  * key×version aggregate. Neither touches the driver.
  */
object CdcOps {

  /** Apply a CDC changeset to a snapshot with MERGE INTO semantics:
    * rows whose key appears in the changeset leave the base (one
    * left-anti join on the distinct change keys), then inserts and
    * updates land as new rows; deletes contribute only their key.
    * The caller guarantees one op per key (upstream CDC compaction) —
    * with both a 'U' and 'D' for one key the update wins here.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], opCol: String): DataFrame = {
    val keys = changes.select(keyCols.map(col): _*).distinct()
    val kept = base.join(keys, keyCols, "left_anti")
    val upserts = changes.where(col(opCol) =!= "D").drop(opCol)
    kept.unionByName(upserts)
  }

  /** Incremental maintenance of a sum/count aggregate view: instead of
    * recomputing over the merged table, fold a changeset in as DELTAS —
    * the before-image of every touched row contributes negatively, the
    * after-image positively, the per-group deltas aggregate, and one
    * outer join patches the old view. With integer (cents) measures
    * the maintained view equals the full recompute EXACTLY, which is
    * what the gate proves. Groups whose maintained count reaches zero
    * drop out (the view stays minimal).
    *
    * Scale: the delta aggregation runs at CHANGESET size, and the
    * patch join at view-group cardinality — the whole point vs a
    * fact-scale rescan.
    */
  def incrementalAgg(baseView: DataFrame, beforeRows: DataFrame,
                     afterRows: DataFrame, groupCols: Seq[String],
                     cntCol: String, sumCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    def signed(df: DataFrame, sign: Int): DataFrame =
      df.select(gc ++ (lit(sign.toLong).as(cntCol) +:
        sumCols.map(c => (col(c) * sign).as(c))): _*)
    val aggExprs = sum(col(cntCol)).as(s"_d_$cntCol") +:
      sumCols.map(c => sum(col(c)).as(s"_d_$c"))
    val delta = signed(afterRows, 1).unionByName(signed(beforeRows, -1))
      .groupBy(gc: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    baseView.join(delta, groupCols, "full")
      .select(gc ++ (
        (coalesce(col(cntCol), lit(0L)) + coalesce(col(s"_d_$cntCol"), lit(0L)))
          .as(cntCol) +:
        sumCols.map(c =>
          (coalesce(col(c), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L)))
            .as(c))): _*)
      .where(col(cntCol) > 0)
  }

  /** SCD type-2 build: collapse an ordered per-key attribute series
    * into validity intervals. Output: key cols + `version` (1-based,
    * increments on attribute change), `attr`, `valid_from` (first
    * order value of the run), `valid_to` (next run's valid_from; NULL
    * = current). Change detection is null-safe (`<=>`).
    */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: String,
           attrCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col(orderCol))
    val flagged = df
      .withColumn("_chg",
        when(lag(col(attrCol), 1).over(w) <=> col(attrCol), 0L).otherwise(1L))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val runs = flagged
      .groupBy(kc :+ col("version"): _*)
      .agg(min(col(attrCol)).as("attr"), // constant within the run
        min(col(orderCol)).as("valid_from"))
    val vw = Window.partitionBy(kc: _*).orderBy(col("version"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(vw))
  }
}
