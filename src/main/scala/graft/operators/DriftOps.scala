package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two corpus snapshots — the
  * monitoring loop of a production data pipeline: is today's intake
  * distributed like the reference the filters/classifiers were tuned
  * on? Implements the population stability index (PSI), the standard
  * industry drift score (PSI < 0.1 stable, 0.1–0.25 shifting, > 0.25
  * drifted), for numeric columns over FIXED bins and for categorical
  * columns over their value domain.
  *
  * Scale shape: each side collapses to its bucket histogram first —
  * one map-side-combinable aggregate per snapshot, output rows =
  * bucket count, NOT corpus rows — and the PSI join runs on those
  * histogram tables (broadcast-sized by construction). Nothing
  * downstream of the two scans touches per-row data, so the op costs
  * two scans regardless of snapshot size. Bins are fixed (caller
  * lo/width/n) rather than data-derived quantiles so the score is
  * comparable across runs — the property a drift MONITOR needs (a
  * quantile-binned PSI re-anchors itself to the drifted data and
  * under-reports exactly when it matters).
  */
object DriftOps {

  /** Zero-proportion clamp: PSI's log ratio is undefined on empty
    * buckets; the standard practice is flooring proportions at a small
    * epsilon, which bounds a born-or-died bucket's contribution
    * instead of producing ±Inf.
    */
  val Eps = 1e-6

  private def contribution(pRef: Column, pCur: Column): Column =
    (pCur - pRef) * log(greatest(pCur, lit(Eps)) / greatest(pRef, lit(Eps)))

  /** Per-bucket Jensen–Shannon divergence term:
    * ½·(p·ln(p/m) + q·ln(q/m)) with m = (p+q)/2 and the 0·ln0 = 0
    * convention — no epsilon needed, and the total is bounded by ln 2
    * (PSI is unbounded, which is why monitors report both: JSD for a
    * comparable saturating score, PSI for the familiar thresholds).
    */
  private def jsContribution(pRef: Column, pCur: Column): Column = {
    val m = (pRef + pCur) / 2
    (when(pRef > 0, pRef * log(pRef / m)).otherwise(lit(0.0)) +
      when(pCur > 0, pCur * log(pCur / m)).otherwise(lit(0.0))) / 2
  }

  /** Fixed-width bin assignment: bucket b covers
    * [lo + b·width, lo + (b+1)·width), with bucket −1 catching
    * underflow and `nBins` overflow. Usable on batch AND streaming
    * frames (pure column arithmetic).
    */
  def bucketOf(value: Column, lo: Double, width: Double, nBins: Int): Column = {
    require(width > 0 && nBins >= 1, s"need width>0, nBins>=1; got $width, $nBins")
    least(greatest(floor((value - lo) / width).cast("long"), lit(-1L)),
      lit(nBins.toLong))
  }

  /** Per-bucket PSI decomposition for a numeric column over fixed-width
    * bins. Returns (bucket, n_ref, n_cur, p_ref, p_cur, contrib) — one
    * row per bucket observed in EITHER snapshot; Σ contrib is the PSI.
    */
  def numericDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, width: Double, nBins: Int): DataFrame = {
    def bucket(df: DataFrame): DataFrame =
      df.select(bucketOf(col(valueCol), lo, width, nBins).as("bucket"))
    psiJoin(bucket(ref), bucket(cur), "bucket")
  }

  /** Per-category PSI decomposition for a categorical column: same
    * output contract keyed by the category value. Born/died categories
    * appear with a zero side and an Eps-bounded contribution.
    */
  def categoricalDrift(ref: DataFrame, cur: DataFrame, catCol: String): DataFrame =
    psiJoin(ref.select(col(catCol).as("bucket")),
      cur.select(col(catCol).as("bucket")), "bucket")

  private def psiJoin(ref: DataFrame, cur: DataFrame, key: String): DataFrame =
    psiOfHistograms(
      ref.groupBy(key).agg(count(lit(1)).as("n_ref")),
      cur.groupBy(key).agg(count(lit(1)).as("n_cur")), key)

  /** PSI from pre-built histograms — the entry a STREAMING monitor
    * uses: maintain the current-side (bucket, n_cur) histogram as
    * streaming aggregation state, then score any snapshot of it
    * against the static reference histogram. Expects (key, n_ref) and
    * (key, n_cur).
    */
  def psiOfHistograms(refHist: DataFrame, curHist: DataFrame,
      key: String = "bucket"): DataFrame = {
    // histograms pinned with localCheckpoint: the snapshot totals then
    // derive from the bucket rows (no second corpus scan, no driver
    // count() action) and ride along as broadcast 1-row frames
    val r = refHist.localCheckpoint()
    val c = curHist.localCheckpoint()
    val rTot = r.agg(sum(col("n_ref")).cast("double").as("t_ref"))
    val cTot = c.agg(sum(col("n_cur")).cast("double").as("t_cur"))
    r.join(c, Seq(key), "full_outer")
      .select(col(key),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(rTot))
      .crossJoin(broadcast(cTot))
      .withColumn("p_ref", col("n_ref") / col("t_ref"))
      .withColumn("p_cur", col("n_cur") / col("t_cur"))
      .withColumn("contrib", contribution(col("p_ref"), col("p_cur")))
      .withColumn("contrib_js", jsContribution(col("p_ref"), col("p_cur")))
      .drop("t_ref", "t_cur")
  }

  /** Quantile-shift drift: exact interpolated quantiles of both
    * snapshots at the given probabilities, reported side by side with
    * the shift — the monitor that localizes WHERE in the distribution
    * the movement happened (a tail shift PSI's fixed bins can smear).
    * Each side collapses to one quantile-array row (a single
    * aggregate), so the comparison costs two scans and a 1×1 join
    * regardless of snapshot size. For bounded-state streaming use,
    * substitute the KLL sketch aggregate — this exact form is the
    * batch truth the sketch is spec-bounded against.
    */
  def quantileDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1), s"bad qs: $qs")
    val arr = s"array(${qs.mkString(", ")})"
    def side(df: DataFrame, as: String) =
      df.agg(expr(s"percentile($valueCol, $arr)").as("qv"))
        .select(posexplode(col("qv")).as(Seq("i", as)))
    side(ref, "ref").join(side(cur, "cur"), "i")
      .select(element_at(array(qs.map(lit): _*), col("i") + 1).as("q"),
        col("ref"), col("cur"), (col("cur") - col("ref")).as("shift"))
  }

  /** Inventory-level companion to the distribution monitors: which
    * rows appeared, vanished, or changed between two snapshots of a
    * keyed corpus. Expects each side as (id, fp) — id the stable key,
    * fp a content fingerprint (hash the text, not the text) — and
    * returns (id, status) with status ∈ added | removed | changed |
    * unchanged. One full-outer hash join on the id; the fingerprint
    * columns are bytes-bounded, so the shuffle carries two hashes per
    * row no matter how wide the rows were.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame,
      idCol: String = "id", fpCol: String = "fp"): DataFrame = {
    val o = old.select(col(idCol).as("id"), col(fpCol).as("_fp_old"))
    val c = cur.select(col(idCol).as("id"), col(fpCol).as("_fp_cur"))
    o.join(c, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_fp_old").isNull, "added")
          .when(col("_fp_cur").isNull, "removed")
          .when(col("_fp_old") =!= col("_fp_cur"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
