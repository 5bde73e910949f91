package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level statistical tests, completing the A/B toolkit
  * beside [[SegmentOps.welchT]] (means) and [[SegmentOps.proportionZ]]
  * (rates): chi-square independence over a contingency table,
  * Mann–Whitney U (rank-based location shift, the nonparametric
  * fallback when values are heavy-tailed), and the two-sample
  * Kolmogorov–Smirnov distance (whole-shape comparison).
  *
  * Shared determinism discipline: every statistic is assembled from
  * EXACT integer aggregates (cell counts, tie counts, integer-cents
  * rank sums, cumulative counts), so the only floating-point ops run
  * on identical integers in both engines — the same design that pins
  * welchT's sufficient statistics and seasonalBaseline's unit-space
  * moments. Shared scale discipline: everything collapses to
  * domain-sized frames (cells, distinct values) in ONE pass before
  * any join; ranks and prefix sums come from [[SegmentOps.globalRank]]
  * -style bucketed machinery, never a global window.
  */
object StatTests {

  /** Chi-square contingency profile of two categorical columns: one
    * row per (rowv, colv) cell of the FULL margin cross (absent
    * observed cells count 0 — they still contribute `expected` to the
    * statistic), with observed n, expected = rowTot·colTot/N, and the
    * (o−e)²/e contribution. Per-cell output keeps the gate free of
    * cross-cell float sums; callers needing the scalar χ² sum the
    * contributions.
    *
    * One count aggregate at cell cardinality; margins broadcast back
    * over the cell cross (|rows|×|cols| — domain-sized by definition).
    */
  def chiSquare(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    // Non-null contract: NULL-keyed rows would inflate the margins yet
    // never match a cell through the equality join back, so they are
    // excluded up front (the standard complete-case χ² convention).
    val obs = df.where(rowCol.isNotNull && colCol.isNotNull)
      .groupBy(rowCol.as("rowv"), colCol.as("colv"))
      .agg(count(lit(1)).as("n_obs"))
    val rowm = obs.groupBy(col("rowv")).agg(sum(col("n_obs")).as("row_tot"))
    val colm = obs.groupBy(col("colv")).agg(sum(col("n_obs")).as("col_tot"))
    val tot = obs.agg(sum(col("n_obs")).as("n_total"))
    broadcast(rowm).crossJoin(broadcast(colm)).crossJoin(broadcast(tot))
      .join(obs, Seq("rowv", "colv"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("expected",
        col("row_tot").cast("double") * col("col_tot") / col("n_total"))
      .withColumn("contrib",
        (col("n_obs") - col("expected")) * (col("n_obs") - col("expected"))
          / col("expected"))
  }

  /** Mann–Whitney U with tie correction, comparing `valueCents`
    * (exact integer units) between the rows where `isArmA` holds and
    * the rest. Midranks are exact: every tied-value group's average
    * rank is (min+max)/2 of its [[SegmentOps.globalRank]] positions,
    * so DOUBLED rank sums stay integer (2R_a = Σ n_a(v)·(mn+mx)) and
    * the normal-approximation z computes from exact integers:
    * U = R_a − n_a(n_a+1)/2, μ = n_a·n_b/2,
    * σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1))).
    *
    * One global rank (bucketed, no global window), one groupBy at
    * distinct-value cardinality, one scalar aggregate. Returns
    * (n_a, n_b, u_a, z).
    */
  def mannWhitneyU(df: DataFrame, isArmA: Column, valueCents: Column,
      tieCol: String): DataFrame = {
    val base = df.select(col(tieCol), isArmA.as("_a"), valueCents.as("_v"))
    val ranked = SegmentOps.globalRank(base, col("_v"), tieCol, 1024, "_r")
    val grp = ranked.groupBy(col("_v"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("_a"), 1L).otherwise(0L)).as("na_v"),
        min(col("_r")).as("mn"), max(col("_r")).as("mx"))
    grp.agg(
        sum(col("na_v")).as("n_a"),
        sum(col("t") - col("na_v")).as("n_b"),
        sum(col("na_v") * (col("mn") + col("mx"))).as("r2a"),
        // t³ in decimal: a single tied value on >~2.1M rows overflows
        // Long under ANSI mode — same discipline as spearman's moments
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("ties3"))
      .select(col("n_a"), col("n_b"),
        // 2U_a = 2R_a − n_a(n_a+1); halve at the end, in double
        ((col("r2a") - col("n_a") * (col("n_a") + 1)).cast("double") / 2.0)
          .as("u_a"),
        col("ties3"))
      .withColumn("_n", col("n_a") + col("n_b"))
      .withColumn("_mu", col("n_a").cast("double") * col("n_b") / 2.0)
      .withColumn("_s2",
        col("n_a").cast("double") * col("n_b") / 12.0 *
          ((col("_n") + lit(1)).cast("double") -
            col("ties3").cast("double") / (col("_n") * (col("_n") - lit(1)))))
      .select(col("n_a"), col("n_b"), col("u_a"),
        when(col("_s2") > 0,
          (col("u_a") - col("_mu")) / sqrt(col("_s2"))).as("z"))
  }

  /** Spearman rank correlation with exact midranks: both columns rank
    * through [[SegmentOps.globalRank]], tied values take the exact
    * (min+max)/2 midrank — carried DOUBLED so every moment sum is an
    * exact integer (products in decimal so corpus-scale rank sums
    * cannot overflow) — and ρ assembles from the closed Pearson-on-
    * ranks form with the only float ops running on identical exact
    * integers in both engines. Returns (n, rho).
    */
  def spearman(df: DataFrame, xCol: Column, yCol: Column,
      tieCol: String): DataFrame = {
    val base = df.select(col(tieCol), xCol.as("_x"), yCol.as("_y"))
    // materialize EACH rank pass once (r18): every ranked frame here is
    // consumed twice — by its per-value midrank-sum aggregate AND by the
    // join that attaches the sums back — so without the cut each rank
    // chain (3 shuffles + a window) executes twice per pass. The frames
    // are row-count-sized with two long columns; one materialization is
    // strictly cheaper than a second rank chain at any scale.
    val rx = SegmentOps.globalRank(base, col("_x"), tieCol, 1024, "_rx")
      .localCheckpoint()
    val gx = rx.groupBy(col("_x"))
      .agg((min(col("_rx")) + max(col("_rx"))).as("sx"))
    // cut the lineage between the two rank passes: the second
    // globalRank references its input four times (min/max frame,
    // bucket counts, offsets, ranked join) and would re-execute the
    // whole first rank chain each time (the rfm chained-fold lesson:
    // 7.9 → 2.4 s there, 7.5 → ~3 s here)
    val rx1 = rx.join(gx, "_x").localCheckpoint()
    val ry = SegmentOps.globalRank(rx1, col("_y"), tieCol, 1024, "_ry")
      .localCheckpoint()
    val gy = ry.groupBy(col("_y"))
      .agg((min(col("_ry")) + max(col("_ry"))).as("sy"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    ry.join(gy, "_y")
      .agg(count(lit(1)).as("n"), sum(col("sx")).as("tx"),
        sum(col("sy")).as("ty"),
        sum(dec(col("sx")) * dec(col("sy"))).as("txy"),
        sum(dec(col("sx")) * dec(col("sx"))).as("txx"),
        sum(dec(col("sy")) * dec(col("sy"))).as("tyy"))
      .select(col("n"),
        ((col("n") * col("txy").cast("double") -
          col("tx").cast("double") * col("ty")) /
          sqrt((col("n") * col("txx").cast("double") -
            col("tx").cast("double") * col("tx")) *
            (col("n") * col("tyy").cast("double") -
              col("ty").cast("double") * col("ty")))).as("rho"))
  }

  /** Two-sample Kolmogorov–Smirnov distance: D = max over values of
    * |F_a − F_b| with the empirical CDFs built from exact cumulative
    * integer counts. The cumulation runs on the DISTINCT-VALUE frame
    * via the globalRank bucket machinery — range buckets over a
    * broadcast min/max, per-bucket totals turned into prefix offsets
    * by a bucket-count-sized non-equi join, within-bucket running sums
    * under a PARTITIONED window — so no global window appears at any
    * cardinality. Returns (n_a, n_b, d).
    */
  def ksTest(df: DataFrame, isArmA: Column, valueCents: Column,
      nBuckets: Int = 1024): DataFrame = {
    val dom = df.select(isArmA.as("_a"), valueCents.as("_v"))
      .groupBy(col("_v"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("nb"))
    val mm = dom.agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    val bucketed = dom.crossJoin(broadcast(mm))
      .withColumn("_b",
        expr(s"(_v - _mn) div (((_mx - _mn) div $nBuckets) + 1)"))
      .drop("_mn", "_mx")
    val btot = bucketed.groupBy(col("_b"))
      .agg(sum(col("na")).as("ba"), sum(col("nb")).as("bb"))
    val off = btot.as("x")
      .join(btot.as("y"), col("y._b") < col("x._b"), "left")
      .groupBy(col("x._b").as("_b"))
      .agg(coalesce(sum(col("y.ba")), lit(0L)).as("oa"),
        coalesce(sum(col("y.bb")), lit(0L)).as("ob"))
    val tots = dom.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val w = Window.partitionBy(col("_b")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(off), "_b")
      .withColumn("ca", sum(col("na")).over(w) + col("oa"))
      .withColumn("cb", sum(col("nb")).over(w) + col("ob"))
      .crossJoin(broadcast(tots))
      .agg(min(col("ta")).as("n_a"), min(col("tb")).as("n_b"),
        max(abs(col("ca").cast("double") / col("ta") -
          col("cb").cast("double") / col("tb"))).as("d"))
  }
}
