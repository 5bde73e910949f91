package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer/product analytics verbs: RFM segmentation, market-basket
  * association rules, and the Welch two-sample t-test — the
  * experimentation/segmentation layer a product-analytics user runs
  * beside the funnel/cohort/attribution verbs (FunnelOps).
  *
  * Scale discipline shared by all three:
  *   - every verb collapses the event/order stream to a per-entity (or
  *     per-itemset) aggregate FIRST, so the only shuffles run at entity
  *     cardinality, never event cardinality;
  *   - ranking ties are broken on integer surrogates (cents, ids), so
  *     NTILE boundaries are deterministic and engine-independent (the
  *     changepoint cents-quantization discipline, MiningQueries);
  *   - the basket pair join explodes per-basket itemsets whose size is
  *     bounded by the item-domain cardinality (event types), not by
  *     basket row count — candidate rows ≤ baskets × |domain|²/2.
  */
object SegmentOps {

  /** Exact global ascending rank of (`v`, `tieCol`) WITHOUT a global
    * window — the distributed form of `row_number() OVER (ORDER BY …)`:
    *  1. range-bucket the (integer) sort value via a broadcast
    *     min/max frame — order-aligned buckets, so bucket order =
    *     value order;
    *  2. count rows per bucket and turn the bounded bucket frame into
    *     prefix offsets with a tiny non-equi self-join (no window);
    *  3. rank inside each bucket with a PARTITIONED window and add the
    *     broadcast offset.
    * Exactly the rank a single-task global sort would produce, with
    * parallelism = nBuckets instead of 1.
    */
  def globalRank(df: DataFrame, v: Column, tieCol: String, nBuckets: Int,
                 as: String): DataFrame = {
    val withV = df.withColumn("_grv", v.cast("long"))
    val mm = withV.agg(min(col("_grv")).as("_mn"), max(col("_grv")).as("_mx"))
    val bucketed = withV.crossJoin(broadcast(mm))
      // integer div, not `/`: Column./ widens to double, which loses
      // exactness past 2^53 — `div` keeps the bucket id exact longs.
      // Bucket by a ceil-width divisor, NOT ((v-mn)*k) div range: the
      // multiplication form overflows Long whenever the key domain
      // spans > Long.MaxValue/k (reachable from 8-char 128-ary prefix
      // keys, ~5.4e16 × 256), silently wrapping to negative buckets.
      // width = ((mx-mn) div k) + 1 = ceil(range/k) exactly, so bucket
      // ids stay in [0, k-1], order-aligned, with no full-range product
      // (a mx-mn span that itself exceeds Long.MaxValue fails loudly
      // under ANSI arithmetic rather than wrapping).
      .withColumn("_grb",
        expr(s"(_grv - _mn) div (((_mx - _mn) div $nBuckets) + 1)"))
      .drop("_mn", "_mx")
    val counts = bucketed.groupBy(col("_grb")).agg(count(lit(1)).as("_c"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b._grb") < col("a._grb"), "left")
      .groupBy(col("a._grb").as("_grb"))
      .agg(coalesce(sum(col("b._c")), lit(0L)).as("_off"))
    val w = Window.partitionBy(col("_grb"))
      .orderBy(col("_grv").asc, col(tieCol).asc)
    bucketed.join(broadcast(offsets), "_grb")
      .withColumn(as, row_number().over(w).cast("long") + col("_off"))
      .drop("_grb", "_grv", "_off")
  }

  /** NTILE(k) of a global rank: q = n div k rows per tile with the
    * first n mod k tiles one longer — the exact SQL NTILE distribution,
    * as a pure integer function of (rank, n).
    */
  private def ntileOfRank(rank: String, n: String, k: Int): Column =
    expr(
      s"""CASE WHEN $rank <= ($n % $k) * (($n div $k) + 1)
         |  THEN ($rank + ($n div $k)) div (($n div $k) + 1)
         |  ELSE ($n % $k) +
         |    (($rank - ($n % $k) * (($n div $k) + 1)) + ($n div $k) - 1)
         |      div ($n div $k)
         |END""".stripMargin)

  /** RFM segmentation over an order history.
    *
    * Per customer: recency = whole days between the customer's last
    * order and the corpus max date, frequency = order count, monetary =
    * lifetime spend. Each dimension is scored into `tiles` quantile
    * tiles with exact NTILE semantics (1 = best: most recent / most
    * frequent / highest spend), ordered on integer-exact keys (days,
    * counts, cents) with the customer id as the final tie-break.
    *
    * One groupBy(custkey) shuffle at customer cardinality, then each
    * dimension is ranked via [[globalRank]] — range-bucketed
    * partitioned windows with broadcast prefix offsets, never a
    * single-task global sort — and scored with the closed-form NTILE
    * distribution. Descending dimensions rank on the negated key.
    */
  def rfm(orders: DataFrame, dateCol: String, custCol: String,
          amountCol: String, tiles: Int = 5): DataFrame = {
    // corpus max date as a broadcast one-row frame (not a global window:
    // an empty-partitionBy window is a single-task sort)
    val maxDate = orders.agg(max(col(dateCol)).as("max_date"))
    val perCust = orders
      .groupBy(col(custCol).as("custkey"))
      .agg(
        max(col(dateCol)).as("last_order"),
        count(lit(1)).as("frequency"),
        // cents surrogate: grid-exact long, safe to ORDER BY (a raw
        // double sum's low bits are accumulation-order-dependent)
        round(sum(col(amountCol)) * 100).cast("long").as("monetary_cents"))
      .crossJoin(broadcast(maxDate))
      .withColumn("recency_days",
        datediff(col("max_date"), col("last_order")).cast("long"))
      .drop("max_date", "last_order")
    // checkpoint between rank passes: each globalRank reads its input
    // THREE ways (min/max agg, bucket counts, the ranked main) and the
    // fold stacks three of them — without truncation the customer
    // aggregate re-executes ~9×(the PageRank lineage lesson)
    val total = perCust.agg(count(lit(1)).as("_n"))
    val ranked = Seq(
      (col("recency_days"), "_rrk"),       // ascending: recent = small
      (negate(col("frequency")), "_frk"),  // descending via negation
      (negate(col("monetary_cents")), "_mrk")
    ).foldLeft(perCust.localCheckpoint()) { case (df, (v, as)) =>
      globalRank(df, v, "custkey", nBuckets = 1024, as = as).localCheckpoint()
    }
    ranked.crossJoin(broadcast(total))
      .withColumn("r_score", ntileOfRank("_rrk", "_n", tiles).cast("int"))
      .withColumn("f_score", ntileOfRank("_frk", "_n", tiles).cast("int"))
      .withColumn("m_score", ntileOfRank("_mrk", "_n", tiles).cast("int"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .drop("_rrk", "_frk", "_mrk", "_n")
  }

  /** Gini concentration index of a per-entity integer amount: the
    * rank-sum form G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n on the exact
    * distributed rank from [[globalRank]] (no single-task sort).
    * rank·cents sums stay integer-exact; FP enters only in the final
    * two ratios, mirrored in the oracle.
    */
  def gini(df: DataFrame, amountCents: Column, tieCol: String): DataFrame = {
    val base = df.select(col(tieCol), amountCents.as("_gx"))
    val ranked = globalRank(base, col("_gx"), tieCol, 1024, "_grank")
    ranked.agg(count(lit(1)).as("n"), sum(col("_gx")).as("sx"),
        sum(col("_grank") * col("_gx")).as("srx"))
      .select(col("n"),
        (lit(2.0) * col("srx") / (col("n") * col("sx")) -
          (col("n") + lit(1.0)) / col("n")).as("gini"))
  }

  /** Market-basket association rules over a (basket, item) relation.
    *
    * Input is ANY frame; `basketCols` name the basket key and `itemCol`
    * the item. Itemsets are de-duplicated (an item counts once per
    * basket), pairs are generated by a self-join on the basket key with
    * `item_a < item_b`, and rules are kept at `minPairSupport` basket
    * co-occurrences. Emits support counts, both conditional
    * confidences, and lift = N·supp(ab) / (supp(a)·supp(b)).
    *
    * Scale: the distinct pass and the pair join both shuffle on the
    * basket key; per-basket fan-out is |itemset|² which the caller
    * bounds by the item domain (event types here). The per-item support
    * table is domain-sized and broadcast into the rule projection.
    */
  def basketRules(df: DataFrame, basketCols: Seq[String], itemCol: String,
                  minPairSupport: Long = 1L): DataFrame = {
    val bk = basketCols.map(col)
    val items = df.select(bk :+ col(itemCol).as("item"): _*).distinct()
    // basket total as a one-row frame cross-joined in (no driver action)
    val nBaskets = items.select(bk: _*).distinct()
      .agg(count(lit(1)).cast("double").as("n_baskets"))
    val itemSupp = items.groupBy(col("item")).agg(count(lit(1)).as("supp"))
    val a = items.toDF(basketCols :+ "item_a": _*)
    val b = items.toDF(basketCols :+ "item_b": _*)
    val pairs = a.join(b, basketCols)
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
      .where(col("supp_ab") >= minPairSupport)
    pairs
      .join(broadcast(itemSupp.toDF("item_a", "supp_a")), "item_a")
      .join(broadcast(itemSupp.toDF("item_b", "supp_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("supp_ab"),
        col("supp_a"), col("supp_b"),
        (col("supp_ab").cast("double") / col("supp_a")).as("conf_a_b"),
        (col("supp_ab").cast("double") / col("supp_b")).as("conf_b_a"),
        (col("supp_ab").cast("double") * col("n_baskets") /
          (col("supp_a") * col("supp_b"))).as("lift"))
  }

  /** Two-proportion z-test between the arms of an A/B split: per arm,
    * n = distinct entities, conv = distinct converting entities; the
    * pooled-variance z statistic. One aggregation pass; the conversion
    * predicate is evaluated per row before the distinct.
    */
  def proportionZ(df: DataFrame, armCol: Column, entityCol: Column,
                  convPred: Column): DataFrame = {
    val perArm = df.groupBy(armCol.as("arm"))
      .agg(countDistinct(entityCol).as("n"),
        countDistinct(when(convPred, entityCol)).as("conv"))
    val a = perArm.where(col("arm") === 0)
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = perArm.where(col("arm") === 1)
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    val p1 = col("conv_a").cast("double") / col("n_a")
    val p2 = col("conv_b").cast("double") / col("n_b")
    val p = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    // degenerate pools (p = 0 or 1) have zero pooled variance: z is
    // undefined → NULL, not an ANSI divide-by-zero
    a.crossJoin(b).select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      p1.as("p_a"), p2.as("p_b"),
      when(p > 0 && p < 1,
        (p1 - p2) / sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))).as("z"))
  }

  /** Welch's unequal-variance two-sample t-test between the arms of an
    * A/B split. One aggregation pass per arm (n, Σx, Σx²), then the
    * t statistic and Welch–Satterthwaite df from the sufficient
    * statistics — a one-row result regardless of input size.
    *
    * Variance uses the sum-of-squares form (Σx² − (Σx)²/n)/(n−1) with
    * the SAME expression shape as the SQL oracle, so the rounded
    * comparison is deterministic.
    */
  def welchT(df: DataFrame, armCol: Column, valueCol: Column): DataFrame = {
    val perArm = df
      .groupBy(armCol.as("arm"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(valueCol).as("s1"),
        sum(valueCol * valueCol).as("s2"))
      .select(col("arm"), col("n"),
        (col("s1") / col("n")).as("mean"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("variance"))
    val a = perArm.where(col("arm") === 0)
      .select(col("n").as("n_a"), col("mean").as("mean_a"), col("variance").as("var_a"))
    val b = perArm.where(col("arm") === 1)
      .select(col("n").as("n_b"), col("mean").as("mean_b"), col("variance").as("var_b"))
    val se2a = col("var_a") / col("n_a")
    val se2b = col("var_b") / col("n_b")
    val se2 = se2a + se2b
    // squares by multiplication, not pow(): both engines then evaluate
    // the identical FP ops, keeping the rounded hash deterministic
    a.crossJoin(b).select(
      col("n_a").cast("long").as("n_a"), col("mean_a"), col("var_a"),
      col("n_b").cast("long").as("n_b"), col("mean_b"), col("var_b"),
      ((col("mean_a") - col("mean_b")) / sqrt(se2)).as("t_stat"),
      (se2 * se2 /
        (se2a * se2a / (col("n_a") - 1) + se2b * se2b / (col("n_b") - 1)))
        .as("welch_df"))
  }
}
