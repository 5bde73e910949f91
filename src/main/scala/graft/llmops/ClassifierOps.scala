package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed logistic-regression quality classifier — the trained
  * counterpart to [[TextOps.nbClassify]]'s counting model and the
  * shape of the fastText-style filters used to curate GPT-3/CCNet-
  * class corpora (public literature: Brown et al. 2020 §A; Wenzek et
  * al. 2020): hash the text to a fixed feature space, fit weights by
  * full-batch gradient descent on the cluster, score every document
  * with the resulting (tiny) model.
  *
  * Determinism is the design driver, as everywhere in this family:
  * md5-derived feature hashing, zero-init weights, a FIXED iteration
  * count, per-document margins folded in feature order, and the
  * gradient ROUNDED to 6dp each iteration before it touches the
  * weights (the moment-rounding trick — a ulp of distributed-sum
  * jitter cannot compound across iterations), so the whole training
  * run replays bit-for-bit in SQL.
  *
  * Scale shape: the corpus is touched once per iteration by two
  * aggregations (per-doc margin fold over its ≤ dim+1 features; the
  * (dim+1)-cell gradient), and the only driver traffic is that
  * gradient vector (audited collect). The model itself is literal-
  * sized and rides the scoring scan as a plan constant — at 100 TB
  * you'd subsample the training pass (any hashU predicate) and still
  * score the full corpus with the same literals.
  */
object ClassifierOps {

  /** Hashed bag-of-words features: (id, f, x) with
    * f = (first FOUR md5 hex digits of the token, a 0..65535 hash)
    * mod `dim` and x the token count in that bucket, plus the
    * intercept row (f = dim, x = 1) every document carries. Pure scan
    * + one (id, f) count aggregation. 16-bit pre-hash keeps every
    * bucket reachable up to dim = 65536 (a 2-digit hash left buckets
    * 256.. permanently empty for larger dims); occupancy is uniform
    * whenever dim divides 65536, mildly biased otherwise.
    */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 65536, s"dim must be in [1, 65536], got $dim")
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val feat = toks
      .withColumn("f",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("int") % dim)
          .cast("int"))
      .groupBy("id", "f").agg(count(lit(1)).cast("double").as("x"))
    feat.unionByName(
      df.select(col(idCol).as("id"), lit(dim).cast("int").as("f"),
        lit(1.0).as("x")))
  }

  /** Full-batch gradient descent: w ← w − lr·round(∇, 6dp) for a fixed
    * `iters`, ∇_f = Σ_docs (σ(z_d) − y_d)·x_{d,f} / N, z_d the margin
    * folded over the doc's features in f order. Labels: (id, y) with
    * y ∈ {0, 1}. Returns the (dim+1) weight vector (last = intercept).
    */
  def lrTrain(feat: DataFrame, labels: DataFrame, dim: Int,
      iters: Int = 3, lr: Double = 0.1): Array[Double] = {
    val n = labels.count().toDouble
    var wv = new Array[Double](dim + 1)
    for (_ <- 0 until iters) {
      val r = margins(feat, wv).join(labels, "id")
        .withColumn("r",
          lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y"))
        .select("id", "r")
      val cells = feat.join(r, "id")
        .groupBy("f")
        .agg(round(sum(col("r") * col("x")) / lit(n), 6).as("g"))
        .collect() // dim+1 aggregated gradient cells, never corpus rows
      val g = new Array[Double](dim + 1)
      cells.foreach(row => g(row.getInt(0)) = row.getDouble(1))
      wv = Array.tabulate(dim + 1)(f => wv(f) - lr * g(f))
    }
    wv
  }

  /** Per-document margins z = Σ x_f·w_f folded in ascending-f order
    * (the family's FP-determinism discipline); w rides as a literal.
    */
  private def margins(feat: DataFrame, wv: Array[Double]): DataFrame =
    feat
      .withColumn("s", col("x") * element_at(typedLit(wv.toSeq), col("f") + 1))
      .groupBy("id")
      .agg(aggregate(array_sort(collect_list(struct(col("f"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("z"))

  /** Score documents with a trained weight vector: (id, z, p) with
    * p = σ(z). Scan + one per-doc fold — no shuffle beyond the
    * feature grouping.
    */
  def lrScore(feat: DataFrame, wv: Array[Double]): DataFrame =
    margins(feat, wv)
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
}
