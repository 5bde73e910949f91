package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * pipelines.
  *
  * Everything here derives from a content/key hash, not an RNG:
  * `rand()`-based sampling changes membership on every re-run,
  * re-partition, or incremental rebuild, which silently leaks
  * held-out data across pipeline versions. A hash split is stable
  * under all of those — the property an LLM training/eval split
  * actually needs — and it is pure per-row column arithmetic: no
  * shuffle, no state, scales as a scan.
  */
object SampleOps {

  /** Deterministic uniform-[0,1) from a row key: the first 32 bits of
    * md5(key), scaled. Codegen'd built-ins only.
    */
  def hashU(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** Assign each row a split label (train/val/test-style) by cumulative
    * weight over the deterministic hash. Weights need not sum to 1 —
    * they are normalized; the last split absorbs the remainder so no
    * row falls through a floating-point crack.
    */
  def assignSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], as: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val u = hashU(col(keyCol))
    val chained = weights.init.zip(cuts.init).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), cut)) => Some(when(u < cut, name))
      case (Some(c), ((name, _), cut)) => Some(c.when(u < cut, name))
    }
    val split = chained.map(_.otherwise(weights.last._1))
      .getOrElse(lit(weights.last._1))
    df.withColumn(as, split)
  }

  /** Per-slice sampling fractions that reshape the corpus to a TARGET
    * mixture (DoReMi/Pile-style domain weighting) by pure
    * downsampling: `r_s = target_s / share_s` measures how
    * over-represented the target says slice s should be, and
    * normalizing by `max r_s` yields fractions ≤ 1 — the
    * best-achievable match without upsampling (the slice most
    * under-represented relative to its target keeps everything; every
    * other slice downsamples proportionally). Slices absent from
    * `target` get fraction 0 — the drop-this-domain case.
    *
    * Scale shape: one slice-level count aggregate; the two scalar
    * reductions (corpus total, max ratio) ride broadcast crossJoins of
    * 1-row frames. Nothing wider than the slice list ever aggregates.
    * Returns `(strataCol, n_docs, fraction)`.
    */
  def mixtureFractions(df: DataFrame, strataCol: String,
      target: Map[String, Double]): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      "target mixture weights must be positive")
    val targetCol = target.foldLeft(lit(0.0)) { case (e, (k, w)) =>
      when(col(strataCol) === k, w).otherwise(e)
    }
    val counts = df.groupBy(strataCol).agg(count(lit(1)).cast("double").as("n"))
    val tot = counts.agg(sum("n").as("nn"))
    val r = counts.crossJoin(broadcast(tot))
      .withColumn("rr", targetCol / (col("n") / col("nn")))
    val mx = r.agg(max("rr").as("mx"))
    r.crossJoin(broadcast(mx))
      .select(col(strataCol), col("n").cast("long").as("n_docs"),
        (col("rr") / col("mx")).as("fraction"))
  }

  /** Apply [[mixtureFractions]]: deterministic hash-membership
    * downsampling to the target mixture. The fraction table is
    * slice-count-sized, so it broadcasts; the filter is the same pure
    * scan predicate as [[stratifiedSample]].
    */
  def resampleToMixture(df: DataFrame, keyCol: String, strataCol: String,
      target: Map[String, Double]): DataFrame =
    df.join(
      broadcast(mixtureFractions(df, strataCol, target)
        .select(col(strataCol), col("fraction"))),
      strataCol)
      .filter(hashU(col(keyCol)) < col("fraction"))

  /** Temperature-scaled (α-sampling) mixture fractions — the
    * multilingual/domain rebalancing rule (XLM-R, mT5): the target
    * mixture is the observed share raised to α < 1 and renormalized,
    * which flattens the distribution toward uniform without inverting
    * it (α = 1 keeps the corpus as is, α = 0 targets uniform). Realized
    * by pure downsampling like [[mixtureFractions]]: the keep-ratio
    * r_s = target_s/share_s ∝ share_s^(α−1) — the softmax normalizer
    * cancels under the divide-by-max — so the rarest slice keeps
    * everything and over-represented slices downsample smoothly.
    *
    * Scale shape: identical to [[mixtureFractions]] — one slice-level
    * count aggregate, two broadcast scalar reductions, nothing wider
    * than the slice list. Returns `(strataCol, n_docs, fraction)`.
    */
  def temperatureFractions(df: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).cast("double").as("n"))
    val tot = counts.agg(sum("n").as("nn"))
    val r = counts.crossJoin(broadcast(tot))
      .withColumn("rr", pow(col("n") / col("nn"), lit(alpha - 1.0)))
    val mx = r.agg(max("rr").as("mx"))
    r.crossJoin(broadcast(mx))
      .select(col(strataCol), col("n").cast("long").as("n_docs"),
        (col("rr") / col("mx")).as("fraction"))
  }

  /** Apply [[temperatureFractions]]: deterministic hash-membership
    * downsampling toward the α-flattened mixture (broadcast fraction
    * table, pure scan predicate — the [[resampleToMixture]] shape).
    */
  def resampleToTemperature(df: DataFrame, keyCol: String, strataCol: String,
      alpha: Double): DataFrame =
    df.join(
      broadcast(temperatureFractions(df, strataCol, alpha)
        .select(col(strataCol), col("fraction"))),
      strataCol)
      .filter(hashU(col(keyCol)) < col("fraction"))

  /** Keep a deterministic per-stratum fraction of rows (domain mixing /
    * downsampling an over-represented source): a row survives iff its
    * hash-u falls below its stratum's fraction. Unlike
    * `DataFrameStatFunctions.sampleBy`, membership is exactly
    * reproducible and the filter is a pure scan predicate.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (e, (k, f)) =>
      when(col(strataCol) === k, f).otherwise(e)
    }
    df.filter(hashU(col(keyCol)) < frac)
  }

  /** Length-bucketed batching stats: assign each document to a
    * fixed-width token-length bucket (bucket floor = `(n div width) ·
    * width` — integer arithmetic, so both engines agree exactly) and
    * report per-bucket document count, token mass, extremes, and the
    * padding waste of batching the bucket to its longest member
    * (`n_docs·max − sum`). This is the pre-training batcher's
    * efficiency view: pure column expressions plus one small aggregate,
    * no extra shuffle beyond the groupBy.
    */
  /** Deterministic EXACTLY-k per-group sample: rank rows by a content
    * hash of `keyCol` and keep the k smallest per group. Where
    * [[stratifiedSample]] keeps a hash FRACTION (count varies with
    * group size), bottom-k guarantees the count — the shape for
    * "10 examples from every slice" eval tables and debugging panels.
    *
    * Runs on the native [[graft.plans.TopKPerGroup]] operator:
    * bounded per-group heaps after one co-location shuffle —
    * O(n log k), never a full per-partition sort, so "k of each" over
    * a 100 TB table costs one scan plus groups·k rows of state. The
    * hash ranking makes the sample stable under re-runs,
    * repartitioning, AND row additions (a new row only displaces the
    * current k-th if its hash is smaller — reservoir semantics
    * without an RNG).
    */
  def bottomKSample(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int): DataFrame = {
    val withH = df.withColumn("_hkey",
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long"))
    graft.plans.TopKPerGroup(withH, groupCols, "_hkey", keyCol, k,
        desc = false, rankName = "_rank")
      .drop("_hkey", "_rank")
  }

  /** Weighted exactly-k per-group sample without replacement
    * (Efraimidis & Spirakis, "Weighted random sampling with a
    * reservoir", IPL 2006 — public literature): score each row
    * u^(1/w) with u = content hash in (0,1), keep the k LARGEST —
    * inclusion probability tracks the weights, and the hash makes it
    * RNG-free like [[bottomKSample]] (stable under re-runs,
    * repartitioning, and appends). Rows with non-positive weight are
    * excluded (the algorithm's domain). Same native-TopKPerGroup
    * execution: bounded heaps, one co-location shuffle.
    *
    * Transcendental discipline: pow appears only in the RANKING.
    * Cross-engine pow agreement is last-ulp; an ordering flip would
    * need two scores within that — the gate's fixed corpus verifies
    * the realized selection hash-exactly.
    */
  def weightedBottomK(df: DataFrame, groupCols: Seq[String], keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    val withS = df.filter(col(weightCol) > 0)
      .withColumn("_wkey",
        pow(hashU(col(keyCol)), lit(1.0) / col(weightCol).cast("double")))
    graft.plans.TopKPerGroup(withS, groupCols, "_wkey", keyCol, k,
        desc = true, rankName = "_rank")
      .drop("_wkey", "_rank")
  }

  /** Deterministic global shuffle into `n` shards — the pretraining
    * data-prep step after dedup/filter/mix: every document gets a
    * pseudo-random shard (`floor(u·n)` on the md5-uniform) and a
    * pseudo-random position within it (rank of `u`), so a trainer
    * streaming shard files in pos order sees an order-decorrelated
    * corpus. RNG-free like the whole sampling family: re-runs,
    * repartitionings and retries produce the SAME shuffle, and an
    * appended document displaces nothing (it lands at its hash
    * position).
    *
    * Scale shape: shard assignment is a scan predicate; the position
    * rank is one shuffle on `shard` + an in-shard sort — each shard
    * sorts independently in parallel, which is exactly why the corpus
    * is sharded before ordering (a single global sort would funnel
    * through one range partitioner). At write time the same plan is
    * `repartition(shard).sortWithinPartitions(u)` → one file per
    * shard.
    */
  def shardShuffle(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1 shards, got $n")
    val u = hashU(col(keyCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_u"), col(keyCol))
    df.withColumn("_u", u)
      .withColumn("shard", least(floor(col("_u") * lit(n)), lit(n - 1)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_u")
  }

  def lengthBuckets(df: DataFrame, textCol: String, width: Int): DataFrame = {
    val n = TextOps.tokenCount(col(textCol)).cast("long")
    df.select((n - (n % width)).as("bucket_lo"), n.as("n_tok"))
      .groupBy("bucket_lo")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .withColumn("pad_waste",
        col("n_docs") * col("max_tok") - col("sum_tok"))
  }
}
