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
}
