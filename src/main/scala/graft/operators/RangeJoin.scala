package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: `points ⋈ intervals ON p ∈ [start, end)` with NO
  * equi-key — the join shape Spark's planner can only execute as a
  * broadcast-nested-loop or cartesian-plus-filter, both of which are
  * O(|points|·|intervals|) and detonate at scale (the PlanGate CI
  * treats CartesianProduct as a build failure for exactly this
  * reason).
  *
  * The standard fix (public technique, e.g. interval-binning range
  * joins in OLAP engines): quantize the axis into fixed-width bins,
  * explode each interval into the bins it overlaps, tag each point
  * with its bin, equi-join on the bin id, and re-apply the EXACT range
  * predicate after the match. Cost becomes
  * O(points + Σ interval-spans/width + true-matches) through one hash
  * shuffle — the cartesian never materializes, and Catalyst plans a
  * plain shuffled hash/SMJ on the bin key (AQE handles hot bins like
  * any other skewed key, or compose with [[SkewOps.saltedJoin]]).
  *
  * `width` trades replication (wide intervals explode into
  * span/width rows) against selectivity (coarse bins → more false
  * candidates filtered after the join); pick it near the typical
  * interval span. All axis values are caller-provided LONGs (epoch
  * µs, days, integer ids — any total order you can quantize).
  */
object RangeJoin {

  /** `points` rows whose `pointL` lies in `[startL, endL)` of an
    * `intervals` row; both sides keep all their columns. `startL`/
    * `endL`/`pointL` must be long-typed expressions over their frames;
    * empty intervals (end <= start) match nothing.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointL: Column, startL: Column, endL: Column, width: Long): DataFrame = {
    require(width >= 1, s"bin width must be >= 1, got $width")
    val p = points.withColumn("_bin", floorDiv(pointL, width))
    // one row per bin the interval overlaps: floor(start/w) .. floor((end-1)/w)
    val iv = intervals
      .withColumn("_start_l", startL)
      .withColumn("_end_l", endL)
      .filter(col("_end_l") > col("_start_l"))
      .withColumn("_bin", explode(sequence(
        floorDiv(col("_start_l"), width), floorDiv(col("_end_l") - 1, width))))
    p.join(iv, "_bin") // exact predicate re-applied post-match:
      .filter(pointL >= col("_start_l") && pointL < col("_end_l"))
      .drop("_bin", "_start_l", "_end_l")
  }

  private def floorDiv(c: Column, w: Long): Column = {
    // integer-exact floor division across the FULL long range (epoch
    // ns included): `/` would round through double, `div` alone
    // truncates toward zero — subtracting pmod's non-negative
    // remainder first makes integral `div` land on the floor bin for
    // any sign
    val x = c.cast("long")
    call_function("div", x - pmod(x, lit(w)), lit(w))
  }
}
