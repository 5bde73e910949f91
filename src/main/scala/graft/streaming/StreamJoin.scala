package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution shape: match each
  * conversion to the impressions that preceded it within a bounded
  * delay, both sides unbounded streams.
  *
  * Why the bounds matter at 100 TB/day: a stream-stream join must
  * buffer BOTH sides in state until a row can no longer match. Without
  * an event-time range condition the state is infinite; with
  * `conv_time ∈ [imp_time, imp_time + maxDelay]` plus watermarks on
  * both sides, Spark evicts an impression once the conversion
  * watermark passes `imp_time + maxDelay` (and vice versa), so state
  * is bounded by rate × (delay + lateness) regardless of how long the
  * query runs. This is Structured Streaming's documented
  * interval-join contract (public Spark docs/source) surfaced as one
  * checked helper instead of four easy-to-miss conditions.
  *
  * Inner joins emit as matches arrive; `joinType = "leftOuter"` emits
  * unmatched impressions too, but only once the watermark proves no
  * conversion can still arrive — the null-padded rows trail by
  * (maxDelay + lateness), which is the semantics, not a bug.
  */
object StreamJoin {

  /** `impressions(key, impTimeCol, …)` ⋈ `conversions(key, convTimeCol,
    * …)` with `convTime ∈ [impTime, impTime + maxDelay]`. The two
    * frames must not share non-key column names; both get a watermark
    * of `lateness` on their time column.
    */
  def attributionJoin(impressions: DataFrame, conversions: DataFrame,
      key: String, impTimeCol: String, convTimeCol: String,
      maxDelay: String, lateness: String,
      joinType: String = "inner"): DataFrame = {
    val shared = impressions.columns.toSet
      .intersect(conversions.columns.toSet) - key
    require(shared.isEmpty,
      s"attributionJoin: non-key columns shared by both sides: " +
        s"${shared.mkString(", ")} — rename before joining")
    val i = impressions.withWatermark(impTimeCol, lateness)
    val c = conversions.withWatermark(convTimeCol, lateness)
      .withColumnRenamed(key, "_conv_key")
    i.join(c,
      col(key) === col("_conv_key") &&
        col(convTimeCol) >= col(impTimeCol) &&
        col(convTimeCol) <= col(impTimeCol) + expr(s"INTERVAL $maxDelay"),
      joinType)
      .drop("_conv_key")
  }
}
