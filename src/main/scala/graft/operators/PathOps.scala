package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Path analysis over the events stream — the third pillar of the
  * product-analytics block next to [[FunnelOps.funnel]] (did the steps
  * happen in order?) and cohort retention (did the user come back?):
  * WHICH routes do sessions actually take, and what does a user do
  * next from a given event. Realized as ordered per-session event
  * sequences ("paths") and first-order Markov transition counts.
  *
  * Scale shape: everything hashes on the entity key. The gap-split
  * window and the per-(entity, session) sequence aggregation share one
  * exchange; sequences are bounded by `maxLen` BEFORE they become rows
  * (a pathological million-event session contributes a fixed-size
  * prefix, not a million-element array in the path count shuffle); the
  * final path/transition counts are map-side-combinable aggregates on
  * low-cardinality keys. Event-time ties order by the id column, so
  * the sequence — and therefore every count downstream — is
  * deterministic on both engines.
  */
object PathOps {

  /** Per-(entity, session) ordered event-type sequence. Sessions split
    * where the gap between consecutive events exceeds `maxGap` (same
    * µs-axis convention as the sessionize verb); the sequence keeps
    * the first `maxLen` events of the session, tie-broken by `idCol`.
    * Returns (user, session, path, path_len) with `path` the
    * '>'-joined type sequence (truncated to maxLen) and `path_len`
    * the truncated length.
    */
  def sessionPaths(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, maxGap: Long, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val withSession = df
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > maxGap, 1)
          .otherwise(0))
      .withColumn("session", sum(col("_new")).over(byUser).cast("long"))
    withSession
      .groupBy(col(userCol), col("session"))
      .agg(slice(
        transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol), col(typeCol).as("t")))),
          x => x.getField("t")),
        1, maxLen).as("_seq"))
      .select(col(userCol), col("session"),
        array_join(col("_seq"), ">").as("path"),
        size(col("_seq")).cast("long").as("path_len"))
  }

  /** Corpus-wide path frequencies: how many sessions took each route.
    * Returns (path, path_len, n_sessions) — order downstream by
    * (n desc, path) for a deterministic top-N cut.
    */
  def pathCounts(paths: DataFrame): DataFrame =
    paths.groupBy("path", "path_len")
      .agg(count(lit(1)).as("n_sessions"))

  /** Touch attribution: for every conversion event, the FIRST and
    * LAST non-conversion ("touch") event of the same entity within the
    * `lookback` time units preceding it — first-touch and last-touch
    * credit, the two standard attribution models. Returns the
    * conversion rows with (first_touch, first_ts, last_touch, last_ts)
    * columns, nulls when no touch falls in the window.
    *
    * ONE per-entity range window does both models: the frame
    * rangeBetween(−lookback, −1) over the numeric time axis IS the
    * attribution window, min/max of a conditional (ts, type) struct
    * pick the endpoints (lexicographic — ties on an exact-equal ts
    * break by type, deterministically). Everything hashes on the
    * entity key; no self-join.
    */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, conversions: Set[String],
      lookback: Long): DataFrame = {
    require(conversions.nonEmpty, "attribution needs conversion types")
    require(lookback > 0, s"lookback must be positive, got $lookback")
    val isConv = col(typeCol).isInCollection(conversions)
    val rangeW = Window.partitionBy(userCol).orderBy(col(tsCol))
      .rangeBetween(-lookback, -1)
    val touch = when(!isConv, struct(col(tsCol).as("ts"), col(typeCol).as("t")))
    df.withColumn("_first", min(touch).over(rangeW))
      .withColumn("_last", max(touch).over(rangeW))
      .filter(isConv)
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol),
        col("_first").getField("t").as("first_touch"),
        col("_first").getField("ts").as("first_ts"),
        col("_last").getField("t").as("last_touch"),
        col("_last").getField("ts").as("last_ts"))
  }

  /** Multi-touch credit summary per conversion over the same
    * rangeBetween(−lookback, −1) frame as [[attribution]]: how many
    * touches share the credit (linear model divides evenly among
    * them) and the total exponential time-decay weight
    * Σ exp(−(conv_ts − touch_ts)/tau) (time-decay model normalizes by
    * it). Returns conversions with (n_touches, decay_sum).
    */
  def attributionCredit(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, conversions: Set[String],
      lookback: Long, tau: Double): DataFrame = {
    require(conversions.nonEmpty, "attribution needs conversion types")
    require(lookback > 0 && tau > 0, "lookback and tau must be positive")
    val isConv = col(typeCol).isInCollection(conversions)
    val rangeW = Window.partitionBy(userCol).orderBy(col(tsCol))
      .rangeBetween(-lookback, -1)
    // the decay term needs the conversion's own ts, which a window
    // frame expression can't see — so the frame collects the touch
    // timestamps (bounded by touches-per-lookback, the model's natural
    // state) and the fold runs at row level where the anchor is in
    // scope. array_sort pins the FP summation order against ts ties.
    val tl = collect_list(when(!isConv, col(tsCol))).over(rangeW)
    df.withColumn("_tl", tl)
      .filter(isConv)
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol),
        size(col("_tl")).cast("long").as("n_touches"),
        aggregate(array_sort(col("_tl")), lit(0.0),
          (acc, x) => acc + exp((x - col(tsCol)) / tau)).as("decay_sum"))
  }

  /** First-order Markov transitions within sessions: for every
    * consecutive (from → to) event pair, the count and the row
    * probability P(to | from) over all transitions leaving `from`.
    * Self-transitions count like any other. Returns
    * (from_type, to_type, n, prob) with prob UNROUNDED — callers
    * round for hash gates.
    *
    * The pair explode happens on the session-grouped sequences, so a
    * session of k events emits exactly k−1 rows; the probability
    * normalization is a window over the from-type — cardinality =
    * distinct event types, bounded and tiny next to the event count.
    */
  def transitions(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, maxGap: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val withSession = df
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > maxGap, 1)
          .otherwise(0))
      .withColumn("session", sum(col("_new")).over(byUser).cast("long"))
    val bySession = Window.partitionBy(col(userCol), col("session"))
      .orderBy(col(tsCol), col(idCol))
    val pairs = withSession
      .withColumn("_to", lead(col(typeCol), 1).over(bySession))
      .filter(col("_to").isNotNull)
      .select(col(typeCol).as("from_type"), col("_to").as("to_type"))
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("prob",
      col("n") / sum(col("n")).over(Window.partitionBy("from_type")))
  }
}
