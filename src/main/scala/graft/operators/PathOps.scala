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
