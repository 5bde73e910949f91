package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift alarms — the live counterpart of
  * [[graft.operators.AnomalyOps.cusum]], in the deployment shape
  * monitoring actually uses: per-series reference moments (μ, σ) come
  * from HISTORY (a batch aggregate, a training window), the stream is
  * scored as it arrives, and the recurrence state survives across
  * micro-batches. Pair with [[graft.operators.AnomalyOps]]'s batch
  * verb for the moments and this for the live tail.
  *
  * Scale/state shape: ONE double of state per series (the running S),
  * via flatMapGroupsWithState — state is O(series), not O(rows), and
  * the stream-static join that attaches the moments broadcasts the
  * (series)-sized params table into every micro-batch. Rows within a
  * micro-batch sort by the time column per series (bounded by batch
  * size); ACROSS batches the source must deliver time-ordered data
  * per series — the same arrival contract the downsample/dedup
  * streams document.
  */
object StreamAnomaly {

  /** `stream` needs (keyCol, tsCol, valueCol); `params` is the static
    * (keyCol, mu, sg) reference table. Emits every scored row:
    * (key, ts, value, cusum, alarm) with
    * S_t = max(0, S_{t−1} + (x − μ − slack·σ)), alarm ⇔ S > thresh·σ.
    */
  def cusumStream(stream: DataFrame, params: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, slackSigmas: Double = 0.5,
      threshSigmas: Double = 4.0): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Long, Double, Double, Double)] = stream
      .join(params, keyCol)
      .select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        col(valueCol).cast("double"), col("mu").cast("double"),
        col("sg").cast("double"))
      .as[(String, Long, Double, Double, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double, Double, Double)],
         state: GroupState[Double]) =>
          var s = state.getOption.getOrElse(0.0)
          val out = rows.toVector.sortBy(_._2).map { case (_, ts, v, mu, sg) =>
            s = math.max(0.0, s + (v - mu - slackSigmas * sg))
            (key, ts, v, s, s > threshSigmas * sg)
          }
          state.update(s)
          out.iterator
      }
      .toDF(keyCol, tsCol, valueCol, "cusum", "alarm")
  }

  /** Streaming hysteresis burst flags — the live counterpart of
    * [[graft.operators.AnomalyOps.burstFlags]]: reference moments from
    * HISTORY (`params`: keyCol, mu, sg), the two-threshold Schmitt
    * automaton's 1-BIT state per series surviving micro-batches in
    * flatMapGroupsWithState. Emits (key, ts, id, value, in_burst).
    *
    * The id column is the arrival-order tie-break within a timestamp
    * (same contract the batch verb's tieCols carries); rows sort by
    * (ts, id) within each micro-batch, and across batches the source
    * must deliver (ts, id)-ordered data per series — the gate feeds
    * time-quartile files one per trigger to exercise exactly that.
    */
  def burstStream(stream: DataFrame, params: DataFrame, keyCol: String,
      tsCol: String, idCol: String, valueCol: String,
      hiSigmas: Double = 2.0, loSigmas: Double = 0.5): DataFrame = {
    require(hiSigmas > loSigmas, s"need hi > lo, got $hiSigmas <= $loSigmas")
    val spark = stream.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Long, Long, Double, Double, Double)] = stream
      .join(params, keyCol)
      .select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        col(idCol).cast("long"), col(valueCol).cast("double"),
        col("mu").cast("double"), col("sg").cast("double"))
      .as[(String, Long, Long, Double, Double, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Double, Double, Double)],
         state: GroupState[Boolean]) =>
          var b = state.getOption.getOrElse(false)
          val out = rows.toVector.sortBy(r => (r._2, r._3))
            .map { case (_, ts, id, v, mu, sg) =>
              b = if (b) v > mu + loSigmas * sg else v > mu + hiSigmas * sg
              (key, ts, id, v, if (b) 1.0 else 0.0)
            }
          state.update(b)
          out.iterator
      }
      .toDF(keyCol, tsCol, idCol, valueCol, "in_burst")
  }

  /** Streaming seasonal-baseline scoring — the live counterpart of
    * [[graft.operators.AnomalyOps.seasonalBaseline]]: the per-(series,
    * hour-of-week) baseline comes from HISTORY (`baseline`: keyCol,
    * how, mu, sg — the batch verb's own output shape), and each
    * arriving row joins its slot and flags. STATELESS by design — the
    * whole verb is one stream-static join that Spark broadcasts into
    * every micro-batch, the deployment shape for reference tables that
    * retrain offline; contrast [[cusumStream]]/[[burstStream]], whose
    * detectors are inherently sequential and carry state.
    */
  def seasonalStream(stream: DataFrame, baseline: DataFrame, keyCol: String,
      tsUsCol: String, valueCol: String, sigmas: Double = 3.0): DataFrame =
    stream
      .withColumn("how", expr(s"($tsUsCol div 3600000000) % 168"))
      .join(broadcast(baseline), Seq(keyCol, "how"))
      .withColumn("flag",
        col("sg") > 0 &&
          abs(round(col(valueCol) * 10000).cast("long").cast("double")
            / lit(10000.0) - col("mu")) > lit(sigmas) * col("sg"))

  /** Streaming MAD — the bounded-state live counterpart of
    * [[graft.operators.AnomalyOps.madFlags]]'s KLL mode. Deployment
    * shape mirrors [[cusumStream]]: the reference median per series
    * comes from HISTORY (`medians`: keyCol, med), the stream's
    * absolute deviations accumulate in a PER-SERIES KLL sketch held in
    * flatMapGroupsWithState state — O(k·log n) doubles per series,
    * never raw rows — and each micro-batch emits the series'
    * (n_seen, mad) as of that batch.
    *
    * Batch equivalence: the sketch state is a weighted multiset, and
    * in its exact regime (n ≤ k) it is literally the multiset of
    * deviations — independent of micro-batch boundaries — so the final
    * emitted row per series (largest n_seen) carries the identical mad
    * a one-shot batch computation produces; the `stream_mad` gate pins
    * that against a disc-quantile SQL replay. In the compacting regime
    * the ts-sorted update order (same arrival contract as
    * [[cusumStream]]) keeps results reproducible run-to-run.
    */
  def madStream(stream: DataFrame, medians: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, kllK: Int = 32768): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Long, Double)] = stream
      .join(medians, keyCol)
      .select(col(keyCol).cast("string"), col(tsCol).cast("long"),
        abs(col(valueCol).cast("double") - col("med").cast("double")))
      .as[(String, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[Array[Byte]]) =>
          val st = state.getOption.map(graft.functions.KllWire.read)
            .getOrElse(new graft.functions.KllState(kllK))
          rows.toVector.sortBy(_._2).foreach { case (_, _, d) => st.update(d) }
          state.update(graft.functions.KllWire.write(st))
          Iterator.single((key, st.totalN, st.quantiles(Array(0.5))(0)))
      }
      .toDF(keyCol, "n_seen", "mad")
  }
}
