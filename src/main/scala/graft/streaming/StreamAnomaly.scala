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
}
