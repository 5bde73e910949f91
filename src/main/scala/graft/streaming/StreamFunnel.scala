package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental ordered funnel — [[graft.operators.FunnelOps.funnel]]
  * running live: per-entity step times advance as events arrive, with
  * the same STRICT semantics (step k counts only strictly after the
  * recorded step-(k−1) time). Because each step time is set-once and
  * events within a batch process in time order, the state after any
  * prefix equals the batch verb over that prefix — set-once monotone
  * state is what makes the live funnel exactly consistent with the
  * nightly batch recompute.
  *
  * Scale/state shape: one `steps.length` long-array per entity
  * (flatMapGroupsWithState — O(entities), not O(events)); rows sort
  * per batch per entity (bounded by batch size); across batches the
  * source must deliver per-entity time-ordered data, the family's
  * documented arrival contract. Emits the entity's full snapshot
  * (user, ts_steps array with nulls for unreached steps) after every
  * batch that touched it — consumers fold snapshots with max()
  * (set-once ⇒ max over snapshots = final value).
  */
object StreamFunnel {

  def funnelStream(stream: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = stream.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val n = steps.length
    stream
      .select(col(userCol).cast("string"), col(typeCol).cast("string"),
        col(tsCol).cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: String, rows: Iterator[(String, String, Long)],
         state: GroupState[Seq[Long]]) =>
          val t = state.getOption.map(_.toArray).getOrElse(Array.fill(n)(-1L))
          rows.toVector.sortBy(_._3).foreach { case (_, tp, ts) =>
            stepIdx.get(tp).foreach { k =>
              if (t(k) == -1L && (k == 0 || (t(k - 1) != -1L && ts > t(k - 1))))
                t(k) = ts
            }
          }
          state.update(t.toSeq)
          Iterator.single((user, t.toSeq.map(v => if (v == -1L) None else Some(v))))
      }
      .toDF(userCol, "ts_steps")
  }
}
