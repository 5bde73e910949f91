package graft.queries

import graft.dsl.FluxFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** As-of join + relational set operations (except/intersect — free via
  * Spark, listed in SURVEY §2B as out-of-Flux extras).
  */
object SetOpQueries {
  import QueryUtil._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: attach to every event the latest completed hourly sum
    // of its event_type (a downsampled reference series), like joining
    // ticks to the most recent quote.
    "asof_join" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .aggregateWindow("1 hour", sum, as = "hsum")
      val joined = ev(s, dir)
        .asofJoin(hourly, Seq("event_type"), Seq("hsum"))
      joined.toDF
        .filter(col("hsum").isNotNull)
        .select(col("event_id"), r4(col("hsum")).as("hsum"))
        .orderBy("event_id")
    }),

    // EXCEPT: click event ids outside the second week.
    "except_ids" -> ((s, dir) => {
      val clicks = events(s, dir).filter(col("event_type") === "click").select("event_id")
      val week2 = events(s, dir)
        .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
          col("ts") < lit("2024-01-15").cast("timestamp"))
        .select("event_id")
      clicks.except(week2).orderBy("event_id")
    }),

    // INTERSECT: users who both clicked and purchased.
    "intersect_users" -> ((s, dir) => {
      val c = events(s, dir).filter(col("event_type") === "click").select("user_id")
      val p = events(s, dir).filter(col("event_type") === "purchase").select("user_id")
      c.intersect(p).orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "asof_join" ->
      """WITH hourly AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS wend,
        |    sum(value) AS hsum
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT e.event_id, round(h.hsum, 4) AS hsum
        |FROM events e ASOF JOIN hourly h
        |  ON e.event_type = h.event_type AND e.ts >= h.wend
        |ORDER BY e.event_id""".stripMargin,
    "except_ids" ->
      """SELECT event_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT event_id FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY event_id""".stripMargin,
    "intersect_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin
  )
}
