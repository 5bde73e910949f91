package graft.lineprotocol

import graft.model.Point
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark bridge for line protocol: Dataset[String] → canonical DataFrame.
  *
  * Works identically for batch (`spark.read.textFile`) and streaming
  * (`spark.readStream` text source) inputs — the same flatMap runs on
  * executors; no driver-side parsing.
  */
object LpIngest {

  /** Internal flat row shape; Options encode the nullable value union.
    * NOT private: Janino-generated code calls the accessors reflectively
    * and a private case class makes every ingest plan fall back to
    * interpreted execution (ERROR CodeGenerator in the logs).
    */
  final case class Parsed(
      measurement: String,
      tags: Map[String, String],
      field: String,
      value_f: Option[Double],
      value_i: Option[Long],
      value_u: Option[Long],
      value_s: Option[String],
      value_b: Option[Boolean],
      time_ns: Long
  )

  /** Parse lines to the canonical long table (SURVEY.md §1.3 / §7).
    *
    * @param defaultTimeNs timestamp assigned to lines without one (the
    *   engine's server-assigned time); fixed per batch for determinism.
    */
  def parse(lines: Dataset[String], defaultTimeNs: Long = System.currentTimeMillis() * 1000000L,
      tsScaleNs: Long = 1L): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val parsed: Dataset[Parsed] = lines.flatMap { line =>
      LineProtocol.parseLenient(line, defaultTimeNs, tsScaleNs).map { p =>
        Parsed(p.measurement, p.tags, p.field, p.valueF, p.valueI, p.valueU, p.valueS, p.valueB, p.timeNs)
      }
    }
    withTimeColumns(parsed.toDF())
  }

  /** Derive µs `time` (TimestampType) from lossless ns `time_ns`.
    * Integer division, not `/`: 2024-era epoch-ns (~1.7e18) exceeds a
    * double's 53-bit mantissa (ulp ~256 ns), so float division could
    * land the derived µs 1 off near boundaries relative to `time_ns`.
    */
  def withTimeColumns(df: DataFrame): DataFrame =
    df.withColumn("time", timestamp_micros(expr("time_ns div 1000")))
      .select(Point.columns.map(col): _*)

  /** Strict batch parse: throws on the first malformed line (used by
    * tests and the non-lenient write API).
    */
  def parseStrict(lines: Seq[String], defaultTimeNs: Long, spark: SparkSession,
      tsScaleNs: Long = 1L): DataFrame = {
    import spark.implicits._
    val pts = lines.flatMap(l => LineProtocol.parseLine(l, defaultTimeNs, tsScaleNs)).map { p =>
      Parsed(p.measurement, p.tags, p.field, p.valueF, p.valueI, p.valueU, p.valueS, p.valueB, p.timeNs)
    }
    withTimeColumns(spark.createDataset(pts).toDF())
  }
}
