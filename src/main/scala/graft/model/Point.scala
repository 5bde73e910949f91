package graft.model

import org.apache.spark.sql.types._

/** Canonical time-series data model.
  *
  * Mirrors the InfluxDB 2.x point model the reference provisions
  * (reference: recipe.yaml:110 pins influxdb:2.0.9; the data model is the
  * public line-protocol contract: measurement + tag set + field set +
  * ns timestamp). We store points in a canonical *long* table — one row per
  * (point, field) — so ingest stays schema-free (schema-on-write), while
  * analytics use a pivoted wide view derived on demand (SURVEY.md §1.3).
  *
  * Field values in line protocol are a union of float | int | uint |
  * string | bool. Spark has no variant-lite union that stays
  * codegen-friendly, so the canonical table carries one nullable column
  * per primitive; exactly one is non-null per row.
  *
  * Timestamps: line protocol is ns-precision; Spark's TimestampType is
  * µs. We carry both: `time` (µs TimestampType, for window functions and
  * partition pruning) and `time_ns` (LongType, lossless).
  */
final case class Point(
    measurement: String,
    tags: Map[String, String],
    field: String,
    valueF: Option[Double],
    valueI: Option[Long],
    valueU: Option[Long], // uint stored as signed bits, like InfluxDB's Go engine
    valueS: Option[String],
    valueB: Option[Boolean],
    timeNs: Long
)

object Point {
  /** Canonical long schema for a bucket table. Partition column `dt`
    * (date of `time`) is appended by the store on write.
    */
  val schema: StructType = StructType(Seq(
    StructField("measurement", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false), nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("value_f", DoubleType, nullable = true),
    StructField("value_i", LongType, nullable = true),
    StructField("value_u", LongType, nullable = true),
    StructField("value_s", StringType, nullable = true),
    StructField("value_b", BooleanType, nullable = true),
    StructField("time", TimestampType, nullable = false),
    StructField("time_ns", LongType, nullable = false)
  ))

  val columns: Seq[String] = schema.fieldNames.toSeq
}
