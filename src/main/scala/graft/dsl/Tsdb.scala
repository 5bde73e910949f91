package graft.dsl

import graft.store.{BucketStore, Catalog}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine facade: `Tsdb.from(bucket)` is the Flux `from(bucket:)` scan
  * (SURVEY.md §2B); verbs chain on the returned [[FluxFrame]]:
  *
  * {{{
  * tsdb.from("telemetry")
  *   .range("2024-01-01", "2024-02-01")
  *   .where(col("measurement") === "cpu" && col("tags.host") === "h1")
  *   .aggregateWindow("1 minute", avg)
  * }}}
  */
final class Tsdb(val spark: SparkSession, val catalog: Catalog) {
  val store = new BucketStore(catalog, spark)

  /** Flux `from(bucket:)`: scan with LWW dedup; time-partition pruning
    * happens when `range()` follows (filter on `time` reaches the dt
    * partitioning because dt = date(time) is how the store writes).
    */
  def from(bucket: String): FluxFrame = {
    val df = store.read(bucket)
    FluxFrame(df, Seq("measurement", "field"), "time", "value_f")
  }

  /** Raw scan without the dedup window (fast path once compacted).
    * `dt` is kept so range() prunes partitions.
    */
  def fromRaw(bucket: String): FluxFrame =
    FluxFrame(store.readRaw(bucket).drop("_ingest_seq"),
      Seq("measurement", "field"), "time", "value_f")

  /** Flux `to(bucket:)` — write a query result back as points. The frame
    * must carry canonical columns; anything extra is dropped.
    */
  def to(bucket: String, df: DataFrame): Unit = {
    val canon = df.select(graft.model.Point.columns.map(c =>
      if (df.columns.contains(c)) col(c)
      else if (c == "tags") map().cast(graft.model.Point.schema(c).dataType).as(c)
      else lit(null).cast(graft.model.Point.schema(c).dataType).as(c)): _*)
    store.write(bucket, canon)
  }

  /** Pivot the canonical long form to a wide per-measurement view
    * (Flux `schema.fieldsAsCols()`): one column per field key.
    */
  def fieldsAsCols(bucket: String, measurement: String, fields: Seq[String] = Nil): DataFrame = {
    val base = from(bucket).where(col("measurement") === measurement).df
    // explicit field list + per-field TYPES from the store's versioned
    // caches: Spark's pivot-value inference would otherwise run a
    // distinct-scan job on EVERY plan construction, and a single pivot
    // aggregate could not give each field its own typed value column
    // (string/bool fields would read back null)
    val fs = if (fields.nonEmpty) fields else store.fieldKeys(bucket, Some(measurement))
    if (fs.isEmpty)
      // dedup must not KEY on the raw map (Spark refuses set ops on
      // MAP columns — the r18 service soak hit this when a measurement
      // was queried before its field keys were known): key on the
      // serialized entries, carry the map through as payload
      return base.select(col("time"), col("time_ns"), col("tags"))
        .withColumn("_tagkey", to_json(array_sort(map_entries(col("tags")))))
        .dropDuplicates("time", "time_ns", "_tagkey")
        .drop("_tagkey")
    val types = store.fieldTypes(bucket, Some(measurement))
    val aggs = fs.map { f =>
      val src = types.getOrElse(f, "float") match {
        case "integer" => col("value_i")
        case "unsigned" => col("value_u")
        case "string" => col("value_s")
        case "boolean" => col("value_b")
        // float (and mixed-kind history): the numeric coalesce the
        // pivot always used
        case _ => coalesce(col("value_f"), col("value_i").cast("double"))
      }
      first(when(col("field") === f, src), ignoreNulls = true).as(f)
    }
    // dt rides in the groupBy (functionally determined by time_ns, so
    // groups are unchanged): WHERE-time conjuncts on dt then push
    // through the Aggregate AND the LWW window down to partition
    // pruning — v1 range queries on uncompacted buckets would
    // otherwise list every day directory
    base.groupBy(col("time"), col("time_ns"), col("dt"), col("tags"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Line-protocol batch write (the /api/v2/write path). `precision`
    * scales supplied raw timestamps (s/ms/us/ns — the v2 write API's
    * `precision=` query param; Telegraf writes s by default).
    */
  def writeLp(bucket: String, lines: Seq[String],
      defaultTimeNs: Long = System.currentTimeMillis() * 1000000L,
      precision: String = "ns"): Unit = {
    val scale = graft.lineprotocol.LineProtocol.precisionScale(precision)
      .getOrElse(throw graft.lineprotocol.LineProtocol.ParseError(
        precision, "invalid precision (want s|ms|us|ns)"))
    val df = graft.lineprotocol.LpIngest.parseStrict(lines, defaultTimeNs, spark, scale)
    // request-bounded and driver-local, so the size is known for free:
    // land one file per ~1M points per day instead of one per default-
    // parallelism slice (32 near-empty files per small HTTP write —
    // the same small-file discipline as the streaming writeSized path)
    val parts = math.max(1, (lines.size / 1000000) + 1)
    store.write(bucket, df.coalesce(parts))
  }
}

object Tsdb {
  def apply(spark: SparkSession, warehouse: String): Tsdb =
    new Tsdb(spark, new Catalog(java.nio.file.Paths.get(warehouse)))
}
