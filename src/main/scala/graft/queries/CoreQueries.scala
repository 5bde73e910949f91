package graft.queries

import graft.dsl.FluxFrame
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core operator queries for the driver's DuckDB-differential gate
  * (SURVEY.md §5 item 3): filters / projections / group-aggregates over
  * the deterministic testdata. Every query is expressed through the
  * engine's FluxFrame verbs (so the gate exercises the library, not ad
  * hoc DataFrame code), carries a column-name-aligned DuckDB oracle, and
  * ends in a total order for stable comparison.
  *
  * Float discipline: any aggregate over doubles is rounded to 4 decimals
  * on BOTH sides — summation order differs between engines and the
  * driver compares hashes, not tolerances.
  */
object QueryUtil {
  def r4(c: Column): Column = round(c, 4)

  /** events.ts has shipped as two physical parquet types across driver
    * testdata generations: timestamp[ns] (read as a long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and timestamp[us]
    * (read as TIMESTAMP_NTZ). Normalize both to the same two columns:
    * `ts_ns` (lossless epoch-ns long, for exact ordering/deltas —
    * matches DuckDB's `epoch_ns(ts)` bit-for-bit) and `ts` (µs
    * TimestampType for date/window functions; with the session pinned
    * to UTC the NTZ→LTZ cast is wall-clock-identity, mirroring how
    * DuckDB treats the naive parquet timestamp).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val read = s.read.parquet(s"$dir/events.parquet")
    // Name drift guard: the round-9 regeneration silently changed the
    // physical type and zeroed 105 gates in the driver artifact; tolerate
    // a `ts_ns`-named time column too so a future rename can't repeat it.
    val raw =
      if (read.columns.contains("ts")) read
      else if (read.columns.contains("ts_ns")) read.withColumnRenamed("ts_ns", "ts")
      else sys.error(s"events.parquet has no ts/ts_ns column: ${read.columns.mkString(",")}")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // ns-as-long generation
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ => // timestamp[us] generation (NTZ or LTZ)
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def orders(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/orders.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** events as a Flux frame: measurement ≙ event_type, series tag ≙
    * user_id, `_value` ≙ value, time ≙ ts.
    */
  def ev(s: SparkSession, dir: String): FluxFrame =
    FluxFrame.of(events(s, dir), "ts", "value", "event_type")

  /** ns-exact variant: time axis = ts_ns long. Use for order-sensitive
    * selectors/deltas so ties and deltas match DuckDB's ns view exactly.
    */
  def evNs(s: SparkSession, dir: String): FluxFrame =
    FluxFrame.of(events(s, dir), "ts_ns", "value", "event_type")

  /** µs-long axis (`ts_us` = ts_ns div 1000): order-sensitive transforms
    * whose VALUES involve time arithmetic use this so deltas match
    * DuckDB's `epoch_us(ts)` bit-for-bit (DuckDB sees the parquet ns
    * timestamp µs-truncated).
    */
  def evUs(s: SparkSession, dir: String): FluxFrame =
    FluxFrame.of(
      events(s, dir).withColumn("ts_us", expr("ts_ns div 1000")),
      "ts_us", "value", "event_type")

  def evSeries(s: SparkSession, dir: String): FluxFrame =
    FluxFrame.of(events(s, dir), "ts", "value", "event_type", "user_id")
}

object CoreQueries {
  import QueryUtil._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: TPC-H Q1-shaped pricing summary (scan + group + 5 aggs).
    "q1_agg" -> ((s, dir) =>
      lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r4(sum(col("l_quantity"))).as("sum_qty"),
          r4(sum(col("l_extendedprice"))).as("sum_base_price"),
          r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Flux range(): half-open time slice, then per-measurement count.
    "range_count" -> ((s, dir) =>
      ev(s, dir)
        .range("2024-01-08 00:00:00", "2024-01-15 00:00:00")
        .countRows("_value")
        .toDF.orderBy("event_type")),

    // Flux filter(): value + tag predicates, multi-aggregate per group.
    "filter_agg" -> ((s, dir) =>
      ev(s, dir)
        .where(col("value") > 50 && col("event_type").isin("click", "view"))
        .group("event_type", "user_id")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("event_type", "user_id")),

    // keep + rename + sort: row-level projection fidelity.
    "keep_rename" -> ((s, dir) =>
      ev(s, dir)
        .keep("event_id", "value", "event_type")
        .rename("value" -> "v")
        .toDF.orderBy("event_id")),

    // map + set + duplicate: computed column, constant column, copy.
    "map_set_dup" -> ((s, dir) =>
      ev(s, dir)
        .where(col("event_id") < 500)
        .duplicate("user_id", "uid2")
        .set("src", "graft")
        .withCol("v2", r4(col("value") * 2 + 1))
        .keep("event_id", "uid2", "src", "v2")
        .toDF.orderBy("event_id")),

    // group()+basic aggregate verbs (count/sum/mean/min/max via agg()).
    "group_stats" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type")
        .agg(
          count(lit(1)).as("n"),
          r4(sum(col("value"))).as("sum_v"),
          r4(avg(col("value"))).as("mean_v"),
          r4(min(col("value"))).as("min_v"),
          r4(max(col("value"))).as("max_v"))
        .orderBy("event_type")),

    // first()/last() selectors: value at earliest/latest time per group.
    "first_last" -> ((s, dir) => {
      val f = evNs(s, dir).firstV("first_v").toDF
      val l = evNs(s, dir).lastV("last_v").toDF
      f.join(l, "event_type")
        .select(col("event_type"), r4(col("first_v")).as("first_v"), r4(col("last_v")).as("last_v"))
        .orderBy("event_type")
    }),

    // median + quantile (exact linear interpolation).
    "quantiles" -> ((s, dir) => {
      val med = ev(s, dir).medianV("med").toDF
      val q90 = ev(s, dir).quantile(0.9, exact = true, as = "q90").toDF
      med.join(q90, "event_type")
        .select(col("event_type"), r4(col("med")).as("med"), r4(col("q90")).as("q90"))
        .orderBy("event_type")
    }),

    // mode: most frequent user per measurement (deterministic tie-break).
    "mode_user" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type", "user_id")
        .agg(count(lit(1)).as("n"))
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy(col("n").desc, col("user_id"))))
        .filter(col("_r") === 1).drop("_r")
        .orderBy("event_type")),

    // stddev + spread.
    "stddev_spread" -> ((s, dir) => {
      val sd = ev(s, dir).stddevV("sd").toDF
      val sp = ev(s, dir).spread("spread").toDF
      sd.join(sp, "event_type")
        .select(col("event_type"), r4(col("sd")).as("sd"), r4(col("spread")).as("spread"))
        .orderBy("event_type")
    }),

    // distinct(column:) — distinct tag values per measurement.
    "distinct_users" -> ((s, dir) =>
      ev(s, dir).group("event_type").distinctV("user_id").orderBy("event_type", "user_id")),

    // unique(column:) — users appearing exactly once per group within one
    // day (rolled up to a count; day-scoped so the result is non-empty).
    "unique_count" -> ((s, dir) =>
      ev(s, dir)
        .range("2024-01-08 00:00:00", "2024-01-09 00:00:00")
        .group("event_type")
        .unique("user_id")
        .group("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    // integral(unit:) — trapezoidal integral of value over time, per hour.
    "integral_1h" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type")
        .integral(3600.0, as = "integ")
        .toDF.select(col("event_type"), r4(col("integ")).as("integ"))
        .orderBy("event_type")),

    // covariance + pearson r of value vs hour-of-day.
    "cov_corr" -> ((s, dir) => {
      val staged = ev(s, dir).withCol("hod", hour(col("ts")).cast("double")).group("event_type")
      val cv = staged.covariance("value", "hod", as = "cov").toDF
      val cr = staged.pearsonr("value", "hod", as = "r").toDF
      cv.join(cr, "event_type")
        .select(col("event_type"), r4(col("cov")).as("cov"), r4(col("r")).as("r"))
        .orderBy("event_type")
    }),

    // exact count distinct.
    "count_distinct" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type")
        .agg(count_distinct(col("user_id")).as("nd"))
        .orderBy("event_type")),

    // JSON field extraction from props (Flux json/regexp package).
    "json_extract" -> ((s, dir) =>
      ev(s, dir)
        .withCol("k", get_json_object(col("props"), "$.k").cast("long"))
        .group("event_type")
        .agg(r4(avg(col("k"))).as("avg_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // Mergeable KLL quantile sketch (native TypedImperativeAggregate,
    // functions/KllSketch.scala): one pass, map-side partials, only
    // KB-sized sketches cross the shuffle — the quantile shape that
    // survives 100 TB groups. Gate pins EXACT mode (k=32768 > any
    // per-group count at sf0.01/0.1, so no compaction fires and the
    // answer is the literal ceil(q·n)-th smallest — row_number
    // arithmetic the oracle replays). Quantile fractions are chosen
    // dyadic (exact in binary) so ceil(q·n) is the same integer in any
    // IEEE implementation. Approximation error is spec-bounded in
    // KllSketchSpec, not here (a hash gate can't pin an approximation).
    "kll_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{array, call_function, posexplode}
      ev(s, dir)
        .group("event_type")
        .agg(call_function("graft_kll_quantiles", col("value"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.875)), lit(32768)).as("qv"))
        .select(col("event_type"), posexplode(col("qv")).as(Seq("qi", "qv")))
        .orderBy("event_type", "qi")
    }),

    // timeWeightedAvg(unit: 1h): trapezoid integral over elapsed time —
    // the irregular-sampling-proof average (same op order as the SQL
    // replay so round(4) is stable).
    "time_weighted_avg" -> ((s, dir) =>
      ev(s, dir).timeWeightedAvg(3600, as = "twa").toDF
        .select(col("event_type"), r4(col("twa")).as("twa"))
        .orderBy("event_type")),

    // Exact mergeable distinct via paged bitmap (native aggregate,
    // functions/BitmapDistinct.scala): bits ship across the shuffle,
    // not keys — and exactness means the count(DISTINCT) oracle pins
    // it directly.
    "bitmap_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions.call_function
      ev(s, dir)
        .group("event_type")
        .agg(call_function("graft_bitmap_distinct", col("user_id")).as("nd"))
        .orderBy("event_type")
    }),

    // Bitmap set algebra: audience overlap between event types as
    // page-wise AND of per-type bitmaps — the distinct sets are built
    // ONCE, every pairwise overlap is then KB-sized bit math (the
    // oracle has to re-join the raw rows per pair).
    "bitmap_intersect" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{broadcast, call_function}
      val sk = ev(s, dir)
        .group("event_type")
        .agg(call_function("graft_bitmap_bytes", col("user_id")).as("bm"))
      val a = sk.select(col("event_type").as("et_a"), col("bm").as("bm_a"))
      val b = sk.select(col("event_type").as("et_b"), col("bm").as("bm_b"))
      a.join(broadcast(b), col("et_a") < col("et_b"))
        .select(col("et_a"), col("et_b"),
          call_function("graft_bitmap_and_count", col("bm_a"), col("bm_b")).as("both"))
        .orderBy("et_a", "et_b")
    }),

    // Custom physical top-k operator (plans/TopKPerGroup.scala):
    // bounded per-group heaps instead of WindowExec's full partition
    // sort — O(n log k) and O(groups·k) memory after the same single
    // shuffle. Gate pins exact equality (incl. tie order) with the
    // rank oracle.
    "topk_native" -> ((s, dir) =>
      graft.plans.TopKPerGroup(
        events(s, dir).select("event_type", "event_id", "value"),
        Seq("event_type"), "value", "event_id", 3)
        .select(col("event_type"), col("rank"), col("event_id"), col("value"))
        .orderBy("event_type", "rank")),

    // Rolling distinct from bitmap snapshots: build ONE bitmap per day
    // (a single pass over events), then DAU = popcount and WAU =
    // 7-day OR-merge of the daily snapshots — the engagement metrics
    // a 100 TB event log answers from KB-sized daily bitmaps instead
    // of rescanning a week of raw rows per day.
    "rolling_wau" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{broadcast, call_function, date_trunc}
      val daily = events(s, dir)
        .groupBy(date_trunc("DAY", col("ts")).as("day"))
        .agg(call_function("graft_bitmap_bytes", col("user_id")).as("bm"))
      val dau = daily.select(col("day"),
        call_function("graft_bitmap_and_count", col("bm"), col("bm")).as("dau"))
      val wau = daily.select(col("day").as("wday"), col("bm"))
        .join(broadcast(daily.select(col("day"))),
          col("wday").between(col("day") - expr("INTERVAL '6' DAY"), col("day")))
        .groupBy("day")
        .agg(call_function("graft_bitmap_merge_count", col("bm")).as("wau"))
      dau.join(wau, "day").orderBy("day")
    }),

    // Persisted-sketch monitoring loop: per-(event_type, ingest shard)
    // KLL sketches are written to parquet as a binary column, read
    // back, and MERGED per event_type to answer quantiles — no rescan
    // of the raw rows. Exact mode (k > per-shard counts) makes the
    // round-trip + merge hash-identical to computing quantiles over
    // the whole table directly, which is exactly what the oracle does.
    "kll_merge_shards" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{array, call_function, posexplode, pmod}
      val shardDir = java.nio.file.Files
        .createTempDirectory("graft-kll-shards").toString
      events(s, dir)
        .groupBy(col("event_type"), pmod(col("user_id"), lit(4)).as("shard"))
        .agg(call_function("graft_kll_sketch", col("value"), lit(32768)).as("sk"))
        .write.mode("overwrite").parquet(shardDir)
      s.read.parquet(shardDir)
        .groupBy("event_type")
        .agg(call_function("graft_kll_merge", col("sk"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.875))).as("qv"))
        .select(col("event_type"), posexplode(col("qv")).as(Seq("qi", "qv")))
        .orderBy("event_type", "qi")
    }),

    // Mergeable SpaceSaving heavy-hitters sketch (native aggregate,
    // functions/SpaceSaving.scala): top-k with O(capacity) state per
    // group — the shape a huge-cardinality GROUP BY key can't take.
    // Gate pins EXACT mode (capacity 1024 >> 150 distinct users: no
    // eviction, zero error, literal exact top-10 with count-desc /
    // item-asc ties — replayed by row_number in the oracle).
    // Approximation bounds are spec-covered (SpaceSavingSpec).
    "topk_sketch" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{call_function, posexplode}
      ev(s, dir)
        .group("event_type")
        .agg(call_function("graft_topk", col("user_id"), lit(10), lit(1024)).as("tk"))
        .select(col("event_type"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("event_type"), col("pos"),
          col("e.item").as("item"), col("e.cnt").as("cnt"))
        .orderBy("event_type", "pos")
    }),

    // Deterministic exactly-k per-group sample
    // (SampleOps.bottomKSample on the native TopKPerGroup operator):
    // rank by content hash, keep the 10 smallest per type — stable
    // under re-runs, repartitioning, and appends (RNG-free reservoir
    // semantics), with bounded heaps instead of a partition sort.
    "hash_sample" -> ((s, dir) =>
      graft.llmops.SampleOps.bottomKSample(
        events(s, dir).select("event_type", "event_id", "value"),
        Seq("event_type"), "event_id", 10)
        .orderBy("event_type", "event_id")),

    // Weighted exactly-k sample (Efraimidis-Spirakis on TopKPerGroup):
    // u^(1/w) ranking, so high-value events are proportionally more
    // likely in the 10 kept — RNG-free and replayed verbatim in SQL.
    "weighted_sample" -> ((s, dir) =>
      graft.llmops.SampleOps.weightedBottomK(
        events(s, dir).select("event_type", "event_id", "value"),
        Seq("event_type"), "event_id", "value", 10)
        .orderBy("event_type", "event_id")),

    // Count-Min frequency sketch (functions/CountMin.scala): d·w
    // counters per group answer a frequency upper bound for ANY item
    // — the gap between the exact count table (unbounded keys) and
    // SpaceSaving (heavy hitters only). The gate builds one grid per
    // (event_type, DAY), add-merges the daily grids per type (the
    // persisted roll-up path — addition is collision-exact), then
    // point-queries every live user; the oracle rebuilds counters
    // positionally, so estimates — collision overcounts included —
    // hash-match. Exact counts ride along to document observed error.
    "cms_freq" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{broadcast, call_function, date_trunc}
      val e = events(s, dir)
      val sk = e
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
        .agg(call_function("graft_cms_bytes", col("user_id"), lit(4), lit(512)).as("cms"))
        .groupBy("event_type")
        .agg(call_function("graft_cms_merge_bytes", col("cms")).as("cms"))
      val exact = e.groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
      exact.join(broadcast(sk), "event_type")
        .select(col("event_type"), col("user_id"),
          call_function("graft_cms_estimate", col("cms"), col("user_id")).as("est"),
          col("n"))
        .orderBy("event_type", "user_id")
    }),

    // HyperLogLog approximate distinct (native aggregate,
    // functions/HllSketch.scala): fixed 4 KiB of registers per group
    // vs the bitmap family's integer-key requirement — the sketch for
    // high-cardinality STRING keys at 100 TB. The md5-derived hash
    // makes every register value — and the estimator's float
    // arithmetic — exactly replayable in the oracle; exact
    // count(DISTINCT) rides along to document the observed error.
    "hll_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{call_function, countDistinct}
      ev(s, dir)
        .group("event_type")
        .agg(
          r4(call_function("graft_hll_count", col("user_id"), lit(12))).as("hll"),
          countDistinct(col("user_id")).as("nd"))
        .orderBy("event_type")
    }),

    // KMV bottom-k distinct sketch (functions/KmvSketch.scala): the
    // k smallest md5-hashes are a uniform sample of the key's hash
    // space, so the same KB of state answers BOTH distinct counts and
    // (unlike HLL) cross-set overlap. k=64 < the ~200-user domain, so
    // the gate exercises the true estimation path, not the exact one.
    "kmv_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{call_function, countDistinct}
      ev(s, dir)
        .group("event_type")
        .agg(
          r4(call_function("graft_kmv_count", col("user_id"), lit(64))).as("kmv"),
          countDistinct(col("user_id")).as("nd"))
        .orderBy("event_type")
    }),

    // Cross-set overlap from sketches alone: per-type bottom-k
    // sketches built once, every pairwise Jaccard then runs on two KB
    // binaries — the sketch analogue of bitmap_intersect for key
    // domains where exact bitmaps are too wide. The oracle replays
    // the coincidence estimator over ranked distinct hashes.
    "kmv_overlap" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{broadcast, call_function}
      val sk = ev(s, dir)
        .group("event_type")
        .agg(call_function("graft_kmv_bytes", col("user_id"), lit(64)).as("sk"))
      val a = sk.select(col("event_type").as("et_a"), col("sk").as("sk_a"))
      val b = sk.select(col("event_type").as("et_b"), col("sk").as("sk_b"))
      a.join(broadcast(b), col("et_a") < col("et_b"))
        .select(col("et_a"), col("et_b"),
          r4(call_function("graft_kmv_jaccard", col("sk_a"), col("sk_b"))).as("jac"))
        .orderBy("et_a", "et_b")
    }),

    // Snapshot roll-up path: persist one HLL per (event_type, day),
    // then answer the all-time distinct by max-merging the daily
    // sketches — registers of the merge are IDENTICAL to a direct
    // build over the union, so the oracle is the same direct-estimate
    // SQL as hll_distinct. This is the zero-rescan roll-up the
    // 100 TB event log wants (daily KBs → weekly/monthly answers).
    "hll_merge" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{call_function, date_trunc}
      events(s, dir)
        .groupBy(col("event_type"), date_trunc("DAY", col("ts")).as("day"))
        .agg(call_function("graft_hll_bytes", col("user_id"), lit(12)).as("sk"))
        .groupBy("event_type")
        .agg(r4(call_function("graft_hll_merge_count", col("sk"))).as("hll"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "range_count" ->
      """SELECT event_type, count(value) AS _value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "filter_agg" ->
      """SELECT event_type, user_id, count(*) AS n, round(sum(value), 4) AS sum_v
        |FROM events WHERE value > 50 AND event_type IN ('click', 'view')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "keep_rename" ->
      "SELECT event_id, value AS v, event_type FROM events ORDER BY event_id",
    "map_set_dup" ->
      """SELECT event_id, user_id AS uid2, 'graft' AS src,
        |  round(value * 2 + 1, 4) AS v2
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin,
    "group_stats" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_v,
        |  round(avg(value), 4) AS mean_v, round(min(value), 4) AS min_v,
        |  round(max(value), 4) AS max_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "first_last" ->
      """SELECT event_type, round(arg_min(value, ts), 4) AS first_v,
        |  round(arg_max(value, ts), 4) AS last_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "quantiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med,
        |  round(quantile_cont(value, 0.9), 4) AS q90
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "mode_user" ->
      """SELECT event_type, user_id, n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS r
        |  FROM events GROUP BY 1, 2) WHERE r = 1 ORDER BY event_type""".stripMargin,
    "stddev_spread" ->
      """SELECT event_type, round(stddev_samp(value), 4) AS sd,
        |  round(max(value) - min(value), 4) AS spread
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "distinct_users" ->
      "SELECT DISTINCT event_type, user_id FROM events ORDER BY 1, 2",
    "unique_count" ->
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT event_type, user_id, count(*) OVER (PARTITION BY event_type, user_id) AS c
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-09 00:00:00'
        |) WHERE c = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "integral_1h" ->
      """SELECT event_type, round(sum(area), 4) AS integ FROM (
        |  SELECT event_type,
        |    (value + lag(value) OVER w) / 2
        |      * (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6 / 3600 AS area
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts)
        |) GROUP BY 1 ORDER BY 1""".stripMargin,
    "cov_corr" ->
      """SELECT event_type,
        |  round(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS cov,
        |  round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS r
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "count_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS nd FROM events GROUP BY 1 ORDER BY 1",
    "json_extract" ->
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Exact-mode KLL: the sketch holds every value (k > n per group),
    // so each answer is literally the ceil(q·n)-th smallest — replayed
    // here with row_number. Dyadic fractions make ceil(q·n) the same
    // integer under decimal or IEEE-double arithmetic.
    "kll_quantiles" ->
      """WITH ranked AS (
        |  SELECT event_type, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |qs AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75), (3, 0.875)) AS t(qi, q))
        |SELECT event_type, qi, v AS qv
        |FROM ranked JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY event_type, qi""".stripMargin,
    "bitmap_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS nd FROM events GROUP BY 1 ORDER BY 1",
    "topk_native" ->
      """SELECT event_type, CAST(r AS INTEGER) AS rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS r
        |  FROM events) WHERE r <= 3 ORDER BY event_type, rank""".stripMargin,
    // DAU/WAU replayed on raw rows (the work the snapshots avoid)
    "rolling_wau" ->
      """WITH days AS (SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS day FROM events),
        |dau AS (SELECT time_bucket(INTERVAL '1 day', ts) AS day,
        |    count(DISTINCT user_id) AS dau FROM events GROUP BY 1),
        |wau AS (SELECT d.day, count(DISTINCT e.user_id) AS wau
        |  FROM days d JOIN events e
        |    ON time_bucket(INTERVAL '1 day', e.ts)
        |       BETWEEN d.day - INTERVAL 6 DAY AND d.day
        |  GROUP BY 1)
        |SELECT d.day, dau.dau, wau.wau
        |FROM days d JOIN dau ON d.day = dau.day JOIN wau ON d.day = wau.day
        |ORDER BY d.day""".stripMargin,
    // pairwise overlap replayed on raw rows
    "bitmap_intersect" ->
      """WITH s AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS et_a, b.event_type AS et_b, count(*) AS both
        |FROM s a JOIN s b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // mirrors the engine's op order exactly: tsec = µs/1e6 first, then
    // deltas — keeps ulp drift inside round(4)
    "time_weighted_avg" ->
      """WITH t AS (SELECT event_type, value, epoch_us(ts)/1000000.0 AS tsec FROM events),
        |a AS (SELECT event_type, tsec,
        |    (value + lag(value) OVER w)/2 * (tsec - lag(tsec) OVER w)/3600 AS area
        |  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY tsec))
        |SELECT event_type, round(sum(area) / ((max(tsec)-min(tsec))/3600), 4) AS twa
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // Persisted shards merge back to the whole-table exact quantiles —
    // the oracle is the direct computation the merge must equal.
    "kll_merge_shards" ->
      """WITH ranked AS (
        |  SELECT event_type, value AS v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |qs AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75), (3, 0.875)) AS t(qi, q))
        |SELECT event_type, qi, v AS qv
        |FROM ranked JOIN qs ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))
        |ORDER BY event_type, qi""".stripMargin,
    // Exact-mode SpaceSaving: capacity exceeds the key cardinality, so
    // the sketch IS the exact count table; top-10 with the same
    // (count desc, item-string asc) tie order.
    "topk_sketch" ->
      """SELECT event_type, CAST(r - 1 AS INTEGER) AS pos,
        |  CAST(user_id AS VARCHAR) AS item, n AS cnt FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY count(*) DESC, CAST(user_id AS VARCHAR)) AS r
        |  FROM events GROUP BY 1, 2)
        |WHERE r <= 10 ORDER BY event_type, pos""".stripMargin,
    // bottom-k-by-hash replayed with row_number over the same fold
    "hash_sample" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY
        |      list_reduce(list_transform(range(1, 9), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |          AS BIGINT)),
        |        (a, b) -> a * 16 + b), event_id) AS r
        |  FROM events) WHERE r <= 10 ORDER BY event_type, event_id""".stripMargin,
    // same u^(1/w) ranking: u = md5 fold / 2^32, power() mirrored
    "weighted_sample" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY
        |      power(list_reduce(list_transform(range(1, 9), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |          AS BIGINT)),
        |        (a, b) -> a * 16 + b) / 4294967296.0, 1.0 / value) DESC,
        |      event_id) AS r
        |  FROM events WHERE value > 0) WHERE r <= 10
        |ORDER BY event_type, event_id""".stripMargin,
    // CMS counters rebuilt positionally: (h1, h2) = md5 hex folds
    // 1..8 / 9..16 of the user key; row-i position = (h1 + i·h2) mod
    // 512; counter = Σ counts of keys landing there; estimate = min
    // over the item's d cells. Daily-grid merging needs no modeling —
    // addition makes the merged grid identical to the direct one.
    "cms_freq" ->
      """WITH cnt AS (
        |  SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2),
        |hh AS (
        |  SELECT event_type, user_id, n,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_transform(range(9, 17), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h2
        |  FROM cnt),
        |pos AS (
        |  SELECT event_type, user_id, n, t.i, (h1 + t.i * h2) % 512 AS p
        |  FROM hh CROSS JOIN (SELECT unnest(range(0, 4)) AS i) t),
        |ctr AS (
        |  SELECT event_type, i, p, CAST(sum(n) AS BIGINT) AS tot
        |  FROM pos GROUP BY 1, 2, 3)
        |SELECT p.event_type, p.user_id, min(c.tot) AS est, min(p.n) AS n
        |FROM pos p JOIN ctr c
        |  ON p.event_type = c.event_type AND p.i = c.i AND p.p = c.p
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // HLL replayed register-for-register: u32 = first-8-hex md5 Horner
    // fold; bucket = top 12 bits (// 2^20), rank = 20 − floor(log2) of
    // the remainder + 1 via binary-digit LENGTH (integer-exact; the
    // format('{:b}') trick avoids float log2 entirely); registers
    // max-aggregated with empties materialized by the 0..4095 spine;
    // estimator = alpha·m²/Σ2^−reg in bucket order (list_reduce left
    // fold ≡ the engine's 0.0-seeded loop since 0.0+x = x exactly)
    // with the canonical linear-counting and large-range branches.
    "hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u
        |  FROM events),
        |r AS (
        |  SELECT event_type, u // 1048576 AS bucket,
        |    max(CASE WHEN u % 1048576 = 0 THEN 21
        |        ELSE 20 - (length(format('{:b}', u % 1048576)) - 1) END) AS mx
        |  FROM h GROUP BY 1, 2),
        |regs AS (
        |  SELECT et.event_type, g.j, COALESCE(r.mx, 0) AS reg
        |  FROM (SELECT DISTINCT event_type FROM events) et
        |  CROSS JOIN (SELECT unnest(range(0, 4096)) AS j) g
        |  LEFT JOIN r ON r.event_type = et.event_type AND r.bucket = g.j),
        |s AS (
        |  SELECT event_type,
        |    list_reduce(list(power(2.0, -reg) ORDER BY j), (a, b) -> a + b) AS ssum,
        |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT event_type, zeros,
        |    (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 / ssum AS raw
        |  FROM s)
        |SELECT e.event_type,
        |  round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
        |             THEN 4096 * ln(4096.0 / zeros)
        |             WHEN raw <= 4294967296.0 / 30.0 THEN raw
        |             ELSE -4294967296.0 * ln(1 - raw / 4294967296.0) END, 4) AS hll,
        |  nd.nd
        |FROM est e JOIN (SELECT event_type, count(DISTINCT user_id) AS nd
        |                 FROM events GROUP BY 1) nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // KMV distinct: distinct md5-u32 hashes ranked ascending; fewer
    // than k ⇒ exact count, else (k−1)·2³²/h_(k) with h_(k) read at
    // rank 64. Hash collisions (two users, one u32) are part of the
    // contract: both engines see the identical collapsed set.
    "kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u
        |  FROM events),
        |rk AS (
        |  SELECT event_type, u,
        |    row_number() OVER (PARTITION BY event_type ORDER BY u) AS r
        |  FROM h),
        |agg AS (
        |  SELECT event_type, count(*) AS n,
        |    max(CASE WHEN r <= 64 THEN u END) AS kth
        |  FROM rk GROUP BY 1)
        |SELECT a.event_type,
        |  round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
        |             ELSE (64 - 1) * 4294967296.0 / kth END, 4) AS kmv,
        |  nd.nd
        |FROM agg a JOIN (SELECT event_type, count(DISTINCT user_id) AS nd
        |                 FROM events GROUP BY 1) nd USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // coincidence estimator replayed: per-type bottom-64 hash lists,
    // per-pair union ranked, |U_k ∩ A ∩ B| / |U_k|
    "kmv_overlap" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u
        |  FROM events),
        |sk AS (
        |  SELECT event_type, u FROM (
        |    SELECT event_type, u,
        |      row_number() OVER (PARTITION BY event_type ORDER BY u) AS r
        |    FROM h) WHERE r <= 64),
        |pairs AS (
        |  SELECT DISTINCT a.event_type AS et_a, b.event_type AS et_b
        |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
        |uni AS (
        |  SELECT p.et_a, p.et_b, s.u,
        |    max(CASE WHEN s.event_type = p.et_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.event_type = p.et_b THEN 1 ELSE 0 END) AS in_b
        |  FROM pairs p JOIN sk s ON s.event_type IN (p.et_a, p.et_b)
        |  GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT et_a, et_b, in_a, in_b,
        |    row_number() OVER (PARTITION BY et_a, et_b ORDER BY u) AS r,
        |    count(*) OVER (PARTITION BY et_a, et_b) AS nu
        |  FROM uni)
        |SELECT et_a, et_b,
        |  round(CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / min(least(nu, 64)), 4) AS jac
        |FROM ranked WHERE r <= 64 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // merge path ≡ direct path: same estimator SQL, no day modeling —
    // the gate's PROOF is that daily-snapshot max-merge reproduces it
    "hll_merge" ->
      """WITH h AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(range(1, 9), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), CAST(i AS INTEGER), 1)) - 1
        |        AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS u
        |  FROM events),
        |r AS (
        |  SELECT event_type, u // 1048576 AS bucket,
        |    max(CASE WHEN u % 1048576 = 0 THEN 21
        |        ELSE 20 - (length(format('{:b}', u % 1048576)) - 1) END) AS mx
        |  FROM h GROUP BY 1, 2),
        |regs AS (
        |  SELECT et.event_type, g.j, COALESCE(r.mx, 0) AS reg
        |  FROM (SELECT DISTINCT event_type FROM events) et
        |  CROSS JOIN (SELECT unnest(range(0, 4096)) AS j) g
        |  LEFT JOIN r ON r.event_type = et.event_type AND r.bucket = g.j),
        |s AS (
        |  SELECT event_type,
        |    list_reduce(list(power(2.0, -reg) ORDER BY j), (a, b) -> a + b) AS ssum,
        |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT event_type, zeros,
        |    (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 / ssum AS raw
        |  FROM s)
        |SELECT event_type,
        |  round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
        |             THEN 4096 * ln(4096.0 / zeros)
        |             WHEN raw <= 4294967296.0 / 30.0 THEN raw
        |             ELSE -4294967296.0 * ln(1 - raw / 4294967296.0) END, 4) AS hll
        |FROM est ORDER BY event_type""".stripMargin
  )
}
