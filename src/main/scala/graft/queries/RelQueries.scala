package graft.queries

import graft.dsl.FluxFrame
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operators (SURVEY.md §2B joins/set-ops/pivot + histogram)
  * and the Flux scalar function packages (math/strings/date/conversion)
  * exercised through SQL-mirrorable queries.
  *
  * Scale notes: the star join broadcasts only the fixed-size dimension
  * (nation, 25 rows at any SF) — customer/orders scale with data volume
  * and go through shuffle joins that AQE can re-plan; the histogram
  * broadcasts the bin table (always tiny).
  */
object RelQueries {
  import QueryUtil._

  def nation(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nation.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def region(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/region.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Star join: revenue per nation (lineitem ⋈ orders ⋈ customer ⋈
    // broadcast(nation)); Flux join(on:) is an equi-join like this.
    "join_revenue" -> ((s, dir) =>
      lineitem(s, dir)
        .join(orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")),

    // Salted skew join: the same lineitem ⋈ orders revenue rollup,
    // routed through SkewOps.saltedJoin (8-way fan-out) — results must
    // be EXACTLY the plain join's, which is what the plain-SQL oracle
    // pins. The salting mechanics (hot-key spread) are spec-asserted.
    "salted_join" -> ((s, dir) =>
      graft.operators.SkewOps.saltedJoin(
        lineitem(s, dir), orders(s, dir),
        col("l_orderkey"), col("o_orderkey"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")),

    // Bucketed co-located fact-fact join (LayoutOps.writeBucketed):
    // both sides hash-clustered on the order key at write time, so
    // the join itself needs NO Exchange — the shuffle is paid once at
    // write, not per query (the dominant saving for repeated
    // fact-fact joins at 100 TB). BucketedJoinSpec pins the
    // Exchange-free SortMergeJoin plan (broadcast disabled); this
    // gate pins that the bucketed round-trip loses no rows — at gate
    // SF the small side may legally auto-broadcast, which changes the
    // plan, never the result.
    "bucketed_join" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft-buckets").toString
      graft.llmops.LayoutOps.writeBucketed(
        lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
        "graft_bkt_lineitem", s"$base/lineitem", "l_orderkey", 8)
      graft.llmops.LayoutOps.writeBucketed(
        orders(s, dir).select("o_orderkey", "o_orderpriority"),
        "graft_bkt_orders", s"$base/orders", "o_orderkey", 8)
      s.table("graft_bkt_lineitem")
        .join(s.table("graft_bkt_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    // Bloom-prefiltered selective join (SkewOps.bloomFilteredJoin):
    // urgent orders are ~20% of the build side, so 4/5 of lineitem
    // rows would shuffle only to be dropped — the build-side key
    // bloom (broadcast KBs) drops them BEFORE the exchange. False
    // positives just ride the shuffle and lose at the merge: results
    // are exactly the plain join's, which is what this gate pins.
    "bloom_join" -> ((s, dir) =>
      graft.operators.SkewOps.bloomFilteredJoin(
        lineitem(s, dir),
        orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey"), col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")),

    // Binned range join (RangeJoin.binnedRangeJoin): lineitems shipped
    // within 3 days of ANY urgent order's placement — a pure interval
    // predicate with NO equi-key, which the planner alone could only
    // run as a cartesian (CI-banned). Day-wide bins turn it into one
    // hash equi-join + exact post-filter; the oracle runs DuckDB's
    // native range join over the same predicate.
    "range_join" -> ((s, dir) => {
      val dayUs = 86400L * 1000000L
      val li = lineitem(s, dir)
        .select(col("l_shipdate"), col("l_returnflag"), col("l_quantity"))
      // The interval predicate only sees o_orderdate, and urgent orders
      // share ~2.4k DISTINCT dates — so collapse the interval side to
      // (date, multiplicity) BEFORE binning. The exploded bin table is
      // then broadcast-sized (~7k rows): the join broadcasts instead of
      // shuffling every lineitem through a low-cardinality bin key, and
      // candidate rows drop ~12× (one per distinct date, not per order).
      // Weighting n and qty by m is algebraically the expanded join.
      val ord = orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderdate")).agg(count(lit(1)).as("m"))
      graft.operators.RangeJoin.binnedRangeJoin(
        li, broadcast(ord),
        unix_micros(col("l_shipdate").cast("timestamp")),
        unix_micros(col("o_orderdate").cast("timestamp")),
        unix_micros(col("o_orderdate").cast("timestamp")) + lit(3L * dayUs),
        dayUs)
        .groupBy(col("l_returnflag"))
        // quantity, not extendedprice: at this join's fan-out a 3.8e9
        // price sum accumulates order-dependent noise past the 4th
        // decimal; quantity sums stay ~1e6 where round(,4) is stable
        .agg(sum(col("m")).as("n"), r4(sum(col("l_quantity") * col("m"))).as("qty"))
        .orderBy("l_returnflag")
    }),

    // union(): schema-merged bag union (missing columns null-filled).
    "union_merge" -> ((s, dir) => {
      val clicks = ev(s, dir).where(col("event_type") === "click").keep("event_id", "value", "event_type")
      val buys = ev(s, dir).where(col("event_type") === "purchase").keep("event_id", "value", "event_type", "user_id")
      clicks.union(buys)
        .group("event_type")
        .agg(count(lit(1)).as("n"), count(col("user_id")).as("n_with_user"),
          r4(sum(col("value"))).as("sum_v"))
        .orderBy("event_type")
    }),

    // pivot(): long→wide, one column per event_type (deterministic: the
    // pivot input is pre-aggregated to one row per cell).
    "pivot_wide" -> ((s, dir) => {
      // max: order-independent cell aggregate (an avg's float summation
      // order differs between engines and can straddle a rounding
      // boundary).
      val pre = ev(s, dir)
        .group("user_id", "event_type")
        .agg(r4(max(col("value"))).as("avg_v"))
      FluxFrame(pre, Seq("user_id"), "user_id", "avg_v")
        .pivot(Seq("user_id"), "event_type", Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("user_id")
    }),

    // histogram(bins:): cumulative counts per upper bound per group.
    "histogram" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type")
        .histogram(Seq(20.0, 40.0, 60.0, 80.0, 100.0), countCol = "n")
        .orderBy("event_type", "le")),

    // histogramQuantile(0.5): inverse interpolation over the cumulative
    // histogram (chained off histogram(), like Flux pipes them).
    "hist_quantile" -> ((s, dir) => {
      val hist = ev(s, dir)
        .group("event_type")
        .histogram(Seq(20.0, 40.0, 60.0, 80.0, 100.0), countCol = "hn")
      FluxFrame(hist, Seq("event_type"), "le", "hn")
        .histogramQuantile(0.5, countCol = "hn", as = "q50")
        .select(col("event_type"), r4(col("q50")).as("q50"))
        .orderBy("event_type")
    }),

    // math package: abs/sqrt/pow/ln/floor/ceil over value.
    "scalar_math" -> ((s, dir) =>
      ev(s, dir)
        .group("event_type")
        .agg(
          r4(sum(sqrt(abs(col("value"))))).as("sum_sqrt"),
          r4(max(pow(col("value"), 2))).as("max_sq"),
          r4(avg(log(col("value") + 1))).as("avg_ln"),
          sum(floor(col("value"))).as("sum_floor"),
          sum(ceil(col("value"))).as("sum_ceil"))
        .orderBy("event_type")),

    // strings package: concat/upper/substring/length/startswith + regexp
    // extract (user_id is numeric in the testdata, so build a string id).
    "scalar_string" -> ((s, dir) =>
      ev(s, dir)
        .withCol("uid", concat(lit("user_"), col("user_id").cast("string")))
        .withCol("uid_num", regexp_extract(col("uid"), "([0-9]+)$", 1).cast("long"))
        .group("event_type")
        .agg(
          count(when(col("uid").startsWith("user_1"), 1)).as("n_u1"),
          max(upper(substring(col("uid"), 1, 6))).as("max_pfx"),
          sum(length(col("props"))).as("sum_len"),
          max(col("uid_num")).as("max_uid"),
          count_distinct(col("uid_num") % 7).as("nd_mod"))
        .orderBy("event_type")),

    // date package: isodow/month/hour extraction buckets.
    "scalar_date" -> ((s, dir) =>
      ev(s, dir)
        .withCol("dow", weekday(col("ts")) + 1) // ISO: Mon=1..Sun=7
        .group("dow")
        .agg(count(lit(1)).as("n"), r4(avg(col("value"))).as("avg_v"),
          count_distinct(hour(col("ts"))).as("nd_hour"))
        .orderBy("dow")),

    // type conversion package: toInt (truncating)/toString/toBool.
    "conv_types" -> ((s, dir) =>
      ev(s, dir)
        .withCol("vi", col("value").cast("long"))
        .withCol("b", col("vi") % 10)
        .group("b")
        .agg(count(lit(1)).as("n"), sum(col("vi")).as("sum_vi"),
          max(col("b").cast("string")).as("bs"),
          count(when((col("value") > 50).cast("boolean"), 1)).as("n_true"))
        .orderBy("b")),

    // Multi-granularity ROLLUP: (source, lang), (source), () levels in
    // ONE aggregation pass — grouping-set expansion happens map-side,
    // so the corpus scans once where three separate GROUP BYs would
    // scan (and shuffle) three times. The dashboard drill-down shape.
    "rollup_stats" -> ((s, dir) =>
      documents(s, dir)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("source", "lang")),

    // CUBE over (event_type, value-decile bucket): all four grouping
    // sets from one scan; long-typed measures keep the gate integer-
    // exact at every level including the grand total.
    "cube_stats" -> ((s, dir) =>
      ev(s, dir)
        .withCol("vb", (col("value").cast("long") / 10L).cast("long"))
        .toDF
        .cube(col("event_type"), col("vb"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("long")).as("sum_vi"))
        .orderBy("event_type", "vb")),

    // Explicit GROUPING SETS — a non-hierarchical pair of levels
    // ((source, lang), (lang)) that neither ROLLUP nor CUBE expresses:
    // the per-source×lang detail plus a per-lang total, still one scan
    // and one Expand-tagged aggregate.
    // TPC-H Q3 shape: top-10 unshipped BUILDING orders by revenue —
    // two selective fact filters meet in one shuffle join, the
    // filtered customer dim broadcasts, and the top-10 ranks on the
    // integer-cents surrogate (an FP revenue sort could flip order
    // across engines in the last bit).
    "q3_shipping" -> ((s, dir) => {
      val c = customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = orders(s, dir)
        .where(col("o_orderdate") < lit("1996-03-15").cast("timestamp"))
      val l = lineitem(s, dir)
        .where(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          * 100).cast("long").as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          (col("rev_cents").cast("double") / 100.0).as("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
    }),

    // TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    // quarter — fact⋈fact shuffle join under two selective filters,
    // customer + nation dims broadcast, integer-cents top-N.
    "q10_returns" -> ((s, dir) => {
      val o = orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = lineitem(s, dir).where(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          * 100).cast("long").as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"),
          (col("rev_cents").cast("double") / 100.0).as("revenue"),
          col("c_name"), col("c_acctbal"), col("n_name"))
    }),

    // TPC-H Q5 shape: ASIA local-supplier revenue — the 6-way join
    // with the c_nationkey = s_nationkey correlation; small dims
    // broadcast, facts meet in two shuffle joins.
    "q5_region" -> ((s, dir) => {
      val o = orders(s, dir)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, dir).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    "grouping_sets" -> ((s, dir) =>
      documents(s, dir)
        .groupingSets(Seq(Seq(col("source"), col("lang")), Seq(col("lang"))),
          col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("source", "lang"))
  )

  private def w(s: String) = s.stripMargin

  val oracle: Map[String, String] = Map(
    // the salted join must be indistinguishable from the plain join
    "salted_join" -> w(
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1"""),
    // DuckDB's native range join over the identical interval predicate
    "range_join" -> w(
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity), 4) AS qty
        |FROM lineitem JOIN orders
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 3 DAY
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1"""),
    // plain filtered join: the bloom prefilter must be invisible
    "bloom_join" -> w(
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1"""),
    // plain join: the bucketed layout must be invisible to results
    "bucketed_join" -> w(
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1"""),
    "join_revenue" -> w(
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1"""),
    "union_merge" -> w(
      """WITH u AS (
        |  SELECT event_id, value, event_type, NULL AS user_id FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, value, event_type, user_id FROM events WHERE event_type = 'purchase'
        |)
        |SELECT event_type, count(*) AS n, count(user_id) AS n_with_user,
        |  round(sum(value), 4) AS sum_v
        |FROM u GROUP BY 1 ORDER BY 1"""),
    "pivot_wide" -> w(
      """SELECT user_id,
        |  round(max(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
        |  round(max(CASE WHEN event_type = 'error' THEN value END), 4) AS error,
        |  round(max(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
        |  round(max(CASE WHEN event_type = 'signup' THEN value END), 4) AS signup,
        |  round(max(CASE WHEN event_type = 'view' THEN value END), 4) AS view
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "histogram" -> w(
      """SELECT event_type, le, count(*) AS n
        |FROM events CROSS JOIN (VALUES (20.0), (40.0), (60.0), (80.0), (100.0)) b(le)
        |WHERE value <= le GROUP BY 1, 2 ORDER BY 1, 2"""),
    "hist_quantile" -> w(
      """WITH hist AS (
        |  SELECT event_type, le, count(*) AS hn
        |  FROM events CROSS JOIN (VALUES (20.0), (40.0), (60.0), (80.0), (100.0)) b(le)
        |  WHERE value <= le GROUP BY 1, 2
        |), staged AS (
        |  SELECT event_type, le, hn,
        |    max(hn) OVER (PARTITION BY event_type) AS tot,
        |    coalesce(lag(hn) OVER w, 0) AS pc,
        |    coalesce(lag(le) OVER w, 0) AS ple
        |  FROM hist WINDOW w AS (PARTITION BY event_type ORDER BY le)
        |)
        |SELECT event_type,
        |  round(ple + (le - ple) * (tot * 0.5 - pc) / (hn - pc), 4) AS q50
        |FROM staged WHERE hn >= tot * 0.5 AND pc < tot * 0.5 ORDER BY 1"""),
    "scalar_math" -> w(
      """SELECT event_type,
        |  round(sum(sqrt(abs(value))), 4) AS sum_sqrt,
        |  round(max(pow(value, 2)), 4) AS max_sq,
        |  round(avg(ln(value + 1)), 4) AS avg_ln,
        |  CAST(sum(floor(value)) AS BIGINT) AS sum_floor,
        |  CAST(sum(ceil(value)) AS BIGINT) AS sum_ceil
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "scalar_string" -> w(
      """SELECT event_type,
        |  count(CASE WHEN starts_with(uid, 'user_1') THEN 1 END) AS n_u1,
        |  max(upper(substring(uid, 1, 6))) AS max_pfx,
        |  CAST(sum(length(props)) AS BIGINT) AS sum_len,
        |  max(CAST(regexp_extract(uid, '([0-9]+)$', 1) AS BIGINT)) AS max_uid,
        |  count(DISTINCT CAST(regexp_extract(uid, '([0-9]+)$', 1) AS BIGINT) % 7) AS nd_mod
        |FROM (SELECT *, 'user_' || CAST(user_id AS VARCHAR) AS uid FROM events)
        |GROUP BY 1 ORDER BY 1"""),
    "scalar_date" -> w(
      """SELECT isodow(ts) AS dow, count(*) AS n, round(avg(value), 4) AS avg_v,
        |  count(DISTINCT hour(ts)) AS nd_hour
        |FROM events GROUP BY 1 ORDER BY 1"""),
    "conv_types" -> w(
      """SELECT CAST(trunc(value) AS BIGINT) % 10 AS b, count(*) AS n,
        |  CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS sum_vi,
        |  max(CAST(CAST(trunc(value) AS BIGINT) % 10 AS VARCHAR)) AS bs,
        |  count(CASE WHEN value > 50 THEN 1 END) AS n_true
        |FROM events GROUP BY 1 ORDER BY 1"""),
    // grouping-set levels must agree row-for-row, NULL markers included
    "rollup_stats" -> w(
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ROLLUP (source, lang) ORDER BY 1, 2"""),
    // value buckets via trunc (Spark's long cast truncates, DuckDB's
    // rounds); // is floor division, == trunc for the positive values
    "cube_stats" -> w(
      """SELECT event_type, CAST(trunc(value) AS BIGINT) // 10 AS vb,
        |  count(*) AS n,
        |  CAST(sum(CAST(trunc(value) AS BIGINT)) AS BIGINT) AS sum_vi
        |FROM events GROUP BY CUBE (event_type, vb) ORDER BY 1, 2"""),
    "q3_shipping" -> w(
      """WITH g AS (
        |  SELECT l_orderkey, o_orderdate, o_orderpriority,
        |    CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
        |      AS BIGINT) AS rev_cents
        |  FROM customer, orders, lineitem
        |  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |    AND l_orderkey = o_orderkey
        |    AND o_orderdate < TIMESTAMP '1996-03-15'
        |    AND l_shipdate > TIMESTAMP '1996-03-15'
        |  GROUP BY 1, 2, 3)
        |SELECT l_orderkey, CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM g ORDER BY rev_cents DESC, o_orderdate, l_orderkey LIMIT 10"""),

    "q10_returns" -> w(
      """WITH g AS (
        |  SELECT c_custkey, c_name, c_acctbal, n_name,
        |    CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
        |      AS BIGINT) AS rev_cents
        |  FROM customer, orders, lineitem, nation
        |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |    AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1, 2, 3, 4)
        |SELECT c_custkey, CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
        |  c_name, c_acctbal, n_name
        |FROM g ORDER BY rev_cents DESC, c_custkey LIMIT 20"""),

    "q5_region" -> w(
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1"""),

    "grouping_sets" -> w(
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY GROUPING SETS ((source, lang), (lang))
        |ORDER BY 1, 2""")
  )
}
