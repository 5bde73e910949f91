package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.TextOps
import graft.operators.{DataQualityOps, SegmentOps}

/** Segmentation / experimentation / data-quality gates: RFM scoring,
  * market-basket association rules, the Welch two-sample t-test, the
  * Deequ-style column profiler + constraint suite, Flesch readability,
  * and the unpivot (melt) reshape.
  *
  * Oracle discipline: every ranking key is integer-exact (days, counts,
  * cents), every FP division/sqrt is written with the same expression
  * shape on both sides, and squares are multiplications (pow() may
  * differ in the last bit between engines).
  */
object AnalyticsQueries {
  import QueryUtil._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RFM segmentation of the order file: quintile scores per dimension
    // on integer-exact sort keys, 1 = best.
    "rfm_segments" -> ((s, dir) =>
      SegmentOps.rfm(orders(s, dir), "o_orderdate", "o_custkey",
          "o_totalprice", tiles = 5)
        .select(col("custkey"), col("recency_days"), col("frequency"),
          (col("monetary_cents").cast("double") / 100.0).as("monetary"),
          col("r_score").cast("long").as("r_score"),
          col("f_score").cast("long").as("f_score"),
          col("m_score").cast("long").as("m_score"),
          col("segment"))
        .orderBy("custkey")),

    // Association rules over (user, day) event-type baskets:
    // support / confidence both ways / lift, at >= 20 co-occurrences.
    "basket_rules" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        to_date(col("ts")).as("day"), col("event_type"))
      SegmentOps.basketRules(e, Seq("user_id", "day"), "event_type",
          minPairSupport = 20L)
        .select(col("item_a"), col("item_b"), col("supp_ab"),
          col("supp_a"), col("supp_b"),
          r4(col("conf_a_b")).as("conf_a_b"),
          r4(col("conf_b_a")).as("conf_b_a"),
          r4(col("lift")).as("lift"))
        .orderBy("item_a", "item_b")
    }),

    // A/B experiment readout: purchase value by user-id parity arms,
    // Welch t statistic + Satterthwaite df from sufficient statistics.
    "ab_welch" -> ((s, dir) => {
      val e = events(s, dir).where(col("event_type") === "purchase")
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      SegmentOps.welchT(e, col("arm"), col("value"))
        .select(col("n_a"), r4(col("mean_a")).as("mean_a"),
          r4(col("var_a")).as("var_a"),
          col("n_b"), r4(col("mean_b")).as("mean_b"),
          r4(col("var_b")).as("var_b"),
          r4(col("t_stat")).as("t_stat"),
          r4(col("welch_df")).as("welch_df"))
    }),

    // Conversion-rate A/B readout: two-proportion pooled z-test on
    // user-parity arms (converted = a purchase above 90 — a plain
    // purchase is universal in this corpus, p = 1 both arms).
    "ab_proportion" -> ((s, dir) => {
      val e = events(s, dir).withColumn("arm", pmod(col("user_id"), lit(2L)))
      graft.operators.SegmentOps.proportionZ(e, col("arm"), col("user_id"),
          col("event_type") === "purchase" && col("value") > 90)
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          r4(col("p_a")).as("p_a"), r4(col("p_b")).as("p_b"),
          r4(col("z")).as("z"))
    }),

    // Shuffle-planning skew diagnostics for the two natural event
    // keys: does user_id (high-card) or event_type (5 values) need
    // salting before a 1000-executor shuffle.
    "key_skew" -> ((s, dir) =>
      graft.operators.SkewOps.keySkewProfile(events(s, dir), "user_id")
        .unionByName(
          graft.operators.SkewOps.keySkewProfile(events(s, dir), "event_type"))
        .select(col("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"), r4(col("max_share")).as("max_share"),
          r4(col("entropy")).as("entropy"),
          r4(col("max_entropy")).as("max_entropy"))
        .orderBy("key_col")),

    // Single-pass column profiler over orders: completeness +
    // distinctness per column, min/max/mean for the numeric.
    "dq_profile" -> ((s, dir) =>
      DataQualityOps.profile(orders(s, dir), Seq("o_totalprice"))
        .orderBy("col_name", "metric")),

    // Constraint suite: key uniqueness, non-negativity, referential
    // containment, value-set membership, stream non-null.
    "dq_checks" -> ((s, dir) => {
      val o = orders(s, dir)
      DataQualityOps.runChecks(Seq(
          DataQualityOps.uniqueCheck(o, "o_orderkey"),
          DataQualityOps.satisfiesCheck(o, "nonneg_totalprice",
            col("o_totalprice") >= 0),
          DataQualityOps.containedInCheck(o, "o_custkey",
            customer(s, dir), "c_custkey"),
          DataQualityOps.inSetCheck(o, "o_orderstatus", Seq("O", "F", "P")),
          DataQualityOps.satisfiesCheck(events(s, dir), "value_not_null",
            col("value").isNotNull)))
        .orderBy("check_name")
    }),

    // Flesch reading ease per document from three compiled regex counts.
    "readability" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("words"),
          greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
            .cast("long").as("sentences"),
          regexp_count(lower(col("text")), lit("[aeiouy]+"))
            .cast("long").as("syllables"),
          r4(TextOps.fleschScore(col("text"))).as("flesch"))
        .orderBy("doc_id")),

    // Kaplan–Meier survival of SESSION durations (minutes) with
    // right-censoring: a session whose 6h inactivity gap hasn't
    // elapsed at the corpus end may still be running — it leaves the
    // risk set without counting as a death. (User lifetimes don't
    // churn in this corpus — every user stays active to the end — so
    // the session axis is where the censoring machinery is real.)
    // Risk sets and the product-limit curve run as triangular
    // self-joins on the duration domain, no global windows.
    "km_survival" -> ((s, dir) => {
      val gapUs = 21600000000L // 6h
      val e = events(s, dir).withColumn("tus", expr("ts_ns div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("tus", "event_id")
      val flagged = e
        .withColumn("ns",
          when(col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("ns")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      // materialized (r18): sess is consumed three times (the max-end
      // aggregate, then kaplanMeier's deaths and at-risk aggregates
      // each re-derive lt) — without the cut the two-window
      // sessionization above ran 3× per query. The frame is
      // session-cardinality (three longs per session).
      val sess = flagged.groupBy("user_id", "sid")
        .agg(expr("(max(tus) - min(tus)) div 60000000").as("t"),
          max(col("tus")).as("en"))
        .localCheckpoint()
      val mx = sess.agg(max(col("en")).as("mx"))
      val lt = sess.crossJoin(broadcast(mx))
        .select(col("t"), ((col("mx") - col("en")) >= gapUs).as("death"))
      graft.operators.SurvivalOps.kaplanMeier(lt, "t", "death")
        .select(col("t"), col("n_risk"), col("d"), r4(col("s")).as("s"))
        .orderBy("t")
    }),

    // Chi-square independence profile: event type × epoch-day-of-week
    // contingency cells with expected counts and per-cell (o−e)²/e —
    // per-cell output, so no cross-cell float sums ride in the gate.
    "chi_square" -> ((s, dir) =>
      graft.operators.StatTests.chiSquare(
        events(s, dir).withColumn("dow",
          expr("(ts_ns div 86400000000000) % 7")),
        col("event_type"), col("dow"))
        .select(col("rowv"), col("colv"), col("n_obs"),
          r4(col("expected")).as("expected"), r4(col("contrib")).as("contrib"))
        .orderBy("rowv", "colv")),

    // Mann-Whitney U with exact midranks and tie-corrected z — the
    // nonparametric location test beside ab_welch; ranks come from the
    // bucketed globalRank, never a global window.
    "mwu_values" -> ((s, dir) =>
      graft.operators.StatTests.mannWhitneyU(
        events(s, dir)
          .where(col("event_type").isin("click", "view"))
          .withColumn("cents", round(col("value") * 100).cast("long")),
        col("event_type") === "click", col("cents"), "event_id")
        .select(col("n_a"), col("n_b"), r4(col("u_a")).as("u_a"),
          r4(col("z")).as("z"))),

    // Two-sample KS distance between the same arms: empirical CDFs
    // from exact cumulative integer counts (bucket offsets +
    // partitioned running sums — the globalRank prefix machinery).
    "ks_test" -> ((s, dir) =>
      graft.operators.StatTests.ksTest(
        events(s, dir)
          .where(col("event_type").isin("click", "view"))
          .withColumn("cents", round(col("value") * 100).cast("long")),
        col("event_type") === "click", col("cents"))
        .select(col("n_a"), col("n_b"), r4(col("d")).as("d"))),

    // Spearman rank correlation (order value vs order date): exact
    // globalRank midranks on both axes, Pearson-on-ranks from exact
    // integer moment sums — the monotonic-association companion of
    // cov_corr's linear Pearson.
    "spearman_corr" -> ((s, dir) =>
      graft.operators.StatTests.spearman(
        orders(s, dir)
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .withColumn("od",
            expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")),
        col("cents"), col("od"), "o_orderkey")
        .select(col("n"), r4(col("rho")).as("rho"))),

    // Benford first-digit screen on order amounts: observed counts vs
    // n·log10(1+1/d) with per-digit chi-square contributions.
    "benford_check" -> ((s, dir) =>
      graft.operators.DataQualityOps
        .benfordProfile(orders(s, dir), col("o_totalprice"))
        .select(col("digit"), col("n_obs"),
          r4(col("expected")).as("expected"), r4(col("contrib")).as("contrib"))
        .orderBy("digit")),

    // Gini concentration of lifetime spend across customers, on the
    // distributed exact rank (the globalRank primitive reused).
    "gini_spend" -> ((s, dir) => {
      val pc = orders(s, dir).groupBy(col("o_custkey").as("k"))
        .agg(round(sum(col("o_totalprice")) * 100).cast("long").as("cents"))
      graft.operators.SegmentOps.gini(pc, col("cents"), "k")
        .select(col("n"), r4(col("gini")).as("gini"))
    }),

    // k-anonymity / l-diversity profile of the customer table under
    // (nation, segment) quasi-identifiers with a generalized acctbal
    // bucket as the sensitive attribute — the re-identification screen
    // before a person-adjacent table ships.
    "k_anonymity" -> ((s, dir) => {
      val c = customer(s, dir).withColumn("ab_bucket",
        graft.operators.PrivacyOps.generalizeNum(col("c_acctbal"), 1000L))
      graft.operators.PrivacyOps
        .kAnonymity(c, Seq("c_nationkey", "c_mktsegment"), "ab_bucket", 5L)
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          col("k"), col("l"), col("suppress"))
        .orderBy("nation", "segment")
    }),

    // Release-level anonymity summary: worst-case k and l plus the row
    // cost of suppressing sub-threshold groups.
    "anon_summary" -> ((s, dir) => {
      val c = customer(s, dir).withColumn("ab_bucket",
        graft.operators.PrivacyOps.generalizeNum(col("c_acctbal"), 1000L))
      graft.operators.PrivacyOps.anonymitySummary(
        graft.operators.PrivacyOps
          .kAnonymity(c, Seq("c_nationkey", "c_mktsegment"), "ab_bucket", 5L))
    }),

    // CDC changeset apply (MERGE semantics): updates bump acctbal,
    // deletes drop rows (keys disjoint from updates), inserts add
    // shifted keys — the snapshot-maintenance op behind every
    // incremental dimension load.
    "cdc_merge" -> ((s, dir) => {
      val base = customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
      val upd = base.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100.0).as("c_acctbal"))
        .withColumn("op", lit("U"))
      val del = base
        .where(col("c_custkey") % 17 === 0 && col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .withColumn("op", lit("D"))
      val ins = base.where(col("c_custkey") % 23 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("NEW "), col("c_name")).as("c_name"),
          lit(0.0).as("c_acctbal"))
        .withColumn("op", lit("I"))
      val changes = upd.unionByName(del).unionByName(ins)
      graft.operators.CdcOps
        .applyChanges(base, changes, Seq("c_custkey"), "op")
        .orderBy("c_custkey")
    }),

    // Incremental view maintenance: the per-priority (count, cents)
    // revenue view patched with the cdc_merge changeset as DELTAS
    // (before-images negative, after-images positive, changeset-sized
    // aggregation + one view-sized patch join) — and the gate proves
    // the maintained view equals a full recompute over the merged
    // table, bit-exact on the integer measures.
    "view_maintain" -> ((s, dir) => {
      val o = orders(s, dir).select(col("o_orderkey").as("k"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val baseView = o.groupBy("prio")
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("cents"))
      val before = o.where(col("k") % 10 === 0 ||
        (col("k") % 17 === 0 && col("k") % 10 =!= 0))
      val afterU = orders(s, dir).where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderpriority").as("prio"),
          round((col("o_totalprice") + 100.0) * 100).cast("long").as("cents"))
      val ins = orders(s, dir).where(col("o_orderkey") % 23 === 0)
        .select(col("o_orderpriority").as("prio"), lit(0L).as("cents"))
      val after = afterU.unionByName(ins)
      graft.operators.CdcOps.incrementalAgg(baseView,
          before.select("prio", "cents"), after, Seq("prio"), "n", Seq("cents"))
        .select(col("prio"), col("n"), col("cents"),
          (col("cents").cast("double") / 100.0).as("revenue"))
        .orderBy("prio")
    }),

    // SCD type-2 intervals: each user's daily activity-level runs
    // (count div 5) as [valid_from, valid_to) versions, NULL = current.
    "scd2_intervals" -> ((s, dir) => {
      val d = events(s, dir).where(col("user_id") < 500)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("day"), expr("n div 5").as("attr"))
      graft.operators.CdcOps.scd2(d, Seq("user_id"), "day", "attr")
        .select(col("user_id"), col("version"), col("attr"),
          // timestamps, not dates: parquet DATE lands as python objects
          // in the driver compare while DuckDB dates land as datetime64
          col("valid_from").cast("timestamp").as("valid_from"),
          col("valid_to").cast("timestamp").as("valid_to"))
        .orderBy("user_id", "version")
    }),

    // Unpivot (melt): the four lineitem measures to long format for an
    // early-1995 slice — the inverse of the pivot_wide gate.
    "unpivot_long" -> ((s, dir) =>
      lineitem(s, dir)
        .where(col("l_shipdate") < lit("1995-03-01").cast("timestamp"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric"))
  )

  private def w(s: String) = s.stripMargin

  /** Generated dq_profile oracle: one UNION ALL arm per (column, metric)
    * over the same single-pass aggregates.
    */
  private val dqCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")
  private def dqProfileSql: String = {
    val arms = dqCols.flatMap { c =>
      Seq(
        s"SELECT '$c' AS col_name, 'completeness' AS metric, " +
          s"round(CAST(count($c) AS DOUBLE) / count(*), 4) AS value FROM orders",
        s"SELECT '$c', 'distinctness', " +
          s"round(CAST(count(DISTINCT $c) AS DOUBLE) / count(*), 4) FROM orders")
    } ++ Seq(
      "SELECT 'o_totalprice', 'min', CAST(min(o_totalprice) AS DOUBLE) FROM orders",
      "SELECT 'o_totalprice', 'max', CAST(max(o_totalprice) AS DOUBLE) FROM orders",
      "SELECT 'o_totalprice', 'mean', round(sum(o_totalprice) / count(o_totalprice), 4) FROM orders")
    arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, metric")
  }

  val oracle: Map[String, String] = Map(

    "rfm_segments" -> w(
      """WITH pc AS (
        |  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_order) AS maxd FROM pc),
        |r AS (
        |  SELECT custkey,
        |    CAST(date_diff('day', CAST(last_order AS DATE), CAST(maxd AS DATE)) AS BIGINT) AS recency_days,
        |    frequency, cents
        |  FROM pc, mx),
        |sc AS (
        |  SELECT *,
        |    NTILE(5) OVER (ORDER BY recency_days, custkey) AS r_score,
        |    NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS f_score,
        |    NTILE(5) OVER (ORDER BY cents DESC, custkey) AS m_score
        |  FROM r)
        |SELECT custkey, recency_days, frequency,
        |  CAST(cents AS DOUBLE) / 100.0 AS monetary,
        |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
        |FROM sc ORDER BY custkey"""),

    "basket_rules" -> w(
      """WITH it AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type AS item
        |  FROM events),
        |nb AS (SELECT CAST(count(*) AS DOUBLE) AS n
        |  FROM (SELECT DISTINCT user_id, day FROM it)),
        |supp AS (SELECT item, count(*) AS s FROM it GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS supp_ab
        |  FROM it a JOIN it b ON a.user_id = b.user_id AND a.day = b.day
        |  WHERE a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT item_a, item_b, supp_ab, sa.s AS supp_a, sb.s AS supp_b,
        |  round(CAST(supp_ab AS DOUBLE) / sa.s, 4) AS conf_a_b,
        |  round(CAST(supp_ab AS DOUBLE) / sb.s, 4) AS conf_b_a,
        |  round(CAST(supp_ab AS DOUBLE) * nb.n / (sa.s * sb.s), 4) AS lift
        |FROM pairs
        |JOIN supp sa ON sa.item = pairs.item_a
        |JOIN supp sb ON sb.item = pairs.item_b, nb
        |ORDER BY item_a, item_b"""),

    "ab_welch" -> w(
      """WITH st AS (
        |  SELECT user_id % 2 AS arm, CAST(count(*) AS DOUBLE) AS n,
        |    sum(value) AS s1, sum(value * value) AS s2
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT arm, n, s1 / n AS mean,
        |    (s2 - s1 * s1 / n) / (n - 1) AS variance FROM st),
        |a AS (SELECT n AS n_a, mean AS mean_a, variance AS var_a FROM m WHERE arm = 0),
        |b AS (SELECT n AS n_b, mean AS mean_b, variance AS var_b FROM m WHERE arm = 1)
        |SELECT CAST(n_a AS BIGINT) AS n_a, round(mean_a, 4) AS mean_a,
        |  round(var_a, 4) AS var_a,
        |  CAST(n_b AS BIGINT) AS n_b, round(mean_b, 4) AS mean_b,
        |  round(var_b, 4) AS var_b,
        |  round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat,
        |  round((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
        |    ((var_a / n_a) * (var_a / n_a) / (n_a - 1) +
        |     (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 4) AS welch_df
        |FROM a, b"""),

    "ab_proportion" -> w(
      """WITH st AS (
        |  SELECT user_id % 2 AS arm, count(DISTINCT user_id) AS n,
        |    count(DISTINCT CASE WHEN event_type = 'purchase' AND value > 90
        |      THEN user_id END) AS conv
        |  FROM events GROUP BY 1),
        |a AS (SELECT n AS n_a, conv AS conv_a FROM st WHERE arm = 0),
        |b AS (SELECT n AS n_b, conv AS conv_b FROM st WHERE arm = 1)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(CAST(conv_a AS DOUBLE) / n_a, 4) AS p_a,
        |  round(CAST(conv_b AS DOUBLE) / n_b, 4) AS p_b,
        |  round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
        |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |FROM a, b"""),

    "key_skew" -> w(
      """WITH c1 AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        |c2 AS (SELECT event_type AS k, count(*) AS c FROM events GROUP BY 1),
        |p1 AS (SELECT 'user_id' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
        |    count(*) AS n_keys, CAST(max(c) AS BIGINT) AS max_key_rows,
        |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclogc
        |  FROM c1),
        |p2 AS (SELECT 'event_type', CAST(sum(c) AS BIGINT), count(*),
        |    CAST(max(c) AS BIGINT),
        |    sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
        |  FROM c2)
        |SELECT key_col, n_rows, n_keys, max_key_rows,
        |  round(CAST(max_key_rows AS DOUBLE) / n_rows, 4) AS max_share,
        |  round(ln(CAST(n_rows AS DOUBLE)) - sclogc / n_rows, 4) AS entropy,
        |  round(ln(CAST(n_keys AS DOUBLE)), 4) AS max_entropy
        |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |ORDER BY key_col"""),

    "dq_profile" -> dqProfileSql,

    "dq_checks" -> w(
      """WITH v AS (
        |  SELECT 'unique:o_orderkey' AS check_name,
        |    count(o_orderkey) - count(DISTINCT o_orderkey) AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'satisfies:nonneg_totalprice',
        |    sum(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'contained:o_custkey',
        |    (SELECT count(*) FROM orders o
        |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |       ON o.o_custkey = c.c_custkey
        |     WHERE c.c_custkey IS NULL)
        |  UNION ALL
        |  SELECT 'satisfies:in_set:o_orderstatus',
        |    sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 0 ELSE 1 END)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'satisfies:value_not_null',
        |    sum(CASE WHEN value IS NOT NULL THEN 0 ELSE 1 END)
        |  FROM events)
        |SELECT check_name, CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS passed
        |FROM v ORDER BY check_name"""),

    "readability" -> w(
      """SELECT doc_id,
        |  CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables,
        |  round(206.835
        |    - 1.015 * (CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS DOUBLE)
        |               / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
        |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
        |              / CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS DOUBLE))
        |  , 4) AS flesch
        |FROM documents ORDER BY doc_id"""),

    "km_survival" -> w(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
        |l AS (SELECT user_id, tus, event_id,
        |    CASE WHEN tus - lag(tus) OVER
        |        (PARTITION BY user_id ORDER BY tus, event_id) > 21600000000
        |      THEN 1 ELSE 0 END AS ns
        |  FROM e),
        |sw AS (SELECT user_id, tus,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM l),
        |g AS (SELECT user_id, sid, (max(tus) - min(tus)) // 60000000 AS t,
        |    max(tus) AS en
        |  FROM sw GROUP BY 1, 2),
        |mx AS (SELECT max(en) AS mx FROM g),
        |u AS (SELECT CAST(t AS BIGINT) AS t,
        |    (mx - en) >= 21600000000 AS death
        |  FROM g, mx),
        |dt AS (SELECT t, count(*) AS d FROM u WHERE death GROUP BY 1),
        |at AS (SELECT t, count(*) AS n_at FROM u GROUP BY 1),
        |nr AS (SELECT a.t, CAST(sum(b.n_at) AS BIGINT) AS n_risk
        |  FROM dt a JOIN at b ON b.t >= a.t GROUP BY 1),
        |j AS (SELECT dt.t, CAST(dt.d AS BIGINT) AS d, nr.n_risk
        |  FROM dt JOIN nr ON nr.t = dt.t),
        |km AS (SELECT a.t,
        |    CASE WHEN max(CASE WHEN b.d = b.n_risk THEN 1 ELSE 0 END) = 1
        |      THEN 0.0
        |      ELSE exp(sum(CASE WHEN b.d < b.n_risk
        |        THEN ln(1.0 - CAST(b.d AS DOUBLE) / b.n_risk) END)) END AS s
        |  FROM j a JOIN j b ON b.t <= a.t GROUP BY a.t)
        |SELECT j.t, j.n_risk, j.d, round(km.s, 4) AS s
        |FROM j JOIN km ON km.t = j.t ORDER BY j.t"""),

    "chi_square" -> w(
      """WITH obs AS (
        |  SELECT event_type AS rowv,
        |    (epoch_ns(ts) // 86400000000000) % 7 AS colv,
        |    count(*) AS n_obs
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT rowv, sum(n_obs) AS rt FROM obs GROUP BY 1),
        |cm AS (SELECT colv, sum(n_obs) AS ct FROM obs GROUP BY 1),
        |t AS (SELECT sum(n_obs) AS nt FROM obs),
        |x AS (
        |  SELECT rm.rowv, cm.colv,
        |    CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs,
        |    CAST(rt AS DOUBLE) * ct / nt AS e
        |  FROM rm CROSS JOIN cm CROSS JOIN t
        |  LEFT JOIN obs o ON o.rowv = rm.rowv AND o.colv = cm.colv)
        |SELECT rowv, colv, n_obs, round(e, 4) AS expected,
        |  round((n_obs - e) * (n_obs - e) / e, 4) AS contrib
        |FROM x ORDER BY 1, 2"""),

    "mwu_values" -> w(
      """WITH x AS (
        |  SELECT event_id, event_type = 'click' AS a,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'view')),
        |r AS (SELECT a, v,
        |        row_number() OVER (ORDER BY v, event_id) AS rn FROM x),
        |g AS (SELECT v, count(*) AS t,
        |        sum(CASE WHEN a THEN 1 ELSE 0 END) AS na_v,
        |        min(rn) AS mn, max(rn) AS mx
        |      FROM r GROUP BY 1),
        |s AS (SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
        |        CAST(sum(t - na_v) AS BIGINT) AS n_b,
        |        CAST(sum(na_v * (mn + mx)) AS BIGINT) AS r2a,
        |        CAST(sum(t * t * t - t) AS BIGINT) AS ties3
        |      FROM g)
        |SELECT n_a, n_b,
        |  round(CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0, 4) AS u_a,
        |  round((CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
        |      - CAST(n_a AS DOUBLE) * n_b / 2.0)
        |    / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
        |      * (CAST(n_a + n_b + 1 AS DOUBLE)
        |        - CAST(ties3 AS DOUBLE) / ((n_a + n_b) * (n_a + n_b - 1)))),
        |    4) AS z
        |FROM s"""),

    "ks_test" -> w(
      """WITH x AS (
        |  SELECT event_type = 'click' AS a,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'view')),
        |g AS (SELECT v,
        |        CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |        CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb
        |      FROM x GROUP BY 1),
        |c AS (SELECT v, sum(na) OVER (ORDER BY v) AS ca,
        |        sum(nb) OVER (ORDER BY v) AS cb FROM g),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |        CAST(sum(nb) AS BIGINT) AS tb FROM g)
        |SELECT ta AS n_a, tb AS n_b,
        |  round(max(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)),
        |    4) AS d
        |FROM c, t GROUP BY 1, 2"""),

    "spearman_corr" -> w(
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |    epoch_us(o_orderdate) // 86400000000 AS y
        |  FROM orders),
        |rx AS (SELECT k, x, y,
        |         row_number() OVER (ORDER BY x, k) AS r FROM b),
        |gx AS (SELECT x, min(r) + max(r) AS sx FROM rx GROUP BY 1),
        |ry AS (SELECT rx.k, rx.y, gx.sx,
        |         row_number() OVER (ORDER BY rx.y, rx.k) AS r
        |       FROM rx JOIN gx ON rx.x = gx.x),
        |gy AS (SELECT y, min(r) + max(r) AS sy FROM ry GROUP BY 1),
        |s AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(sx) AS BIGINT) AS tx, CAST(sum(sy) AS BIGINT) AS ty,
        |    sum(CAST(sx AS HUGEINT) * sy) AS txy,
        |    sum(CAST(sx AS HUGEINT) * sx) AS txx,
        |    sum(CAST(sy AS HUGEINT) * sy) AS tyy
        |  FROM ry JOIN gy ON ry.y = gy.y)
        |SELECT n,
        |  round((n * CAST(txy AS DOUBLE) - CAST(tx AS DOUBLE) * ty)
        |    / sqrt((n * CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) * tx)
        |      * (n * CAST(tyy AS DOUBLE) - CAST(ty AS DOUBLE) * ty)),
        |    4) AS rho
        |FROM s"""),

    "benford_check" -> w(
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 1),
        |o AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS DOUBLE) AS n FROM o)
        |SELECT digit, n_obs,
        |  round(n * (ln(1.0 + 1.0 / digit) / ln(10.0)), 4) AS expected,
        |  round((n_obs - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
        |    * (n_obs - n * (ln(1.0 + 1.0 / digit) / ln(10.0)))
        |    / (n * (ln(1.0 + 1.0 / digit) / ln(10.0))), 4) AS contrib
        |FROM o, t ORDER BY digit"""),

    "gini_spend" -> w(
      """WITH pc AS (
        |  SELECT o_custkey AS k,
        |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT k, x, row_number() OVER (ORDER BY x, k) AS rank FROM pc),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(rank * x) AS BIGINT) AS srx FROM r)
        |SELECT n, round(2.0 * srx / (n * sx) - (n + 1.0) / n, 4) AS gini
        |FROM t"""),

    "k_anonymity" -> w(
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  c_mktsegment AS segment, count(*) AS k,
        |  count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT) * 1000)
        |    AS l,
        |  count(*) < 5 AS suppress
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""),

    "anon_summary" -> w(
      """WITH p AS (
        |  SELECT count(*) AS k,
        |    count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT) * 1000)
        |      AS l
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT count(*) AS n_groups, min(k) AS min_k, min(l) AS min_l,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_suppressed,
        |  CAST(sum(k) AS BIGINT) AS rows_total
        |FROM p"""),

    "cdc_merge" -> w(
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |upd AS (SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
        |    'U' AS op FROM base WHERE c_custkey % 10 = 0),
        |del AS (SELECT c_custkey, c_name, c_acctbal, 'D' AS op
        |  FROM base WHERE c_custkey % 17 = 0 AND c_custkey % 10 <> 0),
        |ins AS (SELECT c_custkey + 1000000 AS c_custkey,
        |    'NEW ' || c_name AS c_name, 0.0 AS c_acctbal, 'I' AS op
        |  FROM base WHERE c_custkey % 23 = 0),
        |changes AS (SELECT * FROM upd UNION ALL SELECT * FROM del
        |  UNION ALL SELECT * FROM ins),
        |kept AS (SELECT b.* FROM base b
        |  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM changes))
        |SELECT * FROM kept
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM changes WHERE op <> 'D'
        |ORDER BY c_custkey"""),

    // full recompute over the merged table — the maintained view must
    // land on these exact integers
    "view_maintain" -> w(
      """WITH base AS (SELECT o_orderkey AS k, o_orderpriority AS prio,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_totalprice FROM orders),
        |kept AS (SELECT prio, cents FROM base
        |  WHERE NOT (k % 10 = 0 OR (k % 17 = 0 AND k % 10 <> 0)
        |    OR k % 23 = 0)
        |  UNION ALL
        |  SELECT prio, cents FROM base
        |  WHERE k % 23 = 0 AND NOT (k % 10 = 0 OR (k % 17 = 0 AND k % 10 <> 0))),
        |upd AS (SELECT prio,
        |    CAST(round((o_totalprice + 100.0) * 100) AS BIGINT) AS cents
        |  FROM base WHERE k % 10 = 0),
        |ins AS (SELECT prio, CAST(0 AS BIGINT) AS cents
        |  FROM base WHERE k % 23 = 0),
        |merged AS (SELECT * FROM kept UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT prio, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0 AS revenue
        |FROM merged GROUP BY 1 ORDER BY 1"""),

    "scd2_intervals" -> w(
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) // 5 AS attr
        |  FROM events WHERE user_id < 500 GROUP BY 1, 2),
        |f AS (
        |  SELECT user_id, day, attr,
        |    CASE WHEN lag(attr) OVER
        |        (PARTITION BY user_id ORDER BY day) IS DISTINCT FROM attr
        |      THEN 1 ELSE 0 END AS chg
        |  FROM d),
        |v AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS version
        |  FROM f),
        |g AS (
        |  SELECT user_id, CAST(version AS BIGINT) AS version,
        |    min(attr) AS attr, min(day) AS valid_from
        |  FROM v GROUP BY 1, 2)
        |SELECT user_id, version, attr,
        |  CAST(valid_from AS TIMESTAMP) AS valid_from,
        |  CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |    AS TIMESTAMP) AS valid_to
        |FROM g ORDER BY user_id, version"""),

    "unpivot_long" -> w(
      """WITH src AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    l_quantity, l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-03-01')
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        |ORDER BY l_orderkey, l_linenumber, metric""")
  )
}
