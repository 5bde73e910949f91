package graft.tools

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The CI plan-regression gate (VERDICT r5 item 8): every gate query's
  * plan stays free of global windows and non-broadcast cartesian
  * products, and driver-side collects stay inside the audited
  * allowlist — plus negative tests proving each detector actually
  * fires on a deliberately bad plan.
  */
class PlanGateSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---- negative tests: each detector trips on a bad plan ----

  test("detector: a global window is flagged") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("t", "v")
      .withColumn("cs", sum("v").over(Window.orderBy("t")))
    assert(PlanGate.globalWindows(df.queryExecution.optimizedPlan) == 1)
    assert(PlanGate.planViolations("bad", df).exists(_.contains("global window")))
  }

  test("detector: a partitioned window is NOT flagged") {
    val df = Seq(("a", 1L, 2.0)).toDF("k", "t", "v")
      .withColumn("cs", sum("v").over(Window.partitionBy("k").orderBy("t")))
    assert(PlanGate.planViolations("ok", df).isEmpty)
  }

  test("detector: a non-broadcast cross join is flagged, a broadcast one is not") {
    val l = spark.range(1000).toDF("a")
    val r = spark.range(1000).toDF("b")
    val bad = l.hint("shuffle_replicate_nl").crossJoin(r)
    assert(PlanGate.cartesianProducts(bad.queryExecution.executedPlan.toString) >= 1)
    assert(PlanGate.planViolations("bad", bad).exists(_.contains("CartesianProduct")))
    val good = l.crossJoin(broadcast(r))
    assert(PlanGate.planViolations("ok", good).isEmpty)
  }

  test("detector: an unlisted .collect() site is flagged, comments are not") {
    val dir = java.nio.file.Files.createTempDirectory("plangate-spec")
    java.nio.file.Files.createDirectories(dir.resolve("x"))
    java.nio.file.Files.write(dir.resolve("x/Bad.scala"),
      "object Bad { def f = df.collect() }\n// df.collect() in a comment is fine\n".getBytes)
    val v = PlanGate.collectViolations(dir)
    assert(v.exists(_.startsWith("x/Bad.scala: 1 .collect()")))
    java.nio.file.Files.write(dir.resolve("x/Bad.scala"),
      "// only a comment: df.collect()\n/* and scaladoc:\n * df.collect()\n */\n".getBytes)
    assert(PlanGate.collectViolations(dir).isEmpty)
  }

  test("detector: toLocalIterator outside the HTTP boundary is flagged") {
    val dir = java.nio.file.Files.createTempDirectory("plangate-spec2")
    java.nio.file.Files.write(dir.resolve("Loop.scala"),
      "object Loop { def f = df.toLocalIterator() }\n".getBytes)
    assert(PlanGate.collectViolations(dir).exists(_.contains("toLocalIterator")))
  }

  // ---- the gate itself ----

  test("sketch aggregates plan two-phase (map-side partial + final merge)") {
    // the entire point of the mergeable sketches is that partials
    // combine BEFORE the shuffle: the physical plan must carry two
    // ObjectHashAggregate nodes (partial, final) — a single complete-
    // mode aggregate would ship raw rows and regress to a global sort
    // at scale
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 10000, 1, 8)
      .select((col("id") % 7).as("g"), col("id").cast("double").as("v"))
    for ((name, agg) <- Seq(
      "graft_kll_quantiles" ->
        call_function("graft_kll_quantiles", col("v"), array(lit(0.5)), lit(256)),
      "graft_topk" -> call_function("graft_topk", col("v"), lit(3), lit(64)),
      "graft_hll_count" -> call_function("graft_hll_count", col("v"), lit(10)),
      "graft_kmv_count" -> call_function("graft_kmv_count", col("v"), lit(64)),
      "graft_cms_bytes" -> call_function("graft_cms_bytes", col("v"), lit(4), lit(64)),
      "graft_bloom_bytes" ->
        call_function("graft_bloom_bytes", col("v"), lit(4096), lit(4)),
      "graft_bitmap_distinct" ->
        call_function("graft_bitmap_distinct", col("id")))) {
      val base = if (name == "graft_bitmap_distinct")
        spark.range(0, 10000, 1, 8).select((col("id") % 7).as("g"), col("id"))
      else df
      val plan = base.groupBy("g").agg(agg.as("a"))
        .queryExecution.executedPlan.toString
      val n = "ObjectHashAggregate".r.findAllIn(plan).size
      assert(n >= 2, s"$name planned $n ObjectHashAggregate nodes:\n$plan")
    }
  }

  test("no driver-side collect outside the audited allowlist") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root), s"spec must run from the repo root")
    val v = PlanGate.collectViolations(root)
    assert(v.isEmpty, v.mkString("\n"))
  }

  test("store range scans push time filters AND prune dt partitions") {
    val tsdb = graft.dsl.Tsdb(spark,
      java.nio.file.Files.createTempDirectory("plangate-store").toString)
    tsdb.catalog.createBucket("pg", "greengrass")
    tsdb.writeLp("pg", Seq(
      s"m,h=a v=1 ${1704672000L * 1000000000L}",  // 2024-01-08
      s"m,h=a v=2 ${1704931200L * 1000000000L}")) // 2024-01-11
    val plan = tsdb.from("pg")
      .range("2024-01-08 00:00:00", "2024-01-09 00:00:00")
      .df.queryExecution.executedPlan.toString
    // the ns time bounds must reach the parquet scan THROUGH the LWW
    // dedup window (time_ns and dt ride in its partitionBy for exactly
    // this; an uncompacted bucket previously scanned everything)...
    assert(plan.contains("GreaterThanOrEqual(time_ns"), plan.take(2500))
    assert(plan.contains("LessThan(time_ns"), plan.take(2500))
    // ...and the dt partition filter must prune day directories
    assert(plan.contains("PartitionFilters: [isnotnull(dt") ||
      plan.contains("PartitionFilters: [(dt"), plan.take(2500))
  }

  test("v1 WHERE time bounds push through the dedup window too") {
    val tsdb = graft.dsl.Tsdb(spark,
      java.nio.file.Files.createTempDirectory("plangate-v1").toString)
    tsdb.catalog.createBucket("pgv", "greengrass")
    tsdb.writeLp("pgv", Seq(
      s"m,h=a v=1 ${1704672000L * 1000000000L}",
      s"m,h=a v=2 ${1704931200L * 1000000000L}"))
    val df = graft.influxql.InfluxQLEval.run(
      "SELECT mean(v) FROM m WHERE time >= '2024-01-08T00:00:00Z' " +
        "AND time < '2024-01-09T00:00:00Z' GROUP BY h",
      graft.influxql.InfluxQLEval.tsdbSource(tsdb, "pgv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(time_ns"), plan.take(2500))
    assert(plan.contains("PartitionFilters: [isnotnull(dt") ||
      plan.contains("PartitionFilters: [(dt"), plan.take(2500))
  }

  test("curation scans prune to (doc_id, text) — passes never read full rows") {
    // at 100 TB the documents table carries many wide columns; these
    // ops must reach the parquet scan with a 2-column ReadSchema.
    // seq_pack and unigram_nll checkpoint mid-query, which truncates
    // their visible plans before the file scan — their pruning is
    // asserted on the real pre-checkpoint frames in the test below,
    // so this exclusion list carries no unchecked entries.
    val pruneSpec = Map(
      "bm25_topk" -> Set("doc_id", "text"),
      "pii_redact" -> Set("doc_id", "text"),
      "url_dedup" -> Set("doc_id", "text"),
      // label/slice-driven r10 ops may read their one extra column
      "dsir_weights" -> Set("doc_id", "lang", "text"),
      "nb_classify" -> Set("doc_id", "source", "text"),
      "temp_mix" -> Set("doc_id", "lang"))
    for ((name, allowed) <- pruneSpec) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(reads.nonEmpty, s"$name: no file scan found\n${plan.take(1500)}")
      assert(reads.forall(r => r.split(",").map(_.takeWhile(_ != ':')).toSet
        .subsetOf(allowed)),
        s"$name reads more than $allowed: $reads")
    }
  }

  test("checkpointed ops prune at the scan BELOW the checkpoint") {
    // seq_pack and unigram_nll localCheckpoint mid-query, so their
    // executed plans start at the checkpoint RDD and the file scan is
    // invisible to the gate above. Assert pruning on the REAL frames
    // that feed those checkpoints (the ops call these same builders),
    // not on a convention or a re-typed copy in the test.
    import graft.queries.QueryUtil.documents
    val preCheckpoint = Map(
      "unigram_nll tf" ->
        graft.llmops.TextOps.unigramTf(documents(spark, sfDir), "doc_id", "text"),
      "seq_pack token counts" ->
        graft.llmops.TextOps.packTokenCounts(documents(spark, sfDir), "doc_id", "text"))
    for ((what, frame) <- preCheckpoint) {
      val plan = frame.queryExecution.executedPlan.toString
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(reads.nonEmpty, s"$what: no file scan found\n${plan.take(1500)}")
      assert(reads.forall(r => r.split(",").map(_.takeWhile(_ != ':')).toSet
        .subsetOf(Set("doc_id", "text"))),
        s"$what reads more than (doc_id, text): $reads")
    }
  }

  test("round-12 op plans: shard shuffle is one exchange; bigram LM joins, unigram broadcasts") {
    import graft.queries.QueryUtil.documents
    val sh = graft.llmops.SampleOps
      .shardShuffle(documents(spark, sfDir), "doc_id", 8)
      .queryExecution.executedPlan.toString
    // assignment is a scan predicate; the ONLY exchange is the
    // per-shard ordering shuffle
    assert("Exchange hashpartitioning".r.findAllIn(sh).size == 1, sh.take(800))
    assert(!sh.contains("Exchange SinglePartition"), "no global funnel")

    val bi = graft.llmops.TextOps
      .bigramNll(documents(spark, sfDir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the vocabulary-sized unigram model broadcasts; the plan must
    // carry at least that one broadcast exchange and no cartesian
    assert(bi.contains("BroadcastExchange"), bi.take(800))
    assert(graft.tools.PlanGate.cartesianProducts(bi) == 0)
  }

  test("round-13 op plans: LTTB one exchange, attribution no self-join, PSI broadcasts totals") {
    import graft.queries.QueryUtil.events
    import org.apache.spark.sql.functions._
    val ev = events(spark, sfDir).withColumn("tus", expr("ts_ns div 1000"))

    // LTTB: the series repartition is the ONLY exchange — selection is
    // the mapPartitions walk, never a window sort or a second shuffle
    val lt = graft.operators.Lttb.lttb(
      ev.select("event_type", "tus", "event_id", "value"),
      Seq("event_type"), "tus", "event_id", "value", 20)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(lt).size == 1, lt.take(800))
    assert(!lt.contains("Window"), "LTTB must not plan a window sort")

    // attribution: ONE window over the entity, zero joins of any kind
    val at = graft.operators.PathOps.attribution(
      ev, "user_id", "event_type", "tus", "event_id", Set("purchase"), 1000L)
      .queryExecution.executedPlan.toString
    assert(at.contains("Window"), at.take(800))
    assert(!at.contains("Join"), "attribution must not self-join")

    // PSI: snapshot totals ride as broadcast 1-row frames (planned as
    // broadcast nested loops, never CartesianProduct — the all-gates
    // sweep below pins that half), and the bucket join is a real join
    val ps = graft.operators.DriftOps.categoricalDrift(
      ev.filter(col("event_id") % 2 === 0).select("event_type"),
      ev.filter(col("event_id") % 2 === 1).select("event_type"), "event_type")
      .queryExecution.executedPlan.toString
    assert("BroadcastNestedLoopJoin".r.findAllIn(ps).size == 2, ps.take(800))
    assert(graft.tools.PlanGate.cartesianProducts(ps) == 0)
  }

  test("every gate query plans without global windows or cartesian products") {
    // construction alone runs the two-pass transforms' first passes and
    // k-means training; sf0.001 keeps that cheap. Plan inspection only —
    // the final frame never executes.
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try PlanGate.planViolations(name, fn(spark, sfDir))
      catch { case e: Throwable => Seq(s"$name: failed to plan: ${e.getMessage.take(120)}") }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
