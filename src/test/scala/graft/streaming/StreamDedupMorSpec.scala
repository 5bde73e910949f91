package graft.streaming

import graft.SparkSpec
import graft.llmops.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Merge-on-read near-dup index + candidate-pair budget (VERDICT r14
  * #2/#4): the MOR path folds batches identically to the in-memory
  * maintained-df path, the df delta log compacts without changing the
  * view, and a corpus-replay batch gets its probe join bounded by the
  * pair budget instead of going dense.
  */
class StreamDedupMorSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Int, b: Int, p: String) = (a to b).map(i => s"$p$i").mkString(" ")

  test("MOR index folds batches identically to the in-memory incremental path") {
    val corpus = Seq(
      (1L, run(1, 40, "a") + " corpus one"),
      (2L, run(50, 90, "b") + " corpus two")).toDF("doc_id", "text")
    val batches = Seq(
      Seq((10L, run(1, 40, "a") + " replay tail"),     // dup of corpus 1
          (11L, run(200, 240, "c") + " novel one")),   // novel → joins index
      Seq((12L, run(200, 240, "c") + " other ending"), // dup of batch-added 11
          (13L, run(300, 340, "d") + " novel two")))
      .map(_.toDF("doc_id", "text"))

    val mor = new StreamDedup.NearDupMorIndex(spark,
      Files.createTempDirectory("graft-mor-idx").toString)
    mor.seed(corpus, "doc_id", "text")
    var keptMor = Vector.empty[Long]

    var inc = StreamDedup.nearDupIndex(corpus, "doc_id", "text")
    inc = inc.copy(fps = inc.fps.localCheckpoint(), df = inc.df.localCheckpoint())
    var keptInc = Vector.empty[Long]

    for ((b, i) <- batches.zipWithIndex) {
      keptMor ++= StreamDedup.nearDedupBatchMor(b, mor, "doc_id", "text",
        batchId = i.toLong)
        .select("doc_id").as[Long].collect().sorted
      val (k, next) = StreamDedup.nearDedupBatchIncremental(b, inc, "doc_id", "text")
      keptInc ++= k.select("doc_id").as[Long].collect().sorted
      inc = next
    }
    assert(keptMor == keptInc && keptMor == Vector(11L, 13L))
    // the MOR df view equals the in-memory maintained table
    assert(mor.dfView().join(inc.df.withColumnRenamed("df", "df2"),
        Seq("shingle"), "full")
      .where(col("df") =!= col("df2") || col("df").isNull || col("df2").isNull)
      .isEmpty)
    // and the fps index holds seed + survivors
    assert(mor.fps().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 11L, 13L))
  }

  test("df-log compaction folds deltas without changing the merge-on-read view") {
    val corpus = Seq((1L, run(1, 40, "a")), (2L, run(50, 90, "b")))
      .toDF("doc_id", "text")
    val mor = new StreamDedup.NearDupMorIndex(spark,
      Files.createTempDirectory("graft-mor-compact").toString)
    mor.seed(corpus, "doc_id", "text")
    // two appends pile delta rows onto the log
    Seq(Seq((11L, run(200, 240, "c"))), Seq((12L, run(300, 340, "d"))))
      .zipWithIndex.foreach { case (b, i) =>
        StreamDedup.nearDedupBatchMor(b.toDF("doc_id", "text"), mor,
          "doc_id", "text", batchId = i.toLong)
      }
    val before = mor.dfView().orderBy("shingle").collect().toSeq
    mor.compact()
    val after = mor.dfView().orderBy("shingle").collect().toSeq
    assert(after == before)
    // folded: the raw log now has one row per shingle
    assert(mor.dfView().count() == before.size)
    assert(mor.fps().count() == 4)
  }

  test("corpus-replay batch: pair budget bounds the probe join and stays off for healthy batches") {
    // replica-overlap seed shape (the 294M-pair incident): the batch
    // replays the indexed documents verbatim, so every shingle's
    // df_idx x df_batch product is dense; two novel docs ride along
    val replayed = (0L until 30L)
      .map(i => (i, run(1, 60, s"w${i % 3}_"))) // 3 families x 10 replicas
    val novel = Seq((100L, run(500, 560, "x")), (101L, run(600, 660, "y")))
    val docs = (replayed ++ novel).toDF("doc_id", "text")
    val idx = TextOps.winnowFingerprints(replayed.toDF("doc_id", "text"),
      "doc_id", "text").localCheckpoint()
    val idxDf = idx.select(explode(col("fps")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df")).localCheckpoint()
    val newEx = TextOps.winnowFingerprints(docs, "doc_id", "text")
      .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
      .localCheckpoint()

    // the replay shape predicts a dense join …
    val total = StreamDedup.pairCost(newEx, idxDf, maxDf = 1000)
      .agg(coalesce(sum("_cost"), lit(0L))).head.getLong(0)
    assert(total > 1000L, s"replay shape should be dense, predicted only $total")

    // … and the budgeted probe degrades only in the documented
    // direction: novel docs (zero shared shingles, zero cost) always
    // survive; replayed docs can only be doomed or SURVIVE EXTRA under
    // a tight budget, never the reverse
    val budget = total / 3
    val keptB = StreamDedup.nearDedupBatch(docs, idx, "doc_id", "text",
      minShared = 15, pairBudget = budget)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(100L, 101L).subsetOf(keptB))

    // default budget: not engaged — every replayed doc is a corpus dup,
    // only the novels survive
    assert(StreamDedup.nearDedupBatch(docs, idx, "doc_id", "text",
      minShared = 15).select("doc_id").as[Long].collect().toSet ==
      Set(100L, 101L))

    // bound holds structurally: any kept-shingle subset the budget
    // selects has total cost <= budget
    val cost = StreamDedup.pairCost(newEx, idxDf, maxDf = 1000)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_cost").asc, col("shingle").asc)
    val keptCost = cost.withColumn("_cum", sum(col("_cost")).over(w))
      .filter(col("_cum") <= budget)
      .agg(coalesce(sum("_cost"), lit(0L))).head.getLong(0)
    assert(keptCost <= budget && keptCost > 0)
  }

  test("generation exclusion is a PARTITION filter — the excluded batch is pruned, not scanned") {
    val mor = new StreamDedup.NearDupMorIndex(spark,
      Files.createTempDirectory("graft-mor-plan").toString)
    mor.seed(Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text"), "doc_id", "text")
    StreamDedup.nearDedupBatchMor(Seq((11L, run(200, 240, "c")))
      .toDF("doc_id", "text"), mor, "doc_id", "text", batchId = 0L)
    val plan = mor.fps(excludeBatch = Some(0L))
      .queryExecution.executedPlan.toString
    // the b=0 generation must fall out at partition-pruning time —
    // NOT(b=0) in PartitionFilters, nothing in data filters
    assert(plan.contains("PartitionFilters: [NOT (b") ||
      plan.contains("PartitionFilters: [isnotnull(b"), plan.take(2000))
  }

  test("replaying a micro-batch overwrites its own generation — no double-count") {
    val corpus = Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text")
    val mor = new StreamDedup.NearDupMorIndex(spark,
      Files.createTempDirectory("graft-mor-replay").toString)
    mor.seed(corpus, "doc_id", "text")
    val batch = Seq((11L, run(200, 240, "c"))).toDF("doc_id", "text")
    StreamDedup.nearDedupBatchMor(batch, mor, "doc_id", "text", batchId = 0L)
    val fpsAfter1 = mor.fps().orderBy("id").collect().toSeq
    val dfAfter1 = mor.dfView().orderBy("shingle").collect().toSeq
    // the foreachBatch crash-replay shape: same batchId delivered again
    StreamDedup.nearDedupBatchMor(batch, mor, "doc_id", "text", batchId = 0L)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAfter1)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAfter1)
  }

  test("keepFrom compaction folds committed generations, carries the in-flight one, and survives its replay") {
    val dir = Files.createTempDirectory("graft-mor-keep").toString
    val mor = new StreamDedup.NearDupMorIndex(spark, dir)
    mor.seed(Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text"), "doc_id", "text")
    (0L to 2L).foreach { b =>
      StreamDedup.nearDedupBatchMor(
        Seq((10L + b, run(200 + 100 * b.toInt, 240 + 100 * b.toInt, "c")))
          .toDF("doc_id", "text"), mor, "doc_id", "text", batchId = b)
    }
    // batch 3's append lands (the crashed-after-append shape) …
    val b3 = Seq((13L, run(600, 640, "d"))).toDF("doc_id", "text")
    StreamDedup.nearDedupBatchMor(b3, mor, "doc_id", "text", batchId = 3L)
    val fpsAll = mor.fps().orderBy("id").collect().toSeq
    val dfAll = mor.dfView().orderBy("shingle").collect().toSeq
    // … then the restart replays batch 3, whose sink cadence compacts
    // with keepFrom = 3 FIRST: generations < 3 fold, b=3 survives
    mor.compact(keepFrom = Some(3L))
    def gens: Set[String] = new java.io.File(dir, "fps").listFiles()
      .map(_.getName).filter(_.startsWith("b=")).toSet
    assert(gens == Set("b=-1", "b=3"), gens.toString)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAll)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAll)
    // the replayed batch now probes the pre-batch state (b=3 excluded)
    // and overwrites its own generation: state identical to no-crash
    StreamDedup.nearDedupBatchMor(b3, mor, "doc_id", "text", batchId = 3L)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAll)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAll)
  }

  test("sink cadence bounds the generation count across a 12-batch stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-mor-sink").toString
    val mor = new StreamDedup.NearDupMorIndex(spark, dir)
    mor.seed(Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text"), "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val keptIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", Files.createTempDirectory("cp-mor-sink").toString)
      .foreachBatch(StreamDedup.nearDedupMorSink(mor, "doc_id", "text",
        onKept = k => { keptIds ++= k.select("doc_id").as[Long].collect(); () },
        compactEvery = 4))
      .start()
    (0 until 12).foreach { i =>
      // one novel doc per batch, plus a replay of corpus doc 1 that
      // must keep being doomed across compactions
      mem.addData((100L + i, run(1000 + 10 * i, 1040 + 10 * i, s"n$i")),
        (1L, run(1, 40, "a") + " replay"))
      q.processAllAvailable()
    }
    q.stop()
    assert(keptIds.toSet == (0 until 12).map(100L + _).toSet)
    val gens = new java.io.File(dir, "fps").listFiles()
      .map(_.getName).count(_.startsWith("b="))
    // cadence bound: base + at most compactEvery un-folded generations
    assert(gens <= 1 + 4, s"$gens generations survived a compactEvery=4 stream")
    assert(mor.fps().select("id").as[Long].collect().sorted.toSeq ==
      (1L +: (0 until 12).map(100L + _)).sorted)
  }

  test("torn append is invisible, not skewed: unstamped generations are excluded until re-run") {
    import java.nio.file.{Files => JF, Paths}
    val dir = Files.createTempDirectory("graft-mor-torn").toString
    val mor = new StreamDedup.NearDupMorIndex(spark, dir)
    mor.seed(Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text"), "doc_id", "text")
    val b0 = Seq((11L, run(200, 240, "c"))).toDF("doc_id", "text")
    StreamDedup.nearDedupBatchMor(b0, mor, "doc_id", "text", batchId = 0L)
    val fpsAfter0 = mor.fps().orderBy("id").collect().toSeq
    val dfAfter0 = mor.dfView().orderBy("shingle").collect().toSeq

    // batch 1 lands fully, then we re-stage its two crash shapes
    val b1 = Seq((12L, run(300, 340, "d"))).toDF("doc_id", "text")
    StreamDedup.nearDedupBatchMor(b1, mor, "doc_id", "text", batchId = 1L)
    val fpsAfter1 = mor.fps().orderBy("id").collect().toSeq
    val dfAfter1 = mor.dfView().orderBy("shingle").collect().toSeq
    assert(fpsAfter1 != fpsAfter0) // batch 1 really contributed

    def rmRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
      f.delete(); ()
    }
    // crash shape A: fps written, df NOT, no commit marker — the shape
    // that used to under-count df and silently skew later batches
    JF.deleteIfExists(Paths.get(dir, "commits", "b=1"))
    rmRec(Paths.get(dir, "df", "b=1").toFile)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAfter0,
      "an unstamped fps generation must be invisible to the fps view")
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAfter0,
      "a torn append must not skew the df view")

    // crash shape B: both logs written, marker NOT — still invisible
    StreamDedup.nearDedupBatchMor(b1, mor, "doc_id", "text", batchId = 1L)
    JF.deleteIfExists(Paths.get(dir, "commits", "b=1"))
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAfter0)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAfter0)

    // re-running the batchId publishes it: state equals the no-crash run
    StreamDedup.nearDedupBatchMor(b1, mor, "doc_id", "text", batchId = 1L)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsAfter1)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfAfter1)
  }

  test("legacy pre-marker index: first stamp backfills, compact stamps the fold (b=-1)") {
    import java.nio.file.{Files => JF, Paths}
    def rmRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
      f.delete(); ()
    }
    // (a) an index written under the pre-marker contract (no commits/
    // dir): the FIRST append must not flip every prior generation to
    // torn — markers are backfilled when commits/ is created
    val dirA = Files.createTempDirectory("graft-mor-legacy").toString
    val morA = new StreamDedup.NearDupMorIndex(spark, dirA)
    morA.seed(Seq((1L, run(1, 40, "a"))).toDF("doc_id", "text"), "doc_id", "text")
    StreamDedup.nearDedupBatchMor(Seq((11L, run(200, 240, "c"))).toDF("doc_id", "text"),
      morA, "doc_id", "text", batchId = 0L)
    rmRec(Paths.get(dirA, "commits").toFile) // legacy: committed, marker-less
    assert(morA.fps().select("id").as[Long].collect().sorted.toSeq == Seq(1L, 11L))
    StreamDedup.nearDedupBatchMor(Seq((12L, run(300, 340, "d"))).toDF("doc_id", "text"),
      morA, "doc_id", "text", batchId = 1L)
    assert(JF.exists(Paths.get(dirA, "commits", "b=-1")) &&
      JF.exists(Paths.get(dirA, "commits", "b=0")),
      "creating commits/ must backfill markers for pre-marker generations")
    assert(morA.fps().select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 11L, 12L),
      "pre-marker generations must stay visible after the first stamped append")

    // (b) an UNSEEDED index (appends only, no b=-1 marker): compact()
    // folds everything into b=-1 and must stamp it, or the whole folded
    // corpus becomes torn/invisible
    val dirB = Files.createTempDirectory("graft-mor-unseeded").toString
    val morB = new StreamDedup.NearDupMorIndex(spark, dirB)
    Seq(Seq((21L, run(400, 440, "e"))), Seq((22L, run(500, 540, "f"))))
      .zipWithIndex.foreach { case (b, i) =>
        morB.append(TextOps.winnowFingerprints(
          b.toDF("doc_id", "text"), "doc_id", "text"), batchId = i.toLong)
      }
    val fpsBefore = morB.fps().orderBy("id").collect().toSeq
    val dfBefore = morB.dfView().orderBy("shingle").collect().toSeq
    morB.compact()
    assert(JF.exists(Paths.get(dirB, "commits", "b=-1")),
      "compact must stamp the folded generation")
    assert(morB.fps().orderBy("id").collect().toSeq == fpsBefore,
      "the folded corpus must stay visible after compacting an unseeded index")
    assert(morB.dfView().orderBy("shingle").collect().toSeq == dfBefore)
  }

  test("oversized batch takes the shuffle path — results identical, no batch-side broadcast hint") {
    // the guard is pure routing: hintIf(_, small = false) must be the
    // identity (no hint node enters the plan), and a probe forced off
    // the broadcast path must keep/doom exactly the same documents
    val d = Seq((1L, 2L)).toDF("new_id", "shingle")
    assert(StreamDedup.hintIf(d, small = false) eq d)
    assert(StreamDedup.hintIf(d, small = true) ne d)

    val corpus = Seq((1L, run(1, 40, "a")), (2L, run(50, 90, "b")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, run(1, 40, "a") + " replay tail"), // dup of corpus 1
      (11L, run(200, 240, "c"))).toDF("doc_id", "text") // novel
    val idx = graft.llmops.TextOps.winnowFingerprints(corpus, "doc_id", "text")
      .localCheckpoint()
    def keptWith(bound: Long) =
      StreamDedup.nearDedupBatch(docs, idx, "doc_id", "text",
        broadcastRows = bound).select("doc_id").as[Long].collect().toSet
    assert(keptWith(0L) == keptWith(StreamDedup.DefaultBroadcastRows))
    assert(keptWith(0L) == Set(11L))

    // and the MOR sink end-to-end: a zero bound (every batch
    // "oversized") folds identically to the default
    def foldMor(bound: Long): (Seq[Long], Seq[org.apache.spark.sql.Row]) = {
      val mor = new StreamDedup.NearDupMorIndex(spark,
        Files.createTempDirectory("graft-mor-bcast").toString)
      mor.seed(corpus, "doc_id", "text")
      val kept = StreamDedup.nearDedupBatchMor(docs, mor, "doc_id", "text",
        batchId = 0L, broadcastRows = bound)
        .select("doc_id").as[Long].collect().sorted.toSeq
      (kept, mor.dfView().orderBy("shingle").collect().toSeq)
    }
    val (kDef, dfDef) = foldMor(StreamDedup.DefaultBroadcastRows)
    val (kShf, dfShf) = foldMor(0L)
    assert(kDef == kShf && kDef == Seq(11L))
    assert(dfDef == dfShf)
  }

  test("compaction crash points recover: torn rewrite rolls back, ready rewrite promotes") {
    import java.nio.file.{Files => JF, Paths}
    val dir = Files.createTempDirectory("graft-mor-crash").toString
    val mor = new StreamDedup.NearDupMorIndex(spark, dir)
    mor.seed(Seq((1L, run(1, 40, "a")), (2L, run(50, 90, "b")))
      .toDF("doc_id", "text"), "doc_id", "text")
    StreamDedup.nearDedupBatchMor(Seq((11L, run(200, 240, "c")))
      .toDF("doc_id", "text"), mor, "doc_id", "text", batchId = 0L)
    val fpsBefore = mor.fps().orderBy("id").collect().toSeq
    val dfBefore = mor.dfView().orderBy("shingle").collect().toSeq

    // crash between retire and promote, rewrite NOT ready (no
    // _SWAP_READY): the retired generation must roll back
    val fpsPath = Paths.get(dir, "fps")
    JF.move(fpsPath, Paths.get(dir, ".old-fps"))
    JF.createDirectories(Paths.get(dir, ".tmp-fps")) // torn, no marker
    assert(mor.fps().orderBy("id").collect().toSeq == fpsBefore)

    // crash between retire and promote with a READY rewrite: the
    // folded generation must promote (simulate with a real compact
    // output: run compact, then re-stage its result as a ready tmp)
    mor.compact()
    assert(mor.fps().orderBy("id").collect().toSeq == fpsBefore)
    assert(mor.dfView().orderBy("shingle").collect().toSeq == dfBefore)
    JF.move(fpsPath, Paths.get(dir, ".tmp-fps"))
    JF.write(Paths.get(dir, ".tmp-fps", "_SWAP_READY"), Array.emptyByteArray)
    assert(mor.fps().orderBy("id").collect().toSeq == fpsBefore)
    assert(JF.exists(fpsPath) && !JF.exists(Paths.get(dir, ".tmp-fps")))
  }
}
