package graft.service

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The serve-loop retention/compaction scheduler: a short-retention
  * bucket's expired day-partition must vanish while the service runs,
  * with no operator action and no query disruption (the pinned
  * engine's automatic expiry + TSM cycles).
  */
class MaintenanceSpec extends SparkSpec {

  private def freshTsdb(retentionNs: Long): Tsdb = {
    val dir = Files.createTempDirectory("graft-maint-spec")
    val t = Tsdb(spark, dir.toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("telemetry", "greengrass", retentionNs = retentionNs)
    t
  }

  private val dayNs = 86400L * 1000000000L

  test("live sweep drops expired day-partitions and recompacts while queries run") {
    val tsdb = freshTsdb(retentionNs = 7 * dayNs)
    val nowNs = System.currentTimeMillis() * 1000000L
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=1.0 ${nowNs - 40 * dayNs}", // long expired
      s"cpu,host=h1 usage=2.0 $nowNs"))
    // second batch overwrites the same (series, time) → LWW dup for compact
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h1 usage=3.0 $nowNs"))
    assert(tsdb.store.partitions("telemetry").size == 2)

    val maint = new Maintenance(tsdb.store, periodSeconds = 1).start()
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (tsdb.store.partitions("telemetry").size > 1 && System.nanoTime() < deadline)
        Thread.sleep(100)
      // expired partition vanished while the service loop ran
      assert(tsdb.store.partitions("telemetry").size == 1)
      // the dirty bucket was compacted in the same sweep: clean marker
      // armed, LWW physically applied (2 appended rows for one key → 1)
      val cleanDeadline = System.nanoTime() + 30L * 1000000000L
      while (!tsdb.store.isClean("telemetry") && System.nanoTime() < cleanDeadline)
        Thread.sleep(100)
      assert(tsdb.store.isClean("telemetry"))
      // queries keep working against the swept bucket
      val vals = tsdb.from("telemetry").toDF
        .filter(col("field") === "usage").select("value_f")
        .collect().map(_.getDouble(0)).toSeq
      assert(vals == Seq(3.0)) // last write wins; expired point gone
      assert(tsdb.fromRaw("telemetry").toDF.count() == 1) // physically deduped
    } finally maint.stop()
  }

  test("sweep serializes with writes on the bucket lock: concurrent appends survive") {
    val tsdb = freshTsdb(retentionNs = 7 * dayNs)
    val nowNs = System.currentTimeMillis() * 1000000L
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h0 usage=0.0 ${nowNs - 40 * dayNs}"))
    val maint = new Maintenance(tsdb.store, periodSeconds = 1)
    // hammer writes while sweeping directly — every append must commit
    // (replaceDir under the same lock cannot drop a racing append)
    val writer = new Thread(() => (1 to 5).foreach { i =>
      tsdb.writeLp("telemetry", Seq(s"cpu,host=h$i usage=$i.0 ${nowNs + i}"))
    })
    writer.start()
    (1 to 5).foreach(_ => maint.sweepAll())
    writer.join()
    maint.sweepAll() // final pass: expired gone, bucket left clean
    val hosts = tsdb.from("telemetry").toDF
      .select("tags.host").collect().map(_.getString(0)).toSet
    assert(hosts == Set("h1", "h2", "h3", "h4", "h5"))
    assert(tsdb.store.isClean("telemetry"))
  }

  test("a bucket with no retention only compacts; failures skip to the next bucket") {
    val tsdb = freshTsdb(retentionNs = 0)
    val nowNs = System.currentTimeMillis() * 1000000L
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=1.0 ${nowNs - 40 * dayNs}",
      s"cpu,host=h1 usage=2.0 $nowNs"))
    // a second bucket whose data dir is corrupt must not starve the sweep
    tsdb.catalog.createBucket("broken", "greengrass", retentionNs = 1L)
    val brokenDir = tsdb.catalog.bucketPath("broken")
    Files.createDirectories(brokenDir.resolve("dt=not-a-date"))
    new Maintenance(tsdb.store, periodSeconds = 1).sweepAll()
    // retention 0 = keep forever: both days survive, but compaction ran
    assert(tsdb.store.partitions("telemetry").size == 2)
    assert(tsdb.store.isClean("telemetry"))
  }

  test("postSweep hook fires once per full sweep; its failure is contained") {
    val tsdb = freshTsdb(retentionNs = 0)
    var fired = 0
    val maint = new Maintenance(tsdb.store, periodSeconds = 1,
      postSweep = () => { fired += 1; if (fired == 1) sys.error("boom") })
    maint.sweepAll() // the throwing first invocation must not propagate
    maint.sweepAll()
    assert(fired == 2, s"postSweep fired $fired times across two sweeps")
  }
}
