package graft.streaming

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Small-file discipline of the streaming ingest path (VERDICT r14 #1
  * — the TSM-compaction analogue): [[graft.store.BucketStore.writeSized]]
  * bounds files-per-batch, the [[graft.store.BucketStore.compactFragmented]]
  * cadence bounds files-per-partition across the stream's lifetime.
  */
class IngestCompactionSpec extends SparkSpec {

  private val t0 = 1705276800L * 1000000000L // 2024-01-15 00:00:00 UTC ns
  private val day1 = java.time.LocalDate.parse("2024-01-15")
  private val day2 = java.time.LocalDate.parse("2024-01-16")

  private def freshTsdb(): Tsdb = {
    val dir = Files.createTempDirectory("graft-compaction-spec")
    val t = Tsdb(spark, dir.toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("raw", "greengrass")
    t
  }

  /** 12 single-line LP files: 11 on day1 + 1 on day2. maxFilesPerTrigger=1
    * makes each file its own micro-batch — a 12-batch stream.
    */
  private def writeLpFiles(): Path = {
    val dir = Files.createTempDirectory("graft-compaction-lp")
    (0 until 12).foreach { i =>
      val ts = if (i == 11) t0 + 86400L * 1000000000L else t0 + i * 60L * 1000000000L
      Files.write(dir.resolve(f"f$i%02d.txt"),
        s"cpu,host=h$i usage=$i.5 $ts\n".getBytes("UTF-8"))
    }
    dir
  }

  private def ingest(tsdb: Tsdb, lpDir: Path, compactEvery: Int): Unit = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .textFile(lpDir.toString)
    val q = new StreamIngest(tsdb).start("raw", lines,
      Files.createTempDirectory("cp-compaction").toString,
      compactEvery = compactEvery, maxFilesPerPartition = 4)
    q.awaitTermination(300000)
  }

  test("writeSized alone: each micro-batch lands as ONE file per day, not one per shuffle partition") {
    val tsdb = freshTsdb()
    ingest(tsdb, writeLpFiles(), compactEvery = 0) // cadence off
    // 11 one-row batches on day1 → 11 files (one per batch); the old
    // write path landed spark.sql.shuffle.partitions files per batch
    assert(tsdb.store.partFiles("raw", day1) == 11)
    assert(tsdb.store.partFiles("raw", day2) == 1)
    assert(tsdb.from("raw").toDF.count() == 12)
  }

  test("compaction cadence bounds files per dt partition across a 12-batch stream") {
    val tsdb = freshTsdb()
    ingest(tsdb, writeLpFiles(), compactEvery = 3)
    // bound = maxFilesPerPartition + compactEvery: a partition can sit
    // at the threshold right after a sweep and gain one file per batch
    // until the next one
    val n1 = tsdb.store.partFiles("raw", day1)
    assert(n1 <= 4 + 3, s"day1 has $n1 files, cadence bound is 7")
    assert(n1 < 11, s"cadence never compacted (day1 still has $n1 files)")
    // correctness is untouched: every ingested point survives the sweeps
    val df = tsdb.from("raw").toDF
    assert(df.count() == 12)
    assert(df.agg(sum("value_f")).head.getDouble(0) == (0 until 12).map(_ + 0.5).sum)
    // a scoped sweep that did not cover every partition must NOT mark
    // the bucket clean (day2 was never fragmented)
    assert(!tsdb.store.isClean("raw"))
  }

  test("compactFragmented rewrites only partitions over the threshold and reports them") {
    val tsdb = freshTsdb()
    // 6 separate appends on day1 (6 files), 1 on day2
    (0 until 6).foreach { i =>
      tsdb.writeLp("raw", Seq(s"cpu,host=h$i usage=$i ${t0 + i}"))
    }
    tsdb.writeLp("raw", Seq(s"cpu,host=hx usage=99 ${t0 + 86400L * 1000000000L}"))
    assert(tsdb.store.partFiles("raw", day1) == 6)
    val swept = tsdb.store.compactFragmented("raw", maxFiles = 4)
    assert(swept == Seq(s"dt=$day1"))
    assert(tsdb.store.partFiles("raw", day1) == 1)
    assert(tsdb.store.partFiles("raw", day2) == 1) // untouched
    assert(!tsdb.store.isClean("raw")) // day2 not rewritten
    assert(tsdb.from("raw").toDF.count() == 7)
    // below-threshold bucket: the sweep is a no-op
    assert(tsdb.store.compactFragmented("raw", maxFiles = 4).isEmpty)
  }

  test("a fragmented sweep that covers every partition earns the clean marker") {
    val tsdb = freshTsdb()
    (0 until 6).foreach { i =>
      tsdb.writeLp("raw", Seq(s"cpu,host=h1 usage=$i $t0")) // same key: LWW
    }
    assert(!tsdb.store.isClean("raw"))
    val swept = tsdb.store.compactFragmented("raw", maxFiles = 4)
    assert(swept == Seq(s"dt=$day1"))
    // the sweep covered the bucket's only partition → clean, and the
    // per-partition dedup physically applied LWW
    assert(tsdb.store.isClean("raw"))
    assert(tsdb.fromRaw("raw").toDF.count() == 1)
    assert(tsdb.from("raw").toDF.select("value_f").head.getDouble(0) == 5.0)
  }

  test("compaction is incremental: a repeat sweep skips stamped partitions, rewrites only appended days") {
    val tsdb = freshTsdb()
    tsdb.writeLp("raw", Seq(
      s"cpu,host=h1 usage=1 $t0",
      s"cpu,host=h2 usage=2 ${t0 + 86400L * 1000000000L}"))
    tsdb.store.compact("raw")
    assert(tsdb.store.isClean("raw"))
    def files(day: java.time.LocalDate): Set[String] = {
      val d = new java.io.File(
        tsdb.catalog.bucketPath("raw").resolve(s"dt=$day").toString)
      Option(d.listFiles()).map(_.map(_.getName)
        .filter(_.startsWith("part-")).toSet).getOrElse(Set.empty)
    }
    val d1 = files(day1); val d2 = files(day2)
    // append to day2 only, then re-sweep: day1's part files must be
    // byte-identical (a rewrite generates fresh random names), day2's
    // must change
    tsdb.writeLp("raw", Seq(s"cpu,host=h3 usage=3 ${t0 + 86400L * 1000000000L + 1}"))
    assert(!tsdb.store.isClean("raw"))
    tsdb.store.compact("raw")
    assert(files(day1) == d1, "untouched day was rewritten")
    assert(files(day2) != d2, "appended day was not rewritten")
    assert(tsdb.store.isClean("raw"))
    assert(tsdb.from("raw").toDF.count() == 3)
    // a changed layout signature invalidates the skip: zorder sweep
    // rewrites the stamped day too
    tsdb.store.compact("raw", targetFiles = 2, zorder = true)
    assert(files(day1) != d1, "layout change must force a rewrite")
    // … but the Maintenance mode (keepExistingLayout) respects a
    // stamped layout of ANY signature: after a fresh write elsewhere,
    // the sweep cleans the dirty day without undoing the z-order
    val z1 = files(day1)
    tsdb.writeLp("raw", Seq(s"cpu,host=h9 usage=9 ${t0 + 2 * 86400L * 1000000000L}"))
    tsdb.store.compact("raw", keepExistingLayout = true)
    assert(files(day1) == z1, "maintenance sweep must not grind the z-order layout")
    assert(tsdb.store.isClean("raw"))
    // and when the z-ordered day ITSELF is appended to, the sweep
    // re-compacts it in its OWN stamped layout, not the sweep default
    def stampSig(day: java.time.LocalDate): String = {
      val p = tsdb.catalog.bucketPath("raw").resolve(s"dt=$day").resolve("_COMPACTED")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").split("\n", 2).head
    }
    assert(stampSig(day1) == "v1 files=2 zorder=true")
    tsdb.writeLp("raw", Seq(s"cpu,host=hz usage=7 ${t0 + 123}"))
    tsdb.store.compact("raw", keepExistingLayout = true)
    assert(stampSig(day1) == "v1 files=2 zorder=true",
      "appended z-ordered day must be re-compacted in its stamped layout")
    assert(tsdb.store.isClean("raw"))
    assert(tsdb.from("raw").toDF.count() == 5)
  }

  test("a scoped fragmented sweep re-arms the clean marker when skipped partitions are stamped-clean") {
    val tsdb = freshTsdb()
    tsdb.writeLp("raw", Seq(s"cpu,host=h1 usage=1 $t0",
      s"cpu,host=hx usage=9 ${t0 + 86400L * 1000000000L}"))
    tsdb.store.compact("raw") // both days stamped
    // fragment day1 with 5 more appends (same key → LWW shadowing too)
    (0 until 5).foreach { i =>
      tsdb.writeLp("raw", Seq(s"cpu,host=h1 usage=${i + 2} $t0"))
    }
    assert(!tsdb.store.isClean("raw"))
    val swept = tsdb.store.compactFragmented("raw", maxFiles = 4)
    assert(swept == Seq(s"dt=$day1"))
    // day2 was skipped but is stamped-clean → the marker comes back
    assert(tsdb.store.isClean("raw"))
    assert(tsdb.fromRaw("raw").toDF.count() == 2) // LWW physically applied
    assert(tsdb.from("raw").toDF
      .filter(col("tags.host") === "h1").select("value_f").head.getDouble(0) == 6.0)
  }

  test("writeSized scales file count with batch size") {
    val tsdb = freshTsdb()
    import spark.implicits._
    val pts = graft.lineprotocol.LpIngest.parse(
      (0 until 10).map(i => s"cpu,host=h$i usage=$i ${t0 + i}").toDS(), t0)
      .repartition(32) // worst-case incoming partitioning
    val n = tsdb.store.writeSized("raw", pts, rowsPerFile = 4)
    assert(n == 10)
    // ceil(10/4) = 3 write tasks → at most 3 files on the single day
    val files = tsdb.store.partFiles("raw", day1)
    assert(files >= 1 && files <= 3, s"expected 1..3 files, got $files")
    assert(tsdb.from("raw").toDF.count() == 10)
  }
}
