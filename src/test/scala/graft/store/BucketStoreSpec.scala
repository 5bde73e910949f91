package graft.store

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end store semantics: LP ingest → partitioned parquet →
  * last-write-wins read, delete, retention, compaction (SURVEY.md §7
  * step 2; mirrors the pinned engine's TSM upsert/retention behavior).
  */
class BucketStoreSpec extends SparkSpec {

  private def freshTsdb(): Tsdb = {
    val dir = Files.createTempDirectory("graft-store-spec")
    val t = Tsdb(spark, dir.toString)
    t.catalog.createOrg("greengrass")
    t.catalog.createBucket("telemetry", "greengrass")
    t
  }

  // 2024-01-15 00:00:10 UTC in ns
  private val t0 = 1705276810L * 1000000000L

  test("LP write → read round-trip with dt partitioning") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h2 usage=0.7,sys=0.1 ${t0 + 1}",
      s"mem,host=h1 free=100i ${t0 + 86400L * 1000000000L}")) // next day
    val df = tsdb.from("telemetry").toDF
    assert(df.count() == 4) // 2 fields on one line -> 2 points
    assert(tsdb.store.partitions("telemetry").size == 2) // two dt= dirs
    val cpu = df.filter(col("measurement") === "cpu" && col("field") === "usage")
    assert(cpu.orderBy("time_ns").select("value_f").collect().map(_.getDouble(0)).toSeq == Seq(0.5, 0.7))
    assert(cpu.filter(col("tags.host") === "h1").count() == 1)
  }

  test("LWW survives a JVM restart after a faster-than-1/ms write run (persisted seq high-water mark)") {
    val dir = Files.createTempDirectory("graft-store-hwm")
    val t1 = Tsdb(spark, dir.toString)
    t1.catalog.createOrg("greengrass")
    t1.catalog.createBucket("telemetry", "greengrass")
    // simulate a run that issued seqs far faster than wall-clock ms
    // (tight batch writeLp loops): burn 2M sequences driver-side, then
    // write v=1 with a now-very-high sequence
    (0 until 2000000).foreach(_ => t1.store.nextSeq())
    t1.writeLp("telemetry", Seq(s"cpu,host=h1 usage=1.0 $t0"))
    assert(t1.from("telemetry").toDF
      .filter(col("field") === "usage").head.getAs[Double]("value_f") == 1.0)

    // "restart": a NEW store instance over the same warehouse must seed
    // ABOVE every sequence the first run used — its overwrite of the
    // same (series, time) key has to win regardless of write rate
    val t2 = Tsdb(spark, dir.toString)
    t2.writeLp("telemetry", Seq(s"cpu,host=h1 usage=2.0 $t0"))
    assert(t2.from("telemetry").toDF
      .filter(col("field") === "usage").head.getAs[Double]("value_f") == 2.0,
      "the second run's write must win LWW after a restart")
    // and reads through a third instance agree (pure on-disk state)
    assert(Tsdb(spark, dir.toString).from("telemetry").toDF
      .filter(col("field") === "usage").head.getAs[Double]("value_f") == 2.0)
  }

  test("two concurrently-live stores on one warehouse never issue the same ingest seq") {
    val dir = Files.createTempDirectory("graft-store-dualseq")
    val t1 = Tsdb(spark, dir.toString)
    t1.store.seqBlock = 1000L // small blocks: cross claims in thousands
    val early = (0 until 10).map(_ => t1.store.nextSeq())
    // second LIVE instance (not a restart): seeds above t1's persisted
    // block, but t1's generator will eventually increment through t2's
    // active range — the leapfrog must route t1 past it instead
    val t2 = Tsdb(spark, dir.toString)
    t2.store.seqBlock = 1000L
    val s1 = collection.mutable.ArrayBuffer.empty[Long]
    val s2 = collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val n = 20000 // many block crossings for both instances
    while (i < n) {
      s1 += t1.store.nextSeq()
      if (i % 64 == 0) s2 += t2.store.nextSeq()
      i += 1
    }
    val all = early ++ s1 ++ s2
    assert(all.distinct.size == all.size,
      "duplicate _ingest_seq issued across two live instances — LWW ties arbitrary")
  }

  test("a seqBlock below the concurrency-safety floor is refused at claim time") {
    // nextSeq's lock-skipping admit is only safe while the block size
    // far exceeds concurrent writer threads (the generator overshoots
    // `reserved` by ~#threads; a claim must always out-jump a foreign
    // block). Test shrinkage (the race specs use 1000) must not be
    // able to cross that invariant silently.
    val dir = Files.createTempDirectory("graft-store-seqfloor")
    val t = Tsdb(spark, dir.toString)
    t.store.seqBlock = 10L
    val e = intercept[IllegalArgumentException](t.store.nextSeq())
    assert(e.getMessage.contains("concurrency-safety floor"))
    // restored above the floor, seq issuance works again
    t.store.seqBlock = 1000L
    assert(t.store.nextSeq() > 0L)
  }

  test("dual-live stores under THREAD concurrency: seqs stay globally unique") {
    // the single-threaded test above walks the leapfrog deterministically;
    // this one races it — 4 threads per instance hammering nextSeq while
    // both instances repeatedly cross block claims, so the floor/reserved
    // interplay (a racing thread must discard a seq the other instance's
    // block covers) is exercised under real interleavings
    val dir = Files.createTempDirectory("graft-store-dualseq-mt")
    val t1 = Tsdb(spark, dir.toString)
    val t2 = Tsdb(spark, dir.toString)
    // shrink the reservation block so the 2.4M seqs below produce
    // thousands of leapfrog crossings (at the production 1M block the
    // few-instruction claim window would be crossed ~2 times per run —
    // no meaningful race coverage)
    t1.store.seqBlock = 1000L
    t2.store.seqBlock = 1000L
    val perThread = 300000
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Array[Long]]()
    val threads = (0 until 8).map { k =>
      val store = if (k % 2 == 0) t1.store else t2.store
      new Thread(() => {
        val buf = new Array[Long](perThread)
        var i = 0
        while (i < perThread) { buf(i) = store.nextSeq(); i += 1 }
        out.add(buf); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val seen = new java.util.HashSet[java.lang.Long](perThread * 8 * 2)
    var dups = 0L
    out.forEach(buf => buf.foreach(s => if (!seen.add(s)) dups += 1))
    assert(dups == 0L, s"$dups duplicate seqs across 8 threads x 2 live stores")
    assert(seen.size == perThread * 8)
  }

  test("last write wins on same (series, time)") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h1 usage=0.5 $t0"))
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h1 usage=0.9 $t0")) // overwrite
    val vals = tsdb.from("telemetry").toDF
      .filter(col("field") === "usage").select("value_f").collect().map(_.getDouble(0))
    assert(vals.toSeq == Seq(0.9))
    // raw keeps both (append-only); compaction applies dedup physically
    assert(tsdb.fromRaw("telemetry").toDF.count() == 2)
    assert(!tsdb.store.isClean("telemetry"))
    tsdb.store.compact("telemetry")
    assert(tsdb.fromRaw("telemetry").toDF.count() == 1)
    assert(tsdb.from("telemetry").toDF.count() == 1)
    // compacted bucket reads skip the dedup window (no shuffle)
    assert(tsdb.store.isClean("telemetry"))
    val plan = tsdb.from("telemetry").toDF.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // a new write invalidates the fast path
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h1 usage=0.7 $t0"))
    assert(!tsdb.store.isClean("telemetry"))
    assert(tsdb.from("telemetry").toDF
      .filter(col("field") === "usage").select("value_f").collect().head.getDouble(0) == 0.7)
  }

  test("z-order compaction: files cover (series, time) rectangles, so selective scans skip files") {
    val tsdb = freshTsdb()
    // 16 series × 64 points spread across one day — enough rows that a
    // 4-file layout must choose what to co-locate
    val dayNs = 86400L * 1000000000L
    val day0 = (t0 / dayNs) * dayNs
    val lines = for (m <- 0 until 16; i <- 0 until 64) yield
      f"m$m%02d,host=h${m % 4} v=${m * 100 + i}.0 ${day0 + i * (dayNs / 64) + m}"
    tsdb.writeLp("telemetry", lines)
    val before = tsdb.from("telemetry").toDF
      .select("measurement", "field", "time_ns", "value_f")
      .collect().map(_.toString).sorted

    tsdb.store.compact("telemetry", targetFiles = 4, zorder = true)

    // rows and values are untouched by the layout
    val after = tsdb.from("telemetry").toDF
      .select("measurement", "field", "time_ns", "value_f")
      .collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    assert(tsdb.store.isClean("telemetry"))

    // per-file footer truth: read each parquet file alone and take the
    // min/max the scanner's stats pruning compares
    val dir = tsdb.catalog.bucketPath("telemetry").resolve(
      "dt=" + java.time.LocalDate.ofEpochDay(day0 / dayNs))
    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 4, files.mkString(", "))
    val stats = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("measurement"), max("measurement"), min("time_ns"), max("time_ns"))
        .head()
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
    }
    // a selective series predicate overlaps a MINORITY of files …
    val mHits = stats.count { case (lo, hi, _, _) => lo <= "m03" && "m03" <= hi }
    assert(mHits < files.length, stats.mkString("; "))
    // … and so does a quarter-day time slice: the same layout prunes
    // BOTH dimensions, which neither single-column sort achieves
    val (qLo, qHi) = (day0, day0 + dayNs / 4)
    val tHits = stats.count { case (_, _, lo, hi) => lo <= qHi && qLo <= hi }
    assert(tHits < files.length, stats.mkString("; "))
  }

  test("compaction crash between retire and promote: reads stay correct, next sweep completes") {
    val tsdb = freshTsdb()
    // duplicate keys on BOTH days so dedup has real work everywhere
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h2 usage=0.6 ${t0 + 1}",
      s"mem,host=h1 free=1i ${t0 + 86400L * 1000000000L}"))
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.9 $t0",
      s"mem,host=h1 free=2i ${t0 + 86400L * 1000000000L}"))
    def snapshot() = tsdb.from("telemetry").toDF
      .orderBy("measurement", "field", "time_ns")
      .select("measurement", "field", "time_ns", "value_f", "value_i")
      .collect().toSeq
    val expected = snapshot()
    // kill the process between the retire and promote renames — the one
    // window where the live partition directory is absent
    tsdb.store.replaceCrashHook =
      p => throw new RuntimeException(s"injected kill at $p")
    try intercept[RuntimeException](tsdb.store.compact("telemetry"))
    finally tsdb.store.replaceCrashHook = _ => ()
    // no clean marker: the interrupted sweep must NOT enable the fast path
    assert(!tsdb.store.isClean("telemetry"))
    // reads recover the retired partition and stay correct on the LWW slow path
    assert(snapshot() == expected)
    // the next sweep completes compaction: marker set, dedup physical
    tsdb.store.compact("telemetry")
    assert(tsdb.store.isClean("telemetry"))
    assert(tsdb.fromRaw("telemetry").toDF.count() == 3)
    assert(snapshot() == expected)
    // and no transition debris is left behind
    val entries = tsdb.catalog.bucketPath("telemetry").toFile.listFiles().map(_.getName)
    assert(!entries.exists(n => n.startsWith(".old-") || n.startsWith(".tmp-")), entries.mkString(","))
  }

  test("a torn compaction rewrite (no _SUCCESS) rolls back to the retired data") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h1 usage=0.9 $t0"))
    def snapshot() = tsdb.from("telemetry").toDF
      .select("measurement", "field", "time_ns", "value_f").collect().toSeq
    val expected = snapshot()
    // stage the crash-mid-rewrite state by hand: partition retired, tmp
    // directory exists but the job never committed (no _SUCCESS)
    val path = tsdb.catalog.bucketPath("telemetry")
    val part = "dt=2024-01-15"
    Files.move(path.resolve(part), path.resolve(s".old-$part"))
    Files.createDirectories(path.resolve(s".tmp-compact-$part"))
    Files.write(path.resolve(s".tmp-compact-$part").resolve("part-torn.parquet"),
      Array[Byte](0, 1, 2))
    // the read rolls the retired data back in place and stays correct
    assert(snapshot() == expected)
    assert(tsdb.store.partitions("telemetry") == Seq(java.time.LocalDate.parse("2024-01-15")))
    val entries = path.toFile.listFiles().map(_.getName)
    assert(!entries.exists(n => n.startsWith(".old-") || n.startsWith(".tmp-")), entries.mkString(","))
  }

  test("hash-colliding bucket names store disjoint data") {
    // "Aa" and "BB" have identical String.hashCode AND identical length —
    // the classic collision that folded two buckets onto one directory
    // before idFor switched to a SHA-256 prefix.
    val tsdb = freshTsdb()
    tsdb.catalog.createBucket("Aa", "greengrass")
    tsdb.catalog.createBucket("BB", "greengrass")
    tsdb.writeLp("Aa", Seq(s"cpu,host=h1 usage=1.0 $t0"))
    tsdb.writeLp("BB", Seq(s"cpu,host=h2 usage=2.0 $t0"))
    assert(tsdb.from("Aa").toDF.select("value_f").collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    assert(tsdb.from("BB").toDF.select("value_f").collect().map(_.getDouble(0)).toSeq == Seq(2.0))
    tsdb.store.delete("Aa", 0L, Long.MaxValue)
    assert(tsdb.from("Aa").toDF.count() == 0)
    assert(tsdb.from("BB").toDF.count() == 1) // BB untouched by Aa's delete
  }

  test("bucketPath honors the persisted id: legacy-id warehouses stay readable") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(s"cpu,host=h1 usage=1.5 $t0"))
    val root = tsdb.catalog.root
    val meta = tsdb.catalog.bucket("telemetry").get
    // Simulate a warehouse written under an older id scheme: rename the
    // data dir to a legacy-looking id and rewrite the catalog JSON to
    // match. A reloaded catalog must resolve reads through the persisted
    // id, not re-derive it from the name.
    val legacyId = "00000000cafe0008"
    Files.move(root.resolve("buckets").resolve(meta.id),
      root.resolve("buckets").resolve(legacyId))
    val catFile = root.resolve("_catalog.json")
    Files.writeString(catFile,
      Files.readString(catFile).replace(meta.id, legacyId))
    val reloaded = Tsdb(spark, root.toString)
    assert(reloaded.catalog.bucket("telemetry").get.id == legacyId)
    assert(reloaded.from("telemetry").toDF
      .select("value_f").collect().map(_.getDouble(0)).toSeq == Seq(1.5))
  }

  test("predicate delete rewrites only matching partitions") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h2 usage=0.7 ${t0 + 1}"))
    tsdb.store.delete("telemetry", t0, t0 + 10, col("tags.host") === "h1")
    val left = tsdb.from("telemetry").toDF.select("tags.host").collect().map(_.getString(0))
    assert(left.toSeq == Seq("h2"))
  }

  test("retention drops whole old partitions") {
    val tsdb = freshTsdb()
    tsdb.catalog.dropBucket("telemetry")
    tsdb.catalog.createBucket("telemetry", "greengrass",
      retentionNs = 7L * 86400 * 1000000000L) // 7 days
    tsdb.writeLp("telemetry", Seq(
      s"cpu v=1 $t0",
      s"cpu v=2 ${t0 + 30L * 86400 * 1000000000L}")) // 30 days later
    val dropped = tsdb.store.enforceRetention("telemetry",
      nowNs = t0 + 31L * 86400 * 1000000000L)
    assert(dropped.size == 1)
    assert(tsdb.from("telemetry").toDF.count() == 1)
  }

  test("fieldsAsCols pivots the long table to a wide per-measurement view") {
    val tsdb = freshTsdb()
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5,sys=0.1 $t0",
      s"cpu,host=h2 usage=0.7 ${t0 + 1}"))
    val wide = tsdb.fieldsAsCols("telemetry", "cpu", Seq("usage", "sys"))
    // dt rides along for partition-pruning pushdown (WHERE-time dt
    // conjuncts pass through the groupBy only as a grouping column)
    assert(wide.columns.toSet == Set("time", "time_ns", "dt", "tags", "usage", "sys"))
    val h1 = wide.filter(col("tags.host") === "h1").collect().head
    assert(h1.getAs[Double]("usage") == 0.5 && h1.getAs[Double]("sys") == 0.1)
    assert(wide.filter(col("tags.host") === "h2").collect().head.get(wide.columns.indexOf("sys")) == null)
  }

  test("to() writes a query result back as points (Flux to(bucket:))") {
    val tsdb = freshTsdb()
    tsdb.catalog.createBucket("out", "greengrass")
    tsdb.writeLp("telemetry", Seq(
      s"cpu,host=h1 usage=0.5 $t0",
      s"cpu,host=h2 usage=0.9 ${t0 + 1}"))
    val result = tsdb.from("telemetry").where(col("value_f") > 0.6).toDF
    tsdb.to("out", result)
    val back = tsdb.from("out").toDF
    assert(back.count() == 1)
    assert(back.select("tags.host").collect().head.getString(0) == "h2")
    assert(back.select("time_ns").collect().head.getLong(0) == t0 + 1)
  }

  test("store.drop removes data and evicts metadata so a recreated same-name bucket starts clean") {
    val tsdb = freshTsdb()
    tsdb.catalog.createBucket("reborn", "greengrass")
    tsdb.writeLp("reborn", Seq(s"cpu,host=h1,dc=us usage=0.5 $t0"))
    // prime the driver-side metadata caches
    assert(tsdb.store.tagKeys("reborn", None).sorted == Seq("dc", "host"))
    assert(tsdb.store.fieldKeys("reborn", None) == Seq("usage"))
    val dir = tsdb.catalog.bucketPath("reborn")
    tsdb.store.drop("reborn")
    tsdb.catalog.dropBucket("reborn")
    assert(!Files.exists(dir))
    // same name → same derived id → same path and cache keys: without
    // the eviction the new bucket would be served the DELETED bucket's
    // tag/field keys (the r8 advice finding)
    tsdb.catalog.createBucket("reborn", "greengrass")
    tsdb.writeLp("reborn", Seq(s"mem,zone=z1 free=1.0 $t0"))
    assert(tsdb.store.tagKeys("reborn", None) == Seq("zone"))
    assert(tsdb.store.fieldKeys("reborn", None) == Seq("free"))
  }

  test("catalog bootstrap is idempotent and persists across instances") {
    val dir = Files.createTempDirectory("graft-cat-spec")
    val c1 = new Catalog(dir)
    c1.createBucket("b1", "org1", retentionNs = 5L)
    c1.createBucket("b1", "org1") // second create: no-op, keeps retention
    c1.addToken(TokenRecord("1", "greengrass_read", "tok-ro", "active", "u", "uid",
      Seq("read:orgs/o/buckets/b")))
    val c2 = new Catalog(dir) // reload from disk
    assert(c2.bucket("b1").map(_.retentionNs).contains(5L))
    assert(c2.listTokens.map(_.description) == Seq("greengrass_read"))
  }
}
