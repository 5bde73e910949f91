package graft.store

import graft.model.Point
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket storage on partitioned Parquet.
  *
  * Layout: `<warehouse>/buckets/<bucketId>/dt=YYYY-MM-DD/part-*.parquet`
  * — hive-style `dt` partitions make Flux `range()` prune partitions for
  * free via Spark's PartitioningAwareFileIndex (SURVEY.md §4), and Parquet
  * row-group min/max stats prune within a day.
  *
  * Scale design (100 TB discipline):
  *  - writes are append-only; upsert semantics (same series+field+time →
  *    last write wins, the TSM behavior of the pinned engine
  *    [engine 2.0.9]) are resolved at read/compaction time with a
  *    window over (series, time) ordered by ingest sequence — no
  *    read-modify-write on the hot path.
  *  - retention (reference: buckets carry retention; recipe.yaml:21's
  *    default bucket) = dropping whole `dt=` directories — an O(metadata)
  *    operation, never a data rewrite.
  *  - deletes (the /api/v2/delete predicate API) rewrite only the
  *    partitions that can contain matching rows.
  *  - compaction rewrites small files per partition (replaces the
  *    engine's TSM compaction) and physically applies LWW dedup so
  *    steady-state reads skip the dedup window entirely.
  */
final class BucketStore(val catalog: Catalog, spark: SparkSession) {

  private val SeqCol = "_ingest_seq"

  /** Monotonic ingest sequence for last-write-wins ordering — monotone
    * ACROSS JVM RESTARTS (r16): a wall-clock seed alone inverts LWW
    * when a run writes faster than 1/ms (tight batch writeLp loops)
    * and then restarts, because the new seed lands BELOW the previous
    * run's max. The store therefore persists a high-water mark at the
    * warehouse root with write-ahead BLOCK reservation: [[nextSeq]]
    * bumps the persisted mark to `seq + seqBlock` before handing out a
    * seq past the current reservation, so every seq ever used is ≤ the
    * persisted mark at all times — a restart seeds at
    * max(now, persisted) and can never re-issue or under-shoot a used
    * sequence. Steady-state cost: one tiny file write per million
    * seqs, zero per-write I/O otherwise.
    *
    * The block size is mutable ONLY so the dual-writer race specs can
    * shrink it (thousands of leapfrog crossings per run instead of ~2 —
    * the claim window is a few instructions wide and a realistic block
    * size would leave it effectively untested); production code never
    * writes it, and [[nextSeq]] reads it ONCE per claim so the
    * persisted mark and the in-memory reservation always agree even if
    * a test mutates it mid-claim.
    *
    * PRECONDITION: seqBlock must exceed the number of concurrent
    * writer threads by a wide margin. [[nextSeq]]'s lock-skipping
    * admit lets the generator overshoot `seqReserved` by up to
    * ~#threads before a claim lands, and a non-foreign claim is safe
    * only because every claim raises the persisted mark by ≥ block —
    * so the overshoot can never straddle a FOREIGN block. A test
    * shrinking the block below plausible thread concurrency would
    * silently void that invariant; [[nextSeq]] enforces a floor of 64
    * (any plausible writer-thread count on one driver is far below it,
    * and the race specs' shrunk value of ~1000 stays well above it).
    */
  @volatile private[graft] var seqBlock: Long = 1L << 20
  private val hwmPath = catalog.root.resolve("_ingest_seq_hwm")

  private def readHwm(): Long =
    if (java.nio.file.Files.exists(hwmPath))
      new String(java.nio.file.Files.readAllBytes(hwmPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption.getOrElse(0L)
    else 0L

  private val seqGen = new java.util.concurrent.atomic.AtomicLong(
    math.max(System.currentTimeMillis(), readHwm()))
  private val seqReserved = new java.util.concurrent.atomic.AtomicLong(readHwm())
  // seqs ≤ seqFloor belong to ANOTHER live instance's claimed block
  // (see nextSeq's leapfrog) and must never be returned by this one
  private val seqFloor = new java.util.concurrent.atomic.AtomicLong(0L)
  private val seqLock = new Object

  /** Monotonic by re-read UNDER A JVM-GLOBAL PER-PATH LOCK: a SECOND
    * live store on the same warehouse (the restart spec itself holds
    * two) may already have pushed the mark past this instance's
    * reservation — overwriting downward would re-open the restart
    * inversion, and the per-instance seqLock cannot order two
    * INSTANCES' read-then-write sequences, so the check-and-move pair
    * serializes on a process-wide monitor keyed by the mark's path.
    * Cross-PROCESS writers remain outside the store's contract ("this
    * store instance owns its warehouse directory").
    */
  private def persistHwm(v: Long): Unit =
    BucketStore.hwmLocks.getOrElseUpdate(hwmPath.toString, new Object).synchronized {
      if (v <= readHwm()) return
      val tmp = hwmPath.resolveSibling(s".${hwmPath.getFileName}.tmp")
      java.nio.file.Files.createDirectories(hwmPath.getParent)
      java.nio.file.Files.write(tmp,
        v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, hwmPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }

  /** Next ingest sequence; the reservation is persisted BEFORE the seq
    * is returned, so a crash at any point keeps used seqs under the
    * persisted mark. Reservations are EXCLUSIVE blocks claimed under
    * the JVM-global per-path hwm monitor: if the persisted mark is
    * found already past the seq about to be issued, a SECOND live
    * store on this warehouse claimed that range — this instance
    * leapfrogs (re-seeds its generator from the mark, claims a fresh
    * block above it, and discards any seq inside the foreign range via
    * `seqFloor`), so two concurrently-live in-JVM instances never hand
    * out the same `_ingest_seq`. Discarded seqs are gaps, which LWW
    * tie-breaking tolerates (uniqueness and restart monotonicity are
    * the contract, not density). Cross-PROCESS writers remain outside
    * the store's contract ("this store instance owns its warehouse
    * directory"). Exposed to the restart-ordering spec.
    */
  private[graft] def nextSeq(): Long = {
    while (true) {
      val s = seqGen.incrementAndGet()
      if (s > seqReserved.get()) seqLock.synchronized {
        if (s > seqReserved.get())
          BucketStore.hwmLocks.getOrElseUpdate(hwmPath.toString, new Object)
            .synchronized {
              val persisted = readHwm()
              // a foreign block's owner may issue any seq ≤ persisted
              // (its return check is s ≤ its reserved top), so s is
              // foreign-claimed iff persisted >= s; our new block is
              // (base, base + block] — block read ONCE so the persisted
              // mark and the reservation below can never disagree
              val block = seqBlock
              // lock-skipping admit safety (see seqBlock's PRECONDITION):
              // the generator can overshoot `reserved` by ~#writer-threads,
              // so a block anywhere near thread-count scale could let an
              // overshoot straddle a foreign block undetected
              require(block >= 64,
                s"seqBlock=$block below the concurrency-safety floor (64): " +
                  "the lock-skipping admit is only safe while the block " +
                  "size far exceeds concurrent writer threads")
              val base = math.max(s, persisted)
              persistHwm(base + block)
              if (persisted >= s) {
                // foreign block covers s — poison it and every pending
                // increment at or under the foreign top, then re-issue
                seqFloor.updateAndGet(f => math.max(f, base))
                seqGen.updateAndGet(g => math.max(g, base))
                ()
              }
              // publish the enlarged reservation LAST: a lock-skipping
              // racer admits a seq only after re-reading reserved (below,
              // BEFORE floor) — sequentially consistent atomics then
              // guarantee that seeing this new reserve implies seeing the
              // new floor, so a foreign-covered seq can never slip
              // through the claim window
              seqReserved.set(base + block)
            }
      }
      // order matters: reserved FIRST, floor second (see claim above)
      val r = seqReserved.get()
      if (s <= r && s > seqFloor.get()) return s
    }
    -1L // unreachable
  }

  def seriesKey: Column =
    xxhash64(col("measurement"), to_json(map_entries(col("tags"))), col("field"))

  /** Per-bucket write locks: Spark's file committer stages every job
    * under the SAME `_temporary/0` of the output directory, so two
    * concurrent appends to one bucket (e.g. two continuous queries on
    * one db, or ingest racing a CQ emission) can delete each other's
    * staging files mid-commit. Appends to one bucket serialize on its
    * monitor; different buckets (different directories) stay parallel.
    * This store instance owns its warehouse directory, so a JVM-level
    * monitor is the correct scope.
    */
  private val writeLocks =
    new scala.collection.concurrent.TrieMap[String, Object]

  /** Live file-stream CONSUMERS per bucket — the runtime half of the
    * compaction-vs-tailing constraint [[compactFragmented]]'s scaladoc
    * documents: a Structured Streaming file source tracks seen file
    * PATHS, so rewriting a tailed bucket double-counts rewritten rows
    * and can break pending batches. Consumers (e.g. a live
    * [[graft.streaming.DownsampleTask]]) register with a LIVENESS
    * thunk; dead entries self-prune, so a stopped task frees the
    * bucket for compaction with no unregister call. The dual registry
    * ([[registerCompactionCadence]]) lets a would-be tail REFUSE to
    * start while an ingest sweep cadence is active.
    */
  private val tailRegistry =
    new scala.collection.concurrent.TrieMap[String,
      scala.collection.concurrent.TrieMap[String, () => Boolean]]

  private val cadenceRegistry =
    new scala.collection.concurrent.TrieMap[String,
      scala.collection.concurrent.TrieMap[String, () => Boolean]]

  private def liveEntries(
      reg: scala.collection.concurrent.TrieMap[String,
        scala.collection.concurrent.TrieMap[String, () => Boolean]],
      bucket: String): Seq[String] =
    reg.get(bucket).map { m =>
      m.foreach { case (n, alive) => if (!alive()) m.remove(n) }
      m.keys.toSeq.sorted
    }.getOrElse(Nil)

  /** Register a live file-stream consumer of `bucket`'s directory.
    * `isActive` is polled at each compaction decision; once false the
    * entry is pruned.
    */
  def registerTail(bucket: String, name: String, isActive: () => Boolean): Unit = {
    tailRegistry.getOrElseUpdate(bucket,
      new scala.collection.concurrent.TrieMap).put(name, isActive)
    ()
  }

  /** Names of live file-stream consumers of `bucket` (dead pruned). */
  def liveTails(bucket: String): Seq[String] = liveEntries(tailRegistry, bucket)

  /** Register an active compaction cadence on `bucket` (an ingest
    * stream whose sweep rewrites files every K batches) so would-be
    * tails can refuse to start against it.
    */
  def registerCompactionCadence(bucket: String, name: String,
      isActive: () => Boolean): Unit = {
    cadenceRegistry.getOrElseUpdate(bucket,
      new scala.collection.concurrent.TrieMap).put(name, isActive)
    ()
  }

  /** Names of live compaction cadences on `bucket` (dead pruned). */
  def liveCompactionCadences(bucket: String): Seq[String] =
    liveEntries(cadenceRegistry, bucket)

  /** IN-PROGRESS one-shot partition rewrites (compact / delete /
    * retention) — separate from the CADENCE registry on purpose: a
    * cadence is a standing property of a live ingest (a would-be tail
    * must refuse outright, naming the compactEvery knob), while a
    * rewrite intent is transient — registered around even a sweep that
    * will SKIP, gone in milliseconds in that case, or gone when a real
    * rewrite finishes. A would-be tail WAITS these out briefly instead
    * of hard-failing with the cadence remedy (which would be the wrong
    * message, and would make the Dekker mutual-abort permanent on the
    * task side).
    */
  private val rewriteRegistry =
    new scala.collection.concurrent.TrieMap[String,
      scala.collection.concurrent.TrieMap[String, () => Boolean]]

  /** Names of in-progress one-shot rewrites on `bucket` (dead pruned). */
  def liveRewrites(bucket: String): Seq[String] = liveEntries(rewriteRegistry, bucket)

  /** Register an IN-PROGRESS partition rewrite (compact / delete /
    * retention) for the duration of `body`: a tail passing its
    * liveTails-was-empty entry check must still see a rewrite that
    * started moments earlier, or its source's initial file listing
    * interleaves with replaceDir (the TOCTOU the registries exist to
    * close — one-shot rewrites need it as much as cadences). The
    * intent registers BEFORE the body's own liveTails check
    * (register-then-check on both sides).
    */
  private def withRewriteIntent[A](bucket: String, op: String)(body: => A): A = {
    @volatile var live = true
    val key = s"$op:${java.util.UUID.randomUUID()}"
    val entries = rewriteRegistry.getOrElseUpdate(bucket,
      new scala.collection.concurrent.TrieMap)
    entries.put(key, () => live)
    // remove deterministically: pruning otherwise happens only when
    // liveRewrites is POLLED, and a maintenance cycle with no tails on
    // the bucket would accumulate one dead UUID entry per sweep forever
    try body finally { live = false; entries.remove(key); () }
  }

  /** Per-bucket mutation counter: bumped by every write/delete/
    * retention/compact so driver-side metadata caches (tag keys) can be
    * validated without a Spark job. Mutations bump TWICE — before the
    * data change starts and after it commits — so a reader that samples
    * the version mid-mutation (and would otherwise cache pre-mutation
    * keys under the post-mutation version) is invalidated by the
    * post-commit bump.
    */
  private val mutations =
    new scala.collection.concurrent.TrieMap[String, java.util.concurrent.atomic.AtomicLong]
  def version(bucket: String): Long = mutations.get(bucket).map(_.get).getOrElse(0L)
  private def bumpVersion(bucket: String): Unit =
    mutations.getOrElseUpdate(bucket, new java.util.concurrent.atomic.AtomicLong).incrementAndGet()

  /** Distinct tag keys of a bucket/measurement, memoized per mutation
    * version. `SELECT *` / `GROUP BY *` / SHOW expansion resolve tag
    * keys at plan time; without this cache every such query paid a
    * blocking driver round-trip (a full distinct scan). The version is
    * read BEFORE the scan, so a concurrent write at worst stores an
    * entry that the next lookup sees as stale and recomputes.
    */
  private val tagKeyCache =
    new scala.collection.concurrent.TrieMap[(String, Option[String]), (Long, Seq[String])]
  private val fieldKeyCache =
    new scala.collection.concurrent.TrieMap[(String, Option[String]), (Long, Seq[String])]

  private def cachedMeta(
      cache: scala.collection.concurrent.TrieMap[(String, Option[String]), (Long, Seq[String])],
      bucket: String, measurement: Option[String])(keyExpr: => Column): Seq[String] = {
    val v = version(bucket)
    cache.get((bucket, measurement)) match {
      case Some((cv, keys)) if cv == v => keys
      case _ =>
        // raw scan: LWW-shadowed rows carry the same series key, so
        // dedup cannot change the distinct key set — skip its shuffle
        val base = readRaw(bucket)
        val f = measurement.map(m => base.filter(col("measurement") === m)).getOrElse(base)
        val keys = f.select(keyExpr.as("k"))
          .distinct().orderBy("k").collect().map(_.getString(0)).toSeq
        cache.put((bucket, measurement), (v, keys))
        keys
    }
  }

  def tagKeys(bucket: String, measurement: Option[String]): Seq[String] =
    cachedMeta(tagKeyCache, bucket, measurement)(explode(map_keys(col("tags"))))

  private val fieldTypeCache =
    new scala.collection.concurrent.TrieMap[(String, Option[String]), (Long, Map[String, String])]

  /** Per-field v1 type names (`float`/`integer`/`unsigned`/`string`/
    * `boolean`), memoized per mutation version like [[fieldKeys]] —
    * lets [[graft.dsl.Tsdb.fieldsAsCols]] read each field back from
    * its TYPED value column (string/bool fields were previously
    * write-only) and SHOW FIELD KEYS report real types. One row per
    * field key reaches the driver (field-count-scale metadata, same
    * class as the key caches). Mixed kinds across writes resolve
    * float > integer > unsigned > string > boolean.
    */
  def fieldTypes(bucket: String, measurement: Option[String]): Map[String, String] = {
    val v = version(bucket)
    fieldTypeCache.get((bucket, measurement)) match {
      case Some((cv, m)) if cv == v => m
      case _ =>
        val base = readRaw(bucket)
        val f = measurement.map(m => base.filter(col("measurement") === m)).getOrElse(base)
        val rows = f.groupBy("field").agg(
          max(col("value_f").isNotNull).as("f"),
          max(col("value_i").isNotNull).as("i"),
          max(col("value_u").isNotNull).as("u"),
          max(col("value_s").isNotNull).as("s")).collect()
        val m = rows.map { r =>
          val t =
            if (r.getBoolean(1)) "float"
            else if (r.getBoolean(2)) "integer"
            else if (r.getBoolean(3)) "unsigned"
            else if (r.getBoolean(4)) "string"
            else "boolean"
          r.getString(0) -> t
        }.toMap
        fieldTypeCache.put((bucket, measurement), (v, m))
        m
    }
  }

  /** Distinct field keys, memoized like [[tagKeys]] — lets
    * `fieldsAsCols` pass explicit pivot values instead of paying
    * Spark's pivot-value-inference job on every plan.
    */
  def fieldKeys(bucket: String, measurement: Option[String]): Seq[String] =
    cachedMeta(fieldKeyCache, bucket, measurement)(col("field"))

  /** Append canonical-schema points to a bucket. */
  def write(bucket: String, points: DataFrame): Unit =
    writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
      writeLocked(bucket, points)
    }

  /** Append with size-targeted file count — the ingest half of the
    * small-file story (the pinned engine's WAL→TSM write path never
    * emits a file per shuffle partition; neither should a micro-batch).
    *
    * A streaming foreachBatch frame arrives with however many
    * partitions its source/shuffle produced (often
    * `spark.sql.shuffle.partitions` of them), and `partitionBy("dt")`
    * then writes ONE FILE PER TASK PER DAY — a 1k-row micro-batch
    * landing as 32 files. This persists the batch once, counts it, and
    * coalesces to `ceil(n / rowsPerFile)` write tasks so a small batch
    * lands as one file per day and a large backfill batch keeps its
    * write parallelism proportional to its size. Returns the row count
    * (the caller's batch metric). Batch-path callers that already
    * control partitioning keep calling [[write]].
    *
    * [[compactFragmented]] is the read-side half: writeSized bounds
    * files-per-batch, the cadence sweep bounds files-per-partition
    * across batches.
    */
  def writeSized(bucket: String, points: DataFrame,
      rowsPerFile: Long = 1000000L): Long = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    // validate BEFORE the empty-batch early-out: a misconfigured sink
    // must fail on its first (possibly empty) micro-batch, not after
    // silently "succeeding" until data happens to arrive
    if (catalog.bucket(bucket).isEmpty)
      throw new IllegalArgumentException(s"unknown bucket '$bucket'")
    val cached = points.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      if (n > 0) {
        val parts = ((n + rowsPerFile - 1) / rowsPerFile).toInt
        write(bucket, cached.coalesce(parts))
      }
      n
    } finally { cached.unpersist(); () }
  }

  private def writeLocked(bucket: String, points: DataFrame): Unit = {
    val meta = catalog.bucket(bucket).getOrElse(
      throw new IllegalArgumentException(s"unknown bucket '$bucket'"))
    val seq = nextSeq()
    // Invalidate the clean marker BEFORE appending: a crash (or a
    // concurrent read) between the append and a later marker delete
    // would see a "clean" bucket containing shadowed duplicate keys and
    // skip LWW dedup. Dropping the marker first means every failure
    // mode degrades to the safe slow path (dedup window), never the
    // incorrect fast path.
    java.nio.file.Files.deleteIfExists(cleanMarker(bucket))
    bumpVersion(bucket)
    points
      .withColumn("dt", to_date(col("time")))
      .withColumn(SeqCol, lit(seq))
      .write
      .mode(SaveMode.Append)
      .partitionBy("dt")
      .parquet(catalog.bucketPath(meta.name).toString)
    // post-commit bump: invalidates any cache entry a reader stored
    // while the append was in flight (it scanned pre-mutation data but
    // would otherwise have keyed it to the already-bumped version)
    bumpVersion(bucket)
  }

  /** Scan a bucket with last-write-wins dedup on (series, time).
    *
    * Fast path: a bucket whose last operation was [[compact]] carries a
    * clean marker — every key already has exactly one row, so the dedup
    * window (a full shuffle on the series key) is skipped entirely.
    * Any [[write]] invalidates the marker. Steady-state reads of
    * compacted data are therefore shuffle-free; only the
    * since-last-compaction tail pays for dedup.
    */
  def read(bucket: String): DataFrame = {
    // a crashed compact/delete may have left a retired partition not
    // yet re-promoted — finish that transition before planning the scan
    // (no-op without orphans: one driver-side directory listing)
    recover(bucket)
    val raw = readRaw(bucket)
    val deduped =
      if (isClean(bucket)) raw
      else {
        // dt and time_ns ride in the partitionBy: dt is functionally
        // determined by time_ns (derived at write), so they don't
        // change the dedup key — but predicates on window PARTITION
        // columns are the only ones Catalyst pushes through a Window,
        // and range() filters exactly (time_ns, dt). Without them an
        // uncompacted bucket's range scan read EVERY partition
        // (PushedFilters/PartitionFilters empty — caught by
        // PlanGateSpec's pushdown test).
        val w = Window
          .partitionBy(col("dt"), col("measurement"),
            to_json(map_entries(col("tags"))), col("field"), col("time_ns"))
          .orderBy(col(SeqCol).desc)
        raw.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      }
    // `dt` is kept: range() adds partition-pruning predicates on it
    deduped.drop(SeqCol).select((Point.columns :+ "dt").map(col): _*)
  }

  private def cleanMarker(bucket: String): java.nio.file.Path =
    catalog.bucketPath(bucket).resolve("_CLEAN")

  def isClean(bucket: String): Boolean =
    java.nio.file.Files.exists(cleanMarker(bucket))

  def readRaw(bucket: String): DataFrame = {
    val meta = catalog.bucket(bucket).getOrElse(
      throw new IllegalArgumentException(s"unknown bucket '$bucket'"))
    val path = catalog.bucketPath(meta.name)
    // A provisioned bucket's directory is created by its FIRST append —
    // until then (and that can be minutes into a service's life, the
    // r18 soak measured ~30 s of failing queries under load) a query
    // must see an EMPTY bucket, exactly like the reference engine,
    // not a PATH_NOT_FOUND 500. The exists-check races an in-flight
    // first append benignly: either side of the race is a valid
    // snapshot (empty vs first batch).
    if (!java.nio.file.Files.exists(path))
      spark.createDataFrame(java.util.Collections.emptyList[Row](), rawSchema)
    else spark.read.schema(rawSchema).parquet(path.toString)
  }

  private def rawSchema = {
    import org.apache.spark.sql.types._
    StructType(Point.schema.fields ++ Seq(
      StructField(SeqCol, LongType), StructField("dt", DateType)))
  }

  /** Predicate-scoped delete (the reference engine's /api/v2/delete:
    * start/stop + measurement/tag predicate). Rewrites only partitions
    * intersecting [startNs, stopNs).
    */
  def delete(bucket: String, startNs: Long, stopNs: Long, predicate: Column = lit(true)): Unit =
    // same hazard as compaction (delete REWRITES intersecting day
    // partitions under new paths), but a delete is explicit user
    // intent — refusing loudly beats silently skipping it.
    // Dekker-style ordering: register the rewrite intent FIRST, check
    // liveTails inside it. A tail registers before checking cadences
    // (DownsampleTask), so whichever side registers second must see the
    // other at its check — check-then-register on this side left a
    // window where both passed and the rewrite raced the tail's initial
    // file listing.
    withRewriteIntent(bucket, "delete") {
      val tails = liveTails(bucket)
      if (tails.nonEmpty)
        throw new BucketStore.TailedBucketException(
          s"delete('$bucket') refused: live file-stream consumer(s) " +
            s"${tails.mkString(", ")} tail this bucket — a partition rewrite " +
            "double-counts rewritten rows in the stream. Stop the consumer " +
            "first (BucketStore.registerTail).")
      writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
        deleteLocked(bucket, startNs, stopNs, predicate)
      }
    }

  /** The delete body shares the per-bucket write lock: its
    * read-rewrite-replaceDir of a day partition must not race a
    * concurrent append staging under the same `_temporary/0`, and an
    * append committed mid-rewrite would be silently dropped by
    * replaceDir.
    *
    * Day-partition math uses floorDiv: pre-1970 timestamps are valid
    * data (the v1 engine's minimum is 1677-09-21, i.e. negative
    * epoch-ns), and truncating division would map them to the wrong
    * day. Long.MinValue/MaxValue bounds saturate instead of
    * overflowing ofEpochDay's range.
    */
  private def deleteLocked(bucket: String, startNs: Long, stopNs: Long, predicate: Column): Unit = {
    recoverLocked(bucket)
    bumpVersion(bucket)
    val path = catalog.bucketPath(bucket)
    def dayOf(ns: Long): java.time.LocalDate = {
      val day = Math.floorDiv(ns, 86400_000_000_000L)
      java.time.LocalDate.ofEpochDay(
        Math.max(-365243219162L, Math.min(365241780471L, day)))
    }
    val startDt = dayOf(startNs)
    val stopDt = dayOf(stopNs)
    partitions(bucket)
      .filter(d => !d.isBefore(startDt) && !d.isAfter(stopDt))
      .foreach { day =>
        val dir = path.resolve(s"dt=$day")
        val df = spark.read.schema(rawSchema.add("dt_ignored", "date")).parquet(dir.toString)
          .drop("dt_ignored")
        val kept = df.filter(
          !(col("time_ns") >= startNs && col("time_ns") < stopNs && predicate))
        val tmp = path.resolve(s".tmp-delete-dt=$day")
        kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        replaceDir(dir, tmp)
      }
    bumpVersion(bucket) // post-commit bump, see writeLocked
  }

  /** Retention enforcement: drop whole day-partitions older than the
    * bucket's retention (reference: bucket retention is a create-time
    * property of the engine; our catalog stores retentionNs).
    */
  def enforceRetention(bucket: String, nowNs: Long = System.currentTimeMillis() * 1000000L): Seq[String] =
    // retention REMOVES whole partitions a tailing source may still
    // reference — skip like the compaction sweep does (the maintenance
    // cycle retries once the consumer stops; expiry is not lost)
    // register-then-check (see delete's ordering note): the intent must
    // be visible BEFORE this side's tail check, or both sides can pass
    withRewriteIntent(bucket, "retention") {
      if (skipIfTailed(bucket, "enforceRetention")) Nil
      else writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
      val meta = catalog.bucket(bucket).get
      if (meta.retentionNs <= 0) Nil
      else {
        bumpVersion(bucket)
        val cutoff = java.time.LocalDate.ofEpochDay(
          Math.floorDiv(nowNs - meta.retentionNs, 86400_000_000_000L))
        val dropped = partitions(bucket).filter(_.isBefore(cutoff)).map { day =>
          val dir = catalog.bucketPath(bucket).resolve(s"dt=$day")
          deleteRecursively(dir.toFile)
          s"dt=$day"
        }
        bumpVersion(bucket) // post-commit bump, see writeLocked
        dropped
      }
    }
    }

  /** Compaction: rewrite each partition dedup-applied and coalesced.
    * Replaces the pinned engine's TSM compaction cycle.
    *
    * INCREMENTAL across sweeps: partitions whose compaction stamp is
    * still valid for this layout signature (same targetFiles/zorder,
    * file set untouched since their rewrite — see [[stampPath]]) are
    * skipped, so a repeat sweep over a bucket with one hot day
    * rewrites that day only. At 100 TB this is the difference between
    * a sweep that costs O(appended data) and one that rewrites the
    * bucket; [[graft.service.Maintenance]]'s fixed-delay cycle relies
    * on it.
    *
    * `zorder = true` (with `targetFiles > 1`) lays each day partition
    * out on a Morton curve of (series rank, time-of-day) via
    * [[graft.llmops.LayoutOps.zorderBy]] instead of one concatenated
    * series sort: every output file then covers a small RECTANGLE of
    * (series, time) space, so parquet min/max stats prune files for a
    * selective series predicate AND for an intra-day time range — the
    * two filters every Flux query leads with. (A plain series sort
    * clusters series but scatters each series' day across all files; a
    * time sort does the reverse.) Series rank — not hash — keeps each
    * file's measurement/field string min/max tight, which is what the
    * footer-stats pruning actually compares. The rank table is
    * series-count-scale metadata, same class as the field-key caches.
    */
  /** `keepExistingLayout = true` (the [[graft.service.Maintenance]]
    * mode) skips any partition with a valid stamp in ANY layout — the
    * sweep wants dedup-cleanliness, and must not grind a deliberately
    * Z-ordered or multi-file day back to the default layout each cycle.
    */
  def compact(bucket: String, targetFiles: Int = 1, zorder: Boolean = false,
      keepExistingLayout: Boolean = false): Unit =
    // register-then-check (see delete's ordering note)
    withRewriteIntent(bucket, "compact") {
      if (skipIfTailed(bucket, "compact")) ()
      else writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
        compactLocked(bucket, targetFiles, zorder,
          keepExistingLayout = keepExistingLayout)
      }
    }

  /** The runtime enforcement of the tailing constraint (see
    * [[registerTail]]): true — and a loud line naming the consumers —
    * when `bucket` must not be rewritten because a live file stream is
    * tailing it. Compaction resumes automatically once the consumer
    * stops (liveness is polled, entries self-prune).
    */
  private def skipIfTailed(bucket: String, op: String): Boolean = {
    val live = liveTails(bucket)
    if (live.nonEmpty)
      System.err.println(s"[graft] $op('$bucket') SKIPPED: live file-stream " +
        s"consumer(s) ${live.mkString(", ")} tail this bucket — rewriting " +
        "files under a FileStreamSource double-counts rewritten rows; " +
        "compaction resumes when the consumer stops (BucketStore.registerTail)")
    live.nonEmpty
  }

  /** Parquet part-file count of one day partition — the fragmentation
    * signal [[compactFragmented]] sweeps on (driver-side listing, no
    * Spark job).
    */
  def partFiles(bucket: String, day: java.time.LocalDate): Int = {
    val dir = catalog.bucketPath(bucket).resolve(s"dt=$day").toFile
    Option(dir.listFiles()).map(_.count { f =>
      f.isFile && f.getName.startsWith("part-") && !f.getName.endsWith(".crc")
    }).getOrElse(0)
  }

  /** Cadence contract — the TSM-compaction analogue for streaming
    * ingest (SURVEY §4 "WAL + cache merge"): compact ONLY the day
    * partitions whose part-file count exceeds `maxFiles`, returning
    * the partition names rewritten. Designed to run off the hot write
    * path — every K micro-batches ([[graft.streaming.StreamIngest]]'s
    * `compactEvery`) or from a maintenance timer; it shares the
    * per-bucket write lock, so either scheduling is race-free against
    * appends/deletes.
    *
    * Together with [[writeSized]] this bounds steady-state files per
    * partition at `maxFiles + K` (each batch adds one file per day it
    * touches; a sweep resets fragmented partitions to `targetFiles`),
    * independent of stream lifetime — the property the spec pins.
    *
    * Clean-marker semantics: per-partition dedup IS complete dedup for
    * the rewritten partitions (the LWW key includes `time_ns`, and
    * `dt` is derived from it at write, so all copies of a key live in
    * one day directory). The global marker is re-armed whenever, after
    * the sweep, EVERY partition carries a valid compaction stamp —
    * rewritten now, or provably untouched since its own dedup rewrite
    * (see [[stampPath]]) — so the common streaming shape (one hot day,
    * cold stamped history) gets shuffle-free reads back after each
    * sweep. A conservative miss costs one dedup window at read, never
    * correctness.
    *
    * NOT safe while a FileStreamSource tails this bucket's directory
    * (e.g. a live [[graft.streaming.DownsampleTask]] on the SAME
    * bucket): Structured Streaming's file source tracks seen file
    * PATHS, so a rewrite re-surfaces already-processed rows as new
    * files (double count) and retires files a pending batch may still
    * reference. Compact tailed buckets at task pause points — the same
    * hot/cold shard discipline the pinned engine's TSM compactor
    * applies. ENFORCED at runtime (r16): consumers register via
    * [[registerTail]], and this sweep (plus [[compact]]) skips a
    * tailed bucket with a loud line instead of corrupting the stream;
    * symmetrically, [[graft.streaming.DownsampleTask]] refuses to
    * start while an ingest cadence ([[registerCompactionCadence]]) is
    * live on its source.
    */
  def compactFragmented(bucket: String, maxFiles: Int = 16,
      targetFiles: Int = 1, zorder: Boolean = false): Seq[String] =
    // register-then-check (see delete's ordering note)
    withRewriteIntent(bucket, "compactFragmented") {
      if (skipIfTailed(bucket, "compactFragmented")) Nil
      else writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
      recoverLocked(bucket)
      val fragmented = partitions(bucket).filter(partFiles(bucket, _) > maxFiles)
      if (fragmented.nonEmpty)
        compactLocked(bucket, targetFiles, zorder, only = Some(fragmented.toSet))
      fragmented.map(d => s"dt=$d")
    }
    }

  /** Per-partition compaction stamp — the mechanism that makes repeated
    * [[compact]] sweeps INCREMENTAL (O(changed partitions), not
    * O(bucket)): after rewriting a day, the stamp records the layout
    * signature plus the exact part-file set the rewrite produced. A
    * partition whose current file set still matches its stamp has
    * provably not been appended to (appends create new part files),
    * deleted from (delete replaces the directory, dropping the stamp),
    * or crash-recovered (recovery promotes stamp-less tmp dirs) since
    * its dedup rewrite — so a sweep skips it, and at 100 TB a bucket
    * with one hot day compacts that day only. Underscore-prefixed, so
    * Spark's readers ignore it. Content equality is exact file names,
    * not mtimes — no clock-granularity edge.
    */
  private def stampPath(dir: java.nio.file.Path) = dir.resolve("_COMPACTED")

  private def layoutSig(targetFiles: Int, zorder: Boolean) =
    s"v1 files=$targetFiles zorder=$zorder"

  private val SigRe = """v1 files=(\d+) zorder=(true|false)""".r

  /** The layout a partition's stamp records — readable even when the
    * stamp's FILE SET is stale (the day was appended to): that is
    * exactly the maintenance case, where the dirty day should be
    * re-compacted in its OWN deliberate layout, not the sweep default.
    */
  private def stampedLayout(dir: java.nio.file.Path): Option[(Int, Boolean)] = {
    val p = stampPath(dir)
    if (!java.nio.file.Files.exists(p)) None
    else new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).split("\n", 2).head match {
      case SigRe(f, z) => Some((f.toInt, z.toBoolean))
      case _ => None
    }
  }

  private def partState(dir: java.nio.file.Path): String =
    Option(dir.toFile.listFiles())
      .map(_.filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).sorted.mkString("\n"))
      .getOrElse("")

  /** Stamp is valid = file set unchanged since the dedup rewrite. With
    * `sig` also requires the same layout signature (skip check); without,
    * any layout counts (clean-marker check — LWW-cleanliness does not
    * depend on file count or z-ordering).
    */
  private def stampValid(dir: java.nio.file.Path, sig: Option[String]): Boolean = {
    val p = stampPath(dir)
    java.nio.file.Files.exists(p) && {
      val content = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val lines = content.split("\n", 2)
      sig.forall(_ == lines.head) &&
        (if (lines.length > 1) lines(1) else "") == partState(dir)
    }
  }

  private def compactLocked(bucket: String, targetFiles: Int,
      zorder: Boolean = false,
      only: Option[Set[java.time.LocalDate]] = None,
      keepExistingLayout: Boolean = false): Unit = {
    val path = catalog.bucketPath(bucket)
    // a previous sweep may have crashed mid-replace: restore/promote
    // first so partitions() sees every day, then rewrite them all —
    // "the next sweep completes compaction"
    recoverLocked(bucket)
    val sig = layoutSig(targetFiles, zorder)
    val skipSig = if (keepExistingLayout) None else Some(sig)
    val all = partitions(bucket)
    all.filter(d => only.forall(_.contains(d)))
      .filterNot(d => stampValid(path.resolve(s"dt=$d"), skipSig))
      .foreach { day =>
      val dir = path.resolve(s"dt=$day")
      // maintenance mode re-applies the day's own stamped layout, so
      // an APPENDED z-ordered day is re-z-ordered, not ground back to
      // the sweep default (the layout signature is readable even when
      // the stamp's file set went stale)
      val (dayFiles, dayZorder) =
        if (keepExistingLayout) stampedLayout(dir).getOrElse((targetFiles, zorder))
        else (targetFiles, zorder)
      val daySig = layoutSig(dayFiles, dayZorder)
      val df = spark.read.schema(rawSchema.add("dt_ignored", "date")).parquet(dir.toString)
        .drop("dt_ignored")
      val w = Window
        .partitionBy(col("measurement"), to_json(map_entries(col("tags"))), col("field"), col("time_ns"))
        .orderBy(col(SeqCol).desc)
      val deduped = df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      val laid =
        if (dayZorder && dayFiles > 1) {
          // series ranks: distinct (measurement, field) pairs, ordered —
          // series-count-scale metadata to the driver (the fieldKeys/
          // fieldTypes collect class), broadcast back as a rank table
          val series = deduped.select(col("measurement"), col("field"))
            .distinct().collect()
            .map(r => (r.getString(0), r.getString(1))).sorted
          val ranks = broadcast(spark.createDataFrame(
            series.zipWithIndex.map { case ((m, f), i) => (m, f, i.toLong) }.toSeq)
            .toDF("measurement", "field", "_srank"))
          val dayNs = 86400L * 1000000000L
          val dayStart = day.toEpochDay * dayNs
          graft.llmops.LayoutOps.zorderBy(
            deduped.join(ranks, Seq("measurement", "field")),
            graft.llmops.LayoutOps.quantizeMinMax(col("_srank"),
              0.0, math.max(series.length - 1, 1).toDouble),
            graft.llmops.LayoutOps.quantizeMinMax(col("time_ns"),
              dayStart.toDouble, (dayStart + dayNs).toDouble),
            dayFiles)
            .drop("_srank", "_zvalue")
            .select(df.columns.map(col): _*) // original column order
        } else deduped
          .sortWithinPartitions("measurement", "field", "time_ns") // cluster for scan locality
          .coalesce(dayFiles)
      val tmp = path.resolve(s".tmp-compact-dt=$day")
      laid.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      replaceDir(dir, tmp)
      // stamp AFTER promote: a crash in between leaves the partition
      // unstamped → treated dirty → re-rewritten by the next sweep
      java.nio.file.Files.write(stampPath(dir),
        (daySig + "\n" + partState(dir)).getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
    }
    // every key now has exactly one row in every partition whose stamp
    // is valid (rewritten this sweep, or untouched since ITS dedup
    // rewrite — LWW keys never span dt dirs, so per-partition
    // cleanliness composes) → reads can skip the dedup window. This
    // lets a SCOPED fragmented sweep re-arm the marker too, whenever
    // the partitions it skipped were already stamped-clean.
    if (partitions(bucket).forall(d => stampValid(path.resolve(s"dt=$d"), None))) {
      java.nio.file.Files.createDirectories(path)
      java.nio.file.Files.write(cleanMarker(bucket), Array.emptyByteArray)
    }
    // LWW compaction cannot change the distinct key set, but bump
    // defensively so the cache invariant ("every mutation bumps") holds
    // without a carve-out.
    bumpVersion(bucket)
  }

  def partitions(bucket: String): Seq[java.time.LocalDate] = {
    val dir = catalog.bucketPath(bucket).toFile
    if (!dir.exists()) Nil
    else dir.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("dt="))
      .map(f => java.time.LocalDate.parse(f.getName.stripPrefix("dt=")))
      .sorted
  }

  /** Test-only crash injection: invoked between the retire and promote
    * renames of [[replaceDir]] — the one window where the live
    * partition directory is absent. A hook that throws simulates a
    * process kill at the worst possible instant.
    */
  @volatile private[store] var replaceCrashHook: java.nio.file.Path => Unit = _ => ()

  /** Crash-safe publish of a rewritten partition. Two renames instead
    * of delete-then-move, so every crash point leaves a recoverable
    * state ([[recover]] completes or rolls back the transition):
    *
    *   1. before retire: target intact, tmp hidden from readers
    *   2. between retire and promote: `.old-<dir>` holds the previous
    *      data, tmp holds the rewrite (with its `_SUCCESS` marker) —
    *      recovery promotes tmp (or restores `.old` if tmp is torn)
    *   3. after promote, before cleanup: both target and `.old` exist —
    *      recovery just drops `.old`
    *
    * Without this, a kill between the delete and the move silently lost
    * the whole day partition.
    */
  private def replaceDir(target: java.nio.file.Path, tmp: java.nio.file.Path): Unit = {
    val old = target.resolveSibling(".old-" + target.getFileName.toString)
    deleteRecursively(old.toFile) // stale leftover from a completed cycle
    if (java.nio.file.Files.exists(target))
      java.nio.file.Files.move(target, old)
    replaceCrashHook(target)
    java.nio.file.Files.move(tmp, target)
    deleteRecursively(old.toFile)
  }

  /** Complete any [[replaceDir]] transition a crash interrupted. Cheap
    * no-op when the bucket directory has no `.old-`/`.tmp-` orphans
    * (one driver-side listing); only locks and mutates when there is
    * something to fix, so steady-state reads never contend with a live
    * compaction.
    */
  def recover(bucket: String): Unit = {
    val dir = catalog.bucketPath(bucket).toFile
    val names = Option(dir.listFiles()).map(_.toSeq.map(_.getName)).getOrElse(Nil)
    // Actionable = a retired dir, or a completed rewrite whose target is
    // missing. A tmp still being written by a LIVE compaction (target
    // present) is NOT actionable — reads must not block behind the
    // bucket lock for a whole compaction sweep just to clean it up.
    def tmpPart(n: String): String =
      n.stripPrefix(".tmp-compact-").stripPrefix(".tmp-delete-")
    val actionable = names.exists(_.startsWith(".old-")) ||
      names.exists(n => n.startsWith(".tmp-") && !names.contains(tmpPart(n)))
    if (actionable)
      writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
        recoverLocked(bucket)
      }
  }

  private def recoverLocked(bucket: String): Unit = {
    val path = catalog.bucketPath(bucket)
    val entries = Option(path.toFile.listFiles()).map(_.toSeq).getOrElse(Nil)
    val names = entries.map(_.getName)
    def complete(tmpName: String): Boolean =
      java.nio.file.Files.exists(path.resolve(tmpName).resolve("_SUCCESS"))
    // partition names touched by an interrupted transition
    val touched = names.collect {
      case n if n.startsWith(".old-") => n.stripPrefix(".old-")
      case n if n.startsWith(".tmp-compact-") => n.stripPrefix(".tmp-compact-")
      case n if n.startsWith(".tmp-delete-") => n.stripPrefix(".tmp-delete-")
    }.distinct
    var changed = false
    touched.foreach { part =>
      val target = path.resolve(part)
      val old = path.resolve(s".old-$part")
      val tmps = Seq(s".tmp-compact-$part", s".tmp-delete-$part").filter(names.contains)
      if (java.nio.file.Files.exists(target)) {
        // promote already happened (or rewrite never retired): the
        // target is canonical — drop the leftovers
        if (java.nio.file.Files.exists(old)) { deleteRecursively(old.toFile); changed = true }
        tmps.foreach { t => deleteRecursively(path.resolve(t).toFile); changed = true }
      } else {
        tmps.find(complete) match {
          case Some(t) => // finish the promote; the rewrite is whole
            java.nio.file.Files.move(path.resolve(t), target)
            if (java.nio.file.Files.exists(old)) deleteRecursively(old.toFile)
            tmps.filterNot(_ == t).foreach(x => deleteRecursively(path.resolve(x).toFile))
            changed = true
          case None if java.nio.file.Files.exists(old) => // torn rewrite: roll back
            java.nio.file.Files.move(old, target)
            tmps.foreach(x => deleteRecursively(path.resolve(x).toFile))
            changed = true
          case None => // torn rewrite, nothing retired: drop the debris
            tmps.foreach { t => deleteRecursively(path.resolve(t).toFile); changed = true }
        }
      }
    }
    if (changed) bumpVersion(bucket)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Remove a bucket's data directory and every driver-side trace of it
    * — the storage half of bucket deletion (`DELETE /api/v2/buckets`).
    * Runs under the bucket's write lock so an in-flight
    * compact/retention/delete pass cannot race the removal and
    * resurrect partial `.tmp-`/partition directories, and bumps the
    * mutation version around the removal + evicts the tagKey/fieldKey
    * caches: bucket ids are name-derived, so a bucket recreated under
    * the SAME name reuses the same path and cache keys — without the
    * eviction it would be served the deleted bucket's metadata. Call
    * BEFORE dropping the catalog entry ([[Catalog.bucketPath]] resolves
    * the directory through the persisted id).
    */
  def drop(bucket: String): Unit =
    writeLocks.getOrElseUpdate(bucket, new Object).synchronized {
      bumpVersion(bucket)
      deleteRecursively(catalog.bucketPath(bucket).toFile)
      tagKeyCache.filterInPlace { case ((b, _), _) => b != bucket }
      fieldKeyCache.filterInPlace { case ((b, _), _) => b != bucket }
      bumpVersion(bucket)
    }
}

object BucketStore {
  /** Thrown by [[BucketStore.delete]] when a live file-stream consumer
    * tails the bucket: client-resolvable contention (stop the consumer,
    * retry), distinct from the blanket IllegalStateExceptions Spark and
    * the JDK throw for genuine server faults, so HTTP handlers can map
    * THIS to 409 and everything else to 500.
    */
  final class TailedBucketException(msg: String)
    extends IllegalStateException(msg)

  /** The dual refusal: a TAIL (DownsampleTask/CQ FileStreamSource)
    * cannot START because rewriters own the bucket — a live ingest
    * compaction cadence, or an in-flight rewrite that outlived the
    * start's grace wait. Same contract as [[TailedBucketException]]:
    * client-resolvable contention (reconfigure the ingest or retry),
    * so HTTP handlers map it to 409, never 500.
    */
  final class TailConflictException(msg: String)
    extends IllegalStateException(msg)

  /** JVM-global per-path monitors for the ingest-seq high-water mark:
    * two store INSTANCES over one warehouse must serialize their
    * read-then-raise of the persisted mark (see persistHwm).
    */
  private[store] val hwmLocks =
    new scala.collection.concurrent.TrieMap[String, Object]
}
