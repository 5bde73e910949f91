package graft.streaming

import graft.llmops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup stage for a document ingest pipeline: the
  * Structured Streaming analogue of the batch `exact_dedup` +
  * `incremental_dedup` operators.
  *
  * Two filters compose on the stream:
  *  1. stream-internal duplicates — `dropDuplicatesWithinWatermark` on
  *     the content fingerprint, so re-sent or doubly-crawled documents
  *     inside the watermark horizon collapse to their first arrival
  *     (state is bounded by the watermark: at 100 TB/day the state
  *     store holds one fingerprint per unique doc per horizon, not the
  *     corpus);
  *  2. corpus duplicates — a stream-static LEFT ANTI join against the
  *     persisted fingerprint index (the `(fp)` parquet a batch job
  *     appends per day). The static side is re-read per micro-batch, so
  *     a nightly index append is picked up without restarting the
  *     stream; Catalyst broadcasts it when small and shuffles the
  *     micro-batch (bounded) against it when not.
  *
  * Output is the deduplicated stream of novel documents — feed it to
  * `foreachBatch` to append both the documents and their fingerprints
  * to the corpus.
  */
object StreamDedup {

  /** @param docs streaming frame carrying `tsCol` (event-time) + `textCol`
    * @param corpusFps static frame with an `fp` column (md5 of the
    *   normalized text, [[TextOps.fingerprint]])
    * @param watermark event-time horizon for the in-stream dedup state
    */
  def exactDedupStream(docs: DataFrame, corpusFps: DataFrame,
      textCol: String, tsCol: String, watermark: String): DataFrame = {
    require(docs.isStreaming, "exactDedupStream expects a streaming frame")
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
  }

  /** Per-micro-batch candidate-pair budget (VERDICT r14 #4) — the
    * guard for the replay-the-corpus failure mode PERF.md documents:
    * a bench seed that replicated indexed documents drove the probe
    * join to 294M pair rows (~100 s/batch), because the join emits
    * df_idx(s)·df_batch(s) rows per shingle s — a batch densely
    * overlapping the index goes quadratic even though both sides are
    * individually bounded. The budget predicts that sum from the df
    * table BEFORE joining (an O(batch-shingles) metadata aggregate);
    * past it, the probe keeps the cheapest shingles that fit and drops
    * the densest — precisely the least discriminative
    * (boilerplate/replay-grade) — with a loud stderr warning.
    *
    * Degrade semantics, documented: dropping a shingle can only LOWER
    * a pair's shared-count, so an engaged budget may let a true
    * near-dup through; it can never fabricate a pair. The default (64M
    * pair rows ≈ a few GB of shuffle) is far above any healthy
    * micro-batch probe and only engages on replay storms.
    */
  val DefaultPairBudget: Long = 64000000L

  /** Exploded batch-side rows above which the probe STOPS broadcasting
    * the batch (`newEx`) and lets the candidate join shuffle. A healthy
    * micro-batch explodes to well under a million (shingle, id) rows
    * and the broadcast keeps the corpus side un-shuffled; but a
    * catch-up trigger (a file source without maxFilesPerTrigger, or an
    * AvailableNow restart over a deep queue) can deliver a
    * multi-million-row "micro"-batch, and an UNCONDITIONAL broadcast of
    * it OOMs the driver. Past this bound the join degrades to a
    * shuffle — same rows out, the corpus scan pays one exchange — and
    * a loud stderr line names the batch size. 4M rows ≈ low hundreds of
    * MB broadcast; the predicted size comes from one metadata-scale
    * scan of the batch's (already checkpointed) fingerprint frame.
    */
  val DefaultBroadcastRows: Long = 4000000L

  /** Broadcast `df` only when the measured batch side is under
    * [[DefaultBroadcastRows]] — the guard every probe-side batch
    * broadcast goes through.
    */
  private[graft] def hintIf(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df

  private def warnLargeBatch(path: String, rows: Long, bound: Long): Unit =
    System.err.println(s"[graft] $path: batch explodes to $rows shingle rows " +
      s"> broadcast bound $bound — probing with a shuffle join instead of a " +
      "batch-side broadcast (results identical; see StreamDedup.DefaultBroadcastRows)")

  /** Predicted probe-join size per shingle — (shingle, _cost) with
    * _cost = df_idx·df_batch, restricted to the batch's non-hot
    * shingles (hot shingles are dropped by the probe's df cap and cost
    * nothing). `idxDf` is (shingle, df) covering at least the batch's
    * shingles — a batch-scoped view is fine, since a shingle's corpus
    * df doesn't depend on which batch probes it. Exposed for the
    * budget spec and the profiler.
    */
  private[graft] def pairCost(newEx: DataFrame, idxDf: DataFrame,
      maxDf: Int, batchSmall: Boolean = true): DataFrame =
    // the batch-side aggregate is O(batch-shingles) and broadcasts, so
    // `idxDf` — which may be the FULL domain-sized state table on the
    // in-memory incremental path — streams through a broadcast-hash
    // join instead of being shuffled per trigger; an oversized batch
    // (see DefaultBroadcastRows) shuffles instead
    hintIf(newEx.groupBy("shingle").agg(count(lit(1)).as("_db")), batchSmall)
      .join(idxDf.filter(col("df") <= maxDf)
        .select(col("shingle"), col("df").as("_di")), "shingle")
      .select(col("shingle"), (col("_db") * col("_di")).as("_cost"))

  /** Trim `newEx` to a shingle set whose predicted probe-join size fits
    * `pairBudget` (cheapest-product shingles first, so trimming starts
    * with the replay-grade ones). No-op — and no extra job beyond one
    * metadata-scale sum — when the batch is healthy.
    */
  private def budgetNewEx(newEx: DataFrame, idxDf: DataFrame, maxDf: Int,
      pairBudget: Long, path: String, batchSmall: Boolean = true): DataFrame = {
    // healthy path = ONE job (the metadata-scale sum); the cost table
    // is only materialized on the rare over-budget path, where its
    // O(batch-shingles) recompute feeds the cumulative trim
    val total = pairCost(newEx, idxDf, maxDf, batchSmall)
      .agg(coalesce(sum("_cost"), lit(0L))).head.getLong(0)
    if (total <= pairBudget) newEx
    else {
      val cost = pairCost(newEx, idxDf, maxDf, batchSmall).localCheckpoint()
      // single-task cumulative sum over O(batch-shingles) rows —
      // micro-batch-bounded, and only paid on the already-degraded path
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("_cost").asc, col("shingle").asc)
      val kept = cost.withColumn("_cum", sum(col("_cost")).over(w))
        .filter(col("_cum") <= pairBudget).select("shingle")
      System.err.println(s"[graft] $path: candidate-pair budget engaged — " +
        s"predicted $total pair rows > budget $pairBudget; dropping the " +
        "densest shingles (shared counts can only shrink; see " +
        "StreamDedup.DefaultPairBudget)")
      newEx.join(hintIf(kept, batchSmall), Seq("shingle"))
    }
  }

  /** NEAR-dup filter for one micro-batch — the `foreachBatch` stage
    * that completes the streaming dedup pipeline (exact collapse above,
    * near-dup here): batch documents sharing at least `minShared`
    * df-capped winnow fingerprints with the persisted corpus index are
    * dropped; survivors are what `foreachBatch` appends to the corpus
    * (documents + fingerprints) before the next batch probes it.
    *
    * Near-dedup needs a per-document aggregation over the candidate
    * join, which Structured Streaming cannot express as an unbounded
    * stateful stage without holding corpus-scale shingle state — so the
    * production shape is exactly this: micro-batch = bounded batch,
    * probe the (static, nightly-compacted) index with the batch side
    * broadcast, so the corpus index is never reshuffled. The df cap is
    * measured batch-scoped (one broadcast-filtered corpus-postings
    * scan, O(batch) output — a shingle's corpus df doesn't depend on
    * which batch probes it, so this equals the full-corpus cap on
    * every shingle that matters), and the candidate join is
    * [[DefaultPairBudget]]-bounded.
    */
  def nearDedupBatch(batch: DataFrame, corpusFps: DataFrame, idCol: String,
      textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget,
      broadcastRows: Long = DefaultBroadcastRows): DataFrame = {
    val newEx0 = TextOps.winnowFingerprints(batch, idCol, textCol)
      .select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
      .localCheckpoint()
    // one count over the checkpointed explode decides every batch-side
    // broadcast below (the backlog-catch-up OOM guard)
    val exRows = newEx0.count()
    val small = exRows <= broadcastRows
    if (!small) warnLargeBatch("nearDedupBatch", exRows, broadcastRows)
    val corpEx = corpusFps
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
    val idxDf = corpEx
      .join(hintIf(newEx0.select("shingle").distinct(), small), Seq("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val newEx = budgetNewEx(newEx0, idxDf, maxDf, pairBudget, "nearDedupBatch", small)
    val hot = idxDf.filter(col("df") > maxDf).select("shingle")
    val doomed = corpEx
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(hintIf(newEx, small), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
  }

  /** Near-dup streaming state with MAINTAINED document frequencies:
    * the fingerprint index `(id, fps)` plus a `(shingle, df)` count
    * table. [[nearDedupBatch]] recomputes the df-cap aggregate over
    * the WHOLE corpus index every micro-batch — an O(corpus) shuffle
    * per trigger, quadratic over a stream's lifetime. Maintaining df
    * incrementally turns the per-batch corpus-side work into a pure
    * scan (the probe join), with the cap's hot-shingle set read from
    * state and updated by an O(batch) delta.
    */
  final case class NearDupIndex(fps: DataFrame, df: DataFrame)

  /** Build the initial state from a seed corpus. */
  def nearDupIndex(docs: DataFrame, idCol: String, textCol: String): NearDupIndex = {
    val fps = TextOps.winnowFingerprints(docs, idCol, textCol)
    NearDupIndex(fps,
      fps.select(explode(col("fps")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).as("df")))
  }

  /** One micro-batch through the maintained-df index: returns the
    * surviving batch rows and the UPDATED state. Semantics match
    * [[nearDedupBatch]] with the df cap measured over the corpus index
    * (the same corpus-side-only capping as
    * [[TextOps.incrementalDedupPairs]]); the spec pins equivalence.
    * Per-batch costs: corpus-index SCAN for the probe join (batch side
    * broadcasts), O(batch) fingerprint work, O(batch) df delta merged
    * into state — no corpus-wide aggregate anywhere. The returned
    * frames are localCheckpointed so a foreachBatch driver can fold
    * them without lineage growth; a production sink appends `fps` rows
    * and merges `df` deltas in its table format instead.
    */
  def nearDedupBatchIncremental(batch: DataFrame, idx: NearDupIndex,
      idCol: String, textCol: String, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget,
      broadcastRows: Long = DefaultBroadcastRows): (DataFrame, NearDupIndex) = {
    val newFps = TextOps.winnowFingerprints(batch, idCol, textCol).localCheckpoint()
    val newEx0 = newFps.select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
    // predicted exploded size — one metadata-scale scan of the
    // checkpointed fingerprint frame, no explode or shuffle — gates
    // every batch-side broadcast (the backlog-catch-up OOM guard)
    val exRows = newFps.agg(coalesce(sum(size(col("fps"))).cast("long"), lit(0L)))
      .head.getLong(0)
    val small = exRows <= broadcastRows
    if (!small) warnLargeBatch("nearDedupBatchIncremental", exRows, broadcastRows)
    // pair budget reads the STATE df table — an O(batch-shingles) join,
    // no corpus work (see DefaultPairBudget)
    val newEx = budgetNewEx(newEx0, idx.df, maxDf, pairBudget,
      "nearDedupBatchIncremental", small)
    // the df cap's hot set comes from STATE, not a per-batch aggregate;
    // it is tiny by construction (shingles with df > maxDf), so it
    // broadcasts onto the corpus scan
    val hot = idx.df.filter(col("df") > maxDf).select("shingle")
    val doomed = idx.fps
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(hintIf(newEx, small), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    val kept = batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
      .localCheckpoint()
    val keptFps = newFps
      .join(kept.select(col(idCol).cast("long").as("id")), Seq("id"))
      .localCheckpoint()
    val dfDelta = keptFps.select(explode(col("fps")).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("d"))
    val mergedDf = idx.df.join(dfDelta, Seq("shingle"), "full")
      .select(col("shingle"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d"), lit(0L))).as("df"))
      .localCheckpoint()
    (kept, NearDupIndex(idx.fps.unionByName(keptFps).localCheckpoint(), mergedDf))
  }

  /** Merge-on-read persistence for the maintained-df near-dup index
    * (VERDICT r14 #2 — the production sink
    * [[nearDedupBatchIncremental]]'s scaladoc promises): two parquet
    * directories,
    *
    *  - `fps/`  — append-only `(id, fps)` fingerprint rows;
    *  - `df/`   — an append-only `(shingle, d)` DELTA LOG whose
    *              merge-on-read view is `df(shingle) = Σ d`.
    *
    * Per batch the sink APPENDS O(batch) rows to each — no full-outer
    * df merge, no rewrite of the corpus-wide df table (the in-memory
    * [[NearDupIndex]] fold materializes the whole domain per trigger,
    * which PERF.md measured as a wash-to-loss at bench scale). The
    * probe never needs the full df view either: only the batch's own
    * shingles can form pairs, so [[nearDedupBatchMor]] reads the log
    * through a broadcast semi-filter on the batch shingle set — an
    * O(log) columnar scan with O(batch) output, and the per-batch
    * corpus-side cost drops to the probe scan alone, independent of
    * index size.
    *
    * [[compact]] is the cadence sweep (same contract as
    * [[graft.store.BucketStore.compactFragmented]]): it folds the df
    * log to one row per shingle and coalesces the fps appends, keeping
    * the log at O(domain + K·batch) for a sweep every K batches. Run
    * it off the hot path; single-writer per index directory, like any
    * foreachBatch sink.
    *
    * Exactly-once + crash-safety (the two failure modes a naive
    * append-only sink gets wrong):
    *
    *  - Appends are keyed by MICRO-BATCH GENERATION (`b=<batchId>`
    *    hive subdirs, seed = `b=-1`) and written with overwrite, so a
    *    Structured Streaming REPLAY of a crashed batch lands on the
    *    same generation instead of double-appending — without this, a
    *    replay double-counts df and can push shingles over the hot
    *    cap, silently UNDER-dooming later batches. A torn append (fps
    *    written, df not) is healed by the same replay; outside a
    *    replaying harness the caller must re-run the failed batchId.
    *  - [[compact]] never rewrites in place: it folds into a `.tmp-`
    *    sibling, stamps `_SWAP_READY`, and publishes with the same
    *    two-rename retire/promote protocol as
    *    [[graft.store.BucketStore]]'s replaceDir — every crash point
    *    leaves either the old or the folded generation recoverable,
    *    and reads heal the transition ([[recover]], one listing).
    */
  final class NearDupMorIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String) {
    private val root = java.nio.file.Paths.get(dir)
    private val fpsDir = root.resolve("fps")
    private val dfDir = root.resolve("df")
    // per-generation commit markers: a generation is visible to readers
    // only once BOTH its fps and df appends landed and `commits/b=<id>`
    // was stamped (the append's last step). A crash between the two log
    // writes outside a Structured-Streaming replay used to leave df
    // undercounted for that generation — a silent skew that under-fills
    // the hot set and can over-doom later batches. With the marker a
    // torn append is simply INVISIBLE (both views exclude it) until the
    // caller re-runs the batchId, which overwrites both generations and
    // stamps the commit.
    private val commitsDir = root.resolve("commits")

    private def stampCommit(b: Long): Unit = {
      // First stamp on a pre-marker index: every generation already on
      // disk was committed under the old contract (readers treated a
      // missing commits/ dir as all-committed), so backfill their
      // markers BEFORE the dir starts existing — otherwise this stamp
      // would flip them all to torn/invisible in one step. The backfill
      // is staged in a temp dir and RENAMED into place: readers key the
      // torn shield off commits/ existing, so the dir must never be
      // observable half-populated (writes are single-writer; reads are
      // not).
      if (!java.nio.file.Files.exists(commitsDir)) {
        val tmp = root.resolve(".tmp-commits")
        deleteRecursively(tmp.toFile)
        java.nio.file.Files.createDirectories(tmp)
        for (log <- Seq(fpsDir, dfDir);
             f <- Option(log.toFile.listFiles()).toSeq.flatten;
             g <- f.getName.stripPrefix("b=").toLongOption if g != b)
          java.nio.file.Files.write(tmp.resolve(s"b=$g"), Array.emptyByteArray)
        java.nio.file.Files.write(tmp.resolve(s"b=$b"), Array.emptyByteArray)
        java.nio.file.Files.move(tmp, commitsDir)
        ()
      } else {
        java.nio.file.Files.write(commitsDir.resolve(s"b=$b"), Array.emptyByteArray)
        ()
      }
    }

    private def committedGens: Set[Long] =
      Option(commitsDir.toFile.listFiles()).toSeq.flatten
        .flatMap(f => f.getName.stripPrefix("b=").toLongOption).toSet

    private def dfDeltaOf(fpsRows: DataFrame): DataFrame =
      fpsRows.select(explode(col("fps")).as("shingle"))
        .groupBy("shingle").agg(count(lit(1)).cast("long").as("d"))

    /** Initialize from a seed corpus — generation `b=-1` of both logs. */
    def seed(docs: DataFrame, idCol: String, textCol: String): Unit = {
      val gen = fpsDir.resolve("b=-1")
      TextOps.winnowFingerprints(docs, idCol, textCol)
        .write.mode("overwrite").parquet(gen.toString)
      dfDeltaOf(spark.read.parquet(gen.toString))
        .write.mode("overwrite").parquet(dfDir.resolve("b=-1").toString)
      stampCommit(-1L)
    }

    /** The fingerprint index — one scan per probe, never reshuffled.
      *
      * `excludeBatch`: drop that generation from the view (partition-
      * pruned, no data read). [[nearDedupBatchMor]] passes its own
      * batchId so a REPLAYED batch probes the exact pre-batch state —
      * without the exclusion, a replay finds its own crashed append,
      * self-matches every survivor, and overwrites the generation with
      * an empty kept set (the failure the replay spec pins).
      */
    def fps(excludeBatch: Option[Long] = None): DataFrame =
      logView(fpsDir, excludeBatch, None)

    /** The single heal-then-read path every consumer goes through:
      * recovery, generation filters (partition-pruned), and the
      * partition-column drop live HERE only.
      */
    private def logView(dir: java.nio.file.Path, excludeBatch: Option[Long],
        keepBelow: Option[Long]): DataFrame = {
      recover(dir)
      var raw = spark.read.parquet(dir.toString)
      // torn-append shield: generations present on disk but missing
      // their commit marker are invisible (partition-pruned out). The
      // list is empty in steady state; a legacy index without a
      // commits/ dir treats everything as committed.
      val torn =
        if (!java.nio.file.Files.exists(commitsDir)) Seq.empty[Long]
        else {
          val committed = committedGens
          Option(dir.toFile.listFiles()).toSeq.flatten
            .flatMap(f => f.getName.stripPrefix("b=").toLongOption)
            .filterNot(committed)
        }
      if (torn.nonEmpty) {
        System.err.println(s"[graft] NearDupMorIndex: ignoring uncommitted " +
          s"generation(s) ${torn.sorted.mkString(", ")} in $dir (torn append — " +
          "re-run those batchIds to publish them)")
        raw = raw.filter(!col("b").isInCollection(torn))
      }
      excludeBatch.foreach(b => raw = raw.filter(col("b") =!= b))
      keepBelow.foreach(b => raw = raw.filter(col("b") < b))
      raw.drop("b")
    }

    /** Merge-on-read df view, scoped to `shingles` (broadcast
      * semi-filter pushed onto the log scan; O(batch) output). Pass
      * no shingle filter for the full domain view (compaction,
      * diagnostics); `excludeBatch` as in [[fps]].
      */
    def dfView(shingles: Option[DataFrame] = None,
        excludeBatch: Option[Long] = None,
        batchSmall: Boolean = true): DataFrame = {
      val log = logView(dfDir, excludeBatch, None)
      val scoped = shingles match {
        case Some(s) => log.join(hintIf(s.select("shingle").distinct(), batchSmall),
          Seq("shingle"), "left_semi")
        case None => log
      }
      scoped.groupBy("shingle").agg(sum("d").as("df"))
    }

    /** Append one batch's surviving fingerprints as generation
      * `b=batchId`: O(batch) rows into each log, nothing rewritten,
      * and a REPLAY of the same batchId overwrites its own generation
      * (idempotent, see class scaladoc).
      */
    def append(keptFps: DataFrame, batchId: Long): Unit = {
      require(batchId >= 0, s"batch ids are non-negative (seed is b=-1), got $batchId")
      keptFps.write.mode("overwrite")
        .parquet(fpsDir.resolve(s"b=$batchId").toString)
      dfDeltaOf(keptFps).write.mode("overwrite")
        .parquet(dfDir.resolve(s"b=$batchId").toString)
      // commit LAST: a crash anywhere above leaves the generation
      // unstamped and therefore invisible — never half-counted
      stampCommit(batchId)
    }

    /** Cadence sweep: fold the df delta log to one row per shingle and
      * compact the fps generations to `targetFiles`, each published
      * via the crash-safe two-rename swap. Run every K batches
      * ([[nearDedupMorSink]] does, inline at trigger start — see its
      * cost note) or nightly from a maintenance timer. Folding df
      * first is safe at every crash point: the df view is a sum,
      * invariant under folding, and the two logs carry no
      * cross-directory invariant beyond it.
      *
      * REPLAY CONSTRAINT: folding erases generation identity, so a
      * generation that might still be REPLAYED (a crashed append of
      * the in-flight batch) must not fold — the [[fps]] exclusion
      * could no longer carve it out and the replay would self-match.
      * `keepFrom = Some(B)` folds only generations with id < B and
      * carries any `b >= B` dirs through the swap untouched: at the
      * start of processing batch B every generation < B has a
      * committed checkpoint behind it, so [[sink]] compacts with
      * `keepFrom = batchId` and is replay-safe with no external
      * coordination. A bare `compact()` keeps the old contract (fold
      * everything; caller guarantees no replay is possible).
      */
    def compact(targetFiles: Int = 1, keepFrom: Option[Long] = None): Unit = {
      // The fold lands as generation b=-1, which may not exist yet on an
      // unseeded (append-only) index — stamp its marker FIRST so the
      // folded corpus is visible at every crash point. Stamping before
      // the swap is safe: a marker for an absent dir is never consulted,
      // and between the two swaps the df-side b=-1 must already be
      // readable (the fold is sum-invariant, so visibility is correct).
      stampCommit(-1L)
      swapWith(dfDir,
        logView(dfDir, None, keepBelow = keepFrom)
          .groupBy("shingle").agg(sum("d").as("d")).coalesce(targetFiles),
        keepFrom)
      swapWith(fpsDir,
        logView(fpsDir, None, keepBelow = keepFrom).coalesce(targetFiles),
        keepFrom)
      // folded generations no longer exist on disk — retire their
      // markers (b=-1 stays committed; carried b >= keepFrom keep
      // theirs). A crash before this cleanup leaves stale markers for
      // absent dirs, which readers never consult — harmless.
      val bound = keepFrom.getOrElse(Long.MaxValue)
      committedGens.filter(b => b >= 0 && b < bound).foreach(b =>
        java.nio.file.Files.deleteIfExists(commitsDir.resolve(s"b=$b")))
    }

    /** Write `folded` as the new `b=-1` generation of `target` via tmp
      * + two renames (BucketStore.replaceDir's protocol); generations
      * `b >= keepFrom` are copied into the tmp before the swap so they
      * survive with their identity (O(one batch) of small files).
      */
    private def swapWith(target: java.nio.file.Path, folded: DataFrame,
        keepFrom: Option[Long] = None): Unit = {
      val name = target.getFileName.toString
      val tmp = target.resolveSibling(s".tmp-$name")
      val old = target.resolveSibling(s".old-$name")
      deleteRecursively(tmp.toFile)
      folded.write.mode("overwrite").parquet(tmp.resolve("b=-1").toString)
      for (b <- keepFrom; f <- Option(target.toFile.listFiles()).toSeq.flatten) {
        val n = f.getName
        if (n.startsWith("b=") && n.stripPrefix("b=").toLongOption.exists(_ >= b))
          copyRecursively(f, tmp.resolve(n).toFile)
      }
      java.nio.file.Files.write(tmp.resolve("_SWAP_READY"), Array.emptyByteArray)
      deleteRecursively(old.toFile)
      java.nio.file.Files.move(target, old)
      java.nio.file.Files.move(tmp, target)
      deleteRecursively(old.toFile)
    }

    private def copyRecursively(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        Option(src.listFiles()).foreach(_.foreach(c =>
          copyRecursively(c, new java.io.File(dst, c.getName))))
      } else {
        java.nio.file.Files.copy(src.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }

    /** Heal an interrupted [[swapWith]] (one directory listing; no-op
      * in steady state). Single-writer contract: reads never race a
      * live compact of the same index, so leftover `.tmp-`/`.old-`
      * debris always belongs to a completed or crashed swap.
      */
    private def recover(target: java.nio.file.Path): Unit = {
      val name = target.getFileName.toString
      val tmp = target.resolveSibling(s".tmp-$name")
      val old = target.resolveSibling(s".old-$name")
      if (java.nio.file.Files.exists(target)) {
        // target canonical — drop debris from a completed/abandoned swap
        deleteRecursively(old.toFile)
        deleteRecursively(tmp.toFile)
      } else if (java.nio.file.Files.exists(tmp.resolve("_SWAP_READY"))) {
        // crashed between retire and promote with a whole rewrite
        java.nio.file.Files.move(tmp, target)
        deleteRecursively(old.toFile)
      } else if (java.nio.file.Files.exists(old)) {
        // torn rewrite: roll back to the retired generation
        java.nio.file.Files.move(old, target)
        deleteRecursively(tmp.toFile)
      }
    }

    private def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
      f.delete(); ()
    }
  }

  /** One micro-batch through the merge-on-read index — semantics match
    * [[nearDedupBatchIncremental]] (the spec pins equivalence, df view
    * included), with the state maintenance turned into appends:
    *
    *   per-batch cost = fps-index probe SCAN
    *                  + df-log scan (broadcast-filtered, O(batch) out)
    *                  + O(batch) appends.
    *
    * Nothing corpus-sized is aggregated, merged, or rewritten per
    * trigger — the property that makes the maintained-df design win
    * when the index is 100×+ the batch (StreamBench's dedup_near_mor
    * row measures exactly that shape against the per-batch-aggregate
    * path). Returns the surviving batch rows; appends survivors'
    * fingerprints to the index as generation `b=batchId` — pass the
    * foreachBatch batch id verbatim so a replayed batch overwrites its
    * own generation instead of double-appending (see
    * [[NearDupMorIndex]]'s exactly-once contract).
    */
  def nearDedupBatchMor(batch: DataFrame, idx: NearDupMorIndex,
      idCol: String, textCol: String, batchId: Long, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget,
      broadcastRows: Long = DefaultBroadcastRows): DataFrame = {
    val newFps = TextOps.winnowFingerprints(batch, idCol, textCol).localCheckpoint()
    val newEx0 = newFps.select(col("id").as("new_id"), explode(col("fps")).as("shingle"))
    // predicted exploded size — one metadata-scale scan of the
    // checkpointed fingerprint frame — gates every batch-side broadcast
    // below (the backlog-catch-up OOM guard)
    val exRows = newFps.agg(coalesce(sum(size(col("fps"))).cast("long"), lit(0L)))
      .head.getLong(0)
    val small = exRows <= broadcastRows
    if (!small) warnLargeBatch("nearDedupBatchMor", exRows, broadcastRows)
    // batch-scoped df: one filtered log scan, O(batch) rows out; the
    // batch's OWN generation is excluded so a replay probes the exact
    // pre-batch state (idempotency — see NearDupMorIndex scaladoc)
    val idxDf = idx.dfView(Some(newEx0), excludeBatch = Some(batchId),
      batchSmall = small).localCheckpoint()
    val newEx = budgetNewEx(newEx0, idxDf, maxDf, pairBudget, "nearDedupBatchMor", small)
    val hot = idxDf.filter(col("df") > maxDf).select("shingle")
    val doomed = idx.fps(excludeBatch = Some(batchId))
      .select(col("id").as("corpus_id"), explode(col("fps")).as("shingle"))
      .join(broadcast(hot), Seq("shingle"), "left_anti")
      .join(hintIf(newEx, small), "shingle")
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("new_id").as("_nd_id")).distinct()
    val kept = batch.join(doomed, batch(idCol) === col("_nd_id"), "left_anti")
      .localCheckpoint()
    idx.append(newFps.join(
      kept.select(col(idCol).cast("long").as("id")), Seq("id")), batchId)
    kept
  }

  /** Complete foreachBatch sink for MOR near-dedup: probe + append +
    * the generation-compaction CADENCE, analogous to
    * [[StreamIngest]]'s small-file sweep. Every `compactEvery`
    * batches the index folds its committed generations (`keepFrom =
    * batchId` — the in-flight batch's own possibly-replayed
    * generation is carried through untouched, see
    * [[NearDupMorIndex.compact]]), so a long-running stream holds
    * O(compactEvery) generations instead of one per lifetime batch.
    * The sweep runs at the START of a trigger, before the batch's own
    * probe — the point where every earlier generation has a committed
    * checkpoint behind it. `onKept` receives the surviving rows (the
    * documents a pipeline would append to its corpus sink).
    *
    * Cost honesty: the sweep rewrites the whole index inline, so the
    * amortized per-batch cost is O(index / compactEvery) — the same
    * rewrite-per-K shape as [[StreamIngest]]'s bucket sweep, paid for
    * bounded generation counts and a fast probe scan. At a large
    * index, raise `compactEvery` (the cost scales down linearly) and
    * keep `targetFiles` at a parallel default — a single-file fold
    * would funnel the whole index through one task.
    */
  def nearDedupMorSink(idx: NearDupMorIndex, idCol: String, textCol: String,
      onKept: DataFrame => Unit = _ => (),
      compactEvery: Int = 16, targetFiles: Int = 8, minShared: Int = 15,
      maxDf: Int = graft.llmops.DedupOps.DefaultMaxDf,
      pairBudget: Long = DefaultPairBudget,
      broadcastRows: Long = DefaultBroadcastRows): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        idx.compact(targetFiles, keepFrom = Some(batchId))
      onKept(nearDedupBatchMor(batch.localCheckpoint(), idx, idCol, textCol,
        batchId, minShared, maxDf, pairBudget, broadcastRows))
    }

  /** Exact-substring SCREEN for one micro-batch — the ingest-time form
    * of [[graft.llmops.DedupOps.substringSpans]]: the persisted corpus
    * is the keeper by definition (it was there first), so every
    * incoming w-token window that collides with the corpus window
    * index marks a removable span, spans merge per doc, and the batch
    * comes back PATCHED — (doc_id, trimmed, kept_tokens) for touched
    * docs, fully-covered docs dropped, novel docs passed through with
    * their token count. `foreachBatch` appends the survivors' windows
    * to the index, so a passage ingested in micro-batch N is screened
    * from batch N+1 on — same index-grows-per-batch shape as
    * [[nearDedupBatch]]. The batch side is micro-batch-bounded; the
    * corpus index joins on 8-byte hash keys and is never reshuffled
    * more than the equi-join requires.
    */
  def substrScreenBatch(batch: DataFrame, corpusWindows: DataFrame,
      idCol: String, textCol: String, w: Int,
      hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    import graft.llmops.DedupOps
    val win = DedupOps.substringWindows(batch, idCol, textCol, w, hashFn)
    val spans = win
      .join(corpusWindows.select(col("h")).distinct(), Seq("h"))
      .select(col("doc_id"), col("i").as("s"), (col("i") + w - 1).as("e"))
    val merged = DedupOps.mergeSpans(spans).localCheckpoint()
    val trimmed = DedupOps.trimToSpans(batch, idCol, textCol, merged)
    val untouched = batch
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.normalize(col(textCol)).as("trimmed"),
        size(TextOps.tokens(col(textCol))).cast("long").as("kept_tokens"))
      .join(merged.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    untouched.unionByName(trimmed)
  }
}
